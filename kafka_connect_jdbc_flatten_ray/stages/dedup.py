"""Deduplication operators over the ``documents`` table.

All per-batch work is vectorized numpy/pyarrow over flattened token/shingle
arrays; the only wide ops are groupbys on compact hash keys (never on the
raw text), which is what keeps these runnable at 100 TB:

- exact:     two independent 64-bit content fingerprints -> groupby the
             128-bit pair -> keep min doc_id (no text moves in the shuffle)
- minhash:   word-shingle MinHash signatures -> LSH banding -> per-band
             buckets -> star-pattern candidate pairs (linear, not quadratic,
             in bucket size) verified by signature-estimated Jaccard
- ngram:     same machinery with character n-gram shingles
- simhash:   64-bit SimHash -> 16-bit band pigeonhole -> pairs verified by
             Hamming distance
- embedding: cosine near-dup pairs, LSH (random hyperplane) bucketed
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.util import fsl_to_numpy

U64 = np.uint64
_A = U64(0x9E3779B97F4A7C15)
_B = U64(0xC2B2AE3D27D4EB4F)
_C = U64(0x165667B19E3779F9)


def _text_col(batch: pa.Table) -> pa.Array:
    t = batch.column("text")
    return t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t


def _string_hashes(flat: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Stable 64-bit hash per string, vectorized: dictionary-encode (C++
    hash table), polynomial-hash only the UNIQUE values, gather by index.
    The hash is ``Horner(bytes, 1000003) * _A + len  (mod 2**64)`` — the
    engine's own content fingerprint — so every downstream MinHash /
    SimHash value is reproducible in plain SQL (see
    pipelines/dedup_oracles.py for the DuckDB mirror)."""
    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    if len(d.dictionary) == 0:
        return np.empty(0, U64)
    hd, _ = _fingerprints(d.dictionary)
    return hd[d.indices.to_numpy(zero_copy_only=False)]


def _token_hashes(text: pa.Array):
    """(flat token hashes uint64, parent doc idx, tokens-per-doc)."""
    toks = pc.split_pattern(text, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    parent = np.repeat(np.arange(len(text), dtype=np.int64), lens)
    flat = pc.list_flatten(toks)
    return _string_hashes(flat), parent, lens


def _char_ngram_hashes(text: pa.Array, n: int = 5):
    """Rolling char n-gram hashes per doc from the flat utf8 byte buffer."""
    b = pc.cast(text, pa.large_binary())
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    nrows = len(b)
    off = np.frombuffer(b.buffers()[1], np.int64, count=nrows + 1, offset=b.offset * 8)
    lens = np.diff(off)
    flat = np.frombuffer(
        b.buffers()[2], np.uint8, count=int(off[-1] - off[0]), offset=int(off[0])
    ).astype(U64)
    parent = np.repeat(np.arange(nrows, dtype=np.int64), lens)
    with np.errstate(over="ignore"):
        h = flat * _A
        for k in range(1, n):
            h[:-k] = h[:-k] * _B + flat[k:] * _A
    # an n-gram starting at i is valid if i+n-1 is in the same doc
    valid = np.zeros(len(flat), bool)
    if len(flat) >= n:
        valid[: len(flat) - (n - 1)] = parent[: len(flat) - (n - 1)] == parent[n - 1:]
    return h[valid], parent[valid]


def _shingle_hashes_words(text: pa.Array, k: int = 3):
    th, parent, _ = _token_hashes(text)
    with np.errstate(over="ignore"):
        sh = th * _A
        for i in range(1, k):
            sh[:-i] = sh[:-i] * _B + th[i:] * _C
    valid = np.zeros(len(th), bool)
    if len(th) >= k:
        valid[: len(th) - (k - 1)] = parent[: len(th) - (k - 1)] == parent[k - 1:]
    return sh[valid], parent[valid]


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _fingerprints(text: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit polynomial hashes of the raw bytes."""
    b = pc.cast(text, pa.large_binary())
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    n = len(b)
    off = np.frombuffer(b.buffers()[1], np.int64, count=n + 1, offset=b.offset * 8)
    lens = np.diff(off)
    flat = np.frombuffer(
        b.buffers()[2], np.uint8, count=int(off[-1] - off[0]), offset=int(off[0])
    ).astype(U64)
    parent = np.repeat(np.arange(n, dtype=np.int64), lens)
    ends = np.cumsum(lens)
    pos = np.arange(len(flat), dtype=np.int64)
    exps = (ends[parent] - 1) - pos
    out = []
    for base in (U64(1000003), U64(31)):
        powers = _pow64(base, exps)
        with np.errstate(over="ignore"):
            terms = powers * flat
        acc = np.zeros(n, U64)
        np.add.at(acc, parent, terms)
        # fold in the length so prefix collisions differ
        with np.errstate(over="ignore"):
            acc = acc * _A + lens.astype(U64)
        out.append(acc)
    return out[0], out[1]


def _pow64(base: U64, exps: np.ndarray) -> np.ndarray:
    result = np.ones(len(exps), U64)
    b = U64(base)
    e = exps.astype(U64).copy()
    with np.errstate(over="ignore"):
        while e.any():
            odd = (e & U64(1)).astype(bool)
            if odd.any():
                result[odd] = result[odd] * b
            b = b * b
            e >>= U64(1)
    return result


def _hash_stage(batch: pa.Table) -> pa.Table:
    h1, h2 = _fingerprints(_text_col(batch))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
        }
    )


def dedup_exact(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Keep min(doc_id) per distinct content; shuffles only (h1, h2, doc_id)."""
    hashed = docs.map_batches(_hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby(["h1", "h2"]).min("doc_id")
    return agg.map_batches(
        lambda t: pa.table({"doc_id": t.column("min(doc_id)")}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

NUM_PERM = 32
NUM_BANDS = 8
ROWS_PER_BAND = NUM_PERM // NUM_BANDS

_rng = np.random.RandomState(1234)
_PERM_A = _rng.randint(1, 2**62, NUM_PERM).astype(U64) | U64(1)
_PERM_B = _rng.randint(1, 2**62, NUM_PERM).astype(U64)


class MinHashStage:
    """doc batch -> (band_id, band_hash, doc_id, sig) rows (one per band)."""

    def __init__(self, shingles: str = "word"):
        self.shingles = shingles

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = _text_col(batch)
        n = len(text)
        if self.shingles == "word":
            sh, parent = _shingle_hashes_words(text)
        else:
            sh, parent = _char_ngram_hashes(text)
        sig = np.full((n, NUM_PERM), np.iinfo(np.uint64).max, U64)
        with np.errstate(over="ignore"):
            for j in range(NUM_PERM):
                y = sh * _PERM_A[j] + _PERM_B[j]
                np.minimum.at(sig[:, j], parent, y)
        # band hashes
        band_hash = np.empty((n, NUM_BANDS), U64)
        with np.errstate(over="ignore"):
            for b in range(NUM_BANDS):
                acc = np.zeros(n, U64)
                for r in range(ROWS_PER_BAND):
                    acc = acc * _B + sig[:, b * ROWS_PER_BAND + r]
                band_hash[:, b] = acc
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_doc = np.tile(doc_id, NUM_BANDS)
        out_band = np.repeat(np.arange(NUM_BANDS, dtype=np.int32), n)
        out_hash = band_hash.T.reshape(-1)
        sig_list = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(sig, (NUM_BANDS, 1)).reshape(-1).view(np.int64)), NUM_PERM
        )
        return pa.table(
            {
                "band_id": pa.array(out_band),
                "band_hash": pa.array(out_hash.view(np.int64)),
                "doc_id": pa.array(out_doc),
                "sig": sig_list,
            }
        )


NUM_LSH_SHARDS = 64


def _sharded_bucket_pairs(group: pa.Table) -> pa.Table:
    """Star-pattern candidate pairs for EVERY bucket in one (band, shard)
    group, fully vectorized: sort by (band_hash, doc_id), find bucket
    boundaries, compare each row's signature to its bucket head with one
    matrix equality. One task call handles thousands of tiny buckets —
    map_groups-per-bucket pays Ray+pandas overhead per bucket instead."""
    n = group.num_rows
    if n < 2:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "est_jaccard": pa.array([], pa.float64())})
    bh = group.column("band_hash").to_numpy(zero_copy_only=False)
    did = group.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((did, bh))
    bh_s, did_s = bh[order], did[order]
    sig_mat = fsl_to_numpy(group.column("sig"))[order]
    # bucket heads: first row of each distinct band_hash run
    new_bucket = np.concatenate(([True], bh_s[1:] != bh_s[:-1]))
    head_pos = np.flatnonzero(new_bucket)
    head_of = head_pos[np.cumsum(new_bucket) - 1]  # per row: its bucket head
    member = ~new_bucket  # every non-head row pairs with its head
    if not member.any():
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "est_jaccard": pa.array([], pa.float64())})
    est = (sig_mat[member] == sig_mat[head_of[member]]).mean(axis=1)
    return pa.table(
        {
            "doc_a": pa.array(did_s[head_of[member]]),
            "doc_b": pa.array(did_s[member]),
            "est_jaccard": pa.array(est.astype(np.float64)),
        }
    )


def dedup_minhash_pairs(
    docs: ray.data.Dataset, threshold: float = 0.5, shingles: str = "word"
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs via MinHash-LSH, deduplicated across
    bands and filtered by estimated Jaccard >= threshold. Buckets are
    processed in ``NUM_LSH_SHARDS`` vectorized shards per band (bounded
    group size at any corpus scale; no per-bucket task overhead)."""
    rows = docs.map_batches(
        MinHashStage(shingles), batch_format="pyarrow", zero_copy_batch=True
    )

    def _shard(t: pa.Table) -> pa.Table:
        bh = t.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "shard", pa.array((bh % np.uint64(NUM_LSH_SHARDS)).astype(np.int32))
        )

    sharded = rows.map_batches(_shard, batch_format="pyarrow", zero_copy_batch=True)
    pairs = sharded.groupby(["band_id", "shard"]).map_groups(
        _sharded_bucket_pairs, batch_format="pyarrow"
    )
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("est_jaccard"), threshold)),
        batch_format="pyarrow",
    )
    # dedup across bands
    return pairs.groupby(["doc_a", "doc_b"]).max("est_jaccard").map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "est_jaccard"]),
        batch_format="pyarrow",
    )


def dedup_ngram_jaccard_pairs(docs: ray.data.Dataset, threshold: float = 0.5):
    return dedup_minhash_pairs(docs, threshold, shingles="char")


class MinHashStageSlim(MinHashStage):
    """Slim banding rows: (band_id, band_hash, doc_id) WITHOUT the
    signature — the LSH shuffle then moves ~20 bytes per row instead of the
    full NUM_PERM signature replicated once per band (8x 256 bytes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        full = super().__call__(batch)
        return full.drop_columns(["sig"])


class MinHashSignatures(MinHashStage):
    """Per-doc signature rows (doc_id, sig as a NUM_PERM*8-byte blob) for
    the verification attach stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        full = super().__call__(batch)
        n = batch.num_rows
        first_band = full.slice(0, n)  # identical sig in every band row
        flat = fsl_to_numpy(first_band.column("sig"), "<i8").tobytes()
        width = NUM_PERM * 8
        return pa.table(
            {
                "doc_id": first_band.column("doc_id"),
                "sig": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(width), n, [None, pa.py_buffer(flat)]
                ),
            }
        )


def dedup_minhash_pairs_slim(
    docs: ray.data.Dataset, threshold: float = 0.5, shingles: str = "word"
) -> ray.data.Dataset:
    """The 100 TB-scale MinHash-LSH path: banding rows carry no signatures
    (8x less exchange than dedup_minhash_pairs), candidate pairs from the
    bucket stars are deduped, and each pair's two signatures are attached
    through sort-based groupbys (one signature blob per doc over the wire,
    plus two per surviving candidate) for exact est-jaccard verification —
    same pairs as the dense variant."""
    rows = docs.map_batches(
        MinHashStageSlim(shingles), batch_format="pyarrow", zero_copy_batch=True
    )

    def _shard(t: pa.Table) -> pa.Table:
        bh = t.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "shard", pa.array((bh % np.uint64(NUM_LSH_SHARDS)).astype(np.int32))
        )

    def _sharded_cands(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        if n < 2:
            return empty
        bh = group.column("band_hash").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bh))
        bh_s, did_s = bh[order], did[order]
        new_bucket = np.concatenate(([True], bh_s[1:] != bh_s[:-1]))
        head_pos = np.flatnonzero(new_bucket)
        head_of = head_pos[np.cumsum(new_bucket) - 1]
        member = ~new_bucket
        if not member.any():
            return empty
        return pa.table({"doc_a": pa.array(did_s[head_of[member]]),
                         "doc_b": pa.array(did_s[member])})

    cand = rows.map_batches(_shard, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["band_id", "shard"]).map_groups(
            _sharded_cands, batch_format="pyarrow"
        )
    # distinct pairs via hash aggregate (outputs feed map_batches, which
    # skips ray 2.49's empty zero-schema blocks safely)
    cand = cand.groupby(["doc_a", "doc_b"]).count().map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )
    sigs = docs.map_batches(
        MinHashSignatures(shingles), batch_format="pyarrow", zero_copy_batch=True
    )

    def _pair_rows(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "doc_a": pa.array(np.concatenate([a, a])),
                "doc_b": pa.array(np.concatenate([b, b])),
                "side": pa.array(np.concatenate(
                    [np.zeros(len(a), np.int8), np.ones(len(b), np.int8)])),
                "blob": pa.nulls(2 * len(a), pa.large_binary()),
            }
        )

    def _sig_rows(t: pa.Table) -> pa.Table:
        # -1 sentinels (NOT nulls): nullable int64 survives Arrow but a
        # pandas round-trip anywhere downstream would promote the column to
        # float64 (the round-3 wrong-answer bug); sentinels can't promote.
        n = t.num_rows
        return pa.table(
            {
                "node": t.column("doc_id"),
                "doc_a": pa.array(np.full(n, -1, np.int64)),
                "doc_b": pa.array(np.full(n, -1, np.int64)),
                "side": pa.array(np.full(n, -1, np.int8)),
                "blob": pc.cast(t.column("sig"), pa.large_binary()),
            }
        )

    tagged = cand.map_batches(_pair_rows, batch_format="pyarrow").union(
        sigs.map_batches(_sig_rows, batch_format="pyarrow")
    )

    attached = tagged.groupby("node").map_groups(
        _attach_blob, batch_format="pyarrow"
    )

    def _combine_star(t: pa.Table) -> pa.Table:
        """Verify all pairs sharing one doc_a at once: the star signature
        vs a stacked matrix of the partners' signatures. Arrow in/out —
        int64 ids stay int64 end to end."""
        got = _star_blobs(t, "doc_b")
        if got is None:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        doc_a, b_docs, sa_blob, mb_blob = got
        sa = np.frombuffer(sa_blob, dtype="<i8")
        mb = np.frombuffer(mb_blob, dtype="<i8").reshape(len(b_docs), -1)
        est = (mb == sa).mean(axis=1)
        sel = est >= threshold
        return pa.table(
            {
                "doc_a": pa.array(np.full(int(sel.sum()), doc_a, np.int64)),
                "doc_b": pa.array(b_docs[sel].astype(np.int64)),
                "est_jaccard": pa.array(est[sel]),
            }
        )

    return attached.groupby("doc_a").map_groups(
        _combine_star, batch_format="pyarrow"
    )


def _attach_blob(t: pa.Table) -> pa.Table:
    """Per-node group of the slim dedup exchange: one side==-1 row carries
    the node's signature/vector blob; broadcast it onto the pair rows.
    Arrow-native (no pandas promotion, no unhashable-schema warnings)."""
    side = t.column("side").to_numpy(zero_copy_only=False)
    carrier = np.flatnonzero(side == -1)
    pair_mask = side >= 0
    if carrier.size == 0 or not pair_mask.any():
        return t.slice(0, 0)
    blob = t.column("blob")[int(carrier[0])]
    pairs = t.filter(pa.array(pair_mask))
    return pairs.set_column(
        pairs.schema.get_field_index("blob"), "blob",
        pa.repeat(blob, pairs.num_rows),
    )


def _star_blobs(t: pa.Table, b_col: str):
    """Shared recombine step for the slim variants' (a, b) star groups:
    returns (a_id, sorted b ids ndarray, a blob bytes, concatenated b blob
    bytes) for the b-side rows whose id also appears on the a side, or
    None when either side is missing."""
    side = t.column("side").to_numpy(zero_copy_only=False)
    a_idx = np.flatnonzero(side == 0)
    b_idx = np.flatnonzero(side == 1)
    if a_idx.size == 0 or b_idx.size == 0:
        return None
    ids = t.column(b_col).to_numpy(zero_copy_only=False)
    b_ids = ids[b_idx]
    order = np.argsort(b_ids, kind="stable")
    b_idx, b_ids = b_idx[order], b_ids[order]
    keep = np.isin(b_ids, ids[a_idx])
    b_idx, b_ids = b_idx[keep], b_ids[keep]
    if b_idx.size == 0:
        return None
    blobs = t.column("blob")
    if isinstance(blobs, pa.ChunkedArray):
        blobs = blobs.combine_chunks()
    a_id = int(t.column("doc_a" if b_col == "doc_b" else "vec_a")[int(a_idx[0])].as_py())
    a_blob = blobs[int(a_idx[0])].as_py()
    mb_blob = b"".join(blobs[int(i)].as_py() for i in b_idx)
    return a_id, b_ids, a_blob, mb_blob


def dedup_minhash_clusters(
    docs: ray.data.Dataset,
    threshold: float = 0.9,
    shingles: str = "word",
    max_iters: int = 50,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Near-duplicate cluster assignment: (doc_id, cluster_id) where
    cluster_id = min doc_id of the connected component over LSH candidate
    pairs — fully DISTRIBUTED via iterative min-label propagation:

        L0(v)   = min(v, neighbors(v))            (groupby min)
        Lk+1(v) = min(Lk(v), min_{u~v} Lk(u))     (join edges->labels,
                                                   groupby min)

    converging in O(component diameter) rounds (star-pattern LSH edges
    give near-dup clusters tiny diameters). The only driver value per
    round is the scalar sum of labels (monotone non-increasing; fixpoint
    when unchanged). Docs never touch the driver: the final labeling is a
    hash left-outer join of doc_ids against the converged labels with
    coalesce(label, doc_id)."""
    pairs = dedup_minhash_pairs(docs, threshold, shingles).select_columns(
        ["doc_a", "doc_b"]
    )
    labels = connected_component_labels(pairs, max_iters, num_partitions)
    ids = docs.select_columns(["doc_id"]).map_batches(
        lambda t: pa.table({"node": t.column("doc_id"), "lab": t.column("doc_id")}),
        batch_format="pyarrow",
    )
    if labels is None:  # no candidate pairs at all
        merged = ids
    else:
        # component labels are <= their node id, so a union + groupby-min is
        # exactly coalesce(label, doc_id) — and unlike a hash join it
        # tolerates the zero-schema empty blocks ray 2.49 aggregates emit
        merged = ids.union(labels)
    return (
        merged.groupby("node")
        .min("lab")
        .map_batches(
            lambda t: t.rename_columns(["doc_id", "cluster_id"]),
            batch_format="pyarrow",
        )
    )


def connected_component_labels(
    pairs: ray.data.Dataset, max_iters: int = 50, num_partitions: int = 16
) -> ray.data.Dataset | None:
    """Distributed connected components over an edge Dataset (doc_a, doc_b):
    returns (node, lab) with lab = component minimum, or None when the edge
    set is empty. Min-label propagation as described in
    dedup_minhash_clusters."""

    def _both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "nbr": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(_both_dirs, batch_format="pyarrow").materialize()

    def _init(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "lab": pc.min_element_wise(t.column("node"), t.column("nbr")),
            }
        )

    def _as_labels(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "lab"])

    labels = (
        edges.map_batches(_init, batch_format="pyarrow")
        .groupby("node")
        .min("lab")
        .map_batches(_as_labels, batch_format="pyarrow")
        .materialize()
    )
    prev_sum = labels.sum("lab")
    if prev_sum is None:  # empty edge set
        return None

    # L(v) attached to v's edges via union + groupby (NOT a hash join: the
    # ray 2.49 join aggregator builds zero-schema tables for empty shuffle
    # partitions and crashes on small/skewed inputs; the sort-based
    # groupby tolerates them). Every edge node has a label by
    # construction, so each group emits one message per incident edge.
    def _edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "node": t.column("node"),
                "nbr": t.column("nbr"),
                "lab": pa.nulls(n, pa.int64()),
                "side": pa.array(np.zeros(n, np.int8)),
            }
        )

    def _label_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "node": t.column("node"),
                "nbr": pa.nulls(n, pa.int64()),
                "lab": t.column("lab"),
                "side": pa.array(np.ones(n, np.int8)),
            }
        )

    def _propagate(t: pa.Table) -> pa.Table:
        side = t.column("side")
        edge_nbr = t.filter(pc.equal(side, 0)).column("nbr")
        lab = pc.min(t.filter(pc.equal(side, 1)).column("lab")).as_py()
        if lab is None or len(edge_nbr) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "lab": pa.array([], pa.int64())})
        return pa.table(
            {"node": pc.cast(edge_nbr, pa.int64()),
             "lab": pa.array(np.full(len(edge_nbr), lab, np.int64))}
        )

    edge_tagged = edges.map_batches(_edge_rows, batch_format="pyarrow").materialize()
    for _ in range(max_iters):
        msgs = edge_tagged.union(
            labels.map_batches(_label_rows, batch_format="pyarrow")
        ).groupby("node").map_groups(_propagate, batch_format="pyarrow")
        labels = (
            msgs.union(labels)
            .groupby("node")
            .min("lab")
            .map_batches(_as_labels, batch_format="pyarrow")
            .materialize()
        )
        # labels are elementwise non-increasing, so an unchanged sum is a
        # fixpoint (sums compared exactly; a mod-2^64 collision would need
        # a >= 2^64 total decrease in one round)
        cur_sum = labels.sum("lab")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_minhash_keep(
    docs: ray.data.Dataset,
    threshold: float = 0.9,
    shingles: str = "word",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Approximate-dedup keep set: drop every doc that is the higher-id side
    of a near-duplicate pair (star edges point at the bucket minimum, so
    clusters collapse onto their smallest doc_id). The loser set is removed
    with a distributed anti-join expressed as union + groupby-max over a
    loser flag — no driver-side materialization at any pair-set size, and
    robust to the zero-schema empty blocks ray 2.49 aggregates emit (which
    crash the native hash-join aggregator)."""
    pairs = dedup_minhash_pairs(docs, threshold, shingles)
    losers = pairs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_b"),
                "loser": pa.array(np.ones(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    ids = docs.select_columns(["doc_id"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "loser": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    merged = ids.union(losers).groupby("doc_id").max("loser")
    return merged.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").filter(
                    pc.equal(t.column("max(loser)"), 0)
                )
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashStage:
    """doc batch -> (chunk_id, chunk_val, doc_id, simhash) rows."""

    NUM_CHUNKS = 4  # 4 x 16-bit pigeonhole chunks of the 64-bit simhash

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = _text_col(batch)
        n = len(text)
        th, parent, _ = _token_hashes(text)
        votes = np.zeros((n, 64), np.int64)
        bits = ((th[:, None] >> np.arange(64, dtype=U64)) & U64(1)).astype(np.int64)
        np.add.at(votes, parent, 2 * bits - 1)
        sim = (votes > 0).astype(U64) @ (U64(1) << np.arange(64, dtype=U64))
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out = {
            "chunk_id": np.repeat(np.arange(self.NUM_CHUNKS, dtype=np.int32), n),
            "chunk_val": np.empty(self.NUM_CHUNKS * n, np.int64),
            "doc_id": np.tile(doc_id, self.NUM_CHUNKS),
            "simhash": np.tile(sim.view(np.int64), self.NUM_CHUNKS),
        }
        for c in range(self.NUM_CHUNKS):
            out["chunk_val"][c * n:(c + 1) * n] = (
                (sim >> U64(16 * c)) & U64(0xFFFF)
            ).view(np.int64)
        return pa.table({k: pa.array(v) for k, v in out.items()})


def _sharded_simhash_pairs(max_hamming: int):
    def fn(group: pa.Table) -> pa.Table:
        """Star pairs for every pigeonhole bucket in one shard, hamming
        verified vectorized (same sharding rationale as the MinHash path)."""
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        n = group.num_rows
        if n < 2:
            return empty
        cv = group.column("chunk_val").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        sim = group.column("simhash").to_numpy(zero_copy_only=False).astype(
            np.int64).view(U64)
        order = np.lexsort((did, cv))
        cv_s, did_s, sim_s = cv[order], did[order], sim[order]
        new_bucket = np.concatenate(([True], cv_s[1:] != cv_s[:-1]))
        head_pos = np.flatnonzero(new_bucket)
        head_of = head_pos[np.cumsum(new_bucket) - 1]
        member = ~new_bucket
        if not member.any():
            return empty
        x = sim_s[member] ^ sim_s[head_of[member]]
        if hasattr(np, "bitwise_count"):
            ham = np.bitwise_count(x).astype(np.int64)
        else:
            ham = np.zeros(len(x), np.int64)
            v = x.copy()
            while v.any():
                ham += (v & U64(1)).astype(np.int64)
                v >>= U64(1)
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(did_s[head_of[member]][keep]),
                "doc_b": pa.array(did_s[member][keep]),
                "hamming": pa.array(ham[keep]),
            }
        )

    fn.__name__ = "sharded_simhash_pairs"
    return fn


def dedup_simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 3):
    rows = docs.map_batches(SimHashStage(), batch_format="pyarrow", zero_copy_batch=True)

    def _shard(t: pa.Table) -> pa.Table:
        cv = t.column("chunk_val").to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array((cv % NUM_LSH_SHARDS).astype(np.int32))
        )

    pairs = rows.map_batches(_shard, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["chunk_id", "shard"]).map_groups(
            _sharded_simhash_pairs(max_hamming), batch_format="pyarrow"
        )
    return pairs.groupby(["doc_a", "doc_b"]).min("hamming").map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "hamming"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (LSH bucketed)
# ---------------------------------------------------------------------------


class HyperplaneBucket:
    """vec batch -> (table_id, bucket, vec_id, unit vec) rows.

    ``num_tables`` independent random-hyperplane tables of ``num_planes``
    bits each: recall for cos>=t pairs is 1-(1-(1-acos(t)/pi)^planes)^tables.
    """

    def __init__(self, dim: int, num_planes: int = 10, num_tables: int = 8):
        rng = np.random.RandomState(99)
        self.num_planes = num_planes
        self.num_tables = num_tables
        # float32-quantized plane values carried in float64: the entire
        # bucket/cosine computation stays in f64 so the DuckDB oracle
        # (same plane literals, f64 list_inner_product) reproduces it
        self.planes = rng.standard_normal(
            (num_tables, dim, num_planes)
        ).astype(np.float32).astype(np.float64)

    def _units(self, batch: pa.Table) -> np.ndarray:
        mat = fsl_to_numpy(batch.column("embedding"), np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        return mat / np.maximum(norms, 1e-12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        unit = self._units(batch)
        n = len(unit)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        weights = 1 << np.arange(self.num_planes)
        tables, buckets = [], []
        for t in range(self.num_tables):
            bits = (unit @ self.planes[t]) > 0
            buckets.append(bits @ weights)
            tables.append(np.full(n, t, np.int32))
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(unit, (self.num_tables, 1)).reshape(-1)),
            unit.shape[1],
        )
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(tables)),
                "bucket": pa.array(np.concatenate(buckets).astype(np.int32)),
                "vec_id": pa.array(np.tile(ids, self.num_tables)),
                "vec": vec,
            }
        )


def _sharded_cosine_pairs(threshold: float):
    def fn(group: pa.Table) -> pa.Table:
        """STAR-pattern cosine pairs for EVERY bucket in one (table, shard)
        group: sort by (bucket, vec_id), pair each member with its bucket
        head, verify with ONE batched row-wise dot product across the whole
        shard. Linear in bucket size — a degenerate corpus (thousands of
        near-identical vectors collapsing into one hot bucket) emits O(b)
        pairs with O(b*dim) work, never the O(b^2) all-pairs matmul. Same
        pair semantics as the slim variant (dedup_embedding_pairs_slim), so
        dense and slim stay output-equivalent."""
        empty = pa.table({"vec_a": pa.array([], pa.int64()),
                          "vec_b": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        n = group.num_rows
        if n < 2:
            return empty
        bh = group.column("bucket").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        mat = fsl_to_numpy(group.column("vec"))
        order = np.lexsort((vid, bh))
        bh_s, vid_s, mat_s = bh[order], vid[order], mat[order]
        new_bucket = np.concatenate(([True], bh_s[1:] != bh_s[:-1]))
        head_pos = np.flatnonzero(new_bucket)
        head_of = head_pos[np.cumsum(new_bucket) - 1]
        member = ~new_bucket
        if not member.any():
            return empty
        # float64 accumulation, matching the slim variant's verify exactly;
        # rounded to 6 decimals BEFORE the threshold so the value (and the
        # borderline keep/drop decision) is oracle-comparable
        cos = np.einsum(
            "ij,ij->i",
            mat_s[member].astype(np.float64),
            mat_s[head_of[member]].astype(np.float64),
        ).round(6)
        keep = cos >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {
                "vec_a": pa.array(vid_s[head_of[member]][keep]),
                "vec_b": pa.array(vid_s[member][keep]),
                "cos": pa.array(cos[keep]),
            }
        )

    fn.__name__ = "sharded_cosine_pairs"
    return fn


def dedup_embedding_pairs(
    embeddings: ray.data.Dataset, dim: int, threshold: float = 0.9,
    num_planes: int = 10, num_tables: int = 8,
) -> ray.data.Dataset:
    rows = embeddings.map_batches(
        HyperplaneBucket(dim, num_planes, num_tables),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def _shard(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array((b % NUM_LSH_SHARDS).astype(np.int32))
        )

    pairs = rows.map_batches(_shard, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["table_id", "shard"]).map_groups(
            _sharded_cosine_pairs(threshold), batch_format="pyarrow"
        )
    return pairs.groupby(["vec_a", "vec_b"]).max("cos").map_batches(
        lambda t: t.rename_columns(["vec_a", "vec_b", "cos"]),
        batch_format="pyarrow",
    )


class HyperplaneBucketIds(HyperplaneBucket):
    """Slim variant: (table_id, bucket, vec_id) rows WITHOUT the vector —
    the bucketing shuffle then moves ~12 bytes/row instead of the unit
    vector replicated once per table (8x dim floats)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        unit = self._units(batch)
        n = len(unit)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        weights = 1 << np.arange(self.num_planes)
        tables, buckets = [], []
        for t in range(self.num_tables):
            bits = (unit @ self.planes[t]) > 0
            buckets.append(bits @ weights)
            tables.append(np.full(n, t, np.int32))
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(tables)),
                "bucket": pa.array(np.concatenate(buckets).astype(np.int32)),
                "vec_id": pa.array(np.tile(ids, self.num_tables)),
            }
        )


def dedup_embedding_pairs_slim(
    embeddings: ray.data.Dataset, dim: int, threshold: float = 0.9,
    num_planes: int = 10, num_tables: int = 8,
) -> ray.data.Dataset:
    """The 100 TB-scale path for embedding near-dup: candidate generation
    shuffles only (table_id, bucket, vec_id) — ~12 bytes per row instead of
    the full unit vector per LSH table (8x dim floats in the dense
    variant). Vectors are then attached to the deduped candidate pairs via
    two sort-based groupbys (each vector crosses the exchange once, plus
    two blobs per surviving candidate pair) and cosine is verified exactly,
    giving the same pairs as dedup_embedding_pairs. Everything is
    map_groups/union — no hash joins, so none of ray 2.49's zero-schema
    empty-block join crashes."""
    rows = embeddings.map_batches(
        HyperplaneBucketIds(dim, num_planes, num_tables),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def _shard(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array((b % NUM_LSH_SHARDS).astype(np.int32))
        )

    def _sharded_cands(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"vec_a": pa.array([], pa.int64()),
                          "vec_b": pa.array([], pa.int64())})
        if n < 2:
            return empty
        bh = group.column("bucket").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, bh))
        bh_s, vid_s = bh[order], vid[order]
        new_bucket = np.concatenate(([True], bh_s[1:] != bh_s[:-1]))
        head_pos = np.flatnonzero(new_bucket)
        head_of = head_pos[np.cumsum(new_bucket) - 1]
        member = ~new_bucket
        if not member.any():
            return empty
        return pa.table({"vec_a": pa.array(vid_s[head_of[member]]),
                         "vec_b": pa.array(vid_s[member])})

    cand = rows.map_batches(_shard, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["table_id", "shard"]).map_groups(
            _sharded_cands, batch_format="pyarrow"
        )
    cand = cand.groupby(["vec_a", "vec_b"]).count().map_batches(
        lambda t: t.select(["vec_a", "vec_b"]), batch_format="pyarrow"
    )

    def _unit_rows(t: pa.Table) -> pa.Table:
        # unit vectors as fixed-width binary blobs: the acero hash join
        # rejects nested (list) payload columns, and a binary column also
        # moves through the exchange with zero per-element overhead.
        # f8 (not f4) so the verify matches the dense/oracle f64 cosine
        # bit-for-bit; the exchange still carries each vector only once.
        mat = fsl_to_numpy(t.column("embedding"), np.float64)
        unit = (mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12))
        blob = unit.astype("<f8").tobytes()
        width = mat.shape[1] * 8
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "vec": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(width), len(mat), [None, pa.py_buffer(blob)]
                ),
            }
        )

    vecs = embeddings.map_batches(_unit_rows, batch_format="pyarrow", zero_copy_batch=True)

    # attach vectors via two SORT-based groupbys instead of hash joins
    # (ray 2.49 joins choke on the empty blocks shuffles can emit, and the
    # acero join also rejects nested payloads): each candidate pair sends
    # one row to each endpoint's node group, picks up the node's vector
    # blob there, and the pair's two halves recombine on (vec_a, vec_b).
    def _pair_rows(t: pa.Table) -> pa.Table:
        a = t.column("vec_a").to_numpy(zero_copy_only=False)
        b = t.column("vec_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "vec_a": pa.array(np.concatenate([a, a])),
                "vec_b": pa.array(np.concatenate([b, b])),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(len(a), np.int8), np.ones(len(b), np.int8)]
                    )
                ),
                "blob": pa.nulls(2 * len(a), pa.large_binary()),
            }
        )

    def _vec_rows(t: pa.Table) -> pa.Table:
        # -1 sentinels, not nulls — see _sig_rows in the minhash slim path.
        blob = pc.cast(t.column("vec"), pa.large_binary())
        n = t.num_rows
        return pa.table(
            {
                "node": t.column("vec_id"),
                "vec_a": pa.array(np.full(n, -1, np.int64)),
                "vec_b": pa.array(np.full(n, -1, np.int64)),
                "side": pa.array(np.full(n, -1, np.int8)),
                "blob": blob,
            }
        )

    tagged = cand.map_batches(_pair_rows, batch_format="pyarrow").union(
        vecs.map_batches(_vec_rows, batch_format="pyarrow")
    )

    attached = tagged.groupby("node").map_groups(
        _attach_blob, batch_format="pyarrow"
    )

    def _combine_star(t: pa.Table) -> pa.Table:
        """Recombine all pairs sharing one vec_a (LSH stars share the
        bucket minimum, so groups are large): one matrix-vector product
        verifies every pair of the star at once. Arrow in/out — int64 ids
        stay int64 end to end."""
        got = _star_blobs(t, "vec_b")
        if got is None:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        vec_a, b_ids, ua_blob, mb_blob = got
        ua = np.frombuffer(ua_blob, dtype="<f8")
        mb = np.frombuffer(mb_blob, dtype="<f8").reshape(len(b_ids), -1)
        cos = (mb @ ua).round(6)
        sel = cos >= threshold
        return pa.table(
            {
                "vec_a": pa.array(np.full(int(sel.sum()), vec_a, np.int64)),
                "vec_b": pa.array(b_ids[sel].astype(np.int64)),
                "cos": pa.array(cos[sel]),
            }
        )

    return attached.groupby("vec_a").map_groups(
        _combine_star, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (cluster, then prune within clusters)
# ---------------------------------------------------------------------------


#: auto-derived centroid target: clusters average ~this many rows (the
#: SemDeDup paper's k scales with corpus size for the same reason)
TARGET_CLUSTER_ROWS = 100_000
#: loud upper bound for ONE cluster's rows in the prune task — the group
#: build materializes n_c vectors (n_c x dim float64) before the chunked
#: matmul can bound anything; past this, raise instead of silently OOMing
MAX_CLUSTER_ROWS = 1_000_000


def derived_num_centroids(
    n_rows: int, target: int = TARGET_CLUSTER_ROWS
) -> int:
    """Centroid count for a corpus of ``n_rows`` embeddings: enough that
    clusters average ~``target`` rows (ceil division), floor 16 — the
    same grow-with-the-population rule reshard_state applies to state
    buckets."""
    return max(16, -(-int(n_rows) // int(target)))


def semantic_dedup_keep(
    sf_dir: str, threshold: float = 0.35, num_centroids: int | None = None
) -> ray.data.Dataset:
    """SemDeDup-style keep-set (Abbas et al. 2023, simplified to a
    deterministic SQL-checkable rule): assign every embedding to its
    nearest coarse centroid (the bounded-sample rule of ann.ivf_centroids
    — row-group-pruned read, broadcast centroids), then within each
    cluster PRUNE any vector that has an earlier (smaller vec_id) cluster
    member with cosine >= threshold (rounded to 6 decimals). The pruning
    reference is "any earlier member", kept or not — the same min-id-wins
    convention as the rest of the dedup family, and exactly an anti-join
    in SQL.

    Scale shape: one broadcast of C centroids, one shuffle of (vec_id,
    embedding, cluster) rows, then a per-cluster chunked lower-triangle
    matmul — O(n_c^2) work per cluster but only O(chunk x n_c) memory;
    cluster count is the knob that bounds n_c at corpus scale.
    ``num_centroids=None`` derives C from the corpus row count
    (metadata-only read) so clusters average ~TARGET_CLUSTER_ROWS rows;
    either way the prune task REFUSES a cluster past MAX_CLUSTER_ROWS
    (the group build materializes n_c x dim float64 before any chunking
    can help) with a loud pointer at num_centroids."""
    from kafka_connect_jdbc_flatten_ray.stages.ann import (
        IVFAssign, _mat, _unit, ivf_centroids,
    )
    from kafka_connect_jdbc_flatten_ray.util import (
        default_pool, read_parquet_clean,
    )

    if num_centroids is None:
        import pyarrow.dataset as pds

        # parquet-footer count only — no vector data leaves storage
        n_rows = pds.dataset(f"{sf_dir}/embeddings.parquet").count_rows()
        num_centroids = derived_num_centroids(n_rows)
    cluster_limit = MAX_CLUSTER_ROWS  # captured driver-side (see _guard_fold)
    cents = ivf_centroids(sf_dir, num_centroids)
    cref = ray.put(cents)
    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_args=(cref,),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_pool(),
    )

    def _prune(g: pa.Table) -> pa.Table:
        if g.num_rows > cluster_limit:
            bkt = int(g.column("ivf_bucket")[0].as_py())
            raise ValueError(
                f"semantic_dedup_keep: cluster {bkt} holds {g.num_rows} "
                f"vectors (> {cluster_limit}); raise num_centroids (or "
                "pass num_centroids=None to derive it from corpus size) "
                "so clusters stay prune-task-sized"
            )
        ids = g.column("vec_id").to_numpy(zero_copy_only=False)
        m = _unit(_mat(g.column("embedding")))
        order = np.argsort(ids, kind="stable")
        ids_s, m_s = ids[order], m[order]
        n = len(ids_s)
        pruned = np.zeros(n, bool)
        step = 1024  # bounded [step, n_c] similarity block
        for s in range(1, n, step):
            e = min(s + step, n)
            sims = np.round(m_s[s:e] @ m_s[:e].T, 6)
            rows = np.arange(s, e)[:, None]
            cols = np.arange(e)[None, :]
            sims[cols >= rows] = -2.0  # only EARLIER members can prune
            pruned[s:e] = (sims >= threshold).any(axis=1)
        keep = ~pruned
        bucket = g.column("ivf_bucket").to_numpy(zero_copy_only=False)[order]
        return pa.table({
            "vec_id": pa.array(ids_s[keep]),
            "cluster_id": pa.array(bucket[keep].astype(np.int32)),
        })

    _prune.__name__ = "semantic_prune"
    return assigned.groupby("ivf_bucket").map_groups(
        _prune, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# duplicated-span statistics (exact substring-dedup signal)
# ---------------------------------------------------------------------------


def duplicated_spans(docs: ray.data.Dataset, width: int = 8) -> ray.data.Dataset:
    """Per-document duplicated-span statistics — the signal behind exact
    substring deduplication (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): a ``width``-token window is
    DUPLICATED when its rolling hash occurs >= 2 times across the whole
    corpus (within-doc repeats count, matching the suffix-array
    occurrence rule). Emits (doc_id, n_spans, n_dup_spans, dup_frac) with
    dup_frac rounded to 6 decimals; docs shorter than ``width`` tokens
    have n_spans = 0 and dup_frac 0.

    100 TB shape: per-batch combiner reduces to one (h, doc_id, m) row
    per distinct (doc, window-hash); the corpus total per hash is an
    in-group sum on the (h) groupby (the bigram-LM trick — the corpus IS
    the queried set, so no side table rides the exchange), and zero-dup
    docs re-attach through the contamination tail's empty-block-safe
    union + groupby-sum. Text bodies never shuffle."""
    from ray.data.aggregate import Sum

    def _window_rows(t: pa.Table) -> pa.Table:
        text = _text_col(t)
        h, parent = _shingle_hashes_words(text, k=width)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        did = ids[parent]
        # per-doc distinct window hashes with multiplicity
        tbl = pa.table({"h": pa.array(h.view(np.int64)),
                        "doc_id": pa.array(did)})
        agg = pa.TableGroupBy(tbl, ["h", "doc_id"]).aggregate(
            [("doc_id", "count")]
        ).rename_columns(["h", "doc_id", "m"])
        return pa.table({
            "h": agg.column("h"),
            "doc_id": agg.column("doc_id"),
            "m": pc.cast(agg.column("m"), pa.int64()),
        })

    def _mark_dups(g: pa.Table) -> pa.Table:
        m = g.column("m").to_numpy(zero_copy_only=False)
        total = int(m.sum())
        if total < 2:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_dup": pa.array([], pa.int64())})
        return pa.table({"doc_id": g.column("doc_id"),
                         "n_dup": g.column("m")})

    _mark_dups.__name__ = "mark_dup_spans"

    def _span_counts(t: pa.Table) -> pa.Table:
        text = _text_col(t)
        toks = pc.split_pattern(text, " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_spans = np.maximum(lens - (width - 1), 0)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_spans": pa.array(n_spans, pa.int64()),
            "n_dup": pa.array(np.zeros(t.num_rows, np.int64)),
        })

    dups = (
        docs.map_batches(_window_rows, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("h").map_groups(_mark_dups, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table({
                "doc_id": t.column("doc_id"),
                "n_spans": pa.array(np.zeros(t.num_rows, np.int64)),
                "n_dup": t.column("n_dup"),
            }),
            batch_format="pyarrow",
        )
    )
    zeros = docs.map_batches(_span_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    totals = zeros.union(dups).groupby("doc_id").aggregate(
        Sum("n_spans", alias_name="n_spans"),
        Sum("n_dup", alias_name="n_dup_spans"),
    )

    def _finish(t: pa.Table) -> pa.Table:
        n = t.column("n_spans").to_numpy(zero_copy_only=False)
        d = t.column("n_dup_spans").to_numpy(zero_copy_only=False)
        frac = np.round(d / np.maximum(n, 1), 6)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_spans": pc.cast(t.column("n_spans"), pa.int64()),
            "n_dup_spans": pc.cast(t.column("n_dup_spans"), pa.int64()),
            "dup_frac": pa.array(frac, pa.float64()),
        })

    return totals.map_batches(_finish, batch_format="pyarrow",
                              zero_copy_batch=True)

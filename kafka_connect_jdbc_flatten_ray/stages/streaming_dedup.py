"""Incremental (epoch-at-a-time) exact deduplication with lake-resident
fingerprint state.

Batch ``dedup_exact`` (stages/dedup.py:158) rescans the whole corpus; a
streaming ingest should fold ONLY the new epoch's documents against the
fingerprints it has already seen. State is a lake table managed by the
same manifest machinery as the ingest lake and the incremental window
trio (epoch lineage, atomic publish, single-writer CAS):

    dedup_state/bucket=N/epoch-M.parquet   one row per distinct content
                                           fingerprint: (h1, h2, doc_id)
                                           where doc_id = the KEEPER
                                           (min doc_id seen so far)
    dedup_state/manifest.json              buckets -> current state file,
                                           epochs -> lineage

``dedup_exact_epoch`` hashes the epoch's documents with the batch
operator's dual 64-bit content fingerprints, buckets rows by h1 (the
fingerprint IS uniform, so no extra hash pass), and one fold task per
touched bucket streams that bucket's prior state: fingerprints touched
this epoch come into memory, every other row streams straight through to
the new state file (the bucket's full fingerprint population is never
materialized — at 100 TB it dwarfs any epoch). min() is commutative and
associative, so unlike the window operators there is NO watermark
assumption: epochs may arrive in any order and ``read_keepers`` equals
batch ``dedup_exact`` over the union of all folded epochs, row for row.

Reference parity: the reference engine has no dedup; this is the
builder's-brief LLM-data-pipeline surface, the streaming counterpart to
``dedup_exact`` exactly as sessionize_epoch is to sessionize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
from kafka_connect_jdbc_flatten_ray.stages.dedup import _hash_stage
from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
    _guard_fold,
    _split_prior_state,
    _stored_num_buckets,
)
from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

STATE_TABLE = "dedup_state"

_ST_SCHEMA = pa.schema(
    [("h1", pa.int64()), ("h2", pa.int64()), ("doc_id", pa.int64())]
)


def dedup_exact_epoch(
    docs: ray.data.Dataset,
    state_root: str,
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of documents into the lake-resident fingerprint set.

    Distributed: only (h1, h2, doc_id) rows shuffle (never text), one fold
    task per touched bucket, prior state streamed (touched fingerprints in
    memory, the rest pass through), commit is a manifest swap whose epoch
    number was CAS-claimed before any fold task wrote a data file.
    ``num_buckets`` applies only at state creation; afterwards the
    manifest's recorded layout wins (a different count would look up
    fingerprints in the wrong bucket file)."""
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS

    def _bucket(t: pa.Table) -> pa.Table:
        h1 = t.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__bucket", pa.array((h1 % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        _guard_fold(g.num_rows, "dedup_exact_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g.column("h1").to_numpy(zero_copy_only=False))
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "h1", touched, _ST_SCHEMA, staged
        )
        state = state.to_pandas() if state is not None else None
        ev = pd.DataFrame(
            {
                "h1": g.column("h1").to_numpy(zero_copy_only=False),
                "h2": g.column("h2").to_numpy(zero_copy_only=False),
                "doc_id": g.column("doc_id").to_numpy(zero_copy_only=False),
                "__stored": np.zeros(g.num_rows, bool),
            }
        )
        if state is not None and len(state):
            state = state.assign(__stored=True)
            both = pd.concat([state, ev], ignore_index=True)
        else:
            both = ev
        grp = both.groupby(["h1", "h2"], sort=False)
        agg = grp.agg(
            doc_id=("doc_id", "min"), __stored=("__stored", "any")
        ).reset_index()
        new_fps = int((~agg["__stored"]).sum())
        out = pa.table(
            {
                "h1": pa.array(agg["h1"].to_numpy(), pa.int64()),
                "h2": pa.array(agg["h2"].to_numpy(), pa.int64()),
                "doc_id": pa.array(agg["doc_id"].to_numpy(), pa.int64()),
            }
        )
        writer.write_table(out.cast(_ST_SCHEMA))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table(
            {
                "bucket": [bucket],
                "state_path": [state_path],
                "fingerprints": [len(agg) + carried],
                "new_fingerprints": [new_fps],
                "epoch_docs": [g.num_rows],
                "dup_docs": [g.num_rows - new_fps],
            }
        )

    _fold.__name__ = "dedup_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            docs.map_batches(_hash_stage, batch_format="pyarrow",
                             zero_copy_batch=True)
            .map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)  # our claim (nonce held): rerunnable
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {
        k: int(sum(r[k] for r in stats))
        for k in ("fingerprints", "new_fingerprints", "epoch_docs", "dup_docs")
    }
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets,
                      "key_pk_cols": ["h1", "h2"], "hash_version": 2},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def reshard_state(state_root: str, new_num_buckets: int) -> dict:
    """Re-bucket the fingerprint state to a new bucket count — the scale
    path when the corpus outgrows the layout it was created with (the
    fold guard trips). Distinct from streaming_windows.reshard_state
    because dedup buckets by the RAW fingerprint (``h1 % N`` — the
    fingerprint is already uniform), not by stable_row_hash of a key
    column; mixing the two would probe the wrong files on the next fold.
    Publishes one state file per new bucket as a manifest epoch that
    replaces the bucket map."""
    import pyarrow.parquet as pq

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    if not m:
        raise ValueError(f"no {STATE_TABLE} manifest at {state_root}")
    epoch = int(m["epoch"]) + 1
    nonce = manifest.claim_epoch(epoch)
    fs, root = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())

    def _rebucket(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:  # hive partition col from the read
            t = t.drop_columns(["bucket"])
        h1 = t.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__bucket",
            pa.array((h1 % np.uint64(new_num_buckets)).astype(np.int32)),
        )

    def _write(t: pa.Table) -> pa.Table:
        bucket = int(t.column("__bucket")[0].as_py())
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, path)
        body = t.drop_columns(["__bucket"]).select(_ST_SCHEMA.names)
        pq.write_table(body.cast(_ST_SCHEMA), staged, filesystem=fs)
        fsx.publish_file(fs, staged, path)
        return pa.table({"bucket": pa.array([bucket], pa.int64()),
                         "path": pa.array([path]),
                         "rows": pa.array([body.num_rows], pa.int64())})

    try:
        stats = (
            read_parquet_clean(files, filesystem=fs)
            .map_batches(_rebucket, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_write, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    part = dict(m.get("partitioning") or {})
    part["num_buckets"] = new_num_buckets
    manifest.publish(
        epoch,
        {int(r["bucket"]): r["path"] for r in stats},
        {"resharded_to": new_num_buckets,
         "rows": int(sum(r["rows"] for r in stats))},
        partitioning=part,
        replace_buckets=True,
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "num_buckets": new_num_buckets,
            "buckets_written": len(stats)}


def read_keepers(state_root: str) -> ray.data.Dataset:
    """Surviving doc_ids (min per distinct content) over every epoch
    folded so far — row-for-row equal to batch ``dedup_exact`` on the
    union of the folded document sets."""
    manifest = TableManifest(state_root, STATE_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())
    ds = read_parquet_clean(sorted(files), filesystem=fs, columns=["doc_id"])
    drop = [c for c in ("bucket",) if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds


# ---------------------------------------------------------------------------
# incremental MinHash-LSH near-dedup (lake-resident band-bucket state)
# ---------------------------------------------------------------------------

LSH_TABLE = "lsh_state"

#: one union-schema file per bucket keeps members and pairs under a SINGLE
#: manifest commit (two tables would need a cross-manifest transaction):
#: kind 0 = band member (band_id, band_hash, doc_id, sig),
#: kind 1 = star pair   (band_id, band_hash, doc_a, doc_b, est_jaccard)
#: sig is fixed_size_binary (NUM_PERM int64s) because Parquet cannot
#: round-trip a fixed_size_list column holding nulls (the pair rows)
def _lsh_schema(num_perm: int) -> pa.Schema:
    return pa.schema([
        ("kind", pa.int8()),
        ("band_id", pa.int32()),
        ("band_hash", pa.int64()),
        ("doc_id", pa.int64()),
        ("sig", pa.binary(num_perm * 8)),
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("est_jaccard", pa.float64()),
    ])


def _sig_to_bin(col, num_perm: int) -> pa.FixedSizeBinaryArray:
    """fixed_size_list<int64>[P] -> fixed_size_binary(P*8), zero-copy-ish."""
    from kafka_connect_jdbc_flatten_ray.util import fsl_to_numpy

    mat = fsl_to_numpy(col, "<i8")
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(num_perm * 8), mat.shape[0], [None, pa.py_buffer(mat.tobytes())]
    )


def _bin_to_sig(col, num_perm: int) -> pa.FixedSizeListArray:
    """fixed_size_binary(P*8) -> fixed_size_list<int64>[P] (no nulls)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    assert col.null_count == 0, "member sig must be non-null"
    raw = np.frombuffer(
        col.buffers()[1], "<i8", count=len(col) * num_perm,
        offset=col.offset * num_perm * 8,
    )
    return pa.FixedSizeListArray.from_arrays(pa.array(raw), num_perm)


def minhash_pairs_epoch(
    docs: ray.data.Dataset,
    state_root: str,
    threshold: float = 0.5,
    shingles: str = "word",
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of documents into lake-resident LSH state; after any
    number of folds, :func:`read_pairs` equals batch
    ``dedup_minhash_pairs`` on the union of all folded epochs, row for row
    (same star-pattern candidate rule, same threshold, same cross-band
    max-dedup — it shares the batch SQL oracle verbatim).

    How: the epoch's banding rows bucket by ``band_hash % N``; each fold
    task streams its bucket's prior state — rows of band-hash groups
    TOUCHED this epoch come into memory, everything else (members and
    pairs of untouched groups alike) passes straight through to the new
    state file. Touched groups are recomputed IN FULL from their member
    sets, so an arriving doc_id smaller than a group's stored anchor
    re-anchors that group's star exactly as batch would — no watermark
    or arrival-order assumption. Per-epoch work is proportional to the
    epoch's bucket membership, never the corpus.

    Storage note: this is the DENSE layout (signatures live in the member
    rows, ~NUM_PERM*8 bytes per band row). The id-only exchange trick of
    ``dedup_minhash_pairs_slim`` applies to the epoch shuffle the same
    way but not to the state file, which must keep signatures to score
    re-anchored stars without re-reading documents."""
    from kafka_connect_jdbc_flatten_ray.stages.dedup import (
        MinHashStage, NUM_PERM, _sharded_bucket_pairs,
    )
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, LSH_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    part = (m or {}).get("partitioning") or {}
    stored_thr = part.get("threshold")
    if stored_thr is not None and float(stored_thr) != float(threshold):
        raise ValueError(
            f"state at {state_root} was built with threshold={stored_thr}; "
            f"sub-threshold pairs were not kept, so folding at "
            f"{threshold} would be wrong — use a fresh state root"
        )
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS
    schema = _lsh_schema(NUM_PERM)

    def _bucket(t: pa.Table) -> pa.Table:
        bh = t.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__bucket", pa.array((bh % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        g = g.drop_columns(["__bucket"])
        _guard_fold(g.num_rows, "minhash_pairs_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, LSH_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g.column("band_hash").to_numpy(zero_copy_only=False))
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "band_hash", touched, schema, staged
        )
        # members of the touched groups: stored kind-0 rows + epoch rows,
        # deduped on (band_id, band_hash, doc_id) — idempotent re-delivery
        new_members = pa.table({
            "band_id": g.column("band_id").cast(pa.int32()),
            "band_hash": g.column("band_hash"),
            "doc_id": g.column("doc_id"),
            "sig": _sig_to_bin(g.column("sig"), NUM_PERM),
        })
        if state is not None:
            stored_members = state.filter(
                pc.equal(state.column("kind"), 0)
            ).select(["band_id", "band_hash", "doc_id", "sig"])
            members = pa.concat_tables(
                [stored_members, new_members]
            ).combine_chunks()
        else:
            members = new_members
        # the epoch guard above bounds NEW rows; a hot band-hash group's
        # accumulated membership can dwarf them — guard the in-memory set
        _guard_fold(members.num_rows, "minhash_pairs_epoch(members)",
                    num_buckets, fold_limit)
        bid = members.column("band_id").to_numpy(zero_copy_only=False)
        bh = members.column("band_hash").to_numpy(zero_copy_only=False)
        did = members.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bh, bid))
        keep = np.ones(len(order), bool)
        keep[1:] = ~(
            (bid[order][1:] == bid[order][:-1])
            & (bh[order][1:] == bh[order][:-1])
            & (did[order][1:] == did[order][:-1])
        )
        members = members.take(pa.array(order[keep]))
        # recompute every touched group's star in full (per band — the
        # batch kernel assumes one band per call)
        pair_parts = []
        bid = members.column("band_id").to_numpy(zero_copy_only=False)
        for b in np.unique(bid):
            sub = members.filter(pc.equal(members.column("band_id"), int(b)))
            sub = pa.table({
                "band_hash": sub.column("band_hash"),
                "doc_id": sub.column("doc_id"),
                "sig": _bin_to_sig(sub.column("sig"), NUM_PERM),
            })
            p = _sharded_bucket_pairs(sub)
            if not p.num_rows:
                continue
            # the kernel emits pairs in (band_hash, doc_id)-sorted member
            # order, so the group key re-attaches by position (no lookup)
            sub_bh = sub.column("band_hash").to_numpy(zero_copy_only=False)
            sub_did = sub.column("doc_id").to_numpy(zero_copy_only=False)
            bh_s = sub_bh[np.lexsort((sub_did, sub_bh))]
            member_bh = bh_s[np.concatenate(([False], bh_s[1:] == bh_s[:-1]))]
            assert len(member_bh) == p.num_rows, "kernel emission order drift"
            keep_thr = pc.greater_equal(
                p.column("est_jaccard"), threshold
            ).to_numpy(zero_copy_only=False)
            if not keep_thr.any():
                continue
            p = p.filter(pa.array(keep_thr))
            pair_parts.append(pa.table({
                "band_id": pa.array(np.full(p.num_rows, b, np.int32)),
                "band_hash": pa.array(member_bh[keep_thr]),
                "doc_a": p.column("doc_a"),
                "doc_b": p.column("doc_b"),
                "est_jaccard": p.column("est_jaccard"),
            }))
        n_members = members.num_rows
        out_members = pa.table({
            "kind": pa.array(np.zeros(n_members, np.int8)),
            "band_id": members.column("band_id"),
            "band_hash": members.column("band_hash"),
            "doc_id": members.column("doc_id"),
            "sig": members.column("sig"),
            "doc_a": pa.nulls(n_members, pa.int64()),
            "doc_b": pa.nulls(n_members, pa.int64()),
            "est_jaccard": pa.nulls(n_members, pa.float64()),
        })
        writer.write_table(out_members.cast(schema))
        n_pairs = 0
        if pair_parts:
            pt = pa.concat_tables(pair_parts)
            n_pairs = pt.num_rows
            out_pairs = pa.table({
                "kind": pa.array(np.ones(n_pairs, np.int8)),
                "band_id": pt.column("band_id"),
                "band_hash": pt.column("band_hash"),
                "doc_id": pa.nulls(n_pairs, pa.int64()),
                "sig": pa.nulls(n_pairs, pa.binary(NUM_PERM * 8)),
                "doc_a": pt.column("doc_a"),
                "doc_b": pt.column("doc_b"),
                "est_jaccard": pt.column("est_jaccard"),
            })
            writer.write_table(out_pairs.cast(schema))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "members": [n_members],
            "pairs": [n_pairs],
            "carried_rows": [carried],
            "epoch_rows": [g.num_rows],
        })

    _fold.__name__ = "lsh_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            docs.map_batches(MinHashStage(shingles), batch_format="pyarrow",
                             zero_copy_batch=True)
            .map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {k: int(sum(r[k] for r in stats))
              for k in ("members", "pairs", "epoch_rows")}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets,
                      "key_pk_cols": ["band_hash"],
                      "threshold": float(threshold),
                      "shingles": shingles, "hash_version": 2},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def read_pairs(state_root: str) -> ray.data.Dataset:
    """Near-duplicate pairs over every epoch folded so far, deduped
    across bands by max est_jaccard — row-for-row equal to batch
    ``dedup_minhash_pairs`` on the union of the folded document sets."""
    import pyarrow.compute as pc

    manifest = TableManifest(state_root, LSH_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())
    ds = read_parquet_clean(
        files, filesystem=fs, columns=["kind", "doc_a", "doc_b", "est_jaccard"]
    )

    def _only_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), 1))
        return t.select(["doc_a", "doc_b", "est_jaccard"])

    return (
        ds.map_batches(_only_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["doc_a", "doc_b"]).max("est_jaccard")
        .map_batches(
            lambda t: t.rename_columns(["doc_a", "doc_b", "est_jaccard"]),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# incremental embedding near-dedup (lake-resident hyperplane-bucket state)
# ---------------------------------------------------------------------------

EMB_TABLE = "emb_lsh_state"

#: same union-schema trick as the minhash state (one file per bucket keeps
#: members and pairs under a SINGLE manifest commit):
#: kind 0 = bucket member (tb, vec_id, vec) — tb packs (table_id, bucket)
#: into one int64 so the prior-state split streams on one key column;
#: vec is fixed_size_binary (dim float64s): Parquet cannot round-trip a
#: fixed_size_list column holding nulls (the pair rows)
def _emb_schema(dim: int) -> pa.Schema:
    return pa.schema([
        ("kind", pa.int8()),
        ("tb", pa.int64()),
        ("vec_id", pa.int64()),
        ("vec", pa.binary(dim * 8)),
        ("vec_a", pa.int64()),
        ("vec_b", pa.int64()),
        ("cos", pa.float64()),
    ])


def embedding_pairs_epoch(
    embeddings: ray.data.Dataset,
    state_root: str,
    dim: int,
    threshold: float = 0.9,
    num_planes: int = 10,
    num_tables: int = 8,
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of embeddings into lake-resident hyperplane-LSH
    state; after any number of folds, :func:`read_embedding_pairs` equals
    batch ``dedup_embedding_pairs`` on the union of all folded epochs, row
    for row (same per-bucket star rule anchored at the min vec_id, same
    f64 cosine rounded to 6 decimals before the threshold, same
    cross-table max-dedup). Touched (table, bucket) groups are recomputed
    IN FULL from their member sets, so an arriving vec_id smaller than a
    group's stored anchor re-anchors that group's star exactly as batch
    would — no watermark or arrival-order assumption, and re-delivery is
    idempotent (members dedupe on (tb, vec_id))."""
    from kafka_connect_jdbc_flatten_ray.stages.dedup import HyperplaneBucket
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )
    from kafka_connect_jdbc_flatten_ray.functions.hashing import _splitmix64
    from kafka_connect_jdbc_flatten_ray.util import fsl_to_numpy

    manifest = TableManifest(state_root, EMB_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    part = (m or {}).get("partitioning") or {}
    for name, val in (("threshold", float(threshold)), ("dim", int(dim)),
                      ("num_planes", int(num_planes)),
                      ("num_tables", int(num_tables))):
        stored = part.get(name)
        if stored is not None and type(val)(stored) != val:
            raise ValueError(
                f"state at {state_root} was built with {name}={stored}; "
                f"folding at {name}={val} would be wrong — use a fresh "
                "state root"
            )
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS
    schema = _emb_schema(dim)

    def _tb_bucket(t: pa.Table) -> pa.Table:
        tb = (t.column("table_id").to_numpy(zero_copy_only=False).astype(np.int64)
              << np.int64(32)) | t.column("bucket").to_numpy(
                  zero_copy_only=False).astype(np.int64)
        hh = _splitmix64(tb.view(np.uint64))
        return pa.table({
            "tb": pa.array(tb),
            "vec_id": t.column("vec_id"),
            "vec": t.column("vec"),
            "__bucket": pa.array(
                (hh % np.uint64(num_buckets)).astype(np.int32)),
        })

    def _blob(mat: np.ndarray) -> pa.FixedSizeBinaryArray:
        raw = mat.astype("<f8").tobytes()
        return pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(dim * 8), mat.shape[0], [None, pa.py_buffer(raw)]
        )

    def _mat(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return np.frombuffer(
            col.buffers()[1], "<f8", count=len(col) * dim,
            offset=col.offset * dim * 8,
        ).reshape(len(col), dim)

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        _guard_fold(g.num_rows, "embedding_pairs_epoch", num_buckets,
                    fold_limit)
        out_dir = fsx.join(root, EMB_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g.column("tb").to_numpy(zero_copy_only=False))
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "tb", touched, schema, staged
        )
        new_members = pa.table({
            "tb": g.column("tb"),
            "vec_id": g.column("vec_id"),
            "vec": _blob(fsl_to_numpy(g.column("vec"), np.float64)),
        })
        if state is not None:
            stored = state.filter(pc.equal(state.column("kind"), 0)) \
                .select(["tb", "vec_id", "vec"])
            members = pa.concat_tables([stored, new_members]).combine_chunks()
        else:
            members = new_members
        _guard_fold(members.num_rows, "embedding_pairs_epoch(members)",
                    num_buckets, fold_limit)
        tb = members.column("tb").to_numpy(zero_copy_only=False)
        vid = members.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, tb))
        keep = np.ones(len(order), bool)
        keep[1:] = ~((tb[order][1:] == tb[order][:-1])
                     & (vid[order][1:] == vid[order][:-1]))
        members = members.take(pa.array(order[keep]))
        # star pairs for EVERY touched group at once: members arrive
        # (tb, vec_id)-sorted from the dedupe take, so bucket heads are
        # run starts and one batched row-wise dot scores the whole fold
        tb = members.column("tb").to_numpy(zero_copy_only=False)
        vid = members.column("vec_id").to_numpy(zero_copy_only=False)
        mat = _mat(members.column("vec"))
        new_grp = np.concatenate(([True], tb[1:] != tb[:-1]))
        head_pos = np.flatnonzero(new_grp)
        head_of = head_pos[np.cumsum(new_grp) - 1]
        member_mask = ~new_grp
        n_pairs = 0
        pair_tbl = None
        if member_mask.any():
            cos = np.einsum(
                "ij,ij->i", mat[member_mask], mat[head_of[member_mask]]
            ).round(6)
            sel = cos >= threshold
            n_pairs = int(sel.sum())
            if n_pairs:
                pair_tbl = pa.table({
                    "kind": pa.array(np.ones(n_pairs, np.int8)),
                    "tb": pa.array(tb[member_mask][sel]),
                    "vec_id": pa.nulls(n_pairs, pa.int64()),
                    "vec": pa.nulls(n_pairs, pa.binary(dim * 8)),
                    "vec_a": pa.array(vid[head_of[member_mask]][sel]),
                    "vec_b": pa.array(vid[member_mask][sel]),
                    "cos": pa.array(cos[sel]),
                })
        n_members = members.num_rows
        out_members = pa.table({
            "kind": pa.array(np.zeros(n_members, np.int8)),
            "tb": members.column("tb"),
            "vec_id": members.column("vec_id"),
            "vec": members.column("vec"),
            "vec_a": pa.nulls(n_members, pa.int64()),
            "vec_b": pa.nulls(n_members, pa.int64()),
            "cos": pa.nulls(n_members, pa.float64()),
        })
        writer.write_table(out_members.cast(schema))
        if pair_tbl is not None:
            writer.write_table(pair_tbl.cast(schema))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "members": [n_members],
            "pairs": [n_pairs],
            "carried_rows": [carried],
            "epoch_rows": [g.num_rows],
        })

    _fold.__name__ = "emb_lsh_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            embeddings.map_batches(
                HyperplaneBucket(dim, num_planes, num_tables),
                batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(_tb_bucket, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {k: int(sum(r[k] for r in stats))
              for k in ("members", "pairs", "epoch_rows")}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets, "key_pk_cols": ["tb"],
                      "hash_version": 2, "threshold": float(threshold),
                      "dim": int(dim), "num_planes": int(num_planes),
                      "num_tables": int(num_tables)},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def read_embedding_pairs(state_root: str) -> ray.data.Dataset:
    """All near-duplicate embedding pairs over every epoch folded so far —
    row-for-row equal to batch ``dedup_embedding_pairs`` on the union of
    the folded vector sets (cross-table/bucket dedup via max(cos); the
    cosines of duplicate pairs agree, so max is a pure dedup)."""
    manifest = TableManifest(state_root, EMB_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())
    ds = read_parquet_clean(
        files, filesystem=fs, columns=["kind", "vec_a", "vec_b", "cos"]
    )

    def _only_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), 1))
        return t.select(["vec_a", "vec_b", "cos"])

    return (
        ds.map_batches(_only_pairs, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["vec_a", "vec_b"]).max("cos")
        .map_batches(
            lambda t: t.rename_columns(["vec_a", "vec_b", "cos"]),
            batch_format="pyarrow",
        )
    )


def reshard_embedding_state(state_root: str, new_num_buckets: int) -> dict:
    """Re-bucket the hyperplane-LSH state when (table, bucket) group
    population outgrows its layout. Member and pair rows both carry their
    ``tb`` key, so whole star groups move together — applies the same
    splitmix64(tb) finalizer the fold path uses."""
    from kafka_connect_jdbc_flatten_ray.stages.state_reshard import (
        reshard_splitmix_state,
    )

    manifest = TableManifest(state_root, EMB_TABLE)
    m = manifest.load()
    if not m:
        raise ValueError(f"no {EMB_TABLE} manifest at {state_root}")
    dim = int((m.get("partitioning") or {})["dim"])
    return reshard_splitmix_state(
        state_root, EMB_TABLE, "tb", _emb_schema(dim), new_num_buckets
    )


# ---------------------------------------------------------------------------
# incremental duplicated-span statistics (window-hash count state)
# ---------------------------------------------------------------------------

SPAN_TABLE = "span_state"

_SPAN_SCHEMA = pa.schema([("h", pa.int64()), ("count", pa.int64())])


def span_counts_epoch(
    docs: ray.data.Dataset,
    state_root: str,
    width: int = 4,
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of documents into lake-resident width-``width``
    token-window hash counts — the corpus statistic of
    dedup.duplicated_spans. Per-batch combiner reduces to one (h, count)
    partial per distinct window hash; rows route by splitmix64(h) % N
    (window hashes are mod-2^64 polynomials, not uniform in their low
    bits); folds sum counts. Addition is commutative: epochs fold in any
    order, and :func:`dup_spans_from_state` equals batch
    ``duplicated_spans`` over the union of the folded epochs. The stored
    ``width`` is pinned in the manifest — folding a different width
    would corrupt the statistic, so it fails loudly."""
    from kafka_connect_jdbc_flatten_ray.functions.hashing import _splitmix64
    from kafka_connect_jdbc_flatten_ray.stages.dedup import (
        _shingle_hashes_words, _text_col,
    )
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, SPAN_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    stored_width = int(((m or {}).get("partitioning") or {})
                       .get("width", width))
    if stored_width != width:
        raise ValueError(
            f"span_counts_epoch: state at {state_root} was built with "
            f"width={stored_width}, got width={width} — widths cannot mix"
        )
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS

    def _partial(t: pa.Table) -> pa.Table:
        h, _ = _shingle_hashes_words(_text_col(t), k=width)
        hu, cnt = np.unique(h, return_counts=True)
        out = pa.table({"h": pa.array(hu.view(np.int64)),
                        "count": pa.array(cnt.astype(np.int64))})
        b = _splitmix64(hu) % np.uint64(num_buckets)
        return out.append_column("__bucket", pa.array(b.astype(np.int32)))

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        g = g.drop_columns(["__bucket"])
        _guard_fold(g.num_rows, "span_counts_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, SPAN_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        hv = g.column("h").to_numpy(zero_copy_only=False)
        cnt = g.column("count").to_numpy(zero_copy_only=False)
        touched = np.unique(hv)
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "h", touched, _SPAN_SCHEMA, staged
        )
        idx = np.searchsorted(touched, hv)
        sums = np.zeros(len(touched), np.int64)
        np.add.at(sums, idx, cnt)
        if state is not None and state.num_rows:
            svb = state.column("h").to_numpy(zero_copy_only=False)
            scnt = state.column("count").to_numpy(zero_copy_only=False)
            np.add.at(sums, np.searchsorted(touched, svb), scnt)
        out = pa.table({"h": pa.array(touched, pa.int64()),
                        "count": pa.array(sums, pa.int64())})
        writer.write_table(out.cast(_SPAN_SCHEMA))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "spans": [len(touched) + carried],
            "epoch_count": [int(cnt.sum())],
        })

    _fold.__name__ = "span_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            docs.map_batches(_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {k: int(sum(r[k] for r in stats))
              for k in ("spans", "epoch_count")}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets, "key_pk_cols": ["h"],
                      "hash_version": 2, "width": width},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def dup_spans_from_state(
    docs: ray.data.Dataset, state_root: str
) -> ray.data.Dataset:
    """Per-doc duplicated-span statistics against the ACCUMULATED window
    counts — equal to batch ``duplicated_spans`` over the union of the
    folded epochs when ``docs`` is that union, sharing its SQL oracle
    verbatim. One hash groupby: doc rows (h, doc_id, m) meet state rows
    (h, -1, count); a window duplicated iff the STATE total >= 2. A doc
    window absent from the state fails loudly (the folded union must
    cover the scored docs)."""
    import pyarrow.compute as pc2
    from ray.data.aggregate import Sum

    from kafka_connect_jdbc_flatten_ray.stages.dedup import (
        _shingle_hashes_words, _text_col,
    )

    manifest = TableManifest(state_root, SPAN_TABLE)
    m = manifest.load()
    if not m:
        raise ValueError(f"no {SPAN_TABLE} manifest at {state_root}")
    width = int((m.get("partitioning") or {}).get("width", 4))
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())

    def _doc_rows(t: pa.Table) -> pa.Table:
        h, parent = _shingle_hashes_words(_text_col(t), k=width)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        tbl = pa.table({"h": pa.array(h.view(np.int64)),
                        "doc_id": pa.array(ids[parent])})
        agg = pa.TableGroupBy(tbl, ["h", "doc_id"]).aggregate(
            [("doc_id", "count")]
        ).rename_columns(["h", "doc_id", "m"])
        return pa.table({"h": agg.column("h"),
                         "doc_id": agg.column("doc_id"),
                         "m": pc2.cast(agg.column("m"), pa.int64())})

    def _state_rows(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:
            t = t.drop_columns(["bucket"])
        return pa.table({
            "h": t.column("h"),
            "doc_id": pa.array(np.full(t.num_rows, -1, np.int64)),
            "m": t.column("count"),
        })

    def _mark(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        mv = g.column("m").to_numpy(zero_copy_only=False)
        is_state = did == -1
        if not is_state.any():
            raise ValueError(
                "dup_spans_from_state: a scored doc's window hash is not "
                "in the folded span state — fold the docs' epoch(s) first "
                "(docs must be a subset of the folded union)"
            )
        total = int(mv[is_state].sum())
        keep = ~is_state
        if total < 2 or not keep.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_dup": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(did[keep]),
                         "n_dup": pa.array(mv[keep])})

    _mark.__name__ = "mark_dup_spans_state"

    def _span_counts(t: pa.Table) -> pa.Table:
        toks = pc2.split_pattern(_text_col(t), " ")
        lens = pc2.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_spans": pa.array(np.maximum(lens - (width - 1), 0),
                                pa.int64()),
            "n_dup": pa.array(np.zeros(t.num_rows, np.int64)),
        })

    dr = docs.map_batches(_doc_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    sr = read_parquet_clean(files, filesystem=fs,
                            columns=["h", "count"]).map_batches(
        _state_rows, batch_format="pyarrow", zero_copy_batch=True)
    dups = dr.union(sr).groupby("h").map_groups(
        _mark, batch_format="pyarrow"
    ).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "n_spans": pa.array(np.zeros(t.num_rows, np.int64)),
            "n_dup": t.column("n_dup"),
        }),
        batch_format="pyarrow",
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
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_spans": pc2.cast(t.column("n_spans"), pa.int64()),
            "n_dup_spans": pc2.cast(t.column("n_dup_spans"), pa.int64()),
            "dup_frac": pa.array(np.round(d / np.maximum(n, 1), 6),
                                 pa.float64()),
        })

    return totals.map_batches(_finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def reshard_span_state(state_root: str, new_num_buckets: int) -> dict:
    """Re-bucket the span-count state (splitmix64(h) routing, like the
    quantile value state)."""
    from kafka_connect_jdbc_flatten_ray.stages.state_reshard import (
        reshard_splitmix_state,
    )

    return reshard_splitmix_state(
        state_root, SPAN_TABLE, "h", _SPAN_SCHEMA, new_num_buckets
    )

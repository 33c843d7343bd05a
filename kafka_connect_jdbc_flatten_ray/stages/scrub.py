"""Corpus hygiene operators: PII-style scrubbing, deterministic sampling,
document chunking, benchmark-contamination checks.

All vectorized (pyarrow regex kernels / numpy over flattened token arrays);
scrub/sample/chunk have exact DuckDB oracles, contamination uses a
broadcast n-gram hash set (tested with planted contamination).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from kafka_connect_jdbc_flatten_ray.util import default_pool

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUM_RE = r"[0-9]{6,}"


class ScrubText:
    """Replace email addresses and long digit runs with placeholder tokens
    (regexes compiled once per worker; pc.replace_substring_regex kernels)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        out = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
        out = pc.replace_substring_regex(out, LONG_NUM_RE, "<NUM>")
        return pa.table({"doc_id": batch.column("doc_id"), "text": out})


def deterministic_sample(
    docs: ray.data.Dataset, percent: int, salt: int = 2654435761
) -> ray.data.Dataset:
    """Keep ~percent% of docs by a pure-arithmetic doc_id hash — the
    reproducible (and SQL-checkable) alternative to random_sample for
    train/val splits."""

    def _filter(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids * np.int64(salt)) % np.int64(100) < percent
        return t.filter(pa.array(keep))

    return docs.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


class ChunkDocs:
    """Split documents into overlapping token-window chunks:
    (doc_id, chunk_idx, chunk text, n_chunk_tokens). Stride = size - overlap."""

    def __init__(self, size: int = 32, overlap: int = 8):
        assert 0 <= overlap < size
        self.size = size
        self.stride = size - overlap

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chunks = np.maximum(1, -(-np.maximum(lens - self.size, 0) // self.stride) + 1)
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # chunk-level index arithmetic (one row per chunk)
        total = int(n_chunks.sum())
        doc_rep = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_chunks)
        chunk_base = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_idx = np.arange(total, dtype=np.int64) - chunk_base[doc_rep]
        tok_start_in_doc = chunk_idx * self.stride
        chunk_len = np.minimum(self.size, lens[doc_rep] - tok_start_in_doc)
        # slot-level gather from the flat token array (one row per chunk token)
        doc_tok_off = np.concatenate(([0], np.cumsum(lens)))
        tok_start_global = doc_tok_off[doc_rep] + tok_start_in_doc
        slot_total = int(chunk_len.sum())
        chunk_off = np.concatenate(([0], np.cumsum(chunk_len)))
        chunk_rep = np.repeat(np.arange(total, dtype=np.int64), chunk_len)
        idx_in_chunk = np.arange(slot_total, dtype=np.int64) - chunk_off[chunk_rep]
        gather = tok_start_global[chunk_rep] + idx_in_chunk
        flat_tokens = pc.list_flatten(toks)
        sel = pc.take(flat_tokens, pa.array(gather, pa.int64()))
        if isinstance(sel, pa.ChunkedArray):
            sel = sel.combine_chunks()
        chunk_lists = pa.LargeListArray.from_arrays(
            pa.array(chunk_off, pa.int64()), pc.cast(sel, pa.large_string())
        )
        joined = pc.binary_join(chunk_lists, pa.scalar(" ", pa.large_string()))
        return pa.table(
            {
                "doc_id": pa.array(doc_id[doc_rep]),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "chunk": pc.cast(joined, pa.string()),
                "n_chunk_tokens": pa.array(chunk_len, pa.int64()),
            }
        )


def _ngram_hash_array(texts, n: int = 8) -> np.ndarray:
    """Sorted unique rolling word-n-gram hashes of the given texts, using
    the same vectorized rolling hash the dedup family uses (process-stable
    pandas token hashing + polynomial combine — python's hash() is
    seed-randomized per process, which would break the broadcast array)."""
    from kafka_connect_jdbc_flatten_ray.stages.dedup import _shingle_hashes_words

    arr = texts if isinstance(texts, pa.Array) else pa.array(list(texts), pa.string())
    if len(arr) == 0:
        return np.empty(0, np.uint64)
    h, _ = _shingle_hashes_words(arr, k=n)
    return np.unique(h)


class ContaminationCheck:
    """Flag docs sharing any word n-gram with a benchmark set: the sorted
    benchmark hash array is broadcast once via ray.put; each batch computes
    its rolling n-gram hashes vectorized and membership-tests them with
    searchsorted — no per-row Python."""

    def __init__(self, benchmark_ref, n: int = 8):
        self.bench = (
            ray.get(benchmark_ref)
            if not isinstance(benchmark_ref, np.ndarray)
            else benchmark_ref
        )
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from kafka_connect_jdbc_flatten_ray.stages.dedup import _shingle_hashes_words

        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        hits = np.zeros(batch.num_rows, np.int64)
        if len(self.bench):
            h, parent = _shingle_hashes_words(text, k=self.n)
            idx = np.searchsorted(self.bench, h)
            idx[idx >= len(self.bench)] = 0
            hit = self.bench[idx] == h
            np.add.at(hits, parent[hit], 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "contaminated": pa.array(hits > 0),
                "ngram_hits": pa.array(hits),
            }
        )


def contamination_check(
    docs: ray.data.Dataset, benchmark_texts: list[str], n: int = 8
) -> ray.data.Dataset:
    ref = ray.put(_ngram_hash_array(benchmark_texts, n))
    return docs.map_batches(
        ContaminationCheck, fn_constructor_args=(ref, n),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=default_pool(),
    )


def _bloom_positions(h: np.ndarray, m_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Two bit positions per 64-bit hash (k=2 bloom; murmur3-style remix
    for the second probe so the two positions are independent)."""
    with np.errstate(over="ignore"):
        h2 = ((h >> np.uint64(33)) ^ h) * np.uint64(0xFF51AFD7ED558CCD)
    return h % np.uint64(m_bits), h2 % np.uint64(m_bits)


def _bloom_test(bloom: np.ndarray, h: np.ndarray, m_bits: int) -> np.ndarray:
    p1, p2 = _bloom_positions(h, m_bits)
    b1 = (bloom[(p1 >> np.uint64(3)).astype(np.int64)]
          >> (p1 & np.uint64(7)).astype(np.uint8)) & 1
    b2 = (bloom[(p2 >> np.uint64(3)).astype(np.int64)]
          >> (p2 & np.uint64(7)).astype(np.uint8)) & 1
    return (b1 & b2).astype(bool)


def build_benchmark_bloom(
    benchmark: ray.data.Dataset, n: int = 8, m_bits: int = 1 << 27
) -> np.ndarray:
    """Fixed-size bloom bitset of the benchmark's word n-gram hashes,
    built distributed: each batch sets bits in a local bitset, partials
    OR-merge on the driver (bitset size is FIXED — 2^27 bits = 16 MB
    default — regardless of benchmark size; size it so k*n_grams/m_bits
    stays below ~1 for a useful false-positive rate)."""
    from kafka_connect_jdbc_flatten_ray.stages.dedup import _shingle_hashes_words

    def _partial(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h = np.unique(_shingle_hashes_words(text, k=n)[0])
        # ship whichever is smaller: the batch's distinct hashes (8 B
        # each) or the fixed bitset. A small benchmark batch sending a
        # full 16 MB bitset costs 1000x its information content — the
        # object-store traffic (blocks x 16 MB) used to dominate the
        # whole contamination query's wall time at bench scale.
        if len(h) * 8 < m_bits // 8:
            return pa.table({
                "kind": pa.array(["hashes"]),
                "payload": pa.array([h.tobytes()], pa.large_binary()),
            })
        arr = np.zeros(m_bits // 8, np.uint8)
        for p in _bloom_positions(h, m_bits):
            np.bitwise_or.at(
                arr, (p >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8)),
            )
        return pa.table({
            "kind": pa.array(["bitset"]),
            "payload": pa.array([arr.tobytes()], pa.large_binary()),
        })

    acc = np.zeros(m_bits // 8, np.uint8)
    for row in benchmark.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_rows():
        if row["kind"] == "bitset":
            acc |= np.frombuffer(row["payload"], np.uint8)
        else:
            h = np.frombuffer(row["payload"], np.uint64)
            for p in _bloom_positions(h, m_bits):
                np.bitwise_or.at(
                    acc, (p >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8)),
                )
    return acc


def contamination_check_distributed(
    docs: ray.data.Dataset, benchmark: ray.data.Dataset, n: int = 8,
    prefilter_bloom_bits: int | None = 1 << 27,
) -> ray.data.Dataset:
    """Contamination against a benchmark CORPUS too large to broadcast:
    both sides emit (ngram_hash, …) rows, a groupby on the hash marks doc
    n-grams that any benchmark n-gram shares, and a per-doc sum aggregates
    hit counts. Exchange = 8-byte hashes (never text); same union +
    groupby shape as the dedup keep-set, so it is empty-block safe.
    Output matches contamination_check for the same benchmark.

    ``prefilter_bloom_bits`` (default 2^27 = a 16 MB bitset) broadcasts a
    bloom filter of the benchmark n-grams and drops the non-contaminated
    majority of DOC n-grams before the exchange — false positives only
    add exchange rows (the sharded membership test stays exact), so the
    output is identical at any bitset size. None disables the prefilter."""
    from kafka_connect_jdbc_flatten_ray.stages.dedup import _shingle_hashes_words
    from ray.data.aggregate import Sum

    bloom_ref = (
        ray.put(build_benchmark_bloom(benchmark, n, prefilter_bloom_bits))
        if prefilter_bloom_bits else None
    )
    m_bits = prefilter_bloom_bits

    def _doc_rows(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h, parent = _shingle_hashes_words(text, k=n)
        if bloom_ref is not None and len(h):
            bloom = ray.get(bloom_ref)  # zero-copy from the local store
            keep = _bloom_test(bloom, h, m_bits)
            h, parent = h[keep], parent[keep]
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64)),
                "doc_id": pa.array(ids[parent]),
                "is_bench": pa.array(np.zeros(len(h), np.int8)),
            }
        )

    def _bench_rows(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h, _ = _shingle_hashes_words(text, k=n)
        h = np.unique(h)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64)),
                "doc_id": pa.array(np.full(len(h), -1, np.int64)),
                "is_bench": pa.array(np.ones(len(h), np.int8)),
            }
        )

    tagged = docs.map_batches(_doc_rows, batch_format="pyarrow", zero_copy_batch=True).union(
        benchmark.map_batches(_bench_rows, batch_format="pyarrow", zero_copy_batch=True)
    )
    return _exchange_and_count(tagged, docs)


def _exchange_and_count(
    tagged: ray.data.Dataset, docs: ray.data.Dataset
) -> ray.data.Dataset:
    """Shared tail of the distributed/incremental contamination checks:
    shard the tagged (h, doc_id, is_bench) rows by hash, mark doc rows
    whose hash has a bench row, per-doc-sum the hits, then re-attach
    zero-hit docs via the empty-block-safe union+groupby pattern."""
    from ray.data.aggregate import Sum

    def _mark(g: pa.Table) -> pa.Table:
        """All rows of one shard of hashes: doc rows whose hash also has a
        bench row become hits (vectorized via sorted membership)."""
        h = g.column("h").to_numpy(zero_copy_only=False)
        isb = g.column("is_bench").to_numpy(zero_copy_only=False).astype(bool)
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        bench_h = np.unique(h[isb])
        doc_mask = ~isb
        if not len(bench_h) or not doc_mask.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "hits": pa.array([], pa.int64())})
        dh = h[doc_mask]
        idx = np.searchsorted(bench_h, dh)
        idx[idx >= len(bench_h)] = 0
        hit = bench_h[idx] == dh
        dd = did[doc_mask][hit]
        if not len(dd):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "hits": pa.array([], pa.int64())})
        uniq, counts = np.unique(dd, return_counts=True)
        return pa.table({"doc_id": pa.array(uniq),
                         "hits": pa.array(counts.astype(np.int64))})

    def _shard(t: pa.Table) -> pa.Table:
        # 64 shards matches the dedup family (NUM_LSH_SHARDS): enough
        # groups to spread any node count, few enough that small inputs
        # don't drown in per-group task overhead
        h = t.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "shard", pa.array((h % np.uint64(64)).astype(np.int32))
        )

    # _mark emits per-doc PARTIAL counts per shard; one union with the
    # zero rows and a single groupby-sum finishes the job (an extra
    # per-doc aggregate before the union would be a redundant all-to-all)
    hits = (
        tagged.map_batches(_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(_mark, batch_format="pyarrow")
        .map_batches(
            lambda t: t.rename_columns(["doc_id", "ngram_hits"]),
            batch_format="pyarrow",
        )
    )
    # attach zero-hit docs via the empty-block-safe union+groupby pattern
    zeros = docs.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"),
             "ngram_hits": pa.array(np.zeros(t.num_rows, np.int64))}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    total = zeros.union(hits).groupby("doc_id").aggregate(
        Sum("ngram_hits", alias_name="ngram_hits")
    )
    return total.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "contaminated": pc.greater(t.column("ngram_hits"), 0),
                "ngram_hits": pc.cast(t.column("ngram_hits"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

"""Incremental (epoch-at-a-time) benchmark-contamination registry with
lake-resident n-gram state.

Batch ``contamination_check_distributed`` (stages/scrub.py) re-hashes the
whole benchmark corpus per run; a streaming registry should fold ONLY the
newly arrived benchmark sets (a new eval release, a fresh test split)
into state it has already built:

    contam_state/bucket=N/epoch-M.parquet  one row per distinct word
                                           n-gram hash of the benchmark
                                           corpus so far (h int64)
    contam_state/bloom/epoch-M.bin         fixed-size bloom bitset of the
                                           same hashes (the broadcast
                                           prefilter; OR-folded)
    contam_state/manifest.json             buckets + bloom -> current
                                           state, epochs -> lineage

Set union and bitset OR are commutative AND idempotent, so benchmark
epochs may arrive in any order and re-delivery is harmless; after any
number of folds ``contamination_check_incremental`` equals the batch
check against the union of all folded benchmark sets, row for row. The
check never re-reads benchmark text: the bloom prefilter drops the clean
majority of DOC n-grams before the exchange (false positives only add
exchange rows — the sharded membership test against the exact state
hashes keeps the answer exact), mirroring the batch pre-filter.

Reference parity: the reference engine has no contamination analogue;
this is the builder's-brief LLM-data-pipeline surface — the streaming
counterpart to ``contamination_check_distributed`` exactly as
``dedup_exact_epoch`` is to ``dedup_exact`` (same manifest lineage,
CAS-claimed epochs, streamed prior state).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from kafka_connect_jdbc_flatten_ray.functions.hashing import _splitmix64
from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
from kafka_connect_jdbc_flatten_ray.stages.scrub import (
    _bloom_test,
    _exchange_and_count,
    build_benchmark_bloom,
)
from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
    _guard_fold,
    _split_prior_state,
    _stored_num_buckets,
)
from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

STATE_TABLE = "contam_state"

_ST_SCHEMA = pa.schema([("h", pa.int64())])


def benchmark_ngrams_epoch(
    benchmark: ray.data.Dataset,
    state_root: str,
    n: int = 8,
    num_buckets: int = 32,
    m_bits: int = 1 << 27,
) -> dict:
    """Fold one epoch of benchmark documents into the lake-resident
    n-gram registry. Distributed: only distinct 8-byte hashes shuffle
    (never text), one fold task per touched bucket, prior state streamed;
    the bloom bitset partials OR-merge on the driver (fixed 16 MB at the
    default size, regardless of benchmark size) and the new blob + state
    files commit under one CAS-claimed manifest epoch."""
    from kafka_connect_jdbc_flatten_ray.stages.dedup import _shingle_hashes_words
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    part = (m or {}).get("partitioning") or {}
    stored_n = part.get("ngram_n")
    if stored_n is not None and int(stored_n) != int(n):
        raise ValueError(
            f"state at {state_root} was built with n={stored_n}; its hashes "
            f"cannot answer n={n} membership — use a fresh state root"
        )
    if part.get("m_bits") is not None:
        m_bits = int(part["m_bits"])  # the stored bitset layout wins
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS

    def _hash_rows(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h, _ = _shingle_hashes_words(text, k=n)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    def _bucket(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        hh = _splitmix64(h)
        return t.append_column(
            "__bucket", pa.array((hh % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        _guard_fold(g.num_rows, "benchmark_ngrams_epoch", num_buckets,
                    fold_limit)
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g.column("h").to_numpy(zero_copy_only=False))
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "h", touched, _ST_SCHEMA, staged
        )
        stored_rows = state.num_rows if state is not None else 0
        # the union of touched hashes IS the new rows for this bucket:
        # stored hashes seen again are re-written once, new ones appear
        writer.write_table(
            pa.table({"h": pa.array(touched, pa.int64())}).cast(_ST_SCHEMA)
        )
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "ngrams": [len(touched) + carried],
            "new_ngrams": [len(touched) - stored_rows],
        })

    _fold.__name__ = "contam_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            benchmark.map_batches(_hash_rows, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
        # bloom sidecar: epoch partial OR prior blob (both fixed-size)
        bloom = build_benchmark_bloom(benchmark, n, m_bits)
        if part.get("bloom_path"):
            bloom |= np.frombuffer(
                fsx.read_bytes(fs, part["bloom_path"]), np.uint8
            )
        bloom_dir = fsx.join(root, STATE_TABLE, "bloom")
        fsx.makedirs(fs, bloom_dir)
        bloom_path = fsx.join(bloom_dir, f"epoch-{epoch:06d}.bin")
        staged_b = fsx.staging_path(fs, bloom_path)
        with fs.open_output_stream(staged_b) as f:
            f.write(bloom.tobytes())
        fsx.publish_file(fs, staged_b, bloom_path)
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {k: int(sum(r[k] for r in stats)) for k in ("ngrams", "new_ngrams")}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets, "key_pk_cols": ["h"],
                      "hash_version": 2, "ngram_n": int(n),
                      "m_bits": int(m_bits), "bloom_path": bloom_path},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def read_benchmark_hashes(state_root: str) -> ray.data.Dataset:
    """Every distinct benchmark n-gram hash folded so far (h int64)."""
    manifest = TableManifest(state_root, STATE_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())
    ds = read_parquet_clean(files, filesystem=fs, columns=["h"])
    drop = [c for c in ("bucket",) if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds


def contamination_check_incremental(
    docs: ray.data.Dataset, state_root: str
) -> ray.data.Dataset:
    """Flag docs sharing any word n-gram with the folded benchmark
    registry — row-for-row equal to ``contamination_check_distributed``
    against the union of all folded benchmark sets. The n-gram width and
    bloom layout come from the manifest (never re-guessed); the stored
    bitset broadcasts once via ray.put and drops the clean majority of
    doc n-grams before the exchange."""
    from kafka_connect_jdbc_flatten_ray.stages.dedup import _shingle_hashes_words

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    if not m:
        raise ValueError(f"no {STATE_TABLE} manifest at {state_root}")
    part = m["partitioning"]
    n, m_bits = int(part["ngram_n"]), int(part["m_bits"])
    fs, _ = fsx.resolve(state_root)
    bloom_ref = ray.put(
        np.frombuffer(fsx.read_bytes(fs, part["bloom_path"]), np.uint8)
    )

    def _doc_rows(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h, parent = _shingle_hashes_words(text, k=n)
        if len(h):
            bloom = ray.get(bloom_ref)  # zero-copy from the local store
            keep = _bloom_test(bloom, h, m_bits)
            h, parent = h[keep], parent[keep]
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "h": pa.array(h.view(np.int64)),
            "doc_id": pa.array(ids[parent]),
            "is_bench": pa.array(np.zeros(len(h), np.int8)),
        })

    def _bench_rows(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:
            t = t.drop_columns(["bucket"])
        nrows = t.num_rows
        return pa.table({
            "h": t.column("h"),
            "doc_id": pa.array(np.full(nrows, -1, np.int64)),
            "is_bench": pa.array(np.ones(nrows, np.int8)),
        })

    files = sorted(manifest.current_files().values())
    bench = read_parquet_clean(files, filesystem=fs, columns=["h"]).map_batches(
        _bench_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    tagged = docs.map_batches(
        _doc_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(bench)
    return _exchange_and_count(tagged, docs)


def reshard_state(state_root: str, new_num_buckets: int) -> dict:
    """Re-bucket the n-gram registry when the benchmark hash population
    outgrows its layout. The bloom sidecar is bucket-agnostic (one global
    bitset) and carries through the manifest partitioning unchanged."""
    from kafka_connect_jdbc_flatten_ray.stages.state_reshard import (
        reshard_splitmix_state,
    )

    return reshard_splitmix_state(
        state_root, STATE_TABLE, "h", _ST_SCHEMA, new_num_buckets
    )

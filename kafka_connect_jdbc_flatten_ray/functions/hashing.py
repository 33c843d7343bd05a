"""Content digests for final-table-state parity checks.

The north-star oracle is per-row content equality of the final merged
tables. ``dataset_digest`` computes an ORDER-INSENSITIVE digest of a
Dataset's rows fully distributed: each batch canonicalizes rows (sorted
column names, fixed null/value formatting), hashes each row, and emits the
per-batch SUM (mod 2^64) — sums combine associatively, so the reduce is a
tiny aggregate and two replays of the same state agree regardless of row
order or partitioning. ``rows_sha256`` is the slow exact-sha256 variant for
small verification samples.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _canonical_strings(tbl: pa.Table) -> pa.Array:
    """One canonical string per row: 'col=value|...' over sorted columns."""
    parts = []
    for name in sorted(tbl.column_names):
        col = tbl.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_floating(col.type):
            s = pc.cast(col, pa.string())
        elif pa.types.is_timestamp(col.type):
            s = pc.strftime(pc.cast(col, pa.timestamp("us")), "%Y-%m-%dT%H:%M:%S.%f")
        else:
            s = pc.cast(col, pa.string())
        s = pc.fill_null(s, "\x00NULL")
        parts.append(pa.scalar(name + "="))
        parts.append(s)
        parts.append(pa.scalar("|"))
    return pc.binary_join_element_wise(*parts, "")


_U64 = np.uint64
_NULL_SENTINEL = _U64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants): full
    avalanche so `h % num_buckets` spreads even near-sequential inputs."""
    with np.errstate(over="ignore"):
        z = x + _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def _col_hash64(col) -> np.ndarray:
    """Deterministic per-row 64-bit hash of one column, Arrow-native:
    strings/binary hash only their UNIQUE values (dictionary encode +
    polynomial fingerprint, the dedup-stage pattern) then gather; numeric
    and temporal types use their bit pattern; nulls a fixed sentinel."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        from kafka_connect_jdbc_flatten_ray.stages.dedup import _fingerprints

        d = pc.dictionary_encode(col)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        if len(d.dictionary) == 0:
            return np.full(len(col), _NULL_SENTINEL, _U64)
        hd, _ = _fingerprints(d.dictionary)
        idx = d.indices
        if idx.null_count:
            hd = np.concatenate([hd, [_NULL_SENTINEL]])
            idx = pc.fill_null(idx, len(hd) - 1)
        return hd[idx.to_numpy(zero_copy_only=False)]
    if pa.types.is_floating(t):
        v = pc.fill_null(pc.cast(col, pa.float64()), float("nan"))
        raw = v.to_numpy(zero_copy_only=False).view(_U64).copy()
    elif pa.types.is_boolean(t):
        raw = pc.fill_null(col, False).to_numpy(zero_copy_only=False).astype(_U64)
    else:  # ints, timestamps, dates, decimals-as-int
        v = pc.fill_null(pc.cast(col, pa.int64()), 0)
        raw = v.to_numpy(zero_copy_only=False).view(_U64).copy()
    if col.null_count:
        mask = pc.is_null(col).to_numpy(zero_copy_only=False)
        raw[mask] = _NULL_SENTINEL
    return _splitmix64(raw)


def stable_row_hash(tbl: pa.Table, cols: tuple[str, ...]) -> np.ndarray:
    """Deterministic uint64 hash per row over ``cols`` with NO pandas
    round-trip — the engine's bucket-assignment hash (hash_version 2).
    Stable across processes/batches/partitionings (writer and reader both
    recompute it for bucket pruning), unlike a per-batch factorize."""
    h = np.full(tbl.num_rows, _U64(0x165667B19E3779F9), _U64)
    with np.errstate(over="ignore"):
        for name in cols:
            h = _splitmix64(h + _col_hash64(tbl.column(name)))
    return h


def batch_digest(tbl: pa.Table) -> int:
    """Sum (mod 2^64) of per-row 64-bit content hashes."""
    if tbl.num_rows == 0:
        return 0
    rows = _canonical_strings(tbl)
    h = pd.util.hash_pandas_object(
        pd.Series(rows.to_numpy(zero_copy_only=False)), index=False
    ).to_numpy()
    with np.errstate(over="ignore"):
        return int(h.sum(dtype=np.uint64))


def dataset_digest(ds) -> str:
    """Order-insensitive 64-bit content digest of a Dataset (hex)."""
    partials = ds.map_batches(
        lambda t: pa.table({"d": pa.array([batch_digest(t)], pa.uint64()),
                            "n": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow",
    ).take_all()
    total = np.uint64(0)
    n = 0
    with np.errstate(over="ignore"):
        for r in partials:
            total = total + np.uint64(r["d"])
            n += r["n"]
    return f"{int(total):016x}:{n}"


def rows_sha256(tbl: pa.Table) -> list[str]:
    """Exact per-row sha256 of the canonical encoding (small samples)."""
    rows = _canonical_strings(tbl).to_pylist()
    return [hashlib.sha256(r.encode()).hexdigest() for r in rows]

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


_FNV = _U64(0x100000001B3)


def _bytes_hash64(col: pa.Array) -> np.ndarray:
    """Stable 64-bit hash per string/binary value, fully vectorized: one
    gather builds a [n, min(maxlen, 64)]-byte padded matrix, a Horner loop
    over BYTE POSITIONS (<= 64 vector ops, never per-row Python or the
    exponent-by-squaring fingerprint) folds it, values longer than the cap
    additionally fold their last 8 bytes; length is mixed in so prefixes
    differ. Collisions only cost bucket skew, never correctness (bucketing
    is coarse), so the 64-byte cap is safe."""
    b = col.cast(pa.large_binary())
    n = len(b)
    if n == 0:
        return np.empty(0, _U64)
    off = np.frombuffer(b.buffers()[1], np.int64, count=n + 1, offset=b.offset * 8)
    flat = np.frombuffer(
        b.buffers()[2], np.uint8, count=int(off[-1] - off[0]), offset=int(off[0])
    )
    off = off - off[0]
    lens = np.diff(off)
    cap = min(int(lens.max()), 64) if len(flat) else 0
    h = np.full(n, _U64(0xCBF29CE484222325), _U64)
    with np.errstate(over="ignore"):
        if cap:
            idx = off[:-1, None] + np.arange(cap)
            mask = np.arange(cap)[None, :] < lens[:, None]
            mat = (flat[np.minimum(idx, len(flat) - 1)] * mask).astype(_U64)
            mult = np.where(mask, _FNV, _U64(1))
            for pos in range(cap):
                h = h * mult[:, pos] + mat[:, pos]
            long = lens > 64
            if long.any():
                tail = off[1:][long, None] - np.arange(8, 0, -1)
                tmat = flat[tail].astype(_U64)
                hl = h[long]
                for k in range(8):
                    hl = hl * _FNV + tmat[:, k]
                h[long] = hl
        h = h ^ lens.astype(_U64)
    return _splitmix64(h)


def _col_hash64(col) -> np.ndarray:
    """Deterministic per-row 64-bit hash of one column, Arrow-native:
    strings/binary hash only their UNIQUE values (dictionary encode +
    vectorized byte-matrix Horner) then gather; numeric and temporal
    types use their bit pattern; nulls a fixed sentinel."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        d = pc.dictionary_encode(col)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        if len(d.dictionary) == 0:
            return np.full(len(col), _NULL_SENTINEL, _U64)
        hd = _bytes_hash64(d.dictionary)
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

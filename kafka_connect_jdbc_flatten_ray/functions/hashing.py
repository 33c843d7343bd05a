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

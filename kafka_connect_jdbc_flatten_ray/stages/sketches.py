"""Mergeable sketches: HyperLogLog approximate distinct count.

The combiner pattern for sketches (SURVEY guide): each batch emits ONE
serialized sketch row; a tiny final stage merges them (register-wise max).
The shuffle moves kilobytes regardless of input size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

P = 12  # 2^12 registers -> ~1.6% relative error
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash64(values: np.ndarray) -> np.ndarray:
    """splitmix64 of the int64/uint64 bit pattern (the engine's own mixer,
    functions/hashing.py) — SQL-reproducible, which is what lets the HLL
    estimate have an exact DuckDB oracle (dedup_oracles.hll_distinct_sql);
    non-integer inputs fall back to the pandas hash (still deterministic,
    just not mirrored in SQL)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        from kafka_connect_jdbc_flatten_ray.functions.hashing import _splitmix64

        return _splitmix64(arr.astype(np.int64).view(np.uint64))
    return pd.util.hash_pandas_object(pd.Series(values), index=False).to_numpy()


def hll_add(regs: np.ndarray, h: np.ndarray) -> None:
    """Fold uint64 hashes into the register array (vectorized)."""
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    w = h << np.uint64(P)  # remaining 64-P bits, left-aligned
    # rho = position of the leftmost 1-bit in w (1-based); w==0 -> 64-P+1
    rho = np.full(len(h), 64 - P + 1, np.uint8)
    nz = w != 0
    # floor(log2(w)) via float conversion is exact for the top bit position
    top = np.zeros(len(h), np.int64)
    top[nz] = 63 - np.floor(np.log2(w[nz].astype(np.float64) + 0.0)).astype(np.int64)
    # guard against float rounding at the boundary
    over = nz & (top < 0)
    top[over] = 0
    rho[nz] = (top[nz] + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)  # linear counting for small cardinalities
    return float(est)


class HLLPartial:
    """map_batches combiner: one serialized sketch row per batch."""

    def __init__(self, column: str):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch.column(self.column).to_numpy(zero_copy_only=False)
        regs = np.zeros(M, np.uint8)
        hll_add(regs, _hash64(vals))
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.large_binary())})


def _merged_registers(ds: ray.data.Dataset, column: str) -> np.ndarray:
    partials = ds.map_batches(
        HLLPartial(column), batch_format="pyarrow", zero_copy_batch=True
    )
    regs = np.zeros(M, np.uint8)
    for row in partials.take_all():  # kilobytes total — driver merge is fine
        regs = np.maximum(regs, np.frombuffer(row["sketch"], np.uint8))
    return regs


def approx_distinct(ds: ray.data.Dataset, column: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT column) via merged HLL sketches."""
    regs = _merged_registers(ds, column)
    return pd.DataFrame({"approx_distinct": [int(round(hll_estimate(regs)))]})


# ---------------------------------------------------------------------------
# incremental HLL (lake-resident registers)
# ---------------------------------------------------------------------------

HLL_TABLE = "hll_state"


def hll_epoch(ds: ray.data.Dataset, state_root: str, column: str) -> dict:
    """Fold one epoch of values into a lake-resident HLL sketch.

    Register merge is a register-wise max — commutative and idempotent —
    so after any number of folds in any order, :func:`read_estimate`
    equals batch ``approx_distinct`` over the union of the folded
    epochs, and shares its SQL oracle verbatim. State is ONE 4 KiB
    register file under the same manifest/CAS machinery as every other
    incremental operator; the per-epoch distributed work is the
    kilobyte-combiner map_batches, never a shuffle."""
    from kafka_connect_jdbc_flatten_ray.state import fs as fsx
    from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

    import pyarrow.parquet as pq

    manifest = TableManifest(state_root, HLL_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    fs, root = fsx.resolve(state_root)
    nonce = manifest.claim_epoch(epoch)
    try:
        regs = _merged_registers(ds, column)
        prior = (m or {}).get("buckets", {}).get("0")
        if prior:
            with fs.open_input_file(prior) as f:
                stored = pq.read_table(f).column("sketch")[0].as_py()
            regs = np.maximum(regs, np.frombuffer(stored, np.uint8))
        out_dir = fsx.join(root, HLL_TABLE, "bucket=00000")
        fsx.makedirs(fs, out_dir)
        path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, path)
        pq.write_table(
            pa.table({"sketch": pa.array([regs.tobytes()], pa.large_binary())}),
            staged, filesystem=fs,
        )
        fsx.publish_file(fs, staged, path)
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    est = int(round(hll_estimate(regs)))
    manifest.publish(
        epoch, {0: path}, {"approx_distinct": est},
        partitioning={"num_buckets": 1, "key_pk_cols": [column]},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "approx_distinct": est}


def read_estimate(state_root: str) -> pd.DataFrame:
    """Current estimate from the lake-resident registers — equal to batch
    ``approx_distinct`` on the union of all folded epochs."""
    import pyarrow.parquet as pq

    from kafka_connect_jdbc_flatten_ray.state import fs as fsx
    from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

    manifest = TableManifest(state_root, HLL_TABLE)
    fs, _ = fsx.resolve(state_root)
    path = manifest.current_files()[0]
    with fs.open_input_file(path) as f:
        regs = np.frombuffer(pq.read_table(f).column("sketch")[0].as_py(), np.uint8)
    return pd.DataFrame({"approx_distinct": [int(round(hll_estimate(regs)))]})

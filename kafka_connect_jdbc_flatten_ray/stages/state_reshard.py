"""Generic re-bucketing for splitmix-bucketed incremental state tables.

Every lake-resident state family buckets its rows by a single int64 key
column; the fold guard (streaming_windows._guard_fold) trips loudly when
a bucket outgrows the layout it was created with, and the escape hatch
is a reshard: read the current per-bucket state as one Dataset,
re-assign buckets at the new count with the SAME hash the fold path
uses, write one state file per new bucket, and publish them as a
manifest epoch that REPLACES the bucket map (the recorded partitioning
carries the new count, so subsequent folds pick it up automatically).

Two bucketing conventions exist and must never be mixed (probing the
wrong file silently duplicates state on the next fold):

- ``streaming_dedup.reshard_state``: raw ``h1 % N`` — the exact-dedup
  fingerprint is already uniform.
- this module: ``splitmix64(key) % N`` — quantile value bits,
  contamination n-gram hashes and embedding (table,bucket) packs are
  NOT uniform in their low bits, so the fold paths finalize them first;
  the reshard applies the identical finalizer.

Family wrappers (``streaming_quantiles.reshard_state`` etc.) pin the
key column and file schema so callers can't cross-wire a table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from kafka_connect_jdbc_flatten_ray.functions.hashing import _splitmix64
from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean


def reshard_modulo_state(
    state_root: str,
    table: str,
    key_col: str,
    schema: pa.Schema,
    new_num_buckets: int,
) -> dict:
    """Raw ``key_col % N`` re-bucketing — for states whose key column is
    ALREADY a finalized uniform hash (the term state's stable_row_hash
    routing column). Applying splitmix again would probe the wrong file
    on the next fold."""
    return _reshard(state_root, table, key_col, schema, new_num_buckets,
                    finalize=False)


def reshard_splitmix_state(
    state_root: str,
    table: str,
    key_col: str,
    schema: pa.Schema,
    new_num_buckets: int,
) -> dict:
    """Re-bucket ``table`` under ``state_root`` to ``new_num_buckets``
    using ``splitmix64(key_col) % N`` — the finalizer every splitmix
    fold path uses. Distributed (one write task per new bucket), and the
    commit is the same CAS-claimed manifest swap as a fold epoch, so a
    concurrent fold and a reshard cannot interleave."""
    return _reshard(state_root, table, key_col, schema, new_num_buckets,
                    finalize=True)


def _reshard(
    state_root: str,
    table: str,
    key_col: str,
    schema: pa.Schema,
    new_num_buckets: int,
    finalize: bool,
) -> dict:
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, table)
    m = manifest.load()
    if not m:
        raise ValueError(f"no {table} manifest at {state_root}")
    epoch = int(m["epoch"]) + 1
    nonce = manifest.claim_epoch(epoch)
    fs, root = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())
    # captured driver-side so the bound travels with the closure (see
    # streaming_windows._guard_fold)
    write_limit = MAX_FOLD_ROWS

    def _rebucket(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:  # hive partition col from the read
            t = t.drop_columns(["bucket"])
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        h = k.view(np.uint64)
        if finalize:
            h = _splitmix64(h)
        return t.append_column(
            "__bucket",
            pa.array((h % np.uint64(new_num_buckets)).astype(np.int32)),
        )

    def _write(t: pa.Table) -> pa.Table:
        bucket = int(t.column("__bucket")[0].as_py())
        if t.num_rows > write_limit:
            # a reshard is triggered precisely when state outgrew its
            # layout — an undersized target must fail loudly, not OOM the
            # one task that materializes the destination bucket
            raise ValueError(
                f"reshard_state({table}): destination bucket {bucket} "
                f"would hold {t.num_rows} rows (> {write_limit}) at "
                f"new_num_buckets={new_num_buckets}; pick a larger "
                "new_num_buckets"
            )
        out_dir = fsx.join(root, table, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, path)
        body = t.drop_columns(["__bucket"]).select(schema.names)
        pq.write_table(body.cast(schema), staged, filesystem=fs)
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
    part["num_buckets"] = int(new_num_buckets)
    manifest.publish(
        epoch,
        {int(r["bucket"]): r["path"] for r in stats},
        {"resharded_to": int(new_num_buckets),
         "rows": int(sum(r["rows"] for r in stats))},
        partitioning=part,
        replace_buckets=True,
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "num_buckets": int(new_num_buckets),
            "buckets_written": len(stats)}

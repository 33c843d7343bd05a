"""Incremental (epoch-at-a-time) exact quantiles with lake-resident
counted-multiset state.

Batch ``quantiles_exact`` (stages/quantiles.py) makes three bounded
passes over the raw rows; a streaming ingest should fold ONLY the new
epoch's values into a summary it has already built. The one summary that
keeps the answer EXACT and is mergeable in any order is the counted
multiset — one row per distinct value carrying its multiplicity:

    quantile_state/bucket=N/epoch-M.parquet  (vbits int64, count int64)
                                             vbits = the float64 value's
                                             raw bit pattern (lossless)
    quantile_state/manifest.json             buckets -> current state
                                             file, epochs -> lineage

``value_counts_epoch`` pre-aggregates each epoch batch to (value, count)
partials BEFORE the shuffle (the per-batch combiner the 100 TB brief
demands), buckets rows by splitmix64(vbits) % N, and one fold task per
touched bucket streams that bucket's prior state: rows whose value was
touched this epoch come into memory for a count-sum, every other row
streams straight through to the new state file. Addition is commutative
and associative, so epochs may fold in any order; after any number of
folds ``quantiles_from_state`` equals batch ``quantiles_exact`` over the
union of all folded epochs (the weighted three-pass refinement over the
state is rank-for-rank the unweighted pass over the raw rows).

State size is bounded by the number of DISTINCT values, not rows — for
discrete measures (token counts, quality buckets, status codes) this is
tiny; for continuous float64 columns it degrades to ~one row per row,
which is still only 16 bytes/row of bucketed lake state and never needs
to fit in memory anywhere (folds stream it, reads are a Dataset).

Reference parity: the reference engine has no quantile operator; this is
the builder's-brief LLM-data-pipeline surface — the streaming
counterpart to ``quantiles_exact`` exactly as ``dedup_exact_epoch`` is
to ``dedup_exact`` (same manifest lineage, CAS-claimed epochs, streamed
prior state).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kafka_connect_jdbc_flatten_ray.functions.hashing import _splitmix64
from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
    _guard_fold,
    _split_prior_state,
    _stored_num_buckets,
)
from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

STATE_TABLE = "quantile_state"

_ST_SCHEMA = pa.schema([("vbits", pa.int64()), ("count", pa.int64())])


def _value_count_partial(t: pa.Table, column: str) -> pa.Table:
    """Per-batch combiner: NaN-filtered (vbits, count) partials — the
    shuffle then moves at most one row per distinct value per batch."""
    v = t.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
    v = v[~np.isnan(v)]
    bits = np.unique(v.view(np.int64), return_counts=True)
    return pa.table({"vbits": pa.array(bits[0], pa.int64()),
                     "count": pa.array(bits[1].astype(np.int64), pa.int64())})


def value_counts_epoch(
    ds: ray.data.Dataset,
    state_root: str,
    column: str,
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of ``ds[column]`` into the lake-resident counted
    multiset. Distributed: only (vbits, count) partials shuffle (never
    the source rows), one fold task per touched bucket, prior state
    streamed, commit is a manifest swap whose epoch number was
    CAS-claimed before any fold task wrote a data file."""
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
        vb = t.column("vbits").to_numpy(zero_copy_only=False)
        h = _splitmix64(vb.view(np.uint64))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        _guard_fold(g.num_rows, "value_counts_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        vb = g.column("vbits").to_numpy(zero_copy_only=False)
        cnt = g.column("count").to_numpy(zero_copy_only=False)
        touched = np.unique(vb)
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "vbits", touched, _ST_SCHEMA, staged
        )
        # sum epoch partials with the touched stored rows (pure numpy:
        # factorize via the sorted unique array, then int64 scatter-adds —
        # a float64-weighted bincount would silently lose exactness past
        # 2^53 occurrences per value, breaking the "exact" contract)
        idx = np.searchsorted(touched, vb)
        sums = np.zeros(len(touched), np.int64)
        np.add.at(sums, idx, cnt)
        stored_rows = 0
        if state is not None and state.num_rows:
            svb = state.column("vbits").to_numpy(zero_copy_only=False)
            scnt = state.column("count").to_numpy(zero_copy_only=False)
            sidx = np.searchsorted(touched, svb)
            np.add.at(sums, sidx, scnt)
            stored_rows = state.num_rows
        out = pa.table({"vbits": pa.array(touched, pa.int64()),
                        "count": pa.array(sums, pa.int64())})
        writer.write_table(out.cast(_ST_SCHEMA))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "distinct_values": [len(touched) + carried],
            "new_values": [len(touched) - stored_rows],
            "epoch_count": [int(cnt.sum())],
        })

    _fold.__name__ = "quantile_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            ds.map_batches(lambda t: _value_count_partial(t, column),
                           batch_format="pyarrow", zero_copy_batch=True)
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
              for k in ("distinct_values", "new_values", "epoch_count")}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets,
                      "key_pk_cols": ["vbits"], "hash_version": 2},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def read_value_counts(state_root: str) -> ray.data.Dataset:
    """The counted multiset over every epoch folded so far, as a Dataset
    of (value float64, count int64)."""
    manifest = TableManifest(state_root, STATE_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())

    def _decode(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:  # hive partition col from the read
            t = t.drop_columns(["bucket"])
        vb = t.column("vbits").to_numpy(zero_copy_only=False)
        return pa.table({"value": pa.array(vb.view(np.float64), pa.float64()),
                         "count": t.column("count")})

    return read_parquet_clean(files, filesystem=fs).map_batches(
        _decode, batch_format="pyarrow", zero_copy_batch=True
    )


def quantiles_from_state(
    state_root: str, qs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99)
) -> pd.DataFrame:
    """Exact ``quantile_disc`` values over every epoch folded so far —
    row-for-row equal to batch ``quantiles_exact`` on the union of the
    folded inputs (the weighted refinement ranks identically)."""
    from kafka_connect_jdbc_flatten_ray.stages.quantiles import quantiles_exact

    return quantiles_exact(read_value_counts(state_root), "value", qs,
                           weight="count")


def reshard_state(state_root: str, new_num_buckets: int) -> dict:
    """Re-bucket the counted-multiset state when the distinct-value
    population outgrows its layout (the fold guard trips). Applies the
    same splitmix64(vbits) finalizer the fold path uses."""
    from kafka_connect_jdbc_flatten_ray.stages.state_reshard import (
        reshard_splitmix_state,
    )

    return reshard_splitmix_state(
        state_root, STATE_TABLE, "vbits", _ST_SCHEMA, new_num_buckets
    )

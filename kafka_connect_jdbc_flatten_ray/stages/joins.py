"""Join patterns (the reference performs no joins — SURVEY.md §2.5 — but a
training-data engine needs them; these are the documented scale patterns):

- broadcast_lookup: small side ``ray.put`` once, dict/merge lookup inside
  map_batches — no shuffle. For dimension tables, vocabularies, blocklists.
- hash_join: both sides large — Ray Data's native hash-partitioned
  ``Dataset.join`` (2.49), with ``num_partitions`` as the explicit
  partitioning control.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def broadcast_lookup(
    large: ray.data.Dataset,
    small_df: pd.DataFrame,
    on: str,
    right_on: str | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Enrich ``large`` with columns from a SMALL pandas table via a
    broadcast hash lookup (no shuffle). ``small_df`` is put in the object
    store once; every task reads the same copy."""
    right_on = right_on or on
    cols = columns or [c for c in small_df.columns if c != right_on]
    ref = ray.put(small_df.set_index(right_on)[cols])

    def _lookup(batch: pa.Table) -> pa.Table:
        lookup: pd.DataFrame = ray.get(ref)
        keys = batch.column(on).to_numpy(zero_copy_only=False)
        idx = lookup.index.get_indexer(keys)
        out = batch
        for c in cols:
            vals = lookup[c].to_numpy()
            col = np.where(idx >= 0, vals[np.clip(idx, 0, len(vals) - 1)], None)
            out = out.append_column(c, pa.array(col))
        return out

    return large.map_batches(_lookup, batch_format="pyarrow", zero_copy_batch=True)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Large-large join: hash-partition both sides on the key
    (``num_partitions`` = explicit shuffle parallelism / skew control)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
    )


def semi_join_ids(
    large: ray.data.Dataset,
    ids: ray.data.Dataset,
    on: str = "doc_id",
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Distributed semi-join: keep ``large`` rows whose ``on`` value
    appears in ``ids`` (an id-only dataset too big to broadcast at corpus
    scale). Both sides shard by ``splitmix64(id) % num_shards`` through
    ONE union+groupby exchange — the same empty-block-safe pattern the
    contamination check and dedup keep-set use (Ray's native hash join
    deadlocks composed with actor pools under tight CPU budgets; see
    dedup_minhash_keep) — and each shard group filters membership with a
    single vectorized ``np.isin``. The ids side rides along as all-null
    rows of the large schema (validity bitmaps only), so the exchange
    ships the large side once and 8-byte ids for the filter side."""
    from kafka_connect_jdbc_flatten_ray.functions.hashing import _splitmix64

    sch = large.schema().base_schema  # arrow schema of the large side
    names = list(sch.names)

    def _shard_of(k: np.ndarray) -> pa.Array:
        h = _splitmix64(k.astype(np.int64).view(np.uint64))
        return pa.array((h % np.uint64(num_shards)).astype(np.int32))

    def _tag_large(t: pa.Table) -> pa.Table:
        k = t.column(on).to_numpy(zero_copy_only=False)
        return (
            t.select(names)
            .append_column("__is_id", pa.array(np.zeros(t.num_rows, np.int8)))
            .append_column("__shard", _shard_of(k))
        )

    def _tag_ids(t: pa.Table) -> pa.Table:
        k = t.column(on).to_numpy(zero_copy_only=False)
        cols = {
            f.name: (t.column(on).cast(f.type) if f.name == on
                     else pa.nulls(t.num_rows, f.type))
            for f in sch
        }
        return (
            pa.table(cols)
            .append_column("__is_id", pa.array(np.ones(t.num_rows, np.int8)))
            .append_column("__shard", _shard_of(k))
        )

    def _filter(g: pa.Table) -> pa.Table:
        isid = g.column("__is_id").to_numpy(zero_copy_only=False).astype(bool)
        k = g.column(on).to_numpy(zero_copy_only=False)
        keep = ~isid & np.isin(k, np.unique(k[isid]))
        return g.filter(pa.array(keep)).drop_columns(["__is_id", "__shard"])

    _filter.__name__ = "semi_join_filter"
    tagged = large.map_batches(
        _tag_large, batch_format="pyarrow", zero_copy_batch=True
    ).union(ids.map_batches(_tag_ids, batch_format="pyarrow",
                            zero_copy_batch=True))
    return tagged.groupby("__shard").map_groups(
        _filter, batch_format="pyarrow"
    )

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

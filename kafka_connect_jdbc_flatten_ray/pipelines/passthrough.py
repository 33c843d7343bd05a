"""Legacy passthrough sink (flatten=false) — SURVEY.md §3.3.

The reference's non-flatten branch (JdbcDbWriter.java:206-215,
FieldsMetadata.java:103-188): one table per topic, value-struct top-level
fields become columns as-is, PK per pk.mode:

    none         append-only
    kafka        (topic, partition, offset) coordinate PK
    record_key   fields of the record key
    record_value configured fields of the record value

insert mode appends; upsert mode keeps the last row per PK by
(partition, offset) — the JDBC ``INSERT .. ON CONFLICT UPDATE`` analogue,
expressed as a bucketed groupby-last-wins (no markers needed: in legacy
mode each row replaces the whole row for its key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.config import SinkConfig


def _unnest(batch: pa.Table, cfg: SinkConfig) -> pa.Table:
    value = batch.column("value")
    if isinstance(value, pa.ChunkedArray):
        value = value.combine_chunks()
    cols: dict[str, pa.Array] = {}
    if cfg.pk_mode == "record_key":
        key = batch.column("key")
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        if pa.types.is_struct(key.type):
            for f in key.type:
                cols[f.name.lower()] = pc.struct_field(key, f.name)
        else:
            cols["key"] = key
    elif cfg.pk_mode == "kafka":
        cols["__connect_topic"] = batch.column("topic")
        cols["__connect_partition"] = batch.column("partition")
        cols["__connect_offset"] = batch.column("offset")
    for f in value.type:
        if pa.types.is_struct(f.type) or pa.types.is_list(f.type) or pa.types.is_map(f.type):
            raise ValueError(
                f"passthrough (flatten=false) requires a flat value struct; "
                f"field {f.name} is a container — enable flatten instead"
            )
        cols[f.name.lower()] = pc.struct_field(value, f.name)
    cols["__part"] = batch.column("partition")
    cols["__off"] = batch.column("offset")
    return pa.table(cols)


def _pk_cols(cfg: SinkConfig, sample: pa.Schema) -> tuple[str, ...]:
    if cfg.pk_mode == "none":
        return ()
    if cfg.pk_mode == "kafka":
        return ("__connect_topic", "__connect_partition", "__connect_offset")
    if cfg.pk_mode in ("record_key", "record_value"):
        if cfg.pk_fields:
            return tuple(f.lower() for f in cfg.pk_fields)
        return tuple(n for n in sample.names if not n.startswith("__"))[:1]
    return ()


def _last_row_per_key(pk: tuple[str, ...]):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        rank = (g["__part"].to_numpy(np.int64) << 40) | g["__off"].to_numpy(np.int64)
        g = g.assign(__rank=rank)
        g = g.sort_values("__rank").groupby(list(pk), dropna=False).tail(1)
        return g.drop(columns=["__rank", "__part", "__off"])

    fn.__name__ = "last_row_per_key"
    return fn


def passthrough_table(
    events: ray.data.Dataset, cfg: SinkConfig, num_buckets: int = 16
) -> ray.data.Dataset:
    """Final single-table state of the passthrough sink."""
    flat = events.map_batches(
        lambda b: _unnest(b, cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    if cfg.insert_mode == "insert" or cfg.pk_mode == "none":
        return flat.map_batches(
            lambda t: t.drop_columns(["__part", "__off"]), batch_format="pyarrow"
        )
    schema = flat.schema()
    pk = _pk_cols(cfg, pa.schema(list(zip(schema.names, schema.types))))

    def _bucket(t: pa.Table) -> pa.Table:
        df = t.select(list(pk)).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    bucketed = flat.map_batches(_bucket, batch_format="pyarrow")
    out = bucketed.groupby("__bucket").map_groups(
        _last_row_per_key(pk), batch_format="pandas"
    )
    return out.map_batches(
        lambda t: t.drop_columns([c for c in ("__bucket",) if c in t.column_names]),
        batch_format="pyarrow",
    )

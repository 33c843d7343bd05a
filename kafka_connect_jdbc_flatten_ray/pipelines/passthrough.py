"""Legacy passthrough sink (flatten=false) — SURVEY.md §3.3.

The reference's non-flatten branch (JdbcDbWriter.java:206-215,
FieldsMetadata.java:103-188): one table per topic, value-struct top-level
fields become columns as-is (optionally projected by ``fields.whitelist``,
FieldsMetadata.java:144), PK per pk.mode:

    none         append-only
    kafka        (topic, partition, offset) coordinate PK
    record_key   fields of the record key
    record_value configured fields of the record value

insert mode appends; upsert mode keeps the last row per PK by
(partition, offset) — the JDBC ``INSERT .. ON CONFLICT UPDATE`` analogue,
expressed as a bucketed groupby-last-wins (no markers needed: in legacy
mode each row replaces the whole row for its key). update mode
(JdbcSinkConfig.java:48-51,147-149) only modifies keys already present in
the target table — an UPDATE that matches zero rows is a no-op, so events
for unknown keys are dropped.

Tombstones (null value): with delete.enabled the key's row is deleted
(BufferedRecords.java:92-101); with delete disabled they are skipped in
record_key mode and rejected by the record validator otherwise
(RecordValidator.java:74-102 requiresValue).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.config import SinkConfig


def validate_records(batch: pa.Table, cfg: SinkConfig) -> None:
    """RecordValidator analogue (sink/RecordValidator.java:45-112):

    - pk_mode=record_key or delete.enabled: requires a non-null key
      (struct or primitive) for every record;
    - pk_mode in (record_value, none): requires a non-null struct value
      (tombstones are invalid in these modes).
    """
    requires_key = cfg.pk_mode == "record_key" or cfg.delete_enabled
    if requires_key and "key" in batch.column_names:
        key = batch.column("key")
        nnull = key.null_count if not isinstance(key, pa.ChunkedArray) else sum(
            c.null_count for c in key.chunks
        )
        if nnull:
            raise ValueError(
                f"sink is configured with pk.mode={cfg.pk_mode} and "
                f"delete.enabled={cfg.delete_enabled} and therefore requires "
                f"records with a non-null key, but found {nnull} null-key "
                "records (RecordValidator.java:104-112 requiresKey)"
            )
    if cfg.pk_mode in ("record_value", "none"):
        value = batch.column("value")
        nnull = value.null_count if not isinstance(value, pa.ChunkedArray) else sum(
            c.null_count for c in value.chunks
        )
        if nnull:
            raise ValueError(
                f"sink is configured with pk.mode={cfg.pk_mode} and therefore "
                f"requires records with a non-null Struct value, but found "
                f"{nnull} null-value records (RecordValidator.java:74-102 "
                "requiresValue)"
            )


def _unnest(batch: pa.Table, cfg: SinkConfig) -> pa.Table:
    validate_records(batch, cfg)
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
    whitelist = cfg.fields_whitelist_lc
    pk_lc = cfg.pk_fields_lc
    for f in value.type:
        if pa.types.is_struct(f.type) or pa.types.is_list(f.type) or pa.types.is_map(f.type):
            raise ValueError(
                f"passthrough (flatten=false) requires a flat value struct; "
                f"field {f.name} is a container — enable flatten instead"
            )
        name = f.name.lower()
        # key-derived columns win over same-named value fields — the
        # reference skips value fields already in keyFieldNames
        # (FieldsMetadata.java:141-143); this also keeps tombstone PKs
        # intact (their value-side fields are all null)
        if name in cols:
            continue
        # fields.whitelist filters value fields; configured pk fields are
        # key fields and always kept (FieldsMetadata.java:142-152)
        if whitelist and name not in whitelist and not (
            cfg.pk_mode == "record_value" and name in pk_lc
        ):
            continue
        cols[name] = pc.struct_field(value, f.name)
    cols["__part"] = batch.column("partition")
    cols["__off"] = batch.column("offset")
    # tombstone marker: with delete disabled null-value records are skipped
    # (record_key mode; other modes already rejected by the validator)
    tomb = pc.is_null(value)
    if not cfg.delete_enabled:
        return pa.table(cols).filter(pc.invert(tomb))
    cols["__tomb"] = tomb
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


def _key_codes(g: pa.Table, pk: tuple[str, ...]) -> np.ndarray:
    from kafka_connect_jdbc_flatten_ray.stages.merge import (
        _factorize_array,
        _factorize_multi,
    )

    if len(pk) == 1:
        codes, _ = _factorize_array(g.column(pk[0]))
        return codes
    return _factorize_multi(g, pk)


def _ranks(g: pa.Table) -> np.ndarray:
    part = g.column("__part").to_numpy(zero_copy_only=False).astype(np.int64)
    off = g.column("__off").to_numpy(zero_copy_only=False).astype(np.int64)
    return (part << 40) | off


def _last_row_per_key(pk: tuple[str, ...], delete_enabled: bool):
    """Per-bucket last-wins (Arrow-native — value columns are filtered, not
    round-tripped through pandas, so integer types survive tombstone
    nulls): per key take the max-rank row; when the winner is a tombstone
    the key is deleted (BufferedRecords delete-on-null)."""

    def fn(g: pa.Table) -> pa.Table:
        rank = _ranks(g)
        codes = _key_codes(g, pk)
        ng = int(codes.max()) + 1 if len(codes) else 0
        mx = np.full(ng, np.int64(-1))
        np.maximum.at(mx, codes, rank)
        keep = rank == mx[codes]
        if delete_enabled and "__tomb" in g.column_names:
            keep &= ~g.column("__tomb").to_numpy(zero_copy_only=False)
        out = g.filter(pa.array(keep))
        return out.drop_columns(
            [c for c in ("__part", "__off", "__tomb") if c in out.column_names]
        )

    fn.__name__ = "last_row_per_key"
    return fn


def _update_merge(pk: tuple[str, ...], delete_enabled: bool):
    """update-mode merge: rows exist only where the initial table has the
    key; the latest event (if any) overwrites that row's values."""

    def fn(g: pa.Table) -> pa.Table:
        init = g.column("__initial").to_numpy(zero_copy_only=False)
        rank = np.where(init, np.int64(-1), _ranks(g))
        codes = _key_codes(g, pk)
        ng = int(codes.max()) + 1 if len(codes) else 0
        mx = np.full(ng, np.int64(-2))
        np.maximum.at(mx, codes, rank)
        has_init = np.zeros(ng, bool)
        has_init[codes[init]] = True
        keep = (rank == mx[codes]) & has_init[codes]
        if delete_enabled and "__tomb" in g.column_names:
            keep &= ~g.column("__tomb").to_numpy(zero_copy_only=False)
        out = g.filter(pa.array(keep))
        return out.drop_columns(
            [c for c in ("__part", "__off", "__tomb", "__initial")
             if c in out.column_names]
        )

    fn.__name__ = "update_merge"
    return fn


def _bucket_fn(pk: tuple[str, ...], num_buckets: int):
    # Arrow-native row hash (no per-batch pandas round-trip); the bucket
    # column is shuffle-internal only — dropped after the merge, never
    # persisted — so no layout-migration concern here.
    def _bucket(t: pa.Table) -> pa.Table:
        from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash

        h = stable_row_hash(t, pk)
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    return _bucket


def passthrough_table(
    events: ray.data.Dataset,
    cfg: SinkConfig,
    num_buckets: int = 16,
    initial: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Final single-table state of the passthrough sink.

    ``initial`` is the pre-existing target-table state (plain columns, no
    coordinates); required for insert_mode=update, ignored otherwise.
    """
    flat = events.map_batches(
        lambda b: _unnest(b, cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    if cfg.insert_mode == "insert" or cfg.pk_mode == "none":
        drop = ["__part", "__off", "__tomb"]
        return flat.map_batches(
            lambda t: t.drop_columns([c for c in drop if c in t.column_names]),
            batch_format="pyarrow",
        )
    schema = flat.schema()
    pk = _pk_cols(cfg, pa.schema(list(zip(schema.names, schema.types))))

    if cfg.insert_mode == "update":
        if initial is None:
            raise ValueError("insert_mode=update requires the initial table state")
        # a fixed column order + types so the two union sides align
        order = list(schema.names) + ["__initial"]
        types = dict(zip(schema.names, schema.types))

        def _mark_initial(t: pa.Table) -> pa.Table:
            n = t.num_rows
            t = t.append_column("__part", pa.array(np.zeros(n, np.int64)).cast(types["__part"]))
            t = t.append_column("__off", pa.array(np.zeros(n, np.int64)).cast(types["__off"]))
            if "__tomb" in types:
                t = t.append_column("__tomb", pa.array(np.zeros(n, bool)))
            t = t.append_column("__initial", pa.array(np.ones(n, bool)))
            return t.select(order)

        def _mark_event(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__initial", pa.array(np.zeros(t.num_rows, bool))
            ).select(order)

        merged_in = initial.map_batches(_mark_initial, batch_format="pyarrow").union(
            flat.map_batches(_mark_event, batch_format="pyarrow")
        )
        bucketed = merged_in.map_batches(_bucket_fn(pk, num_buckets), batch_format="pyarrow")
        out = bucketed.groupby("__bucket").map_groups(
            _update_merge(pk, cfg.delete_enabled), batch_format="pyarrow"
        )
    else:
        bucketed = flat.map_batches(_bucket_fn(pk, num_buckets), batch_format="pyarrow")
        out = bucketed.groupby("__bucket").map_groups(
            _last_row_per_key(pk, cfg.delete_enabled), batch_format="pyarrow"
        )
    return out.map_batches(
        lambda t: t.drop_columns([c for c in ("__bucket",) if c in t.column_names]),
        batch_format="pyarrow",
    )


def passthrough_to_lake(
    events: ray.data.Dataset,
    cfg: SinkConfig,
    lake_root: str,
    topic: str = "t",
    num_buckets: int = 16,
    initial: ray.data.Dataset | None = None,
) -> tuple[str, dict]:
    """Write the legacy sink's final table state into the lake under its
    table.name.format-resolved name (JdbcDbWriter.destinationTable
    analogue), with the sharded-export manifest for verification."""
    from kafka_connect_jdbc_flatten_ray.functions.naming import destination_table
    from kafka_connect_jdbc_flatten_ray.stages.export import export_corpus

    name = destination_table(cfg, topic)
    state = passthrough_table(events, cfg, num_buckets, initial=initial)
    manifest = export_corpus(state, f"{lake_root}/{name}")
    return name, manifest

"""Sink/engine configuration.

Mirrors the flatten-relevant config surface of the reference's
``JdbcSinkConfig`` (reference: src/main/java/io/confluent/connect/jdbc/sink/
JdbcSinkConfig.java:251-332, 715-776) plus Ray-engine knobs (bucket count,
lake root) that replace the JDBC connection settings.
"""

from __future__ import annotations

from dataclasses import dataclass, field


DEFAULT_COORDINATE_NAMES = (
    "kafkatopic",
    "kafkapartition",
    "kafkaoffset",
    "kafkatimestamp",
    "kafkatimestamp_type",
)


@dataclass(frozen=True)
class SinkConfig:
    """Engine configuration (hashable so plans can be cached per config).

    Validation rules follow JdbcSinkConfig.java:715-776:
    flatten => insert_mode in {insert, upsert}; delete_enabled => pk_mode in
    {record_key, flatten}.
    """

    # --- flatten surface (JdbcSinkConfig.java:251-332) ---
    flatten: bool = True
    flatten_coordinates: bool = True
    # (topic, partition, offset, timestamp, timestamp_type) column names
    coordinate_names: tuple[str, ...] = DEFAULT_COORDINATE_NAMES
    delimiter: str = "_"
    # {"<dotted path>.<field>": "<new name>"} — applied verbatim (no case fold)
    rename_fields: tuple[tuple[str, str], ...] = ()
    # {"<full table name, lowercase delimited>": "<new table name>"}
    rename_tables: tuple[tuple[str, str], ...] = ()
    uppercase: bool = False
    # exact dotted container paths to keep; empty = keep everything
    whitelist: tuple[str, ...] = ()
    instruction_cache_size: int = 100
    # dotted value paths copied from ancestor structs into descendant tables
    pk_propagate_value_fields: tuple[str, ...] = ()

    # --- sink surface ---
    # destination naming for the legacy sink (JdbcSinkConfig.java:89-96,
    # JdbcDbWriter.java:232-242): '${topic}' expands to the record's topic
    table_name_format: str = "${topic}"
    pk_mode: str = "flatten"  # none | kafka | record_key | record_value | flatten
    # W4/W5 (JdbcSinkConfig.java:124-141): disable to refuse creating
    # missing tables / widening stored schemas (DbStructure.java:113-117,
    # amendIfNecessary's auto.evolve error)
    auto_create: bool = True
    auto_evolve: bool = True
    pk_fields: tuple[str, ...] = ()
    insert_mode: str = "upsert"  # insert | upsert | update
    delete_enabled: bool = True
    batch_size: int = 3000  # reference JDBC batch; informational here
    # W6 retry budget (JdbcSinkConfig.java:98-105 max.retries /
    # retry.backoff.ms): surfaced as Ray TASK retries on the flatten/merge
    # stages — a worker or transient failure re-executes the task up to
    # max_retries times, and the tmp+atomic publish keeps re-execution
    # idempotent. Backoff is informational (Ray schedules retries itself).
    max_retries: int = 10
    retry_backoff_ms: int = 3000
    # value-field projection for the legacy sink (JdbcSinkConfig.java:188-196,
    # FieldsMetadata.java:144): empty = all value fields; pk fields always kept
    fields_whitelist: tuple[str, ...] = ()
    # timestamp rendering zone (JdbcSinkConfig.java:218-220 DB_TIMEZONE_CONFIG):
    # coordinate/logical timestamps are written as wall-clock in this zone
    db_timezone: str = "UTC"

    # --- Ray engine knobs (replace JDBC connection config) ---
    num_buckets: int = 32  # hash buckets per table for the merge shuffle
    # merge-exchange IPC payload codec: zstd (default — the sort exchange
    # is byte-bound, so the smallest payload wins end-to-end; measured
    # 14.3s vs lz4's 21.9s on the 10.7M-event bench) | lz4 | none
    envelope_compression: str = "zstd"
    # bucket-assignment hash for the merge shuffle / lake layout.
    # 2 = Arrow-native stable_row_hash (functions/hashing.py); 1 = legacy
    # pandas hash_pandas_object. Recorded in each table manifest's
    # partitioning metadata; run_epoch follows the STORED version on
    # existing lakes so new epochs keep co-locating keys with prior state.
    hash_version: int = 2

    def __post_init__(self) -> None:
        if self.insert_mode not in ("insert", "upsert", "update"):
            raise ValueError(
                f"insert_mode must be insert|upsert|update, got {self.insert_mode}"
            )
        if self.pk_mode not in ("none", "kafka", "record_key", "record_value", "flatten"):
            raise ValueError(f"unknown pk_mode {self.pk_mode}")
        if self.flatten and self.insert_mode not in ("insert", "upsert"):
            # JdbcSinkConfig.java:746-749
            raise ValueError("Flatten only supports insert modes upsert and insert")
        if self.insert_mode == "update" and self.pk_mode == "none":
            raise ValueError("insert_mode=update requires a primary key mode")
        if self.delete_enabled and self.pk_mode not in ("record_key", "flatten"):
            raise ValueError("delete_enabled requires pk_mode record_key or flatten")
        if len(self.coordinate_names) != 5:
            raise ValueError("coordinate_names must have exactly 5 entries")
        if self.envelope_compression not in ("lz4", "zstd", "none"):
            raise ValueError(
                f"envelope_compression must be lz4|zstd|none, got {self.envelope_compression}"
            )

    # Convenience views (tuples keep the dataclass hashable).
    @property
    def rename_fields_map(self) -> dict[str, str]:
        return dict(self.rename_fields)

    @property
    def rename_tables_map(self) -> dict[str, str]:
        return dict(self.rename_tables)

    @property
    def pk_fields_lc(self) -> tuple[str, ...]:
        return tuple(f.strip().lower() for f in self.pk_fields if f.strip())

    @property
    def propagate_fields_lc(self) -> tuple[str, ...]:
        return tuple(f.strip().lower() for f in self.pk_propagate_value_fields if f.strip())

    @property
    def whitelist_lc(self) -> tuple[str, ...]:
        return tuple(w.strip().lower() for w in self.whitelist if w.strip())

    @property
    def fields_whitelist_lc(self) -> tuple[str, ...]:
        return tuple(f.strip().lower() for f in self.fields_whitelist if f.strip())

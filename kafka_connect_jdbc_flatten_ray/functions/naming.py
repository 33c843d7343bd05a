"""Naming functions shared by the flatten plan.

Semantics from the reference (all cited into /root/reference):
- ``ucase``: FlattenTransformation.java:723-725 (lowercase default,
  uppercase when flatten.uppercase).
- ``full_path_delimiter``: FlattenTransformation.java:727-736 (rename-map
  lookup on ``<path>.<field lowercase>`` returned verbatim; else full path
  with dots replaced by the delimiter, or the bare field name).
- ``container_pathname``: FlattenTransformation.java:744-757 (last dot
  segment of the schema name lowercased; literal "root" when unnamed).
- table naming: JdbcDbWriter.java:85-108 (topic dots -> delimiter, plus
  schema name dots -> delimiter, rename_tables override, case fold).
"""

from __future__ import annotations

from kafka_connect_jdbc_flatten_ray.config import SinkConfig


def ucase(cfg: SinkConfig, s: str) -> str:
    return s.upper() if cfg.uppercase else s.lower()


def full_path_delimiter(cfg: SinkConfig, path: str, field_name: str, full_path: bool) -> str:
    """Final column name for a field at ``path`` (dotted, lowercase)."""
    renamed = cfg.rename_fields_map.get(f"{path}.{field_name.lower()}")
    if renamed is not None:
        return renamed
    if full_path:
        return ucase(cfg, path.replace(".", cfg.delimiter) + cfg.delimiter + field_name)
    return ucase(cfg, field_name)


def container_pathname(schema_name: str | None) -> str:
    """Root container name from a schema name ('com.example.Person' -> 'person')."""
    if not schema_name:
        return "root"
    return schema_name.rsplit(".", 1)[-1].lower()


def table_name(cfg: SinkConfig, topic: str, flat_schema_name: str) -> str:
    """Final (renamed, case-folded) lake table name for a flattened schema.

    ``flat_schema_name`` is the dotted container path produced by the plan
    (e.g. 'person.address').
    """
    full = (
        topic.replace(".", cfg.delimiter).lower()
        + cfg.delimiter
        + flat_schema_name.replace(".", cfg.delimiter).lower()
    )
    renamed = cfg.rename_tables_map.get(full)
    if renamed is not None:
        return renamed.upper() if cfg.uppercase else renamed.lower()
    return full.upper() if cfg.uppercase else full.lower()


def destination_table(cfg: SinkConfig, topic: str) -> str:
    """Legacy-sink destination table name (JdbcDbWriter.java:232-242):
    table.name.format with '${topic}' expanded; empty result is a
    configuration error exactly as the reference raises."""
    name = cfg.table_name_format.replace("${topic}", topic)
    if not name:
        raise ValueError(
            f"Destination table name for topic '{topic}' is empty using "
            f"the format string '{cfg.table_name_format}'"
        )
    return name.upper() if cfg.uppercase else name.lower()

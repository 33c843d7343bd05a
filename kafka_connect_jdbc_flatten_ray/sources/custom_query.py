"""Custom-query source mode (S5) — the reference's ``query`` config
(JdbcSourceTask.java:102-111, JdbcSourceConnector_Flatten.java:137-145):
user SQL replaces the table scan, and the connector runs it in a SINGLE
task (query mode is never partitioned across tasks).

Ray analogue: the SQL executes in DuckDB over the directory's Parquet
tables (registered as views, same names the oracle harness uses) and the
result STREAMS into a Dataset as Arrow record batches — each batch is put
into the object store as its own block as it is produced, so the driver
holds only references, and downstream map_batches parallelize over the
blocks even though production is single-tasked (exactly the reference's
shape: one reading task, parallel downstream).

The incrementing criterion composes the same way the reference appends its
WHERE clause to the user query (TimestampIncrementingTableQuerier built
around the query as a subselect): ``source_query_incrementing`` wraps the
user SQL as a subquery and filters ``inc_col > offset``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data

from kafka_connect_jdbc_flatten_ray.sources.discovery import discover_tables


def _connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name, path in discover_tables(sf_dir).items():
        target = path if path.endswith(".parquet") else os.path.join(path, "*.parquet")
        con.execute(
            f'CREATE VIEW "{name}" AS SELECT * FROM read_parquet(\'{target}\')'
        )
    return con


def source_query(
    sql: str, sf_dir: str, batch_size: int = 65536
) -> ray.data.Dataset:
    """Run user SQL over the directory's tables; return a streaming Dataset.

    Single-producer like the reference's query mode; blocks land in the
    object store incrementally (no full-result driver materialization).
    """
    con = _connect(sf_dir)
    reader = con.execute(sql).fetch_record_batch(batch_size)
    refs = []
    schema = reader.schema
    while True:
        try:
            batch = reader.read_next_batch()
        except StopIteration:
            break
        refs.append(ray.put(pa.Table.from_batches([batch])))
    if not refs:
        refs.append(ray.put(schema.empty_table()))
    return ray.data.from_arrow_refs(refs)


def source_query_incrementing(
    sql: str, sf_dir: str, inc_col: str, offset, batch_size: int = 65536
) -> ray.data.Dataset:
    """Query mode + incrementing criterion: the stored offset filters the
    user query exactly as the reference appends its criteria WHERE clause
    around the configured query."""
    wrapped = (
        f'SELECT * FROM ({sql}) AS __user_query '
        f'WHERE "{inc_col}" > ? ORDER BY "{inc_col}"'
    )
    con = _connect(sf_dir)
    reader = con.execute(wrapped, [offset]).fetch_record_batch(batch_size)
    refs = []
    schema = reader.schema
    while True:
        try:
            batch = reader.read_next_batch()
        except StopIteration:
            break
        refs.append(ray.put(pa.Table.from_batches([batch])))
    if not refs:
        refs.append(ray.put(schema.empty_table()))
    return ray.data.from_arrow_refs(refs)

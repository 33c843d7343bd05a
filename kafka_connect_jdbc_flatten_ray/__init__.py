"""kafka_connect_jdbc_flatten_ray — a Ray-Data-native CDC ingest engine.

Reimplements the record-flattening CDC sink semantics of
Norsk-Tipping/kafka-connect-jdbc-flatten (reference at /root/reference) as an
idiomatic Ray Data pipeline:

    change-event tail  ->  map_batches(FlattenStage, batch_format="pyarrow")
                       ->  groupby(table, bucket).map_groups(last_wins merge)
                       ->  partitioned Parquet lake tables

The semantics (what to compute) come from the reference's
``FlattenTransformation`` / ``JdbcDbWriter`` / ``BufferedRecords``; the
execution model (how) is Ray Data streaming over zero-copy Arrow batches.
"""

from kafka_connect_jdbc_flatten_ray.config import SinkConfig

__all__ = ["SinkConfig"]
__version__ = "0.1.0"

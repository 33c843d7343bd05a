"""Driver-facing queries and their DuckDB oracle SQL.

Each query runs a real Ray Data pipeline over ``{sf_dir}/*.parquet``; its
oracle computes the identical result analytically in ANSI SQL from the same
tables (the event-derivation rules in sources/cdc_gen.py are pure integer /
string arithmetic precisely so the oracle can re-derive the FINAL merged
state without replaying — an independent implementation of the semantics).

Column names match the Ray outputs exactly (the driver hashes values under
sorted column names).
"""

from __future__ import annotations

import ray.data

from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean
from kafka_connect_jdbc_flatten_ray.pipelines import ingest
from kafka_connect_jdbc_flatten_ray.sources import queriers

# ---------------------------------------------------------------------------
# Shared SQL fragments
# ---------------------------------------------------------------------------

# the deterministic per-document derivations (must mirror cdc_gen.py)
_D = """
WITH d AS (
  SELECT doc_id, text, lang, source, n_chars,
         doc_id % 3 AS maxv,
         'repo_' || (doc_id % 20) AS repo,
         'src/doc_' || doc_id || '.txt' AS path
  FROM documents
)
"""

_COORDS = """
  'cdc' AS kafkatopic,
  CAST(doc_id % 8 AS INTEGER) AS kafkapartition,
  CAST(doc_id * 4 + {v} AS BIGINT) AS kafkaoffset,
  epoch_ms(1600000000000 + (doc_id * 4 + {v}) * 1000) AS kafkatimestamp,
  'CreateTime' AS kafkatimestamp_type
"""


def _root_select(v: str) -> str:
    return f"""
SELECT
  repo AS filechangekey_repo,
  path AS filechangekey_path,
  repo, path,
  'c' || ((doc_id * 2654435761 + {v}) % 1000000007) AS commit_id,
  lang AS lang,
  CAST({v} AS INTEGER) AS version,
  CAST(n_chars + {v} AS BIGINT) AS "size",
  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  {_COORDS.format(v=v)}
"""


# ---------------------------------------------------------------------------
# CDC flatten pipelines (upsert replay final state)
# ---------------------------------------------------------------------------


# materialized-envelope cache: the 3-4 per-table queries of one config
# variant share a single flatten run (envelopes are small — the compressed
# exchange payloads — so pinning them in the object store is cheap)
_ENV_CACHE: dict = {}


def _cached_env(sf_dir: str, kind: str, build):
    key = (sf_dir, kind)
    if key not in _ENV_CACHE:
        _ENV_CACHE[key] = build().materialize()
    return _ENV_CACHE[key]


def _upsert_state(sf_dir: str, table: str) -> ray.data.Dataset:
    cfg = ingest.default_config()
    plan = ingest.default_plan(cfg)
    env = _cached_env(
        sf_dir, "upsert",
        lambda: ingest.flatten_envelopes(ingest.event_stream(sf_dir), cfg),
    )
    return ingest.table_state(env, plan, table)


def cdc_root_upsert(sf_dir: str) -> ray.data.Dataset:
    """Final state of the root table after full upsert+tombstone replay."""
    return _upsert_state(sf_dir, "cdc_filechange")


def cdc_lines_upsert(sf_dir: str) -> ray.data.Dataset:
    """Final state of the exploded array child table (F4 + W2 clears)."""
    return _upsert_state(sf_dir, "cdc_filechange_lines")


def cdc_attrs_upsert(sf_dir: str) -> ray.data.Dataset:
    """Final state of the exploded map child table (F5 + W2 clears)."""
    return _upsert_state(sf_dir, "cdc_filechange_attrs")


ORACLE_ROOT_UPSERT = _D + _root_select("maxv") + "FROM d WHERE doc_id % 7 <> 0"

ORACLE_LINES_UPSERT = _D + f"""
, l AS (
  SELECT *, string_split(text, chr(10)) AS ls FROM d WHERE doc_id % 7 <> 0
)
SELECT
  repo AS filechangekey_repo,
  path AS filechangekey_path,
  CAST(unnest(range(1, len(ls) + 1)) AS INTEGER) AS lineno,
  unnest(list_transform(ls, x -> 'v' || maxv || ':' || x)) AS line,
  {_COORDS.format(v="maxv")}
FROM l
"""

ORACLE_ATTRS_UPSERT = _D + f"""
SELECT
  repo AS filechangekey_repo,
  path AS filechangekey_path,
  unnest([lang, source]) AS attrs,
  unnest(['lang', 'source']) AS filechange_attrs_key,
  {_COORDS.format(v="maxv")}
FROM d WHERE doc_id % 7 <> 0
"""


# ---------------------------------------------------------------------------
# CDC flatten pipelines (insert mode: every version appended, no tombstones)
# ---------------------------------------------------------------------------


def _insert_state(sf_dir: str, table: str, cfg=None) -> ray.data.Dataset:
    custom = cfg is not None
    cfg = cfg or ingest.default_config(insert_mode="insert", delete_enabled=False)
    plan = ingest.default_plan(cfg)

    def build():
        events = ingest.event_stream(sf_dir, include_tombstones=False)
        return ingest.flatten_envelopes(events, cfg)

    env = build() if custom else _cached_env(sf_dir, "insert", build)
    return ingest.table_state(env, plan, table)


def cdc_root_insert(sf_dir: str) -> ray.data.Dataset:
    """Append-mode root table: one row per (doc, version)."""
    return _insert_state(sf_dir, "cdc_filechange")


def cdc_lines_insert(sf_dir: str) -> ray.data.Dataset:
    return _insert_state(sf_dir, "cdc_filechange_lines")


_V = _D + """
, v AS (
  SELECT d.*, unnest(range(maxv + 1)) AS v FROM d
)
"""

ORACLE_ROOT_INSERT = _V + _root_select("v") + "FROM v"

ORACLE_LINES_INSERT = _V + f"""
, l AS (SELECT *, string_split(text, chr(10)) AS ls FROM v)
SELECT
  repo AS filechangekey_repo,
  path AS filechangekey_path,
  CAST(unnest(range(1, len(ls) + 1)) AS INTEGER) AS lineno,
  unnest(list_transform(ls, x -> 'v' || v || ':' || x)) AS line,
  {_COORDS.format(v="v")}
FROM l
"""


# ---------------------------------------------------------------------------
# Config variants: renames + whitelist (F11-F13), uppercase (F14)
# ---------------------------------------------------------------------------


def cdc_renamed_whitelist(sf_dir: str) -> ray.data.Dataset:
    """Whitelist keeps only root-level leaves; commit_id renamed to sha;
    table renamed to 'files' (JdbcSinkTaskTestPostgresArray.java:773-994)."""
    cfg = ingest.default_config(
        insert_mode="insert",
        delete_enabled=False,
        whitelist=("filechange",),
        rename_fields=(("filechange.commit_id", "sha"),),
        rename_tables=(("cdc_filechange", "files"),),
    )
    return _insert_state(sf_dir, "files", cfg)


ORACLE_RENAMED_WHITELIST = _V + f"""
SELECT
  repo AS filechangekey_repo,
  path AS filechangekey_path,
  repo, path,
  'c' || ((doc_id * 2654435761 + v) % 1000000007) AS sha,
  lang,
  CAST(v AS INTEGER) AS version,
  CAST(n_chars + v AS BIGINT) AS "size",
  {_COORDS.format(v="v")}
FROM v
"""


def cdc_root_upsert_evolved(sf_dir: str) -> ray.data.Dataset:
    """Mid-stream schema evolution (W5): events with version >= 1 carry an
    evolved value schema with a new 'branch' leaf; the merged table gains
    the column with nulls for keys whose last write was generation 1."""
    from kafka_connect_jdbc_flatten_ray.sources.cdc_gen import (
        KEY_SCHEMA_NAME as KN,
        KEY_TYPE,
        VALUE_SCHEMA_NAME as VN,
        VALUE_TYPE_V2,
    )
    from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

    cfg = ingest.default_config()
    plan2 = build_plan(cfg, "cdc", VALUE_TYPE_V2, VN, KEY_TYPE, KN)
    events = ingest.event_stream(sf_dir, evolve_from=1)
    env = ingest.flatten_envelopes(events, cfg)
    return ingest.table_state(env, plan2, "cdc_filechange")


ORACLE_ROOT_UPSERT_EVOLVED = _D + """
SELECT
  repo AS filechangekey_repo,
  path AS filechangekey_path,
  repo, path,
  'c' || ((doc_id * 2654435761 + maxv) % 1000000007) AS commit_id,
  lang AS lang,
  CAST(maxv AS INTEGER) AS version,
  CAST(n_chars + maxv AS BIGINT) AS "size",
  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CASE WHEN maxv >= 1 THEN 'main' ELSE NULL END AS branch,
""" + _COORDS.format(v="maxv") + "FROM d WHERE doc_id % 7 <> 0"


def cdc_root_upsert_tz(sf_dir: str) -> ray.data.Dataset:
    """db.timezone variant (JdbcSinkConfig.java:218-220): the kafkatimestamp
    coordinate is rendered as wall-clock in a +02:00 zone — the
    DateTimeUtils calendar-binding analogue."""
    cfg = ingest.default_config(db_timezone="+02:00")
    plan = ingest.default_plan(cfg)
    env = ingest.flatten_envelopes(ingest.event_stream(sf_dir), cfg)
    return ingest.table_state(env, plan, "cdc_filechange")


ORACLE_ROOT_UPSERT_TZ = ORACLE_ROOT_UPSERT.replace(
    "AS kafkatimestamp,", "+ INTERVAL 2 HOUR AS kafkatimestamp,"
)


def cdc_lines_per_lang(sf_dir: str) -> ray.data.Dataset:
    """The reference's motivating downstream use (README.md:32-34): users
    JOIN flattened child tables back to parents via the propagated PKs.
    Final lines state hash-joined to final root state on the key-PK tuple,
    then line counts per root language."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kafka_connect_jdbc_flatten_ray.stages.joins import hash_join
    from ray.data.aggregate import Sum

    root = _upsert_state(sf_dir, "cdc_filechange").select_columns(
        ["filechangekey_repo", "filechangekey_path", "lang"]
    )
    lines = _upsert_state(sf_dir, "cdc_filechange_lines").select_columns(
        ["filechangekey_repo", "filechangekey_path", "lineno"]
    )
    joined = hash_join(
        lines, root, on=("filechangekey_repo", "filechangekey_path"),
        num_partitions=8,
    )

    def _partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "lang").aggregate([("lineno", "count")])
        return g.rename_columns(["lang", "n_part"])

    agg = joined.map_batches(_partial, batch_format="pyarrow").groupby(
        "lang"
    ).aggregate(Sum("n_part", alias_name="n_lines"))
    return agg.map_batches(
        lambda t: pa.table(
            {"lang": t.column("lang"),
             "n_lines": pc.cast(t.column("n_lines"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


ORACLE_LINES_PER_LANG = _D + """
SELECT lang, CAST(SUM(len(string_split(text, chr(10)))) AS BIGINT) AS n_lines
FROM d WHERE doc_id % 7 <> 0
GROUP BY lang
"""


def cdc_root_upsert_uppercase(sf_dir: str) -> ray.data.Dataset:
    """Uppercase naming variant of the upsert root state
    (JdbcSinkTaskTestPostgresArrayDelete.java:625-809)."""
    cfg = ingest.default_config(uppercase=True)
    plan = ingest.default_plan(cfg)
    env = ingest.flatten_envelopes(ingest.event_stream(sf_dir), cfg)
    return ingest.table_state(env, plan, "CDC_FILECHANGE")


def _uppercase_aliases(sql: str) -> str:
    import re

    return re.sub(r'AS ("?)([a-z_]+)\1', lambda m: f'AS "{m.group(2).upper()}"', sql)


ORACLE_ROOT_UPSERT_UPPERCASE = _uppercase_aliases(ORACLE_ROOT_UPSERT)


# ---------------------------------------------------------------------------
# Debezium binlog/WAL adapter end-to-end (SCALE.md roadmap item 4)
# ---------------------------------------------------------------------------

DEBEZIUM_FLAT_VT = None  # built lazily (pa import at module scope avoided)


def _debezium_value_type():
    import pyarrow as pa

    return pa.struct(
        [
            pa.field("repo", pa.string()),
            pa.field("path", pa.string()),
            pa.field("commit_id", pa.string()),
            pa.field("lang", pa.string()),
            pa.field("version", pa.int32()),
            pa.field("size", pa.int64()),
        ]
    )


def _jsonify_debezium(t):
    """documents batch -> Debezium envelope JSON strings, VECTORIZED via
    string-concat kernels (fields are identifier-safe, no escaping needed):
    one c/u event per version plus a d (delete) envelope for doc_id%7==0,
    using the same partition/offset/ts derivations as cdc_gen."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    lang = t.column("lang").to_numpy(zero_copy_only=False)
    nchars = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
    maxv = did % 3
    # one row per (doc, version) + tombstone rows
    reps = (maxv + 1) + (did % 7 == 0)
    doc = np.repeat(did, reps)
    base = np.concatenate(([0], np.cumsum(reps)[:-1]))
    v = np.arange(int(reps.sum()), dtype=np.int64) - base[np.repeat(
        np.arange(len(did)), reps)]
    is_tomb = v == (np.repeat(maxv, reps) + 1)
    lang_r = np.repeat(lang, reps)
    nchars_r = np.repeat(nchars, reps)
    off = doc * 4 + v
    ts = 1600000000000 + off * 1000
    commit = (doc * 2654435761 + v) % 1000000007

    def s(arr):
        return pa.array(arr.astype(str) if arr.dtype != object else arr, pa.string())

    row = pc.binary_join_element_wise(
        pa.scalar('{"repo":"repo_'), s(doc % 20),
        pa.scalar('","path":"src/doc_'), s(doc),
        pa.scalar('.txt","commit_id":"c'), s(commit),
        pa.scalar('","lang":"'), s(lang_r),
        pa.scalar('","version":'), s(v),
        pa.scalar(',"size":'), s(nchars_r + v),
        pa.scalar("}"), "",
    )
    before = pc.if_else(pa.array(is_tomb), row, pa.scalar("null"))
    after = pc.if_else(pa.array(is_tomb), pa.scalar("null"), row)
    op = pc.if_else(pa.array(is_tomb), pa.scalar('"d"'), pa.scalar('"u"'))
    env = pc.binary_join_element_wise(
        pa.scalar('{"payload":{"before":'), before,
        pa.scalar(',"after":'), after,
        pa.scalar(',"op":'), op,
        pa.scalar(',"ts_ms":'), s(ts),
        pa.scalar("}}"), "",
    )
    return pa.table(
        {
            "topic": pa.array(["cdc"] * len(doc)),
            "partition": pa.array((doc % 8).astype(np.int32)),
            "offset": pa.array(off),
            "json": env,
        }
    )


def debezium_root_upsert(sf_dir: str) -> ray.data.Dataset:
    """Full parity through the Debezium path: synthesize binlog envelopes
    from documents, parse them with the vectorized adapter, then standard
    flatten + last-wins merge of the root table."""
    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.sources.debezium import DebeziumParser
    from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

    vt = _debezium_value_type()
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    raw = docs.map_batches(_jsonify_debezium, batch_format="pyarrow")
    events = raw.map_batches(
        DebeziumParser(vt, ("repo", "path")), batch_format="pyarrow"
    )
    cfg = ingest.default_config()  # pk flatten on filechangekey.repo/path
    kt = pa.struct([pa.field("repo", pa.string()), pa.field("path", pa.string())])
    plan = build_plan(cfg, "cdc", vt, "filechange", kt, "filechangekey")
    env = ingest.flatten_envelopes(
        events, cfg, topic="cdc", value_schema_name="filechange",
        key_schema_name="filechangekey",
    )
    return ingest.table_state(env, plan, "cdc_filechange")


ORACLE_DEBEZIUM_ROOT_UPSERT = _D + """
SELECT
  repo AS filechangekey_repo,
  path AS filechangekey_path,
  repo, path,
  'c' || ((doc_id * 2654435761 + maxv) % 1000000007) AS commit_id,
  lang AS lang,
  CAST(maxv AS INTEGER) AS version,
  CAST(n_chars + maxv AS BIGINT) AS "size",
""" + _COORDS.format(v="maxv") + "FROM d WHERE doc_id % 7 <> 0"


# ---------------------------------------------------------------------------
# Source-code table (input_hint shape)
# ---------------------------------------------------------------------------


def source_code_table(sf_dir: str) -> ray.data.Dataset:
    from kafka_connect_jdbc_flatten_ray.sources.cdc_gen import source_code_batch

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return docs.map_batches(source_code_batch, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SOURCE_CODE = """
SELECT 'repo_' || (doc_id % 20) AS repo,
       'src/doc_' || doc_id || '.txt' AS path,
       'c' || ((doc_id * 2654435761) % 1000000007) AS commit_id,
       lang,
       text AS content
FROM documents
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

ORACLE_SOURCE_BULK = "SELECT event_id, ts, user_id, event_type, value FROM events"

ORACLE_SOURCE_INCREMENTING = """
SELECT event_id, ts, user_id, event_type, value FROM events
WHERE event_id > (SELECT (MIN(event_id) + MAX(event_id)) // 2 FROM events)
"""

ORACLE_SOURCE_TIMESTAMP = """
SELECT event_id, ts, user_id, event_type, value FROM events
WHERE ts > (SELECT MIN(ts) FROM events) + INTERVAL 1 HOUR
  AND ts <= (SELECT MAX(ts) FROM events) - INTERVAL 5 MINUTE
"""

def source_multi_table(sf_dir: str) -> ray.data.Dataset:
    """Multi-table tail (JdbcSourceConnector_Flatten.java:137-170): two
    tables with independent incrementing columns and stored offsets (their
    midpoints), round-robined across tasks, unioned into one stream."""
    from kafka_connect_jdbc_flatten_ray.sources.multi_tail import (
        TableSpec,
        tail_tables,
    )
    from kafka_connect_jdbc_flatten_ray.sources.queriers import _id_bounds

    specs = [
        TableSpec("events", f"{sf_dir}/events.parquet", "event_id"),
        TableSpec("orders", f"{sf_dir}/orders.parquet", "o_orderkey"),
    ]
    offsets = {}
    for spec in specs:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(spec.path)
        md = pf.metadata
        idx = md.schema.to_arrow_schema().get_field_index(spec.inc_col)
        stats = [md.row_group(r).column(idx).statistics for r in range(md.num_row_groups)]
        if any(st is None or not st.has_min_max for st in stats):
            import pyarrow.compute as pc  # stats absent: one-column scan

            col = pf.read(columns=[spec.inc_col]).column(spec.inc_col)
            lo, hi = pc.min(col).as_py(), pc.max(col).as_py()
        else:
            lo = min(st.min for st in stats)
            hi = max(st.max for st in stats)
        offsets[spec.name] = (lo + hi) // 2
    return tail_tables(specs, offsets, max_tasks=2)


ORACLE_SOURCE_MULTI_TABLE = """
SELECT 'events' AS table_name, event_id AS inc_id FROM events
WHERE event_id > (SELECT (MIN(event_id) + MAX(event_id)) // 2 FROM events)
UNION ALL
SELECT 'orders' AS table_name, o_orderkey AS inc_id FROM orders
WHERE o_orderkey > (SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2 FROM orders)
"""


CUSTOM_QUERY_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       round(SUM(value), 3) AS total_value
FROM events GROUP BY user_id
"""


def source_custom_query(sf_dir: str) -> ray.data.Dataset:
    """S5 query mode: user SQL replaces the table scan
    (JdbcSourceTask.java:102-111); single producer, streamed blocks."""
    from kafka_connect_jdbc_flatten_ray.sources.custom_query import source_query

    return source_query(CUSTOM_QUERY_SQL, sf_dir)


ORACLE_SOURCE_TS_INC = """
WITH mid AS (SELECT (MIN(event_id) + MAX(event_id)) // 2 AS i FROM events),
t AS (SELECT MAX(ts) AS t FROM events WHERE event_id <= (SELECT i FROM mid))
SELECT event_id, ts, user_id, event_type, value FROM events
WHERE ts > (SELECT t FROM t)
   OR (ts = (SELECT t FROM t) AND event_id > (SELECT i FROM mid))
"""


def cdc_queries() -> dict:
    return {
        "source_code_table": source_code_table,
        "cdc_root_upsert": cdc_root_upsert,
        "cdc_lines_upsert": cdc_lines_upsert,
        "cdc_attrs_upsert": cdc_attrs_upsert,
        "cdc_root_insert": cdc_root_insert,
        "cdc_lines_insert": cdc_lines_insert,
        "cdc_renamed_whitelist": cdc_renamed_whitelist,
        "cdc_root_upsert_uppercase": cdc_root_upsert_uppercase,
        "cdc_root_upsert_evolved": cdc_root_upsert_evolved,
        "cdc_root_upsert_tz": cdc_root_upsert_tz,
        "debezium_root_upsert": debezium_root_upsert,
        "cdc_lines_per_lang": cdc_lines_per_lang,
        "source_bulk": queriers.source_bulk,
        "source_incrementing": queriers.source_incrementing,
        "source_timestamp": queriers.source_timestamp,
        "source_timestamp_incrementing": queriers.source_timestamp_incrementing,
        "source_multi_table": source_multi_table,
        "source_custom_query": source_custom_query,
    }


def cdc_oracles() -> dict:
    return {
        "source_code_table": ORACLE_SOURCE_CODE,
        "cdc_root_upsert": ORACLE_ROOT_UPSERT,
        "cdc_lines_upsert": ORACLE_LINES_UPSERT,
        "cdc_attrs_upsert": ORACLE_ATTRS_UPSERT,
        "cdc_root_insert": ORACLE_ROOT_INSERT,
        "cdc_lines_insert": ORACLE_LINES_INSERT,
        "cdc_renamed_whitelist": ORACLE_RENAMED_WHITELIST,
        "cdc_root_upsert_uppercase": ORACLE_ROOT_UPSERT_UPPERCASE,
        "cdc_root_upsert_evolved": ORACLE_ROOT_UPSERT_EVOLVED,
        "cdc_root_upsert_tz": ORACLE_ROOT_UPSERT_TZ,
        "debezium_root_upsert": ORACLE_DEBEZIUM_ROOT_UPSERT,
        "cdc_lines_per_lang": ORACLE_LINES_PER_LANG,
        "source_bulk": ORACLE_SOURCE_BULK,
        "source_incrementing": ORACLE_SOURCE_INCREMENTING,
        "source_timestamp": ORACLE_SOURCE_TIMESTAMP,
        "source_timestamp_incrementing": ORACLE_SOURCE_TS_INC,
        "source_multi_table": ORACLE_SOURCE_MULTI_TABLE,
        "source_custom_query": CUSTOM_QUERY_SQL,
    }

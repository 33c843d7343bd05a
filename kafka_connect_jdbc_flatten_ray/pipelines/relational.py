"""Relational/aggregate queries demonstrating the engine's wide-op patterns
(pre-aggregation combiners, windowed aggregates, top-k, distinct) plus the
legacy passthrough sink queries — all with DuckDB oracles.

Pre-aggregation pattern: every groupby here first combines inside
``map_batches`` (one row per key per batch via pyarrow's hash groupby), so
the shuffle moves partial aggregates, not events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from kafka_connect_jdbc_flatten_ray.util import arrowize, read_parquet_clean
from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.pipelines import ingest
from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table


def _events(sf_dir: str, columns) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=columns)


# ---------------------------------------------------------------------------
# grouped aggregate with partial pre-aggregation
# ---------------------------------------------------------------------------


def _partial_by_type(t: pa.Table) -> pa.Table:
    g = pa.TableGroupBy(t, "event_type").aggregate(
        [("event_id", "count"), ("value", "sum")]
    )
    return g.rename_columns(["event_type", "n_part", "sum_part"])


def events_by_type(sf_dir: str) -> ray.data.Dataset:
    ds = _events(sf_dir, ["event_type", "event_id", "value"])
    partial = ds.map_batches(_partial_by_type, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial.groupby("event_type").aggregate(
        Sum("n_part", alias_name="n"), Sum("sum_part", alias_name="sum_value")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "n": pc.cast(t.column("n"), pa.int64()),
                "sum_value": pc.round(t.column("sum_value"), 3),
            }
        ),
        batch_format="pyarrow",
    )


ORACLE_EVENTS_BY_TYPE = """
SELECT event_type, COUNT(*) AS n, round(SUM(value), 3) AS sum_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# tumbling-window aggregate (event-time, exact integers)
# ---------------------------------------------------------------------------


def _partial_hourly(t: pa.Table) -> pa.Table:
    hour = pc.floor_temporal(t.column("ts"), unit="hour")
    g = pa.TableGroupBy(
        pa.table({"user_id": t.column("user_id"), "hour": hour, "x": t.column("event_id")}),
        ["user_id", "hour"],
    ).aggregate([("x", "count")])
    return g.rename_columns(["user_id", "hour", "n_part"])


def user_hourly_counts(sf_dir: str) -> ray.data.Dataset:
    ds = _events(sf_dir, ["user_id", "ts", "event_id"])
    partial = ds.map_batches(_partial_hourly, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial.groupby(["user_id", "hour"]).aggregate(Sum("n_part", alias_name="n"))
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("n"), "n", pc.cast(t.column("n"), pa.int64())
        ),
        batch_format="pyarrow",
    )


ORACLE_USER_HOURLY = """
SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


# ---------------------------------------------------------------------------
# top-k with deterministic tie-break
# ---------------------------------------------------------------------------


def top_users(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    ds = _events(sf_dir, ["user_id", "event_id"])

    def _partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "user_id").aggregate([("event_id", "count")])
        return g.rename_columns(["user_id", "n_part"])

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial.groupby("user_id").aggregate(Sum("n_part", alias_name="n"))
    top = agg.sort(["n", "user_id"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda t: pa.table(
            {"user_id": t.column("user_id"), "n": pc.cast(t.column("n"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


ORACLE_TOP_USERS = """
SELECT user_id, COUNT(*) AS n FROM events
GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# joins: broadcast lookup (small side) and hash join (both sides large)
# ---------------------------------------------------------------------------


def orders_by_segment(sf_dir: str) -> ray.data.Dataset:
    """Broadcast join: orders (large) enriched with customer.mktsegment
    (small side broadcast via ray.put), then pre-aggregated counts."""
    import pyarrow.parquet as pq

    from kafka_connect_jdbc_flatten_ray.stages.joins import broadcast_lookup

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    joined = broadcast_lookup(orders, cust, on="o_custkey", right_on="c_custkey")

    def _partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "c_mktsegment").aggregate([("o_custkey", "count")])
        return g.rename_columns(["c_mktsegment", "n_part"])

    partial = joined.map_batches(_partial, batch_format="pyarrow")
    agg = partial.groupby("c_mktsegment").aggregate(Sum("n_part", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table(
            {"c_mktsegment": t.column("c_mktsegment"),
             "n": pc.cast(t.column("n"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


ORACLE_ORDERS_BY_SEGMENT = """
SELECT c_mktsegment, COUNT(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def lineitem_order_priority(sf_dir: str) -> ray.data.Dataset:
    """Hash join (both sides large): lineitem x orders on orderkey,
    hash-partitioned, then per-priority lineitem counts."""
    from kafka_connect_jdbc_flatten_ray.stages.joins import hash_join

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = hash_join(li, orders, on=("l_orderkey",), right_on=("o_orderkey",),
                       num_partitions=16)

    def _partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "o_orderpriority").aggregate([("l_orderkey", "count")])
        return g.rename_columns(["o_orderpriority", "n_part"])

    partial = joined.map_batches(_partial, batch_format="pyarrow")
    agg = partial.groupby("o_orderpriority").aggregate(Sum("n_part", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table(
            {"o_orderpriority": t.column("o_orderpriority"),
             "n": pc.cast(t.column("n"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


ORACLE_LINEITEM_ORDER_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def distinct_langs(sf_dir: str):
    """Distributed distinct: per-batch pre-dedup, then groupby-count and
    project the key (the groupby aggregate path is solid in ray 2.49,
    unlike Dataset.unique's sparse-block merge — commit 2cd70f5). No
    driver-side value collection."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["lang"])
    partial = ds.map_batches(
        lambda t: pa.table({"lang": pc.unique(t.column("lang").combine_chunks())})
        if isinstance(t.column("lang"), pa.ChunkedArray)
        else pa.table({"lang": pc.unique(t.column("lang"))}),
        batch_format="pyarrow",
    )
    return partial.groupby("lang").count().map_batches(
        lambda t: pa.table({"lang": t.column("lang")}), batch_format="pyarrow"
    )


ORACLE_DISTINCT_LANGS = "SELECT DISTINCT lang FROM documents"


# ---------------------------------------------------------------------------
# legacy passthrough sink (flatten = false)
# ---------------------------------------------------------------------------

_FLAT_FIELDS = ("repo", "path", "commit_id", "lang", "version", "size")


def _project_flat_value(b: pa.Table) -> pa.Table:
    v = b.column("value")
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    arrs = [pc.struct_field(v, f) for f in _FLAT_FIELDS]
    mask = pc.is_null(v)
    flat = pa.StructArray.from_arrays(
        arrs,
        fields=[pa.field(f, a.type) for f, a in zip(_FLAT_FIELDS, arrs)],
        mask=mask if mask.null_count or pc.any(mask).as_py() else None,
    )
    return b.set_column(b.column_names.index("value"), "value", flat)


def passthrough_upsert(sf_dir: str) -> ray.data.Dataset:
    """flatten=false + insert.mode=upsert + pk.mode=record_key: one table,
    last row per key wins (no tombstones in this stream)."""
    cfg = SinkConfig(
        flatten=False, pk_mode="record_key", pk_fields=("repo", "path"),
        insert_mode="upsert", delete_enabled=False,
    )
    events = ingest.event_stream(sf_dir, include_tombstones=False)
    flat = events.map_batches(_project_flat_value, batch_format="pyarrow", zero_copy_batch=True)
    return passthrough_table(flat, cfg)


ORACLE_PASSTHROUGH_UPSERT = """
WITH d AS (
  SELECT doc_id, lang, n_chars, doc_id % 3 AS maxv,
         'repo_' || (doc_id % 20) AS repo,
         'src/doc_' || doc_id || '.txt' AS path
  FROM documents
)
SELECT repo, path,
       'c' || ((doc_id * 2654435761 + maxv) % 1000000007) AS commit_id,
       lang AS lang,
       CAST(maxv AS INTEGER) AS version,
       CAST(n_chars + maxv AS BIGINT) AS "size"
FROM d
"""


def passthrough_insert(sf_dir: str) -> ray.data.Dataset:
    """flatten=false append-only: every version is a row."""
    cfg = SinkConfig(
        flatten=False, pk_mode="none", insert_mode="insert", delete_enabled=False
    )
    events = ingest.event_stream(sf_dir, include_tombstones=False)
    flat = events.map_batches(_project_flat_value, batch_format="pyarrow", zero_copy_batch=True)
    return passthrough_table(flat, cfg)


ORACLE_PASSTHROUGH_INSERT = """
WITH d AS (
  SELECT doc_id, lang, n_chars, doc_id % 3 AS maxv,
         'repo_' || (doc_id % 20) AS repo,
         'src/doc_' || doc_id || '.txt' AS path
  FROM documents
), v AS (SELECT d.*, unnest(range(maxv + 1)) AS v FROM d)
SELECT repo, path,
       'c' || ((doc_id * 2654435761 + v) % 1000000007) AS commit_id,
       lang AS lang,
       CAST(v AS INTEGER) AS version,
       CAST(n_chars + v AS BIGINT) AS "size"
FROM v
"""


def passthrough_upsert_delete(sf_dir: str) -> ray.data.Dataset:
    """flatten=false + upsert + delete.enabled: tombstones (null value, last
    op for doc_id % 7 == 0) delete their key's row
    (BufferedRecords.java:92-101 delete-on-null analogue)."""
    cfg = SinkConfig(
        flatten=False, pk_mode="record_key", pk_fields=("repo", "path"),
        insert_mode="upsert", delete_enabled=True,
    )
    events = ingest.event_stream(sf_dir, include_tombstones=True)
    flat = events.map_batches(_project_flat_value, batch_format="pyarrow", zero_copy_batch=True)
    return passthrough_table(flat, cfg)


ORACLE_PASSTHROUGH_UPSERT_DELETE = ORACLE_PASSTHROUGH_UPSERT + " WHERE doc_id % 7 <> 0"


def passthrough_fields_whitelist(sf_dir: str) -> ray.data.Dataset:
    """fields.whitelist projection (JdbcSinkConfig.java:188-196): only the
    'version' value field survives; the record-key PK columns always do."""
    cfg = SinkConfig(
        flatten=False, pk_mode="record_key", pk_fields=("repo", "path"),
        insert_mode="upsert", delete_enabled=False,
        fields_whitelist=("version",),
    )
    events = ingest.event_stream(sf_dir, include_tombstones=False)
    flat = events.map_batches(_project_flat_value, batch_format="pyarrow", zero_copy_batch=True)
    return passthrough_table(flat, cfg)


ORACLE_PASSTHROUGH_FIELDS_WHITELIST = """
WITH d AS (
  SELECT doc_id, doc_id % 3 AS maxv,
         'repo_' || (doc_id % 20) AS repo,
         'src/doc_' || doc_id || '.txt' AS path
  FROM documents
)
SELECT repo, path, CAST(maxv AS INTEGER) AS version FROM d
"""


def passthrough_update(sf_dir: str) -> ray.data.Dataset:
    """insert.mode=update (JdbcSinkConfig.java:48-51): only keys already in
    the target table are modified. The initial table holds version-0 rows
    for EVEN doc_ids only; the full event stream then updates those keys to
    their max version, while events for odd doc_ids match no row and are
    dropped."""
    import pyarrow as _pa

    cfg = SinkConfig(
        flatten=False, pk_mode="record_key", pk_fields=("repo", "path"),
        insert_mode="update", delete_enabled=False,
    )
    events = ingest.event_stream(sf_dir, include_tombstones=False)
    flat_events = events.map_batches(
        _project_flat_value, batch_format="pyarrow", zero_copy_batch=True
    )

    def _initial_rows(b: pa.Table) -> pa.Table:
        # version-0 events (offset % 4 == 0) of even docs -> plain columns
        off = b.column("offset").to_numpy(zero_copy_only=False)
        doc = off // 4
        sel = b.filter(pa.array((off % 4 == 0) & (doc % 2 == 0)))
        v = sel.column("value")
        if isinstance(v, _pa.ChunkedArray):
            v = v.combine_chunks()
        return pa.table({f: pc.struct_field(v, f) for f in _FLAT_FIELDS})

    initial = events.map_batches(_initial_rows, batch_format="pyarrow")
    return passthrough_table(flat_events, cfg, initial=initial)


ORACLE_PASSTHROUGH_UPDATE = """
WITH d AS (
  SELECT doc_id, lang, n_chars, doc_id % 3 AS maxv,
         'repo_' || (doc_id % 20) AS repo,
         'src/doc_' || doc_id || '.txt' AS path
  FROM documents
)
SELECT repo, path,
       'c' || ((doc_id * 2654435761 + maxv) % 1000000007) AS commit_id,
       lang AS lang,
       CAST(maxv AS INTEGER) AS version,
       CAST(n_chars + maxv AS BIGINT) AS "size"
FROM d WHERE doc_id % 2 = 0
"""


def user_sessions(sf_dir: str) -> ray.data.Dataset:
    """Gap-based session windows (30-min inactivity): one row per
    (user, session) with event count and time bounds. Streaming-window
    analogue expressed as groupby(user).map_groups with in-group sort."""
    from kafka_connect_jdbc_flatten_ray.stages.windows import sessionize

    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    return sessionize(ds, gap_seconds=1800)


ORACLE_USER_SESSIONS = """
WITH x AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 1800 SECOND
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""


def user_sessions_incremental(sf_dir: str) -> ray.data.Dataset:
    """The SAME session windows computed INCREMENTALLY: the event stream is
    split into three event-time epochs and folded one epoch at a time into
    lake-resident per-key session state (stages/streaming_windows.py —
    manifest-committed, CAS-guarded, resumable); closed ∪ open sessions
    must equal the batch computation, so this shares ORACLE_USER_SESSIONS
    verbatim."""
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from kafka_connect_jdbc_flatten_ray.stages import streaming_windows as sw

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_id", "ts"])
    tsi = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
    q1, q2 = np.quantile(tsi, [0.33, 0.66])
    root = tempfile.mkdtemp(prefix="kcjf_sessions_")
    for part in (
        t.filter(pa.array(tsi <= q1)),
        t.filter(pa.array((tsi > q1) & (tsi <= q2))),
        t.filter(pa.array(tsi > q2)),
    ):
        sw.sessionize_epoch(ray.data.from_arrow(part), root, gap_seconds=1800)
    return sw.read_sessions(root).map_batches(
        lambda b: b.select(
            ["user_id", "session_id", "n_events", "session_start", "session_end"]
        ),
        batch_format="pyarrow",
    )


def clicks_asof_purchase(sf_dir: str) -> ray.data.Dataset:
    """AS-OF join within the event stream: each click joined to the most
    recent strictly-earlier purchase's value for the same user."""
    from kafka_connect_jdbc_flatten_ray.stages.windows import asof_join_last_value

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type", "value"])
    return asof_join_last_value(ds)


def clicks_asof_incremental(sf_dir: str) -> ray.data.Dataset:
    """The SAME as-of join computed INCREMENTALLY: three event-time epochs
    folded through tiny lake-resident state (one row per key — the latest
    purchase value; stages/streaming_windows.py). The union of per-epoch
    outputs must equal the batch join, so this shares ORACLE_CLICKS_ASOF
    verbatim."""
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from kafka_connect_jdbc_flatten_ray.stages import streaming_windows as sw

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_id", "ts", "event_type", "value"])
    tsi = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
    q1, q2 = np.quantile(tsi, [0.33, 0.66])
    root = tempfile.mkdtemp(prefix="kcjf_asof_")
    for part in (
        t.filter(pa.array(tsi <= q1)),
        t.filter(pa.array((tsi > q1) & (tsi <= q2))),
        t.filter(pa.array(tsi > q2)),
    ):
        sw.asof_epoch(ray.data.from_arrow(part), root)
    return sw.read_asof(root).map_batches(
        lambda b: b.select(["user_id", "event_id", "ts", "asof_value"]),
        batch_format="pyarrow",
    )


ORACLE_CLICKS_ASOF = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         LAG(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS asof_value
  FROM events
)
SELECT user_id, event_id, ts, asof_value FROM o WHERE event_type = 'click'
"""


def user_trailing_hour(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window aggregate: per event, same-user events in the
    trailing hour (RANGE-window semantics, ts-peers included)."""
    from kafka_connect_jdbc_flatten_ray.stages.windows import trailing_window_counts

    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    return trailing_window_counts(ds, window_seconds=3600)


ORACLE_USER_TRAILING_HOUR = """
SELECT user_id, event_id,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 3600 SECOND PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_trailing
FROM events
"""


def user_trailing_incremental(sf_dir: str) -> ray.data.Dataset:
    """The SAME trailing RANGE window computed INCREMENTALLY: three
    event-time epochs folded through lake-resident state (each key's last
    `window` of events — stages/streaming_windows.py); the union of
    per-epoch counts equals the batch computation, so this shares
    ORACLE_USER_TRAILING_HOUR verbatim."""
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from kafka_connect_jdbc_flatten_ray.stages import streaming_windows as sw

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_id", "ts"])
    tsi = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
    q1, q2 = np.quantile(tsi, [0.33, 0.66])
    root = tempfile.mkdtemp(prefix="kcjf_trailing_")
    for part in (
        t.filter(pa.array(tsi <= q1)),
        t.filter(pa.array((tsi > q1) & (tsi <= q2))),
        t.filter(pa.array(tsi > q2)),
    ):
        sw.trailing_epoch(ray.data.from_arrow(part), root, window_seconds=3600)
    return sw.read_trailing(root).map_batches(
        lambda b: b.select(["user_id", "event_id", "n_trailing"]),
        batch_format="pyarrow",
    )


def stratified_sample_docs(sf_dir: str, per_group: int = 3) -> ray.data.Dataset:
    """Deterministic stratified sample: the ``per_group`` lowest doc_ids of
    each language (class-balanced eval-set carving)."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def _head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id").head(per_group)

    _head.__name__ = "stratum_head"
    return ds.groupby("lang").map_groups(arrowize(_head), batch_format="pandas")


ORACLE_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 3
"""


def top_terms_per_lang(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """Top-k most frequent whitespace tokens per language (count desc,
    token asc tie-break): per-batch (lang, token) pre-aggregation keeps the
    shuffle on partial counts, then a per-lang top-k map_groups."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        rep = pa.table(
            {"lang": pa.array(np.repeat(lang, lens)), "token": flat}
        )
        g = pa.TableGroupBy(rep, ["lang", "token"]).aggregate([("token", "count")])
        return g.rename_columns(["lang", "token", "n_part"])

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = partial.groupby(["lang", "token"]).aggregate(
        Sum("n_part", alias_name="n")
    )

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "token"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["n"] = g["n"].astype(np.int64)
        return g[["lang", "rank", "token", "n"]]

    _topk.__name__ = "lang_topk"
    return counts.groupby("lang").map_groups(arrowize(_topk), batch_format="pandas")


def stratified_sample_incremental(sf_dir: str, per_group: int = 3):
    """Streaming counterpart to stratified_sample_docs: fold the corpus
    in three epochs through a lake-resident per-group min-k state (at
    most k rows per group — the smallest state family), then read the
    sample — min-k of a union is min-k of the per-part min-ks, so any
    epoch split gives the batch answer and the query shares its SQL
    oracle verbatim."""
    import tempfile

    from kafka_connect_jdbc_flatten_ray.stages import streaming_sample as ssm

    root = tempfile.mkdtemp(prefix="kcjf_sample_state_")
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def _part(part: int):
        def _f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"sample_epoch_part_{part}"
        return _f

    for part in range(3):
        ssm.sample_epoch(
            ds.map_batches(_part(part), batch_format="pyarrow",
                           zero_copy_batch=True),
            root, per_group=per_group,
        )
    return ssm.read_sample(root)


def top_terms_incremental(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """Streaming counterpart to top_terms_per_lang: fold the corpus in
    three epochs through a lake-resident (lang, token, count) multiset,
    then top-k over the state — addition is commutative, so any epoch
    split gives the batch answer and the query shares the batch SQL
    oracle verbatim."""
    import tempfile

    from kafka_connect_jdbc_flatten_ray.stages import streaming_terms as st

    root = tempfile.mkdtemp(prefix="kcjf_term_state_")
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def _part(part: int):
        def _f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"term_epoch_part_{part}"
        return _f

    for part in range(3):
        st.term_counts_epoch(
            ds.map_batches(_part(part), batch_format="pyarrow",
                           zero_copy_batch=True),
            root,
        )
    return st.top_terms_from_state(root, k)


ORACLE_TOP_TERMS = """
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
), c AS (
  SELECT lang, token, COUNT(*) AS n FROM t GROUP BY lang, token
)
SELECT lang,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS BIGINT) AS rank,
       token, CAST(n AS BIGINT) AS n
FROM c QUALIFY rank <= 5
"""


def relational_queries() -> dict:
    return {
        "events_by_type": events_by_type,
        "user_hourly_counts": user_hourly_counts,
        "top_users": top_users,
        "distinct_langs": distinct_langs,
        "orders_by_segment": orders_by_segment,
        "lineitem_order_priority": lineitem_order_priority,
        "passthrough_upsert": passthrough_upsert,
        "passthrough_insert": passthrough_insert,
        "passthrough_upsert_delete": passthrough_upsert_delete,
        "passthrough_fields_whitelist": passthrough_fields_whitelist,
        "passthrough_update": passthrough_update,
        "user_sessions": user_sessions,
        "user_sessions_incremental": user_sessions_incremental,
        "clicks_asof_purchase": clicks_asof_purchase,
        "clicks_asof_incremental": clicks_asof_incremental,
        "user_trailing_hour": user_trailing_hour,
        "user_trailing_incremental": user_trailing_incremental,
        "stratified_sample_docs": stratified_sample_docs,
        "top_terms_per_lang": top_terms_per_lang,
        "top_terms_incremental": top_terms_incremental,
        "stratified_sample_incremental": stratified_sample_incremental,
    }


def relational_oracles() -> dict:
    return {
        "events_by_type": ORACLE_EVENTS_BY_TYPE,
        "user_hourly_counts": ORACLE_USER_HOURLY,
        "top_users": ORACLE_TOP_USERS,
        "distinct_langs": ORACLE_DISTINCT_LANGS,
        "orders_by_segment": ORACLE_ORDERS_BY_SEGMENT,
        "lineitem_order_priority": ORACLE_LINEITEM_ORDER_PRIORITY,
        "passthrough_upsert": ORACLE_PASSTHROUGH_UPSERT,
        "passthrough_insert": ORACLE_PASSTHROUGH_INSERT,
        "passthrough_upsert_delete": ORACLE_PASSTHROUGH_UPSERT_DELETE,
        "passthrough_fields_whitelist": ORACLE_PASSTHROUGH_FIELDS_WHITELIST,
        "passthrough_update": ORACLE_PASSTHROUGH_UPDATE,
        "user_sessions": ORACLE_USER_SESSIONS,
        "user_sessions_incremental": ORACLE_USER_SESSIONS,
        "clicks_asof_purchase": ORACLE_CLICKS_ASOF,
        "clicks_asof_incremental": ORACLE_CLICKS_ASOF,
        "user_trailing_hour": ORACLE_USER_TRAILING_HOUR,
        "user_trailing_incremental": ORACLE_USER_TRAILING_HOUR,
        "stratified_sample_docs": ORACLE_STRATIFIED_SAMPLE,
        "top_terms_per_lang": ORACLE_TOP_TERMS,
        # counted-multiset folds are order-independent sums: top-k over
        # the state ranks exactly like the batch pass
        "top_terms_incremental": ORACLE_TOP_TERMS,
        # min-k folds are order-independent: the state read IS the sample
        "stratified_sample_incremental": ORACLE_STRATIFIED_SAMPLE,
    }

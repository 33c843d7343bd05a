"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

No ``ray.init()`` / ``ray.shutdown()`` here or in the library code these
callables use — the driver owns the Ray session.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any

# The driver's correctness harness checks the FIRST 50 queries in dict
# insertion order. Rotate per round so every query gets a driver row at
# least every other round: entries never checked in r2/r3 (passthrough,
# windows, hash join, sampling) come first, queries changed this round
# next, and the long-stable CDC/source family rotates to the back.
_ORDER_R4 = [
    # never driver-checked through r3 (beyond the 50-cap)
    "passthrough_upsert",
    "passthrough_insert",
    "passthrough_upsert_delete",
    "passthrough_fields_whitelist",
    "passthrough_update",
    "user_sessions",
    "user_sessions_incremental",
    "clicks_asof_purchase",
    "clicks_asof_incremental",
    "user_trailing_hour",
    "user_trailing_incremental",
    "lineitem_order_priority",
    "stratified_sample_docs",
    "top_terms_per_lang",
    # changed this round (slim dtype fix; k-means probe oracle)
    "dedup_minhash_pairs_slim",
    "dedup_embedding_pairs_slim",
    "ann_topk_ivf_kmeans",
    # new this round (Gopher repetition metrics; incremental dedup)
    "repetition_stats",
    "dedup_exact_incremental",
    "dedup_minhash_incremental",
    "approx_distinct_incremental",
    "semantic_dedup_keep",
    "value_quantiles",
    "value_quantiles_incremental",
    "contamination_check",
    "contamination_incremental",
    "dedup_embedding_incremental",
    "top_terms_incremental",
    "ann_topk_ivf_incremental",
    "stratified_sample_incremental",
    "tfidf_top_terms",
    "tfidf_incremental",
    "label_centroids",
]


def _rotated(d: dict[str, Any]) -> dict[str, Any]:
    head = {k: d[k] for k in _ORDER_R4 if k in d}
    head.update({k: v for k, v in d.items() if k not in head})
    return head


def entry() -> Any:
    """Flagship pipeline: full CDC ingest epoch (tail -> flatten -> merge ->
    lake commit) on sf0.001; returns the merged root table state."""
    from kafka_connect_jdbc_flatten_ray.pipelines import ingest

    lake = tempfile.mkdtemp(prefix="kcjf_lake_")
    ingest.run_epoch("/root/testdata/sf0.001", lake)
    return ingest.read_lake_table(lake, "cdc_filechange")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from kafka_connect_jdbc_flatten_ray.pipelines import data_queries as dq
    from kafka_connect_jdbc_flatten_ray.pipelines import queries as q
    from kafka_connect_jdbc_flatten_ray.pipelines import relational as rel

    out: dict[str, Callable[[str], Any]] = {}
    out.update(q.cdc_queries())
    out.update(dq.data_queries())
    out.update(rel.relational_queries())
    return _rotated(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (tables pre-registered as views)."""
    from kafka_connect_jdbc_flatten_ray.pipelines import data_queries as dq
    from kafka_connect_jdbc_flatten_ray.pipelines import queries as q
    from kafka_connect_jdbc_flatten_ray.pipelines import relational as rel

    out: dict[str, str] = {}
    out.update(q.cdc_oracles())
    out.update(dq.data_oracles())
    out.update(rel.relational_oracles())
    return _rotated(out)

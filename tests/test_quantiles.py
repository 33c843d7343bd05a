"""Exact distributed quantiles: histogram refinement must reproduce
DuckDB quantile_disc (1-based rank ceil(q*n) of the sorted values)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from kafka_connect_jdbc_flatten_ray.stages.quantiles import quantiles_exact

QS = (0.25, 0.5, 0.9, 0.99)


def _oracle(vals, qs=QS):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS value)",
        [list(map(float, vals))],
    )
    got = con.execute(
        f"SELECT quantile_disc(value, {list(qs)}) FROM t"
    ).fetchone()[0]
    return list(got)


class TestQuantiles:
    def test_random_matches_duckdb(self, ray_session):
        rng = np.random.RandomState(5)
        vals = rng.randn(20_000) * 100
        ds = ray.data.from_arrow(pa.table({"value": vals}))
        got = quantiles_exact(ds, "value", QS)
        assert list(got["value"]) == _oracle(vals)

    def test_duplicate_heavy(self, ray_session):
        rng = np.random.RandomState(6)
        vals = rng.choice([1.0, 2.0, 2.0, 3.0, 100.0], 5_000)
        ds = ray.data.from_arrow(pa.table({"value": vals}))
        got = quantiles_exact(ds, "value", QS)
        assert list(got["value"]) == _oracle(vals)

    def test_constant_column(self, ray_session):
        ds = ray.data.from_arrow(pa.table({"value": [7.0] * 100}))
        got = quantiles_exact(ds, "value", QS)
        assert list(got["value"]) == [7.0] * 4

    def test_nan_rows_ignored(self, ray_session):
        vals = [1.0, float("nan"), 2.0, 3.0, float("nan"), 4.0]
        ds = ray.data.from_arrow(pa.table({"value": vals}))
        got = quantiles_exact(ds, "value", QS)
        clean = [1.0, 2.0, 3.0, 4.0]
        assert list(got["value"]) == _oracle(clean)

    def test_extremes(self, ray_session):
        vals = list(np.arange(1000, dtype=np.float64))
        ds = ray.data.from_arrow(pa.table({"value": vals}))
        got = quantiles_exact(ds, "value", (0.0, 1.0))
        assert list(got["value"]) == [0.0, 999.0]

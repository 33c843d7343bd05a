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


class TestWeightedGuard:
    """The MAX_COLLECT guard bounds COLLECTED ROWS, not multiplicities:
    a pre-aggregated heavy duplicate (counted-multiset state row with a
    huge count) must pass, while the same duplication as raw rows trips."""

    def test_preaggregated_heavy_duplicate_passes(self, ray_session):
        from kafka_connect_jdbc_flatten_ray.stages.quantiles import (
            MAX_COLLECT,
        )

        big = MAX_COLLECT + 15  # one value, multiplicity > the guard
        t = pa.table({"value": [1.0, 2.0, 3.0],
                      "count": pa.array([big, 10, 5], pa.int64())})
        ds = ray.data.from_arrow(t)
        got = quantiles_exact(ds, "value", (0.5, 0.99, 1.0), weight="count")
        # cum: 1.0 -> big, 2.0 -> big+10, 3.0 -> big+15
        assert list(got["value"]) == [1.0, 1.0, 3.0]

    def test_raw_duplication_still_trips(self, ray_session, monkeypatch):
        import kafka_connect_jdbc_flatten_ray.stages.quantiles as qmod

        monkeypatch.setattr(qmod, "MAX_COLLECT", 50)
        vals = [1.0] * 100 + [2.0] * 100
        ds = ray.data.from_arrow(pa.table({"value": vals}))
        import pytest

        with pytest.raises(ValueError, match="rows"):
            qmod.quantiles_exact(ds, "value", (0.5,))

    def test_weighted_rows_bound_not_tripped_by_counts(
        self, ray_session, monkeypatch
    ):
        import kafka_connect_jdbc_flatten_ray.stages.quantiles as qmod

        monkeypatch.setattr(qmod, "MAX_COLLECT", 50)
        # 2 state rows carrying 200 occurrences: collects 2 rows, passes
        t = pa.table({"value": [1.0, 2.0],
                      "count": pa.array([100, 100], pa.int64())})
        got = qmod.quantiles_exact(
            ray.data.from_arrow(t), "value", (0.25, 0.75), weight="count")
        assert list(got["value"]) == [1.0, 2.0]


class TestExactIntCounts:
    def test_hist_partial_exact_past_2_53(self):
        """int64 accumulation: a multiplicity of 2^55+1 must survive the
        histogram exactly (a float64-weighted bincount rounds it away)."""
        from kafka_connect_jdbc_flatten_ray.stages.quantiles import (
            NUM_BINS, _hist_partial,
        )
        from kafka_connect_jdbc_flatten_ray.util import fsl_to_numpy

        big = 2**55 + 1
        t = pa.table({"value": [1.0, 2.0],
                      "count": pa.array([big, 3], pa.int64())})
        out = _hist_partial(t, "value", lo=1.0, width=1.0 / NUM_BINS * 2,
                            weight="count")
        counts = fsl_to_numpy(out.column("counts"), np.int64)[0]
        rows = fsl_to_numpy(out.column("rows"), np.int64)[0]
        assert counts.sum() == big + 3  # exact, not 2**55 + 3
        assert rows.sum() == 2

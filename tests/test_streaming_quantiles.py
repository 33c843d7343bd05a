"""Incremental exact quantiles: counted-multiset epoch folds must equal
the batch refinement (and therefore DuckDB quantile_disc) over the union
of the folded inputs, in any arrival order."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import streaming_quantiles as sq
from kafka_connect_jdbc_flatten_ray.stages.quantiles import quantiles_exact

QS = (0.25, 0.5, 0.9, 0.99)


def _mixed(seed: int, n: int = 12_000) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return np.concatenate([
        rng.randn(n // 3) * 40,                       # continuous
        np.repeat(3.5, n // 3),                       # one hot duplicate
        rng.randint(0, 50, n // 3).astype(np.float64),  # discrete
    ])


def _ds(vals: np.ndarray) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({"value": pa.array(vals)}))


def _fold_parts(vals: np.ndarray, root, order=(0, 1, 2)):
    for part in order:
        sub = vals[np.arange(len(vals)) % 3 == part]
        sq.value_counts_epoch(_ds(sub), str(root), "value")


class TestStreamingQuantiles:
    def test_three_epochs_equal_batch(self, ray_session, tmp_path):
        vals = _mixed(5)
        _fold_parts(vals, tmp_path / "lake")
        inc = sq.quantiles_from_state(str(tmp_path / "lake"), QS)
        batch = quantiles_exact(_ds(vals), "value", QS)
        assert inc.equals(batch)

    def test_epoch_order_does_not_matter(self, ray_session, tmp_path):
        vals = _mixed(6)
        _fold_parts(vals, tmp_path / "a", order=(0, 1, 2))
        _fold_parts(vals, tmp_path / "b", order=(2, 0, 1))
        a = sq.quantiles_from_state(str(tmp_path / "a"), QS)
        b = sq.quantiles_from_state(str(tmp_path / "b"), QS)
        assert a.equals(b)

    def test_weighted_batch_path_matches_unweighted(self, ray_session):
        vals = _mixed(7, 6_000)
        bits, counts = np.unique(vals, return_counts=True)
        weighted = ray.data.from_arrow(pa.table({
            "value": pa.array(bits), "count": pa.array(counts.astype(np.int64)),
        }))
        w = quantiles_exact(weighted, "value", QS, weight="count")
        u = quantiles_exact(_ds(vals), "value", QS)
        assert w.equals(u)

    def test_counts_accumulate_across_epochs(self, ray_session, tmp_path):
        # the same values folded twice double their multiplicity, which
        # must shift ranks exactly like a doubled batch input
        vals = _mixed(8, 3_000)
        root = str(tmp_path / "lake")
        sq.value_counts_epoch(_ds(vals), root, "value")
        sq.value_counts_epoch(_ds(vals), root, "value")
        inc = sq.quantiles_from_state(root, QS)
        batch = quantiles_exact(_ds(np.concatenate([vals, vals])), "value", QS)
        assert inc.equals(batch)

    def test_manifest_lineage_and_stats(self, ray_session, tmp_path):
        vals = _mixed(9, 3_000)
        root = str(tmp_path / "lake")
        r0 = sq.value_counts_epoch(_ds(vals), root, "value")
        r1 = sq.value_counts_epoch(_ds(vals * 2), root, "value")
        assert (r0["epoch"], r1["epoch"]) == (0, 1)
        assert r0["epoch_count"] == len(vals) == r1["epoch_count"]
        assert r1["distinct_values"] >= r0["distinct_values"]
        mc = sq.read_value_counts(root).to_pandas()
        assert int(mc["count"].sum()) == 2 * len(vals)

    def test_nan_rows_ignored(self, ray_session, tmp_path):
        vals = np.array([1.0, np.nan, 2.0, 3.0, np.nan, 4.0])
        root = str(tmp_path / "lake")
        sq.value_counts_epoch(_ds(vals), root, "value")
        inc = sq.quantiles_from_state(root, QS)
        batch = quantiles_exact(_ds(np.array([1.0, 2.0, 3.0, 4.0])),
                                "value", QS)
        assert inc.equals(batch)

    def test_fold_guard_trips_and_claim_released(self, ray_session, tmp_path,
                                                 monkeypatch):
        from kafka_connect_jdbc_flatten_ray.stages import streaming_windows

        monkeypatch.setattr(streaming_windows, "MAX_FOLD_ROWS", 10)
        root = str(tmp_path / "lake")
        with pytest.raises(Exception, match="value_counts_epoch"):
            sq.value_counts_epoch(_ds(_mixed(10, 3_000)), root, "value",
                                  num_buckets=1)
        # the abandoned claim must not block a rerun at sane limits, and
        # the failed epoch's number is reused (manifest never advanced)
        monkeypatch.setattr(streaming_windows, "MAX_FOLD_ROWS", 10_000_000)
        r = sq.value_counts_epoch(_ds(np.array([1.0, 2.0])), root, "value",
                                  num_buckets=1)
        assert r["epoch"] == 0 and r["epoch_count"] == 2

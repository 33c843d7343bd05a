"""Session-window and as-of join operator tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kafka_connect_jdbc_flatten_ray.stages.windows import (
    asof_join_last_value,
    sessionize,
)


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
                "ts": pa.array(
                    np.array(
                        [np.datetime64("2024-01-01T00:00:00", "us")
                         + np.timedelta64(r[1] * 1_000_000, "us") for r in rows]
                    )
                ),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([float(r[3]) for r in rows]),
            }
        )
    )


class TestSessionize:
    def test_gap_splits_sessions(self, ray_session):
        ds = _events([
            (1, 0, "view", 0), (1, 100, "view", 0),      # session 0
            (1, 100 + 1801, "view", 0),                   # gap > 1800 -> session 1
            (2, 0, "view", 0),                            # other user: own session
        ])
        out = sessionize(ds, gap_seconds=1800).take_all()
        got = {(r["user_id"], r["session_id"]): r["n_events"] for r in out}
        assert got == {(1, 0): 2, (1, 1): 1, (2, 0): 1}

    def test_exact_gap_boundary_stays_in_session(self, ray_session):
        ds = _events([(1, 0, "view", 0), (1, 1800, "view", 0)])
        out = sessionize(ds, gap_seconds=1800).take_all()
        assert len(out) == 1 and out[0]["n_events"] == 2


class TestAsofJoin:
    def test_latest_strictly_earlier_right_value(self, ray_session):
        ds = _events([
            (1, 0, "click", 1),          # before any purchase -> NULL
            (1, 10, "purchase", 50),
            (1, 20, "click", 2),         # -> 50
            (1, 30, "purchase", 70),
            (1, 40, "click", 3),         # -> 70
            (2, 5, "click", 4),          # other user, no purchase -> NULL
        ])
        out = {r["event_id"]: r["asof_value"]
               for r in asof_join_last_value(ds).take_all()}
        assert out[0] is None or (isinstance(out[0], float) and np.isnan(out[0]))
        assert out[2] == 50.0 and out[4] == 70.0
        assert out[5] is None or np.isnan(out[5])

    def test_purchase_does_not_see_itself(self, ray_session):
        # a click at the same timestamp as a purchase but later event_id
        # sees it; the purchase itself never self-matches
        ds = _events([(1, 10, "purchase", 9), (1, 10, "click", 0)])
        out = asof_join_last_value(ds).take_all()
        assert len(out) == 1 and out[0]["asof_value"] == 9.0


class TestTrailingWindow:
    def test_range_semantics_include_ts_peers(self, ray_session):
        from kafka_connect_jdbc_flatten_ray.stages.windows import (
            trailing_window_counts,
        )

        ds = _events([
            (1, 0, "view", 0),
            (1, 1800, "view", 0),
            (1, 1800, "view", 0),     # ts peer: both peers count for each other
            (1, 3601, "view", 0),     # first event fell out of the window
        ])
        out = {r["event_id"]: r["n_trailing"]
               for r in trailing_window_counts(ds, window_seconds=3600).take_all()}
        assert out == {0: 1, 1: 3, 2: 3, 3: 3}


def _skewed_events(n=4000, hot_frac=0.8, seed=3):
    """One user owns hot_frac of all events (the pathological key)."""
    rng = np.random.RandomState(seed)
    n_hot = int(n * hot_frac)
    users = np.concatenate([
        np.zeros(n_hot, np.int64),
        rng.randint(1, 50, n - n_hot).astype(np.int64),
    ])
    secs = np.sort(rng.randint(0, 200_000, n))
    types = rng.choice(["click", "purchase", "view"], n, p=[0.5, 0.2, 0.3])
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(
                    (np.datetime64("2024-01-01T00:00:00", "us")
                     + secs.astype("timedelta64[s]")).astype("datetime64[us]")
                ),
                "event_type": pa.array(types),
                "value": pa.array(rng.randint(1, 100, n).astype(np.float64)),
            }
        )
    )


class TestSaltedEquivalence:
    """Time-range salting must be EXACT: a skewed stream (one user = 80% of
    events) produces identical results salted and unsalted."""

    def _sorted(self, ds, cols):
        df = ds.to_pandas().sort_values(cols).reset_index(drop=True)
        return df[sorted(df.columns)]

    def test_sessionize_salted_equals_unsalted(self, ray_session):
        ds = _skewed_events()
        a = self._sorted(sessionize(ds, gap_seconds=300),
                         ["user_id", "session_id"])
        b = self._sorted(sessionize(ds, gap_seconds=300, salt_seconds=3600),
                         ["user_id", "session_id"])
        pd.testing.assert_frame_equal(a, b)

    def test_sessionize_salt_narrower_than_gap(self, ray_session):
        # sessions spanning several EMPTY buckets must still stitch
        ds = _skewed_events()
        a = self._sorted(sessionize(ds, gap_seconds=300),
                         ["user_id", "session_id"])
        b = self._sorted(sessionize(ds, gap_seconds=300, salt_seconds=60),
                         ["user_id", "session_id"])
        pd.testing.assert_frame_equal(a, b)

    def test_trailing_salted_equals_unsalted(self, ray_session):
        from kafka_connect_jdbc_flatten_ray.stages.windows import (
            trailing_window_counts,
        )

        ds = _skewed_events()
        a = self._sorted(trailing_window_counts(ds, window_seconds=600),
                         ["user_id", "event_id"])
        b = self._sorted(
            trailing_window_counts(ds, window_seconds=600, salt_seconds=600),
            ["user_id", "event_id"],
        )
        pd.testing.assert_frame_equal(a, b)

    def test_asof_salted_equals_unsalted(self, ray_session):
        ds = _skewed_events()
        a = self._sorted(asof_join_last_value(ds), ["user_id", "event_id"])
        b = self._sorted(asof_join_last_value(ds, salt_seconds=3600),
                         ["user_id", "event_id"])
        pd.testing.assert_frame_equal(a, b)

    def test_unsalted_guard_is_loud(self, ray_session):
        import pytest as _pytest

        ds = _skewed_events(n=500)
        with _pytest.raises(Exception, match="salt_seconds"):
            sessionize(ds, gap_seconds=300, max_group_rows=100).take_all()

"""Incremental sessionization: epoch-at-a-time folds into lake-resident
state must reproduce batch sessionize over the full stream exactly
(closed ∪ open == batch), under the documented watermark assumption
(per-key time order ACROSS epochs; any order within an epoch)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import streaming_windows as sw
from kafka_connect_jdbc_flatten_ray.stages.windows import sessionize


def _read_events(sf_dir):
    return pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )


def _sorted_df(ds_or_df):
    df = ds_or_df.to_pandas() if hasattr(ds_or_df, "to_pandas") else ds_or_df
    df = df[["user_id", "session_id", "n_events", "session_start", "session_end"]]
    for c in ("session_start", "session_end"):
        df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(["user_id", "session_id"]).reset_index(drop=True)


class TestIncrementalSessionize:
    def test_three_epochs_equal_batch(self, ray_session, sf_dir, tmp_path):
        t = _read_events(sf_dir)
        ts = t.column("ts").to_numpy()
        tsi = ts.astype("datetime64[us]").astype(np.int64)
        q1, q2 = np.quantile(tsi, [0.33, 0.66])
        root = str(tmp_path / "sess")
        parts = [
            t.filter(pa.array(tsi <= q1)),
            t.filter(pa.array((tsi > q1) & (tsi <= q2))),
            t.filter(pa.array(tsi > q2)),
        ]
        for part in parts:
            r = sw.sessionize_epoch(
                ray.data.from_arrow(part), root, gap_seconds=1800
            )
            assert r["buckets"] > 0
        got = _sorted_df(sw.read_sessions(root))
        want = _sorted_df(sessionize(
            ray.data.from_arrow(t), gap_seconds=1800
        ))
        pd.testing.assert_frame_equal(got, want)

    def test_idle_key_carries_state_across_epochs(self, ray_session, tmp_path):
        """A key idle during epoch 2 must keep its open session and, when
        it returns within the gap in epoch 3, CONTINUE it — one session."""
        root = str(tmp_path / "sess")

        def ev(rows):
            return ray.data.from_arrow(pa.table({
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(np.array(
                    [np.datetime64("2024-01-01T00:00:00", "us")
                     + np.timedelta64(r[2], "s") for r in rows])),
            }))

        sw.sessionize_epoch(ev([(1, 0, 0), (2, 1, 0)]), root, gap_seconds=600)
        sw.sessionize_epoch(ev([(2, 2, 300)]), root, gap_seconds=600)  # 1 idle
        sw.sessionize_epoch(ev([(1, 3, 500), (2, 4, 2000)]), root, gap_seconds=600)
        df = _sorted_df(sw.read_sessions(root))
        u1 = df[df.user_id == 1]
        assert len(u1) == 1 and u1.iloc[0]["n_events"] == 2  # continued
        u2 = df[df.user_id == 2]
        assert list(u2["session_id"]) == [0, 1]  # gap at t=2000 closed s0
        assert list(u2["n_events"]) == [2, 1]

    def test_gap_across_epochs_closes_and_renumbers(self, ray_session, tmp_path):
        root = str(tmp_path / "sess")

        def ev(rows):
            return ray.data.from_arrow(pa.table({
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(np.array(
                    [np.datetime64("2024-01-01T00:00:00", "us")
                     + np.timedelta64(r[2], "s") for r in rows])),
            }))

        sw.sessionize_epoch(ev([(7, 0, 0), (7, 1, 100)]), root, gap_seconds=300)
        sw.sessionize_epoch(ev([(7, 2, 1000), (7, 3, 1100)]), root, gap_seconds=300)
        df = _sorted_df(sw.read_sessions(root))
        assert list(df["session_id"]) == [0, 1]
        assert list(df["n_events"]) == [2, 2]
        # second fold opened manifest epoch 1 with a closed file
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        m = TableManifest(root, sw.STATE_TABLE).load()
        assert m["epoch"] == 1
        assert any(m["deltas"].values())

    def test_epoch_commit_is_cas_guarded(self, ray_session, tmp_path):
        import posixpath

        from kafka_connect_jdbc_flatten_ray.state import fs as fsx
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        root = str(tmp_path / "sess")
        ev = ray.data.from_arrow(pa.table({
            "user_id": pa.array([1], pa.int64()),
            "event_id": pa.array([0], pa.int64()),
            "ts": pa.array(np.array([np.datetime64("2024-01-01", "us")])),
        }))
        sw.sessionize_epoch(ev, root)
        m = TableManifest(root, sw.STATE_TABLE)
        marker = posixpath.join(m.dir, "_epochs", "epoch-000001.json")
        fsx.create_exclusive(m.fs, marker, b"{}")  # rival writer claims 1
        with pytest.raises(fsx.ConcurrentWriteError):
            sw.sessionize_epoch(ev, root)


class TestIncrementalAsof:
    def test_three_epochs_equal_batch(self, ray_session, sf_dir, tmp_path):
        from kafka_connect_jdbc_flatten_ray.stages.windows import (
            asof_join_last_value,
        )

        t = pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_id", "ts", "event_type", "value"],
        )
        tsi = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        q1, q2 = np.quantile(tsi, [0.33, 0.66])
        root = str(tmp_path / "asof")
        for part in (
            t.filter(pa.array(tsi <= q1)),
            t.filter(pa.array((tsi > q1) & (tsi <= q2))),
            t.filter(pa.array(tsi > q2)),
        ):
            sw.asof_epoch(ray.data.from_arrow(part), root)
        cols = ["user_id", "event_id", "ts", "asof_value"]
        got = sw.read_asof(root).to_pandas()[cols].sort_values(
            ["user_id", "event_id"]).reset_index(drop=True)
        want = asof_join_last_value(ray.data.from_arrow(t)).to_pandas()[
            cols].sort_values(["user_id", "event_id"]).reset_index(drop=True)
        for df in (got, want):
            df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        pd.testing.assert_frame_equal(got, want)

    def test_carry_in_spans_idle_epochs(self, ray_session, tmp_path):
        root = str(tmp_path / "asof")

        def ev(rows):
            return ray.data.from_arrow(pa.table({
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(np.array(
                    [np.datetime64("2024-01-01T00:00:00", "us")
                     + np.timedelta64(r[2], "s") for r in rows])),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([float(r[4]) for r in rows]),
            }))

        sw.asof_epoch(ev([(1, 0, 0, "purchase", 42), (2, 1, 0, "click", 0)]), root)
        sw.asof_epoch(ev([(2, 2, 100, "purchase", 7)]), root)  # user 1 idle
        sw.asof_epoch(ev([(1, 3, 500, "click", 0), (2, 4, 600, "click", 0)]), root)
        df = sw.read_asof(root).to_pandas().set_index("event_id")
        assert df.loc[3, "asof_value"] == 42.0  # carried across idle epoch
        assert df.loc[4, "asof_value"] == 7.0
        assert np.isnan(df.loc[1, "asof_value"])  # click before any purchase


class TestIncrementalTrailing:
    def test_three_epochs_equal_batch(self, ray_session, sf_dir, tmp_path):
        from kafka_connect_jdbc_flatten_ray.stages.windows import (
            trailing_window_counts,
        )

        t = pq.read_table(f"{sf_dir}/events.parquet",
                          columns=["user_id", "event_id", "ts"])
        tsi = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        q1, q2 = np.quantile(tsi, [0.33, 0.66])
        root = str(tmp_path / "trail")
        for part in (
            t.filter(pa.array(tsi <= q1)),
            t.filter(pa.array((tsi > q1) & (tsi <= q2))),
            t.filter(pa.array(tsi > q2)),
        ):
            sw.trailing_epoch(ray.data.from_arrow(part), root)
        cols = ["user_id", "event_id", "n_trailing"]
        got = sw.read_trailing(root).to_pandas()[cols].sort_values(
            ["user_id", "event_id"]).reset_index(drop=True)
        want = trailing_window_counts(ray.data.from_arrow(t)).to_pandas()[
            cols].sort_values(["user_id", "event_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_window_reaches_into_prior_epoch(self, ray_session, tmp_path):
        root = str(tmp_path / "trail")

        def ev(rows):
            return ray.data.from_arrow(pa.table({
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(np.array(
                    [np.datetime64("2024-01-01T00:00:00", "us")
                     + np.timedelta64(r[2], "s") for r in rows])),
            }))

        sw.trailing_epoch(ev([(1, 0, 0), (1, 1, 100)]), root, window_seconds=600)
        # event at t=500: window [−100, 500] covers both prior events
        sw.trailing_epoch(ev([(1, 2, 500)]), root, window_seconds=600)
        # event at t=5000: none of the old events within 600s
        sw.trailing_epoch(ev([(1, 3, 5000)]), root, window_seconds=600)
        df = sw.read_trailing(root).to_pandas().set_index("event_id")
        assert list(df.loc[[0, 1, 2, 3], "n_trailing"]) == [1, 2, 3, 1]


class TestPropertyEquivalence:
    def test_random_streams_random_splits(self, ray_session, tmp_path):
        """Property check: for random event streams and random epoch cut
        points, all three incremental operators equal their batch
        counterparts (events within an epoch are shuffled — only the
        cross-epoch per-key time order is preserved, as documented)."""
        from kafka_connect_jdbc_flatten_ray.stages.windows import (
            asof_join_last_value,
            sessionize,
            trailing_window_counts,
        )

        for seed in range(6):
            rng = np.random.RandomState(seed)
            n = 400
            users = rng.randint(0, 12, n)
            secs = np.sort(rng.randint(0, 50_000, n))
            types = rng.choice(["click", "purchase", "view"], n)
            t = pa.table({
                "user_id": pa.array(users.astype(np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(
                    (np.datetime64("2024-01-01T00:00:00", "us")
                     + secs.astype("timedelta64[s]")).astype("datetime64[us]")),
                "event_type": pa.array(types),
                "value": pa.array(rng.randint(1, 50, n).astype(np.float64)),
            })
            n_epochs = int(rng.randint(2, 5))
            cuts = np.sort(rng.choice(np.arange(1, n), n_epochs - 1, replace=False))
            bounds = [0, *cuts.tolist(), n]
            roots = {op: str(tmp_path / f"s{seed}_{op}")
                     for op in ("sess", "asof", "trail")}
            full = ray.data.from_arrow(t)
            for e in range(n_epochs):
                part = t.slice(bounds[e], bounds[e + 1] - bounds[e])
                # shuffle WITHIN the epoch: the fold must sort
                perm = rng.permutation(part.num_rows)
                part = part.take(pa.array(perm))
                ds = ray.data.from_arrow(part)
                sw.sessionize_epoch(ds, roots["sess"], gap_seconds=900)
                sw.asof_epoch(ds, roots["asof"])
                sw.trailing_epoch(ds, roots["trail"], window_seconds=1200)
            sc = ["user_id", "session_id", "n_events",
                  "session_start", "session_end"]
            got = sw.read_sessions(roots["sess"]).to_pandas()[sc]
            want = sessionize(full, gap_seconds=900).to_pandas()[sc]
            for df in (got, want):
                for c in ("session_start", "session_end"):
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            pd.testing.assert_frame_equal(
                got.sort_values(sc[:2]).reset_index(drop=True),
                want.sort_values(sc[:2]).reset_index(drop=True),
            )
            ac = ["user_id", "event_id", "asof_value"]
            got = sw.read_asof(roots["asof"]).to_pandas()[ac].sort_values(
                ac[:2]).reset_index(drop=True)
            want = asof_join_last_value(full).to_pandas()[ac].sort_values(
                ac[:2]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want)
            tc = ["user_id", "event_id", "n_trailing"]
            got = sw.read_trailing(roots["trail"]).to_pandas()[tc].sort_values(
                tc[:2]).reset_index(drop=True)
            want = trailing_window_counts(
                full, window_seconds=1200).to_pandas()[tc].sort_values(
                tc[:2]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want)


class TestLateFoldExactness:
    """The round-3 advisor repro cases: epoch events older than the stored
    open session's END must be flagged late, and a late-but-folded event
    must never regress the stored end."""

    def _ev(self, rows):
        return ray.data.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(np.array(
                [np.datetime64("2024-01-01T00:00:00", "us")
                 + np.timedelta64(r[2], "s") for r in rows])),
        }))

    def test_end_never_regresses(self, ray_session, tmp_path):
        # state {start 0, end 500, n 2}; epoch event at t=400 (< stored
        # end) is LATE, and under count-policy the fold keeps end=500
        root = str(tmp_path / "s")
        sw.sessionize_epoch(self._ev([(1, 0, 0), (1, 1, 500)]), root,
                            gap_seconds=600)
        r = sw.sessionize_epoch(self._ev([(1, 2, 400)]), root, gap_seconds=600)
        assert r["late_events"] == 1
        df = sw.read_sessions(root).to_pandas()
        assert len(df) == 1
        assert df.iloc[0]["session_end"] == pd.Timestamp("2024-01-01T00:08:20")
        assert df.iloc[0]["n_events"] == 3

    def test_bridging_case_is_flagged_late(self, ray_session, tmp_path):
        # state {start 0, end 500, n 2}; epoch events at 300 and 1000 —
        # batch would bridge them through the stored event at 500 into ONE
        # session; the fold cannot know that, so the t=300 row must be late
        root = str(tmp_path / "s")
        sw.sessionize_epoch(self._ev([(1, 0, 0), (1, 1, 500)]), root,
                            gap_seconds=600)
        r = sw.sessionize_epoch(self._ev([(1, 2, 300), (1, 3, 1000)]), root,
                                gap_seconds=600)
        assert r["late_events"] == 1  # silent divergence is gone

    def test_on_time_exact_at_stored_end(self, ray_session, tmp_path):
        # an event exactly AT the stored end is on time and folds exactly
        root = str(tmp_path / "s")
        sw.sessionize_epoch(self._ev([(1, 0, 0), (1, 1, 500)]), root,
                            gap_seconds=600)
        r = sw.sessionize_epoch(self._ev([(1, 2, 500)]), root, gap_seconds=600)
        assert r["late_events"] == 0
        df = sw.read_sessions(root).to_pandas()
        assert len(df) == 1 and df.iloc[0]["n_events"] == 3


class TestQuarantinePolicy:
    def _ev(self, rows):
        return ray.data.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(np.array(
                [np.datetime64("2024-01-01T00:00:00", "us")
                 + np.timedelta64(r[2], "s") for r in rows])),
            "event_type": pa.array([r[3] if len(r) > 3 else "click"
                                    for r in rows]),
            "value": pa.array([float(r[4]) if len(r) > 4 else 0.0
                               for r in rows]),
        }))

    def test_sessionize_on_time_stays_batch_equal(self, ray_session, tmp_path):
        """3 epochs with deliberately late events: the on-time output must
        equal batch sessionize over the on-time events alone, and the
        quarantine must hold exactly the late rows."""
        root = str(tmp_path / "s")
        sw.sessionize_epoch(
            self._ev([(1, 0, 0), (1, 1, 500), (2, 2, 100)]), root,
            gap_seconds=600, late_policy="quarantine")
        r = sw.sessionize_epoch(
            self._ev([(1, 3, 400), (1, 4, 900), (2, 5, 300)]), root,
            gap_seconds=600, late_policy="quarantine")
        assert r["late_events"] == 1  # event 3 (t=400 < stored end 500)
        r = sw.sessionize_epoch(
            self._ev([(2, 6, 200), (1, 7, 2000)]), root,
            gap_seconds=600, late_policy="quarantine")
        assert r["late_events"] == 1  # event 6 (t=200 < stored end 300)
        on_time = self._ev([(1, 0, 0), (1, 1, 500), (2, 2, 100),
                            (1, 4, 900), (2, 5, 300), (1, 7, 2000)])
        got = _sorted_df(sw.read_sessions(root))
        want = _sorted_df(sessionize(on_time, gap_seconds=600))
        pd.testing.assert_frame_equal(got, want)
        q = sw.read_quarantine(root).to_pandas()
        assert sorted(q["event_id"]) == [3, 6]

    def test_asof_quarantine(self, ray_session, tmp_path):
        root = str(tmp_path / "a")
        sw.asof_epoch(self._ev([(1, 0, 1000, "purchase", 5)]), root,
                      late_policy="quarantine")
        r = sw.asof_epoch(
            self._ev([(1, 1, 100, "click", 0), (1, 2, 1500, "click", 0)]),
            root, late_policy="quarantine")
        assert r["late_events"] == 1
        df = sw.read_asof(root).to_pandas().set_index("event_id")
        assert list(df.index) == [2]  # the late click never joined
        assert df.loc[2, "asof_value"] == 5.0
        q = sw.read_quarantine(root, sw.ASOF_TABLE).to_pandas()
        assert list(q["event_id"]) == [1]

    def test_trailing_quarantine(self, ray_session, tmp_path):
        root = str(tmp_path / "t")
        sw.trailing_epoch(self._ev([(1, 0, 1000)]), root, window_seconds=600,
                          late_policy="quarantine")
        r = sw.trailing_epoch(self._ev([(1, 1, 100), (1, 2, 1200)]), root,
                              window_seconds=600, late_policy="quarantine")
        assert r["late_events"] == 1
        df = sw.read_trailing(root).to_pandas().set_index("event_id")
        # late event 1 neither emitted nor counted in event 2's window
        assert list(df.loc[[0, 2], "n_trailing"]) == [1, 2]
        assert 1 not in df.index
        q = sw.read_quarantine(root, sw.TRAILING_TABLE).to_pandas()
        assert list(q["event_id"]) == [1]

    def test_error_policy_releases_claim_for_rerun(self, ray_session, tmp_path):
        root = str(tmp_path / "s")
        sw.sessionize_epoch(self._ev([(1, 0, 5000)]), root, gap_seconds=600)
        with pytest.raises(ValueError, match="late events"):
            sw.sessionize_epoch(self._ev([(1, 1, 0)]), root, gap_seconds=600,
                                late_policy="error")
        # the failed epoch's claim was released: a rerun (quarantine) works
        r = sw.sessionize_epoch(self._ev([(1, 1, 0)]), root, gap_seconds=600,
                                late_policy="quarantine")
        assert r["late_events"] == 1 and r["epoch"] == 1


class TestBucketLayout:
    def _ev(self, rows):
        return ray.data.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(np.array(
                [np.datetime64("2024-01-01T00:00:00", "us")
                 + np.timedelta64(r[2], "s") for r in rows])),
        }))

    def test_stored_num_buckets_wins(self, ray_session, tmp_path):
        """Folding a later epoch with a DIFFERENT num_buckets argument must
        not mis-route keys: the manifest's recorded layout wins."""
        root = str(tmp_path / "s")
        rows1 = [(u, u, 0) for u in range(20)]
        rows2 = [(u, 100 + u, 300) for u in range(20)]
        sw.sessionize_epoch(self._ev(rows1), root, gap_seconds=600,
                            num_buckets=4)
        sw.sessionize_epoch(self._ev(rows2), root, gap_seconds=600,
                            num_buckets=16)  # ignored: stored layout is 4
        df = _sorted_df(sw.read_sessions(root))
        want = _sorted_df(sessionize(self._ev(rows1 + rows2), gap_seconds=600))
        pd.testing.assert_frame_equal(df, want)
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        m = TableManifest(root, sw.STATE_TABLE).load()
        assert m["partitioning"]["num_buckets"] == 4

    def test_reshard_then_fold(self, ray_session, tmp_path):
        root = str(tmp_path / "s")
        rows1 = [(u, u, 0) for u in range(30)]
        rows2 = [(u, 100 + u, 300) for u in range(30)]
        rows3 = [(u, 200 + u, 2000) for u in range(30)]
        sw.sessionize_epoch(self._ev(rows1), root, gap_seconds=600,
                            num_buckets=2)
        sw.sessionize_epoch(self._ev(rows2), root, gap_seconds=600)
        r = sw.reshard_state(root, sw.STATE_TABLE, 8)
        assert r["num_buckets"] == 8
        sw.sessionize_epoch(self._ev(rows3), root, gap_seconds=600)
        df = _sorted_df(sw.read_sessions(root))
        want = _sorted_df(sessionize(self._ev(rows1 + rows2 + rows3),
                                     gap_seconds=600))
        pd.testing.assert_frame_equal(df, want)

    def test_fold_guard_trips(self, ray_session, tmp_path, monkeypatch):
        monkeypatch.setattr(sw, "MAX_FOLD_ROWS", 3)
        root = str(tmp_path / "s")
        rows = [(1, i, i) for i in range(10)]
        with pytest.raises(Exception, match="reshard_state"):
            sw.sessionize_epoch(self._ev(rows), root, num_buckets=1)


class TestLateEventPolicy:
    def _ev(self, rows):
        return ray.data.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(np.array(
                [np.datetime64("2024-01-01T00:00:00", "us")
                 + np.timedelta64(r[2], "s") for r in rows])),
            "event_type": pa.array([r[3] if len(r) > 3 else "click"
                                    for r in rows]),
            "value": pa.array([float(r[4]) if len(r) > 4 else 0.0
                               for r in rows]),
        }))

    def test_sessionize_counts_and_errors(self, ray_session, tmp_path):
        root = str(tmp_path / "s")
        r = sw.sessionize_epoch(self._ev([(1, 0, 5000)]), root, gap_seconds=600)
        assert r["late_events"] == 0
        # an event 2h older than the stored session start - gap is late
        r = sw.sessionize_epoch(self._ev([(1, 1, 0)]), root, gap_seconds=600)
        assert r["late_events"] == 1
        root2 = str(tmp_path / "s2")
        sw.sessionize_epoch(self._ev([(1, 0, 5000)]), root2, gap_seconds=600)
        with pytest.raises(ValueError, match="late events"):
            sw.sessionize_epoch(self._ev([(1, 2, 0)]), root2, gap_seconds=600,
                                late_policy="error")

    def test_asof_watermark(self, ray_session, tmp_path):
        root = str(tmp_path / "a")
        r = sw.asof_epoch(self._ev([(1, 0, 5000, "purchase", 9)]), root)
        assert r["late_events"] == 0
        r = sw.asof_epoch(self._ev([(1, 1, 100, "click", 0)]), root)
        assert r["late_events"] == 1  # older than the watermark
        with pytest.raises(ValueError, match="late events"):
            sw.asof_epoch(self._ev([(1, 2, 100, "click", 0)]), root,
                          late_policy="error")

    def test_trailing_watermark(self, ray_session, tmp_path):
        root = str(tmp_path / "t")
        r = sw.trailing_epoch(self._ev([(1, 0, 5000)]), root, window_seconds=600)
        assert r["late_events"] == 0
        r = sw.trailing_epoch(self._ev([(1, 1, 100)]), root, window_seconds=600)
        assert r["late_events"] == 1
        with pytest.raises(ValueError, match="late events"):
            sw.trailing_epoch(self._ev([(1, 2, 100)]), root,
                              window_seconds=600, late_policy="error")

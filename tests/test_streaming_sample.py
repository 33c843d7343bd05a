"""Incremental stratified sample: per-group min-k epoch folds must equal
the batch sample over the union of the folded inputs, in any arrival
order, under re-delivery, and despite routing-hash collisions."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import streaming_sample as ssm


def _docs(ids, langs):
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(langs, pa.string()),
    })


def _corpus(seed=5, n=120):
    rng = np.random.default_rng(seed)
    return _docs(rng.permutation(n * 3)[:n],
                 rng.choice(["en", "de", "fr", "pt"], n))


def _batch(tbl, k=3):
    df = tbl.to_pandas()
    return df.sort_values(["lang", "doc_id"]).groupby("lang").head(k) \
        .sort_values(["lang", "doc_id"]).reset_index(drop=True)


def _inc(root):
    return ssm.read_sample(str(root)).to_pandas() \
        .sort_values(["lang", "doc_id"]).reset_index(drop=True)[["doc_id", "lang"]]


def _fold_thirds(tbl, root, order=(0, 1, 2), k=3):
    ids = tbl.column("doc_id").to_numpy()
    for p in order:
        ssm.sample_epoch(
            ray.data.from_arrow(tbl.filter(pa.array(ids % 3 == p))),
            str(root), per_group=k)


class TestStreamingSample:
    def test_three_epochs_equal_batch(self, ray_session, tmp_path):
        tbl = _corpus()
        _fold_thirds(tbl, tmp_path / "lake")
        assert _inc(tmp_path / "lake").equals(_batch(tbl))

    def test_order_and_redelivery(self, ray_session, tmp_path):
        tbl = _corpus(6)
        _fold_thirds(tbl, tmp_path / "a", (2, 0, 1, 0))  # epoch 0 twice
        _fold_thirds(tbl, tmp_path / "b", (0, 1, 2))
        assert _inc(tmp_path / "a").equals(_inc(tmp_path / "b"))
        assert _inc(tmp_path / "a").equals(_batch(tbl))

    def test_k_mismatch_refused(self, ray_session, tmp_path):
        tbl = _corpus(7)
        root = str(tmp_path / "lake")
        ssm.sample_epoch(ray.data.from_arrow(tbl), root, per_group=3)
        with pytest.raises(ValueError, match="per_group=3"):
            ssm.sample_epoch(ray.data.from_arrow(tbl), root, per_group=5)

    def test_hash_collision_does_not_merge_groups(self, ray_session,
                                                  tmp_path, monkeypatch):
        from kafka_connect_jdbc_flatten_ray.stages import streaming_sample

        monkeypatch.setattr(
            streaming_sample, "stable_row_hash",
            lambda tbl, cols: np.full(tbl.num_rows, 7, np.uint64))
        tbl = _docs([5, 1, 9, 2, 8], ["en", "en", "en", "de", "de"])
        root = str(tmp_path / "lake")
        ssm.sample_epoch(ray.data.from_arrow(tbl), root, per_group=2)
        got = _inc(root)
        assert list(map(tuple, got.to_records(index=False))) == [
            (2, "de"), (8, "de"), (1, "en"), (5, "en"),
        ]

    def test_state_is_k_rows_per_group(self, ray_session, tmp_path):
        tbl = _corpus(8, 200)
        root = str(tmp_path / "lake")
        _fold_thirds(tbl, root, k=3)
        n_langs = len(set(tbl.column("lang").to_pylist()))
        assert ssm.read_sample(root).count() == 3 * n_langs

"""Multimodal stage tests: fake-container decode plumbing over Ray."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import multimodal as mm


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).slice(0, 50)


class TestDecodeImage:
    def test_decode_shapes(self, ray_session, docs):
        media = mm.synthesize_media(docs, "image")
        ds = ray.data.from_arrow(media)
        out = ds.map_batches(
            mm.DecodeImage, batch_format="pyarrow", batch_size=16, concurrency=2
        ).take_all()
        assert len(out) == 50
        for r in out[:10]:
            assert r["width"] == 8 + r["media_id"] % 24
            assert r["height"] == 6 + r["media_id"] % 18
            assert len(r["pixel_hist"]) == 16
            assert sum(r["pixel_hist"]) == r["width"] * r["height"]

    def test_non_fake_payload_raises(self, docs):
        bad = pa.table(
            {"media_id": [1], "media_type": ["image"],
             "media": pa.array([b"not-an-image"], pa.large_binary())}
        )
        with pytest.raises(NotImplementedError):
            mm.DecodeImage()(bad)


class TestFrameSample:
    def test_sampling(self, ray_session, docs):
        media = mm.synthesize_media(docs, "video")
        out = ray.data.from_arrow(media).map_batches(
            mm.FrameSample, fn_constructor_args=(2,),
            batch_format="pyarrow", batch_size=16, concurrency=2,
        ).take_all()
        by_id = {}
        for r in out:
            by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
        for mid, idxs in by_id.items():
            n_frames = 4 + mid % 8
            assert sorted(idxs) == list(range(0, n_frames, 2))
        assert all(len(r["frame"]) == 64 for r in out)


class TestAudioFeatures:
    def test_features(self, ray_session, docs):
        media = mm.synthesize_media(docs, "audio")
        out = ray.data.from_arrow(media).map_batches(
            mm.AudioFeatures, batch_format="pyarrow", batch_size=16, concurrency=2
        ).take_all()
        assert len(out) == 50
        for r in out:
            assert r["n_samples"] > 0
            assert r["rms"] >= 0 and r["peak"] >= 0

    def test_rms_reference(self):
        samples = np.array([1000, -1000, 500, -500], np.int16)
        media = pa.table(
            {"media_id": [0], "media_type": ["audio"],
             "media": pa.array([samples.tobytes()], pa.large_binary())}
        )
        r = mm.AudioFeatures()(media).to_pylist()[0]
        assert r["n_samples"] == 4
        assert abs(r["rms"] - np.sqrt((1000**2 + 1000**2 + 500**2 + 500**2) / 4)) < 1e-9
        assert r["zero_crossings"] == 3
        assert r["peak"] == 1000

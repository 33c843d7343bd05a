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


class TestRealCodecSeam:
    def test_pil_decode_matches_numpy(self):
        """Runs only where PIL is installed (not this container — the
        FAKEIMG path is the CI path); pins the real-codec branch to the
        same schema and grayscale stats."""
        PIL = pytest.importorskip("PIL")
        import io

        import numpy as np
        import pyarrow as pa
        from PIL import Image

        from kafka_connect_jdbc_flatten_ray.stages.multimodal import DecodeImage

        rng = np.random.RandomState(0)
        payloads = []
        arrs = []
        for w, h in ((12, 9), (5, 7)):
            arr = rng.randint(0, 256, (h, w), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr, "L").save(buf, format="PNG")
            payloads.append(buf.getvalue())
            arrs.append(arr)
        batch = pa.table({
            "media_id": pa.array([0, 1], pa.int64()),
            "media": pa.array(payloads, pa.large_binary()),
        })
        out = DecodeImage()(batch).to_pylist()
        for r, arr in zip(out, arrs):
            assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])
            assert abs(r["mean_pixel"] - arr.mean()) < 1e-9
            assert np.array_equal(
                np.asarray(r["pixel_hist"]),
                np.bincount(arr.reshape(-1) >> 4, minlength=16),
            )


def _wav_payload(samples: "np.ndarray", rate: int = 16000) -> bytes:
    """Canonical RIFF/WAVE container around s16le mono PCM."""
    import numpy as np

    pcm = samples.astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")          # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")   # byte rate
        + (2).to_bytes(2, "little")          # block align
        + (16).to_bytes(2, "little")         # bits
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + len(body).to_bytes(4, "little") + body


class TestAudioContainers:
    """The RIFF/WAVE path is fully real (pure header arithmetic, no codec
    library); compressed containers hit the soundfile seam."""

    def _features(self, payloads):
        import pyarrow as pa

        from kafka_connect_jdbc_flatten_ray.stages.multimodal import AudioFeatures

        batch = pa.table({
            "media_id": pa.array(list(range(len(payloads))), pa.int64()),
            "media": pa.array(payloads, pa.large_binary()),
        })
        return AudioFeatures()(batch).to_pylist()

    def test_wav_equals_raw_pcm(self):
        import numpy as np

        rng = np.random.RandomState(7)
        samples = rng.randint(-30000, 30000, 257).astype(np.int16)
        raw = self._features([samples.astype("<i2").tobytes()])[0]
        wav = self._features([_wav_payload(samples)])[0]
        for k in ("n_samples", "rms", "zero_crossings", "peak"):
            assert wav[k] == raw[k], k

    def test_mixed_batch_wav_and_raw(self):
        import numpy as np

        rng = np.random.RandomState(8)
        a = rng.randint(-1000, 1000, 64).astype(np.int16)
        b = rng.randint(-20000, 20000, 100).astype(np.int16)
        out = self._features([_wav_payload(a), b.astype("<i2").tobytes()])
        assert out[0]["n_samples"] == 64
        assert out[1]["n_samples"] == 100
        only_a = self._features([a.astype("<i2").tobytes()])[0]
        assert out[0]["rms"] == only_a["rms"]

    def test_extra_wav_chunks_skipped(self):
        # a LIST chunk before fmt/data must be walked over, not break parse
        import numpy as np

        samples = np.arange(-16, 16, dtype=np.int16)
        pcm = samples.astype("<i2").tobytes()
        fmt = (1).to_bytes(2, "little") + (1).to_bytes(2, "little") \
            + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little") \
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        body = b"WAVE" + b"LIST" + (4).to_bytes(4, "little") + b"INFO" \
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
            + b"data" + len(pcm).to_bytes(4, "little") + pcm
        out = self._features([b"RIFF" + len(body).to_bytes(4, "little") + body])
        assert out[0]["n_samples"] == 32

    def test_flac_without_soundfile_names_the_seam(self):
        import pytest

        from kafka_connect_jdbc_flatten_ray.stages import multimodal

        stage = multimodal.AudioFeatures()
        if stage._sf is not None:
            pytest.skip("soundfile installed; seam not reachable")
        with pytest.raises(NotImplementedError, match="soundfile"):
            self._features([b"fLaC" + b"\x00" * 64])

    def test_video_seam_names_pyav(self):
        import pytest
        import pyarrow as pa

        from kafka_connect_jdbc_flatten_ray.stages.multimodal import FrameSample

        stage = FrameSample()
        if stage._av is not None:
            pytest.skip("PyAV installed; seam not reachable")
        batch = pa.table({
            "media_id": pa.array([0], pa.int64()),
            "media": pa.array([b"\x00\x00\x00\x18ftypisom" + b"\x00" * 32],
                              pa.large_binary()),
        })
        with pytest.raises(NotImplementedError, match="PyAV"):
            stage(batch)


class TestDispatchWithFakeCodecs:
    """Branch selection at each codec seam, tested with monkeypatched
    fake modules (the container has no PIL/PyAV/soundfile): a non-fake
    payload must route to the real-codec branch when the library is
    'present', and fake-container payloads must NEVER enter it."""

    def _img_batch(self, payloads):
        return pa.table({
            "media_id": pa.array(list(range(len(payloads))), pa.int64()),
            "media": pa.array(payloads, pa.large_binary()),
        })

    def test_image_routes_to_real_branch(self):
        stage = mm.DecodeImage()
        stage._pil = object()  # pretend PIL is importable
        sentinel = pa.table({"hit": pa.array([1])})
        seen = []
        stage._decode_real = lambda b: (seen.append(b), sentinel)[1]
        png_ish = b"\x89PNG\r\n\x1a\n" + b"\x00" * 24
        out = stage(self._img_batch([png_ish]))
        assert out is sentinel and seen[0].num_rows == 1

    def test_fakeimg_never_enters_real_branch(self):
        stage = mm.DecodeImage()
        stage._pil = object()
        stage._decode_real = lambda b: (_ for _ in ()).throw(
            AssertionError("FAKEIMG batch must stay on the fake path"))
        payload = (mm.MAGIC_IMG + (2).to_bytes(4, "little")
                   + (2).to_bytes(4, "little") + bytes([10, 20, 30, 40]))
        out = stage(self._img_batch([payload])).to_pylist()[0]
        assert (out["width"], out["height"]) == (2, 2)
        assert out["mean_pixel"] == 25.0

    def test_video_routes_to_real_branch(self):
        stage = mm.FrameSample(every=2)
        stage._av = object()  # pretend PyAV is importable
        sentinel = pa.table({"hit": pa.array([1])})
        stage._demux_real = lambda b: sentinel
        mp4_ish = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 32
        out = stage(self._img_batch([mp4_ish]))
        assert out is sentinel

    def test_audio_container_decodes_via_fake_soundfile(self):
        """A fLaC payload routed through a fake soundfile module must
        yield the same features as the raw PCM it 'decodes' to — pins the
        whole unwrap path (sniff -> seam -> appended buffer -> shared
        vectorized feature pass), not just the error message."""
        rng = np.random.RandomState(9)
        samples = rng.randint(-25000, 25000, 128).astype(np.int16)

        class FakeSF:
            @staticmethod
            def read(fileobj, dtype):
                assert dtype == "int16"
                assert fileobj.read(4) == b"fLaC"
                return samples.copy(), 16000

        stage = mm.AudioFeatures()
        stage._sf = FakeSF
        flac = self._img_batch([b"fLaC" + b"\x00" * 64])
        got = stage(flac).to_pylist()[0]
        raw = mm.AudioFeatures()(
            self._img_batch([samples.astype("<i2").tobytes()])
        ).to_pylist()[0]
        for k in ("n_samples", "rms", "zero_crossings", "peak"):
            assert got[k] == raw[k], k

    def test_audio_stereo_takes_first_channel(self):
        rng = np.random.RandomState(10)
        stereo = rng.randint(-25000, 25000, (64, 2)).astype(np.int16)

        class FakeSF:
            @staticmethod
            def read(fileobj, dtype):
                return stereo.copy(), 44100

        stage = mm.AudioFeatures()
        stage._sf = FakeSF
        got = stage(self._img_batch([b"OggS" + b"\x00" * 32])).to_pylist()[0]
        raw = mm.AudioFeatures()(
            self._img_batch([stereo[:, 0].astype("<i2").tobytes()])
        ).to_pylist()[0]
        for k in ("n_samples", "rms", "zero_crossings", "peak"):
            assert got[k] == raw[k], k

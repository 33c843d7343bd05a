"""Multimodal (image/audio/video) stages: opaque binary columns + typed
metadata, processed by actor-pool map_batches stages.

The container has no image/video codec libraries, so decode is STUBBED
behind a deterministic fake container format while the Ray-side plumbing —
schemas, actor signatures, batch sizing, output layout — is real and tested:

    fake image:  b"FAKEIMG" + width:int32le + height:int32le + pixel bytes
    fake video:  b"FAKEVID" + n_frames:int32le + frame_len:int32le + frames
    audio:       raw PCM s16le bytes OR a RIFF/WAVE container holding
                 16-bit PCM (both fully real — numpy DSP + pure header
                 arithmetic, no codec library needed)

Real-codec seams, each probed once per actor in ``__init__`` and each with
a working branch when the library is present: PIL for images (DecodeImage),
PyAV/ffmpeg for video demux (FrameSample), soundfile for compressed audio
containers (AudioFeatures; fLaC/OggS/non-PCM WAV). Where the library is
absent a NotImplementedError names the missing dependency — that error is
exactly the stubbed seam. All three fake-container paths are fully VECTORIZED
(gathered byte matrices + segment reductions over the flat buffer — no
per-row Python). Large binary payloads => use small ``batch_size`` when
mapping these stages (see batch-size notes in each class).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAGIC_IMG = b"FAKEIMG"
MAGIC_VID = b"FAKEVID"


def _binary_parts(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 buffer, int64 offsets) of a binary column."""
    b = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    b = b.cast(pa.large_binary())
    off = np.frombuffer(b.buffers()[1], np.int64, count=len(b) + 1, offset=b.offset * 8)
    flat = np.frombuffer(
        b.buffers()[2], np.uint8, count=int(off[-1] - off[0]), offset=int(off[0])
    )
    return flat, off - off[0]


def synthesize_media(docs: pa.Table, kind: str = "image") -> pa.Table:
    """Deterministic fake media derived from document text bytes (tests and
    demo pipelines; no external data)."""
    texts = docs.column("text")
    texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    doc_id = docs.column("doc_id").to_numpy(zero_copy_only=False)
    payloads = []
    for i, t in enumerate(texts.to_pylist()):
        raw = t.encode()
        if kind == "image":
            w = 8 + (doc_id[i] % 24)
            h = 6 + (doc_id[i] % 18)
            need = int(w * h)
            px = (raw * (need // max(1, len(raw)) + 1))[:need]
            payloads.append(
                MAGIC_IMG + int(w).to_bytes(4, "little") + int(h).to_bytes(4, "little") + px
            )
        elif kind == "video":
            n_frames = 4 + (doc_id[i] % 8)
            frame_len = 64
            need = n_frames * frame_len
            px = (raw * (need // max(1, len(raw)) + 1))[:need]
            payloads.append(
                MAGIC_VID
                + int(n_frames).to_bytes(4, "little")
                + int(frame_len).to_bytes(4, "little")
                + px
            )
        else:  # audio: PCM s16le derived from byte pairs
            need = 2 * max(16, min(4096, len(raw)))
            px = (raw * (need // max(1, len(raw)) + 1))[:need]
            payloads.append(px)
    return pa.table(
        {
            "media_id": pa.array(doc_id, pa.int64()),
            "media_type": pa.array([kind] * len(doc_id)),
            "media": pa.array(payloads, pa.large_binary()),
        }
    )


class DecodeImage:
    """Actor-pool stage: image bytes -> (width, height, mean_pixel, histogram).

    Real-codec path is stubbed (no PIL in this container); the fake-format
    path is fully vectorized over the flat byte buffer. Use a small
    ``batch_size`` (e.g. 256) — payloads are large relative to rows.
    """

    def __init__(self):
        try:  # real decoder, if the environment has one
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, off = _binary_parts(batch.column("media"))
        n = batch.num_rows
        hdr = len(MAGIC_IMG)
        starts = off[:-1]
        ends = off[1:]
        # vectorized header validation: every payload must begin with MAGIC
        magic = np.frombuffer(MAGIC_IMG, np.uint8)
        idx = starts[:, None] + np.arange(hdr)
        if n and not (flat[idx] == magic).all(axis=1).all():
            if self._pil is None:
                raise NotImplementedError(
                    "real image decode requires PIL (not in this container); "
                    "only the FAKEIMG container format is supported"
                )
            return self._decode_real(batch)
        # 4-byte LE fields gathered without a per-row loop
        w_idx = starts[:, None] + hdr + np.arange(4)
        h_idx = w_idx + 4
        pow256 = (256 ** np.arange(4)).astype(np.int64)
        widths = (flat[w_idx].astype(np.int64) @ pow256).astype(np.int32)
        heights = (flat[h_idx].astype(np.int64) @ pow256).astype(np.int32)
        # pixel stats via segment reductions over the flat buffer: gather
        # indices computed with pure offset arithmetic (no per-row loop)
        px_start = (starts + hdr + 8).astype(np.int64)
        lens = (ends - px_start).astype(np.int64)
        total_px = int(lens.sum())
        parent = np.repeat(np.arange(n, dtype=np.int64), lens)
        base = np.concatenate(([0], np.cumsum(lens)[:-1])) if n else np.empty(0, np.int64)
        gather = np.arange(total_px, dtype=np.int64) - base[parent] + px_start[parent]
        px = flat[gather]
        sums = np.zeros(n, np.int64)
        np.add.at(sums, parent, px.astype(np.int64))
        means = sums / np.maximum(lens, 1)
        means[lens == 0] = 0.0
        hists = np.bincount(
            parent * 16 + (px >> 4), minlength=n * 16
        ).reshape(n, 16).astype(np.int64)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array(widths),
                "height": pa.array(heights),
                "mean_pixel": pa.array(means),
                "pixel_hist": pa.FixedSizeListArray.from_arrays(
                    pa.array(hists.reshape(-1)), 16
                ),
            }
        )


    def _decode_real(self, batch: pa.Table) -> pa.Table:
        """Real-codec branch (exercised only where PIL is installed — CI in
        this container covers the FAKEIMG path; tests/test_multimodal.py
        importorskips PIL): same output schema as the fake path, with
        pixels taken from the luma (grayscale) conversion. Decode is
        necessarily per-image (codec boundary); the histogram/mean math is
        numpy per image."""
        import io

        col = batch.column("media")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        widths, heights, means, hists = [], [], [], []
        for payload in col.to_pylist():
            img = self._pil.open(io.BytesIO(payload)).convert("L")
            arr = np.asarray(img, np.uint8)
            widths.append(img.width)
            heights.append(img.height)
            means.append(float(arr.mean()) if arr.size else 0.0)
            hists.append(np.bincount((arr.reshape(-1) >> 4), minlength=16))
        hist_mat = (np.vstack(hists) if hists
                    else np.empty((0, 16), np.int64)).astype(np.int64)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array(np.array(widths, np.int32)),
                "height": pa.array(np.array(heights, np.int32)),
                "mean_pixel": pa.array(np.array(means, np.float64)),
                "pixel_hist": pa.FixedSizeListArray.from_arrays(
                    pa.array(hist_mat.reshape(-1)), 16
                ),
            }
        )


class FrameSample:
    """Actor-pool stage: video bytes -> one row per sampled frame
    (media_id, frame_idx, frame bytes). ``every`` = sampling stride.

    Real-container demux goes through PyAV (ffmpeg bindings) when the
    environment has it — probed once per actor in ``__init__``, exactly
    like DecodeImage's PIL seam; the FAKEVID path (CI) is fully
    vectorized offset arithmetic."""

    def __init__(self, every: int = 2):
        self.every = every
        try:  # real demuxer, if the environment has one
            import av  # noqa: F401

            self._av = av
        except ImportError:
            self._av = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, off = _binary_parts(batch.column("media"))
        n = batch.num_rows
        hdr = len(MAGIC_VID)
        starts = off[:-1].astype(np.int64)
        mid = batch.column("media_id").to_numpy(zero_copy_only=False)
        magic = np.frombuffer(MAGIC_VID, np.uint8)
        if n and not (flat[starts[:, None] + np.arange(hdr)] == magic).all():
            if self._av is None:
                raise NotImplementedError(
                    "real video demux requires PyAV/ffmpeg (not in this "
                    "container); only the FAKEVID container format is "
                    "supported"
                )
            return self._demux_real(batch)
        pow256 = (256 ** np.arange(4)).astype(np.int64)
        n_frames = flat[starts[:, None] + hdr + np.arange(4)].astype(np.int64) @ pow256
        flen = flat[starts[:, None] + hdr + 4 + np.arange(4)].astype(np.int64) @ pow256
        base = starts + hdr + 8
        # sampled frames per video, all offset arithmetic (no per-row loop)
        n_sampled = -(-n_frames // self.every)
        total = int(n_sampled.sum())
        vparent = np.repeat(np.arange(n, dtype=np.int64), n_sampled)
        fbase = np.concatenate(([0], np.cumsum(n_sampled)[:-1])) if n else np.empty(0, np.int64)
        fidx = (np.arange(total, dtype=np.int64) - fbase[vparent]) * self.every
        frame_start = base[vparent] + fidx * flen[vparent]
        frame_len = flen[vparent]
        nbytes = int(frame_len.sum())
        bparent = np.repeat(np.arange(total, dtype=np.int64), frame_len)
        bbase = np.concatenate(([0], np.cumsum(frame_len)[:-1])) if total else np.empty(0, np.int64)
        gather = np.arange(nbytes, dtype=np.int64) - bbase[bparent] + frame_start[bparent]
        data = flat[gather].tobytes()
        offsets = np.concatenate(([0], np.cumsum(frame_len))).astype(np.int64)
        frames = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), total,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
        )
        return pa.table(
            {
                "media_id": pa.array(mid[vparent], pa.int64()),
                "frame_idx": pa.array(fidx.astype(np.int32)),
                "frame": frames,
            }
        )

    def _demux_real(self, batch: pa.Table) -> pa.Table:
        """Real-container branch (exercised only where PyAV is installed —
        CI in this container covers the FAKEVID path;
        tests/test_multimodal.py importorskips av): same output schema as
        the fake path, one row per sampled frame, frame bytes = the
        grayscale plane of the decoded frame. Demux/decode is necessarily
        per-video (codec boundary)."""
        import io

        col = batch.column("media")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        mid = batch.column("media_id").to_numpy(zero_copy_only=False)
        out_ids, out_idx, out_frames = [], [], []
        for i, payload in enumerate(col.to_pylist()):
            with self._av.open(io.BytesIO(payload)) as container:
                for fi, frame in enumerate(container.decode(video=0)):
                    if fi % self.every:
                        continue
                    gray = frame.to_ndarray(format="gray")
                    out_ids.append(int(mid[i]))
                    out_idx.append(fi)
                    out_frames.append(gray.tobytes())
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.int64()),
                "frame_idx": pa.array(np.array(out_idx, np.int32)),
                "frame": pa.array(out_frames, pa.large_binary()),
            }
        )


class AudioFeatures:
    """Actor-pool stage: audio bytes -> per-clip RMS / zero-crossing /
    peak features. Fully real for raw PCM s16le AND for RIFF/WAVE
    containers holding 16-bit PCM (the WAV chunk walk is plain header
    arithmetic — no codec library needed). Compressed containers
    (fLaC / OggS magic, or non-PCM WAV) decode through soundfile when the
    environment has it — probed once per actor in ``__init__``, the same
    seam pattern as DecodeImage's PIL branch. Feature math is one shared
    vectorized pass regardless of how each clip's samples were obtained."""

    def __init__(self):
        try:  # real decoder for compressed containers, if present
            import soundfile  # noqa: F401

            self._sf = soundfile
        except ImportError:
            self._sf = None

    @staticmethod
    def _wav_pcm_span(buf: memoryview) -> tuple[int, int]:
        """(data offset, data length) of the PCM samples in one RIFF/WAVE
        payload; raises ValueError for non-PCM / non-16-bit encodings (the
        caller falls through to the soundfile seam)."""
        if bytes(buf[8:12]) != b"WAVE":
            raise ValueError("RIFF but not WAVE")
        pos, fmt = 12, None
        while pos + 8 <= len(buf):
            cid = bytes(buf[pos:pos + 4])
            csz = int.from_bytes(buf[pos + 4:pos + 8], "little")
            if cid == b"fmt ":
                fmt = bytes(buf[pos + 8:pos + 8 + csz])
            elif cid == b"data":
                if fmt is None:
                    raise ValueError("data chunk before fmt")
                audio_format = int.from_bytes(fmt[0:2], "little")
                bits = int.from_bytes(fmt[14:16], "little")
                if audio_format != 1 or bits != 16:
                    raise ValueError("non-PCM or non-16-bit WAV")
                return pos + 8, min(csz, len(buf) - pos - 8)
            pos += 8 + csz + (csz & 1)
        raise ValueError("no data chunk")

    def _unwrap_containers(
        self, col, flat: np.ndarray, starts: np.ndarray, lens: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Adjust (flat, starts, lens) so every clip's span covers raw PCM
        s16le: WAV spans move inside the payload (zero-copy); compressed
        clips decode via soundfile into an appended buffer. Per-row work
        happens only at this codec boundary — the pure-PCM batch never
        enters here."""
        import io

        payloads = col.to_pylist()
        extra: list[bytes] = []
        extra_len = 0
        starts = starts.copy()
        lens = lens.copy()
        for i, payload in enumerate(payloads):
            head = payload[:4]
            decode = None
            if head == b"RIFF":
                try:
                    doff, dlen = self._wav_pcm_span(memoryview(payload))
                    starts[i] += doff
                    lens[i] = dlen
                    continue
                except ValueError:
                    decode = "wav-nonpcm"
            elif head in (b"fLaC", b"OggS"):
                decode = head.decode("latin1")
            else:
                continue  # raw PCM clip: span already correct
            if self._sf is None:
                raise NotImplementedError(
                    f"decoding a {decode} audio container requires "
                    "soundfile (not in this container); only raw PCM "
                    "s16le and 16-bit PCM WAV are supported natively"
                )
            data, _rate = self._sf.read(io.BytesIO(payload), dtype="int16")
            pcm = np.ascontiguousarray(data[:, 0] if data.ndim > 1 else data)
            raw = pcm.astype("<i2").tobytes()
            starts[i] = len(flat) + extra_len
            lens[i] = len(raw)
            extra.append(raw)
            extra_len += len(raw)
        if extra:
            flat = np.concatenate(
                [flat, np.frombuffer(b"".join(extra), np.uint8)]
            )
        return flat, starts, lens

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, off = _binary_parts(batch.column("media"))
        n = batch.num_rows
        starts = off[:-1].astype(np.int64)
        lens = (off[1:] - off[:-1]).astype(np.int64)
        # container sniff, vectorized: any clip starting with a known
        # container magic takes the codec-boundary unwrap; a batch of raw
        # PCM (the common path) stays fully vectorized with zero copies
        sniffable = np.flatnonzero(lens >= 4)
        if len(sniffable):
            first4 = flat[starts[sniffable][:, None] + np.arange(4)]
            is_container = (
                (first4 == np.frombuffer(b"RIFF", np.uint8)).all(axis=1)
                | (first4 == np.frombuffer(b"fLaC", np.uint8)).all(axis=1)
                | (first4 == np.frombuffer(b"OggS", np.uint8)).all(axis=1)
            )
            if is_container.any():
                flat, starts, lens = self._unwrap_containers(
                    batch.column("media").combine_chunks()
                    if isinstance(batch.column("media"), pa.ChunkedArray)
                    else batch.column("media"),
                    flat, starts, lens,
                )
        lens = lens // 2 * 2  # whole s16 pairs
        n_samples = lens // 2
        total = int(n_samples.sum())
        parent = np.repeat(np.arange(n, dtype=np.int64), n_samples)
        base = np.concatenate(([0], np.cumsum(n_samples)[:-1])) if n else np.empty(0, np.int64)
        pos = np.arange(total, dtype=np.int64) - base[parent]
        lo_idx = starts[parent] + 2 * pos
        # s16le sample = lo + 256*hi, sign-adjusted — gathered vectorized
        s = flat[lo_idx].astype(np.int64) + 256 * flat[lo_idx + 1].astype(np.int64)
        s = np.where(s >= 32768, s - 65536, s).astype(np.float64)
        sq = np.zeros(n, np.float64)
        np.add.at(sq, parent, s * s)
        rms = np.sqrt(sq / np.maximum(n_samples, 1))
        rms[n_samples == 0] = 0.0
        # zero crossings: adjacent products within one clip only
        zc = np.zeros(n, np.int64)
        if total > 1:
            same = parent[:-1] == parent[1:]
            neg = (s[:-1] * s[1:]) < 0
            np.add.at(zc, parent[:-1][same & neg], 1)
        peak = np.zeros(n, np.int64)
        if total:
            np.maximum.at(peak, parent, np.abs(s).astype(np.int64))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_samples": pa.array(n_samples),
                "rms": pa.array(rms),
                "zero_crossings": pa.array(zc),
                "peak": pa.array(peak),
            }
        )

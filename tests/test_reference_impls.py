"""Second independent reference implementations for rows-only operators
(the driver's SQL oracle can't express them): each vectorized operator is
re-implemented as a deliberately-naive per-document Python loop and the
outputs compared exactly over the real sf0.001 documents. Mirrors the
flatten core's reference-interpreter strategy
(tests/reference_flatten.py + test_property_flatten.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from kafka_connect_jdbc_flatten_ray.stages import dedup, multimodal, textops


def _docs(sf_dir, n=200):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.slice(0, n)


class TestFingerprintReference:
    def test_matches_naive_polynomial_hash(self, sf_dir):
        t = _docs(sf_dir)
        fast = textops.Fingerprint()(t)
        base = int(textops.BASE)
        got = dict(zip(fast.column("doc_id").to_pylist(),
                       fast.column("fingerprint").to_pylist()))
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            acc = 0
            for byte in text.encode():
                acc = (acc * base + byte) % (1 << 64)  # Horner == sum b_i*B^(n-1-i)
            expect = acc - (1 << 64) if acc >= (1 << 63) else acc  # int64 view
            assert got[doc_id] == expect, doc_id


class TestImageDecodeReference:
    def test_matches_naive_decode(self, sf_dir):
        t = _docs(sf_dir, 100)
        media = multimodal.synthesize_media(t, "image")
        fast = multimodal.DecodeImage()(media)
        rows = {r["media_id"]: r for r in fast.to_pylist()}
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            raw = text.encode()
            w, h = 8 + doc_id % 24, 6 + doc_id % 18
            need = w * h
            px = (raw * (need // max(1, len(raw)) + 1))[:need]
            arr = np.frombuffer(px, np.uint8)
            r = rows[doc_id]
            assert (r["width"], r["height"]) == (w, h)
            assert abs(r["mean_pixel"] - arr.mean()) < 1e-12
            assert np.array_equal(
                np.asarray(r["pixel_hist"]), np.bincount(arr >> 4, minlength=16)
            )


class TestMinHashSignatureReference:
    def test_matches_naive_per_doc_minhash(self, sf_dir):
        """The vectorized MinHash signatures equal a per-doc Python loop
        using the same shingle hashes and permutations."""
        t = _docs(sf_dir, 50)
        stage = dedup.MinHashStage("word")
        out = stage(t)
        # one row per (band, doc); take band 0's signatures
        sigs = {}
        for r in out.to_pylist():
            if r["band_id"] == 0:
                sigs[r["doc_id"]] = np.array(r["sig"], np.int64).view(np.uint64)
        text_arr = t.column("text")
        sh, parent = dedup._shingle_hashes_words(text_arr, 3)
        for i, doc_id in enumerate(t.column("doc_id").to_pylist()):
            mine = sh[parent == i]
            expect = np.full(dedup.NUM_PERM, np.iinfo(np.uint64).max, np.uint64)
            with np.errstate(over="ignore"):
                for j in range(dedup.NUM_PERM):
                    for v in mine:
                        y = v * dedup._PERM_A[j] + dedup._PERM_B[j]
                        if y < expect[j]:
                            expect[j] = y
            assert np.array_equal(sigs[doc_id], expect), doc_id


class TestSimHashReference:
    def test_matches_naive_per_doc_simhash(self, sf_dir):
        t = _docs(sf_dir, 50)
        out = dedup.SimHashStage()(t)
        sims = {}
        for r in out.to_pylist():
            if r["chunk_id"] == 0:
                sims[r["doc_id"]] = np.uint64(np.int64(r["simhash"]))
        th, parent, _ = dedup._token_hashes(t.column("text"))
        for i, doc_id in enumerate(t.column("doc_id").to_pylist()):
            mine = th[parent == i]
            votes = np.zeros(64, np.int64)
            for v in mine:
                for bit in range(64):
                    votes[bit] += 1 if (int(v) >> bit) & 1 else -1
            expect = np.uint64(0)
            for bit in range(64):
                if votes[bit] > 0:
                    expect |= np.uint64(1) << np.uint64(bit)
            assert sims[doc_id] == expect, doc_id

"""Corpus-hygiene operator tests: scrubbing, sampling, chunking,
contamination (planted benchmark overlap)."""

import pyarrow as pa
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import scrub


class TestScrub:
    def test_email_and_numbers(self):
        t = pa.table(
            {"doc_id": [0, 1],
             "text": ["mail me at a.b+c@test.org now", "card 1234567890 and 123"]}
        )
        out = scrub.ScrubText()(t).to_pylist()
        assert out[0]["text"] == "mail me at <EMAIL> now"
        assert out[1]["text"] == "card <NUM> and 123"


class TestSample:
    def test_deterministic_and_proportional(self, ray_session, sf_dir):
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        a = sorted(r["doc_id"] for r in scrub.deterministic_sample(docs, 30).take_all())
        docs2 = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "text"],
                                      override_num_blocks=5)
        b = sorted(r["doc_id"] for r in scrub.deterministic_sample(docs2, 30).take_all())
        assert a == b  # parallelism-independent
        assert 0.15 < len(a) / 500 < 0.45


class TestChunk:
    def test_overlap_layout(self):
        words = " ".join(f"w{i}" for i in range(40))
        t = pa.table({"doc_id": [7], "text": [words]})
        out = scrub.ChunkDocs(size=32, overlap=8)(t).to_pylist()
        assert [r["chunk_idx"] for r in out] == [0, 1]
        assert out[0]["n_chunk_tokens"] == 32
        assert out[1]["n_chunk_tokens"] == 16
        # overlap: chunk 1 starts at token 24
        assert out[1]["chunk"].split(" ")[0] == "w24"

    def test_short_doc_single_chunk(self):
        t = pa.table({"doc_id": [1], "text": ["just three words"]})
        out = scrub.ChunkDocs(size=32, overlap=8)(t).to_pylist()
        assert len(out) == 1 and out[0]["n_chunk_tokens"] == 3


class TestContamination:
    def test_planted_overlap(self, ray_session):
        bench = ["the secret benchmark question about unicorns and rainbows today ok"]
        texts = [
            "completely clean document with other words entirely here now",
            # contains an 8-gram from the benchmark
            "prefix words the secret benchmark question about unicorns and rainbows today ok suffix",
            "another clean one with no overlap at all in any way",
        ]
        docs = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": texts}))
        out = {r["doc_id"]: r["contaminated"]
               for r in scrub.contamination_check(docs, bench, n=8).take_all()}
        assert out == {0: False, 1: True, 2: False}


class TestContaminationDistributed:
    def test_matches_broadcast_variant(self, ray_session, sf_dir):
        """The shuffle-based variant (benchmark as a Dataset, nothing
        broadcast) must agree exactly with the broadcast-array variant."""
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        import duckdb

        con = duckdb.connect()
        bench_texts = [r[0] for r in con.execute(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
            "WHERE doc_id IN (3, 77)").fetchall()]
        bcast = {r["doc_id"]: (r["contaminated"], r["ngram_hits"])
                 for r in scrub.contamination_check(docs, bench_texts, n=8).take_all()}
        bench_ds = ray.data.from_items([{"text": t} for t in bench_texts])
        dist = {r["doc_id"]: (r["contaminated"], r["ngram_hits"])
                for r in scrub.contamination_check_distributed(docs, bench_ds, n=8).take_all()}
        assert bcast == dist
        assert bcast[3][0] and bcast[77][0]  # planted docs flagged

    def test_bloom_prefilter_variants_agree(self, ray_session, sf_dir):
        """Bloom on (default), tiny bloom (many false positives), and bloom
        off must all produce identical results — FPs only add exchange
        rows, never output differences."""
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        import duckdb

        con = duckdb.connect()
        bench_texts = [r[0] for r in con.execute(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
            "WHERE doc_id IN (3, 77)").fetchall()]
        bench_ds = ray.data.from_items([{"text": t} for t in bench_texts])

        def run(bits):
            return {r["doc_id"]: (r["contaminated"], r["ngram_hits"])
                    for r in scrub.contamination_check_distributed(
                        docs, bench_ds, n=8, prefilter_bloom_bits=bits
                    ).take_all()}

        default = run(1 << 27)
        tiny = run(1 << 10)       # heavy false positives
        off = run(None)
        assert default == off == tiny
        assert default[3][0] and default[77][0]

    def test_bloom_cuts_exchange_rows(self, ray_session):
        """On a planted-overlap corpus the prefilter must drop the clean
        majority of doc n-grams (>10x reduction) before the exchange."""
        import numpy as np

        from kafka_connect_jdbc_flatten_ray.stages.dedup import (
            _shingle_hashes_words,
        )

        bench = ["the secret benchmark question about unicorns and rainbows today ok"]
        rng = np.random.RandomState(5)
        words = [f"w{v}" for v in rng.randint(0, 5000, 40 * 200)]
        clean = [" ".join(words[i * 40:(i + 1) * 40]) for i in range(200)]
        dirty = "padding words " + bench[0] + " trailing junk here"
        texts = clean + [dirty]
        bench_ds = ray.data.from_items([{"text": t} for t in bench])
        bloom = scrub.build_benchmark_bloom(bench_ds, n=8, m_bits=1 << 27)
        import pyarrow as _pa

        h, _ = _shingle_hashes_words(_pa.array(texts), k=8)
        surviving = scrub._bloom_test(bloom, h, 1 << 27).sum()
        assert len(h) > 10 * surviving
        # and the surviving set still yields the exact answer
        docs = ray.data.from_arrow(
            _pa.table({"doc_id": list(range(len(texts))), "text": texts}))
        out = {r["doc_id"]: r["contaminated"]
               for r in scrub.contamination_check_distributed(
                   docs, bench_ds, n=8).take_all()}
        assert out[len(texts) - 1] is True or out[len(texts) - 1] == True  # noqa: E712
        assert sum(out.values()) == 1

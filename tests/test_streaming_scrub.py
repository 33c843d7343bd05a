"""Incremental contamination registry: benchmark epoch folds (set union +
bloom OR) must make the check equal the batch distributed check against
the union of the folded benchmark sets, in any order, under re-delivery."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import scrub
from kafka_connect_jdbc_flatten_ray.stages import streaming_scrub as ss

WORDS = [f"w{i}" for i in range(200)]


def _text(seed: int, n: int = 30) -> str:
    return " ".join(np.random.default_rng(seed).choice(WORDS, n))


def _corpus():
    docs_txt = [_text(i) for i in range(120)]
    bench_txt = [_text(1000 + i, 40) for i in range(24)]
    span = " ".join(bench_txt[3].split()[5:17])  # 12 words => 5 8-grams
    docs_txt[5] += " " + span
    docs_txt[17] = span + " " + docs_txt[17]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs_txt))),
        "text": pa.array(docs_txt),
    }))
    bench = pa.table({
        "doc_id": pa.array(np.arange(len(bench_txt))),
        "text": pa.array(bench_txt),
    })
    return docs, bench


def _slice(bench: pa.Table, lo: int, hi: int) -> ray.data.Dataset:
    ids = bench.column("doc_id").to_numpy(zero_copy_only=False)
    return ray.data.from_arrow(
        bench.filter(pa.array((lo <= ids) & (ids < hi)))
    )


def _sorted(ds) -> "object":
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


class TestStreamingContamination:
    def test_three_epochs_equal_batch(self, ray_session, tmp_path):
        docs, bench = _corpus()
        root = str(tmp_path / "lake")
        for lo, hi in [(0, 8), (8, 16), (16, 24)]:
            ss.benchmark_ngrams_epoch(_slice(bench, lo, hi), root, n=8)
        inc = _sorted(ss.contamination_check_incremental(docs, root))
        batch = _sorted(scrub.contamination_check_distributed(
            docs, ray.data.from_arrow(bench), n=8))
        assert inc.equals(batch)
        assert {5, 17} <= set(inc[inc.contaminated].doc_id)

    def test_redelivery_is_idempotent(self, ray_session, tmp_path):
        docs, bench = _corpus()
        root = str(tmp_path / "lake")
        r0 = ss.benchmark_ngrams_epoch(_slice(bench, 0, 12), root, n=8)
        r1 = ss.benchmark_ngrams_epoch(_slice(bench, 0, 12), root, n=8)
        assert r1["new_ngrams"] == 0 and r1["ngrams"] == r0["ngrams"]
        r2 = ss.benchmark_ngrams_epoch(_slice(bench, 12, 24), root, n=8)
        inc = _sorted(ss.contamination_check_incremental(docs, root))
        batch = _sorted(scrub.contamination_check_distributed(
            docs, ray.data.from_arrow(bench), n=8))
        assert inc.equals(batch)

    def test_epoch_order_does_not_matter(self, ray_session, tmp_path):
        docs, bench = _corpus()
        parts = [(0, 8), (8, 16), (16, 24)]
        outs = []
        for name, order in (("a", (0, 1, 2)), ("b", (2, 0, 1))):
            root = str(tmp_path / name)
            for i in order:
                ss.benchmark_ngrams_epoch(_slice(bench, *parts[i]), root, n=8)
            outs.append(_sorted(ss.contamination_check_incremental(docs, root)))
        assert outs[0].equals(outs[1])

    def test_ngram_width_mismatch_refused(self, ray_session, tmp_path):
        _, bench = _corpus()
        root = str(tmp_path / "lake")
        ss.benchmark_ngrams_epoch(_slice(bench, 0, 8), root, n=8)
        with pytest.raises(ValueError, match="n=8"):
            ss.benchmark_ngrams_epoch(_slice(bench, 8, 16), root, n=5)

    def test_bloom_layout_survives_and_prefilters(self, ray_session, tmp_path):
        # a tiny bitset forces false positives: the answer must stay exact
        # and later folds must keep the stored m_bits, not the argument
        docs, bench = _corpus()
        root = str(tmp_path / "lake")
        ss.benchmark_ngrams_epoch(_slice(bench, 0, 12), root, n=8,
                                  m_bits=1 << 10)
        ss.benchmark_ngrams_epoch(_slice(bench, 12, 24), root, n=8,
                                  m_bits=1 << 27)
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        part = TableManifest(root, ss.STATE_TABLE).load()["partitioning"]
        assert part["m_bits"] == 1 << 10
        inc = _sorted(ss.contamination_check_incremental(docs, root))
        batch = _sorted(scrub.contamination_check_distributed(
            docs, ray.data.from_arrow(bench), n=8))
        assert inc.equals(batch)

    def test_read_benchmark_hashes_is_distinct_union(self, ray_session,
                                                     tmp_path):
        _, bench = _corpus()
        root = str(tmp_path / "lake")
        for lo, hi in [(0, 12), (6, 18), (12, 24)]:  # overlapping epochs
            ss.benchmark_ngrams_epoch(_slice(bench, lo, hi), root, n=8)
        h = ss.read_benchmark_hashes(root).to_pandas()["h"].to_numpy()
        assert len(h) == len(np.unique(h))
        from kafka_connect_jdbc_flatten_ray.stages.scrub import _ngram_hash_array

        expect = _ngram_hash_array(
            bench.column("text").to_pylist(), n=8).view(np.int64)
        assert np.array_equal(np.sort(h), np.sort(expect))


class TestStateVacuum:
    def test_vacuum_prunes_state_history_and_keeps_current(
        self, ray_session, tmp_path
    ):
        import glob

        from kafka_connect_jdbc_flatten_ray.pipelines.ingest import vacuum
        from kafka_connect_jdbc_flatten_ray.stages import (
            streaming_quantiles as sq,
        )
        from kafka_connect_jdbc_flatten_ray.stages.quantiles import (
            quantiles_exact,
        )

        root = str(tmp_path / "lake")
        docs, bench = _corpus()
        rng = np.random.default_rng(3)
        vals = rng.normal(0, 5, 2000)
        for p in range(3):
            sub = vals[np.arange(len(vals)) % 3 == p]
            sq.value_counts_epoch(
                ray.data.from_arrow(pa.table({"value": pa.array(sub)})),
                root, "value", num_buckets=4)
        for lo, hi in [(0, 8), (8, 16), (16, 24)]:
            ss.benchmark_ngrams_epoch(_slice(bench, lo, hi), root, n=8,
                                      num_buckets=4)
        removed = vacuum(root, keep_epochs=1)
        assert removed["quantile_state"] > 0
        assert removed["contam_state"] > 0
        # the current bloom sidecar survives; older blobs are gone
        blooms = glob.glob(f"{root}/contam_state/bloom/epoch-*.bin")
        assert len(blooms) == 1
        # reads stay exact after the prune
        inc = sq.quantiles_from_state(root)
        batch = quantiles_exact(
            ray.data.from_arrow(pa.table({"value": pa.array(vals)})), "value")
        assert inc.equals(batch)
        got = _sorted(ss.contamination_check_incremental(docs, root))
        want = _sorted(scrub.contamination_check_distributed(
            docs, ray.data.from_arrow(bench), n=8))
        assert got.equals(want)

"""Incremental grouped term counts: counted-multiset epoch folds must
make the top-k read equal batch top_terms_per_lang over the union of the
folded inputs, in any arrival order, across a reshard, and despite
routing-hash collisions."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import streaming_terms as st


def _docs(ids, langs, texts):
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(langs, pa.string()),
        "text": pa.array(texts, pa.string()),
    })


def _corpus(seed=5, n=90):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(40)]
    langs = rng.choice(["en", "de", "fr"], n)
    texts = [" ".join(rng.choice(words, 12)) for _ in range(n)]
    return _docs(np.arange(n), langs, texts)


def _batch_topk(tbl, k=5):
    import duckdb

    con = duckdb.connect()
    con.register("documents", tbl.to_pandas())
    return con.sql(f"""
        WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS token
                   FROM documents),
        c AS (SELECT lang, token, COUNT(*) AS n FROM t GROUP BY lang, token)
        SELECT lang,
               CAST(row_number() OVER (PARTITION BY lang
                                       ORDER BY n DESC, token) AS BIGINT)
                 AS rank,
               token, CAST(n AS BIGINT) AS n
        FROM c QUALIFY rank <= {k}
        ORDER BY lang, rank
    """).df().reset_index(drop=True)


def _inc_topk(root, k=5):
    return st.top_terms_from_state(str(root), k).to_pandas() \
        .sort_values(["lang", "rank"]).reset_index(drop=True)


def _fold_thirds(tbl, root, order=(0, 1, 2)):
    ids = tbl.column("doc_id").to_numpy()
    for p in order:
        st.term_counts_epoch(
            ray.data.from_arrow(tbl.filter(pa.array(ids % 3 == p))),
            str(root))


class TestStreamingTerms:
    def test_three_epochs_equal_batch(self, ray_session, tmp_path):
        tbl = _corpus()
        _fold_thirds(tbl, tmp_path / "lake")
        assert _inc_topk(tmp_path / "lake").equals(_batch_topk(tbl))

    def test_epoch_order_does_not_matter(self, ray_session, tmp_path):
        tbl = _corpus(6)
        _fold_thirds(tbl, tmp_path / "a", (0, 1, 2))
        _fold_thirds(tbl, tmp_path / "b", (2, 0, 1))
        assert _inc_topk(tmp_path / "a").equals(_inc_topk(tmp_path / "b"))

    def test_reshard_then_fold(self, ray_session, tmp_path):
        tbl = _corpus(7)
        ids = tbl.column("doc_id").to_numpy()
        root = tmp_path / "lake"
        st.term_counts_epoch(
            ray.data.from_arrow(tbl.filter(pa.array(ids % 2 == 0))),
            str(root), num_buckets=4)
        st.reshard_state(str(root), 16)
        st.term_counts_epoch(
            ray.data.from_arrow(tbl.filter(pa.array(ids % 2 == 1))),
            str(root))
        assert _inc_topk(root).equals(_batch_topk(tbl))

    def test_counts_accumulate(self, ray_session, tmp_path):
        tbl = _corpus(8, 30)
        root = str(tmp_path / "lake")
        st.term_counts_epoch(ray.data.from_arrow(tbl), root)
        st.term_counts_epoch(ray.data.from_arrow(tbl), root)
        total = int(st.read_term_counts(root).sum("count"))
        expect = 2 * sum(len(s.split(" "))
                         for s in tbl.column("text").to_pylist())
        assert total == expect

    def test_hash_collision_does_not_merge_terms(self, ray_session,
                                                 tmp_path, monkeypatch):
        # force EVERY term onto one routing hash: distinct (lang, token)
        # rows must still stay separate because the fold groups on the
        # real columns
        from kafka_connect_jdbc_flatten_ray.stages import streaming_terms

        monkeypatch.setattr(
            streaming_terms, "stable_row_hash",
            lambda tbl, cols: np.full(tbl.num_rows, 7, np.uint64))
        tbl = _docs([0, 1], ["en", "de"], ["aa bb aa", "aa cc"])
        root = str(tmp_path / "lake")
        st.term_counts_epoch(ray.data.from_arrow(tbl), root)
        got = st.read_term_counts(root).to_pandas() \
            .sort_values(["lang", "token"]).reset_index(drop=True)
        assert list(map(tuple, got.to_records(index=False))) == [
            ("de", "aa", 1), ("de", "cc", 1), ("en", "aa", 2), ("en", "bb", 1),
        ]

    def test_fold_guard_trips_and_claim_released(self, ray_session, tmp_path,
                                                 monkeypatch):
        from kafka_connect_jdbc_flatten_ray.stages import streaming_windows

        monkeypatch.setattr(streaming_windows, "MAX_FOLD_ROWS", 5)
        root = str(tmp_path / "lake")
        with pytest.raises(Exception, match="term_counts_epoch"):
            st.term_counts_epoch(ray.data.from_arrow(_corpus(9)), root,
                                 num_buckets=1)
        monkeypatch.setattr(streaming_windows, "MAX_FOLD_ROWS", 10_000_000)
        r = st.term_counts_epoch(
            ray.data.from_arrow(_docs([0], ["en"], ["aa bb"])), root,
            num_buckets=1)
        assert r["epoch"] == 0 and r["epoch_tokens"] == 2


class TestStreamingTfidf:
    def _tbl(self, seed=11, n=60):
        rng = np.random.default_rng(seed)
        words = [f"w{i}" for i in range(25)]
        return _docs(np.arange(n),
                     ["en"] * n,
                     [" ".join(rng.choice(words, 10)) for _ in range(n)]
                     ).select(["doc_id", "text"])

    def test_three_epochs_equal_batch(self, ray_session, tmp_path):
        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            tfidf_top_terms,
        )

        tbl = self._tbl()
        ids = tbl.column("doc_id").to_numpy()
        root = str(tmp_path / "df")
        for p in (2, 0, 1):
            st.df_counts_epoch(
                ray.data.from_arrow(tbl.filter(pa.array(ids % 3 == p))), root)
        assert st.corpus_docs_total(root) == tbl.num_rows
        inc = st.tfidf_from_state(ray.data.from_arrow(tbl), root, k=3) \
            .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
        batch = tfidf_top_terms(ray.data.from_arrow(tbl), tbl.num_rows, k=3) \
            .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
        assert inc.equals(batch)

    def test_df_accumulates_across_epochs(self, ray_session, tmp_path):
        root = str(tmp_path / "df")
        a = _docs([0, 1], ["en", "en"], ["aa bb", "aa"]).select(
            ["doc_id", "text"])
        b = _docs([2], ["en"], ["aa cc"]).select(["doc_id", "text"])
        st.df_counts_epoch(ray.data.from_arrow(a), root)
        st.df_counts_epoch(ray.data.from_arrow(b), root)
        assert st.corpus_docs_total(root) == 3
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
        from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

        files = sorted(TableManifest(root, st.DF_TABLE)
                       .current_files().values())
        df = read_parquet_clean(files).to_pandas() \
            .set_index("token")["df"].to_dict()
        assert df == {"aa": 3, "bb": 1, "cc": 1}


class TestTfidfStateMismatch:
    def test_unfolded_token_fails_loudly(self, ray_session, tmp_path):
        """Scoring a doc whose token was never folded into the df state
        must raise, not silently truncate that doc's top-k."""
        root = str(tmp_path / "df")
        folded = _docs([0, 1], ["en", "en"], ["aa bb", "aa"]).select(
            ["doc_id", "text"])
        st.df_counts_epoch(ray.data.from_arrow(folded), root)
        rogue = _docs([2], ["en"], ["aa zz"]).select(["doc_id", "text"])
        with pytest.raises(Exception, match="not in the folded df state"):
            st.tfidf_from_state(
                ray.data.from_arrow(rogue), root, k=3).to_pandas()

    def test_scoring_subset_of_union_ok(self, ray_session, tmp_path):
        """Tokens in the state but absent from the scored docs are fine
        (scoring a subset of the folded union)."""
        root = str(tmp_path / "df")
        folded = _docs([0, 1], ["en", "en"], ["aa bb cc", "aa dd"]).select(
            ["doc_id", "text"])
        st.df_counts_epoch(ray.data.from_arrow(folded), root)
        subset = _docs([0], ["en"], ["aa bb cc"]).select(["doc_id", "text"])
        out = st.tfidf_from_state(
            ray.data.from_arrow(subset), root, k=3).to_pandas()
        assert set(out["doc_id"]) == {0}


class TestStreamingBigramLM:
    def _tbl(self, seed=13, n=45):
        rng = np.random.default_rng(seed)
        words = [f"w{i}" for i in range(12)]
        return _docs(np.arange(n), ["en"] * n,
                     [" ".join(rng.choice(words, 9)) for _ in range(n)]
                     ).select(["doc_id", "text"])

    def _batch(self, tbl):
        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            bigram_lm_score,
        )

        return bigram_lm_score(ray.data.from_arrow(tbl)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    def test_three_epochs_any_order_equal_batch(self, ray_session, tmp_path):
        tbl = self._tbl()
        ids = tbl.column("doc_id").to_numpy()
        batch = self._batch(tbl)
        for name, order in (("a", (0, 1, 2)), ("b", (2, 0, 1))):
            root = str(tmp_path / f"bg_{name}")
            for p in order:
                st.bigram_counts_epoch(
                    ray.data.from_arrow(tbl.filter(pa.array(ids % 3 == p))),
                    root)
            inc = st.lm_score_from_state(ray.data.from_arrow(tbl), root) \
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            assert inc.equals(batch), name

    def test_subset_scoring_ok(self, ray_session, tmp_path):
        tbl = self._tbl()
        root = str(tmp_path / "bg")
        st.bigram_counts_epoch(ray.data.from_arrow(tbl), root)
        sub = tbl.slice(0, 5)
        out = st.lm_score_from_state(ray.data.from_arrow(sub), root) \
            .to_pandas()
        assert set(out["doc_id"]) <= set(range(5))
        batch = self._batch(tbl)
        merged = out.sort_values("doc_id").reset_index(drop=True)
        ref = batch[batch["doc_id"] < 5].reset_index(drop=True)
        assert merged.equals(ref)

    def test_unfolded_bigram_fails_loudly(self, ray_session, tmp_path):
        root = str(tmp_path / "bg")
        st.bigram_counts_epoch(
            ray.data.from_arrow(_docs([0], ["en"], ["aa bb aa"]).select(
                ["doc_id", "text"])), root)
        rogue = _docs([1], ["en"], ["zz qq"]).select(["doc_id", "text"])
        with pytest.raises(Exception, match="not in the folded bigram"):
            st.lm_score_from_state(ray.data.from_arrow(rogue), root) \
                .to_pandas()

    def test_reshard_then_fold_equal_batch(self, ray_session, tmp_path):
        tbl = self._tbl(seed=14)
        ids = tbl.column("doc_id").to_numpy()
        root = str(tmp_path / "bg")
        st.bigram_counts_epoch(
            ray.data.from_arrow(tbl.filter(pa.array(ids % 2 == 0))), root,
            num_buckets=4)
        r = st.reshard_bigram_state(root, 16)
        assert r["num_buckets"] == 16
        st.bigram_counts_epoch(
            ray.data.from_arrow(tbl.filter(pa.array(ids % 2 == 1))), root)
        inc = st.lm_score_from_state(ray.data.from_arrow(tbl), root) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert inc.equals(self._batch(tbl))


class TestBigramStateVacuum:
    def test_vacuum_keeps_current_state(self, ray_session, tmp_path):
        """The generic lake vacuum covers the bigram state family: old
        epoch files go, the current state stays score-identical."""
        from kafka_connect_jdbc_flatten_ray.pipelines.ingest import vacuum
        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            bigram_lm_score,
        )

        rng = np.random.default_rng(15)
        words = [f"w{i}" for i in range(10)]
        tbl = _docs(np.arange(30), ["en"] * 30,
                    [" ".join(rng.choice(words, 8)) for _ in range(30)]
                    ).select(["doc_id", "text"])
        ids = tbl.column("doc_id").to_numpy()
        root = str(tmp_path / "lake")
        for p in range(3):
            st.bigram_counts_epoch(
                ray.data.from_arrow(tbl.filter(pa.array(ids % 3 == p))),
                root)
        removed = vacuum(root, keep_epochs=1)
        assert removed.get(st.BIGRAM_TABLE, 0) > 0
        inc = st.lm_score_from_state(ray.data.from_arrow(tbl), root) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        batch = bigram_lm_score(ray.data.from_arrow(tbl)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert inc.equals(batch)


class TestBPEFromState:
    def test_any_order_folds_equal_batch(self, ray_session, tmp_path):
        from kafka_connect_jdbc_flatten_ray.stages.textops import bpe_merges

        tbl = _corpus(seed=7, n=60)
        ids = tbl.column("doc_id").to_numpy()
        batch = bpe_merges(
            ray.data.from_arrow(tbl.select(["doc_id", "text"])),
            num_merges=6)
        for name, order in (("a", (0, 1, 2)), ("b", (2, 1, 0))):
            root = str(tmp_path / f"bpe_{name}")
            for p in order:
                st.term_counts_epoch(
                    ray.data.from_arrow(tbl.filter(pa.array(ids % 3 == p))),
                    root)
            inc = st.bpe_merges_from_state(root, num_merges=6)
            assert inc.equals(batch), name

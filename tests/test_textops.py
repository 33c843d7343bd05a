"""Text-analysis operator tests (pure Arrow except TF-IDF)."""

import numpy as np
import pyarrow as pa
import ray.data

from kafka_connect_jdbc_flatten_ray.stages.textops import (
    Fingerprint,
    LangId,
    QualityScore,
    RepetitionStats,
    TokenCount,
)


def batch(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


class TestTokenCount:
    def test_counts_match_split_semantics(self):
        out = TokenCount()(batch(["a b c", "one", "a  b", ""])).to_pylist()
        # single-space split keeps empties: 'a  b' -> ['a','','b'], '' -> ['']
        assert [r["n_tokens"] for r in out] == [3, 1, 3, 1]


class TestQuality:
    def test_metrics(self):
        out = QualityScore()(batch(["the cat, the dog!"])).to_pylist()[0]
        assert out["n_chars"] == 17
        assert out["n_tokens"] == 4
        assert out["punct_chars"] == 2  # ',' and '!'
        assert out["stop_hits"] == 2  # 'the' twice


class TestLangId:
    def test_language_guess(self):
        out = LangId()(
            batch(
                [
                    "the cat and the dog",
                    "der hund und die katze ist",
                    "le chat et la maison est",
                    "el perro y la casa es",
                    "xyz qqq",  # no hits anywhere -> priority tie-break = en
                ]
            )
        ).to_pylist()
        assert [r["lang_guess"] for r in out] == ["en", "de", "fr", "es", "en"]


class TestFingerprint:
    def test_matches_reference_polynomial(self):
        texts = ["hello world", "hello worlD", "", "hello world"]
        out = Fingerprint()(batch(texts)).to_pylist()

        def ref(s):
            h = 0
            for b in s.encode():
                h = (h * 1000003 + b) % (1 << 64)
            return h - (1 << 64) if h >= (1 << 63) else h

        assert [r["fingerprint"] for r in out] == [ref(t) for t in texts]
        assert out[0]["fingerprint"] == out[3]["fingerprint"]
        assert out[0]["fingerprint"] != out[1]["fingerprint"]


class TestRepetitionStats:
    def test_metrics_vs_per_row_reference(self):
        from collections import Counter

        texts = [
            "a b a b a b",        # top bigram (a,b) x3
            "x",                  # single token: no bigrams
            "a a a a",            # (a,a) x3, 1 distinct token
            "one two three four", # all unique
            "",                   # split('') -> [''] one empty token
            "a  b",               # '' token in the middle
        ]
        out = RepetitionStats()(batch(texts)).to_pylist()
        for row, text in zip(out, texts):
            toks = text.split(" ")
            bigr = Counter(zip(toks, toks[1:]))
            assert row["n_tokens"] == len(toks)
            assert row["n_distinct_tokens"] == len(set(toks))
            assert row["n_bigrams"] == max(len(toks) - 1, 0)
            assert row["top_bigram_count"] == (max(bigr.values()) if bigr else 0)

    def test_empty_batch(self):
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        out = RepetitionStats()(empty)
        assert out.num_rows == 0
        assert out.schema.names == [
            "doc_id", "n_tokens", "n_distinct_tokens",
            "n_bigrams", "top_bigram_count",
        ]


class TestTfidf:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import pandas as pd

        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            tfidf_top_terms,
        )

        rng = np.random.default_rng(4)
        words = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(words, 15)) for _ in range(50)]
        tbl = pa.table({
            "doc_id": pa.array(np.arange(50, dtype=np.int64)),
            "text": pa.array(texts),
        })
        got = tfidf_top_terms(ray.data.from_arrow(tbl), 50, k=3) \
            .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", tbl.to_pandas())
        odf = con.sql("""
            WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
                       AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
            df AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.token,
                         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6)
                           AS score
                  FROM tf CROSS JOIN n JOIN df USING (token))
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, token) AS BIGINT) AS rank,
                   token, score
            FROM s QUALIFY rank <= 3
            ORDER BY doc_id, rank
        """).df().reset_index(drop=True)
        assert got.equals(odf)

    def test_common_term_scores_zero(self, ray_session):
        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            tfidf_top_terms,
        )

        # 'the' appears in EVERY doc -> idf = ln(1) = 0; unique terms win
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["the alpha", "the beta", "the gamma"]),
        })
        got = tfidf_top_terms(ray.data.from_arrow(tbl), 3, k=1).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.token.tolist() == ["alpha", "beta", "gamma"]
        assert (got.score > 0).all()


class TestGopherQuality:
    def _run(self, texts, **kw):
        import pyarrow as pa

        from kafka_connect_jdbc_flatten_ray.stages.textops import GopherQuality

        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        })
        return GopherQuality(**kw)(t).to_pylist()

    def test_metrics_and_keep(self):
        out = self._run(
            ["the cat sat on the mat with a hat",   # 9 words, 2+ stops
             "short",                                # 1 word
             "a b c d e f g h i j"],                 # 10 words, mwl 1, 0 stops
            min_words=5, min_mean_word_len=2.0, min_stop_hits=2,
        )
        assert out[0]["n_words"] == 9
        assert out[0]["gopher_stop_hits"] == 3   # the, the, with
        assert out[0]["keep"] is True or out[0]["keep"] == True  # noqa: E712
        assert not out[1]["keep"]                # too few words
        assert not out[2]["keep"]                # mwl 1.0 < 2.0, no stops

    def test_alpha_fraction(self):
        out = self._run(
            ["the of 123 ab7 word to and that more words here ok"],
            min_words=5, min_alpha_frac=0.9,
        )
        # 12 words, 2 non-alpha (123, ab7) -> 10/12 = 0.833333 < 0.9
        assert abs(out[0]["frac_alpha_words"] - round(10 / 12, 6)) < 1e-12
        assert not out[0]["keep"]

    def test_matches_duckdb(self, sf_dir):
        import duckdb
        import pyarrow.parquet as pq

        from kafka_connect_jdbc_flatten_ray.pipelines.data_queries import (
            _gopher_quality_sql,
        )
        from kafka_connect_jdbc_flatten_ray.stages.textops import GopherQuality

        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
        got = GopherQuality(min_words=40)(t).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        want = con.execute(_gopher_quality_sql(min_words=40)).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want[got.columns])
        assert 0 < got["keep"].sum() < len(got)  # both branches exercised


class TestBigramLM:
    def test_tiny_known_probabilities(self, ray_session):
        import math

        import pyarrow as pa
        import ray.data

        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            bigram_lm_score,
        )

        # corpus bigrams: (a b) x2, (b a) x1, (b b) x1
        # c(a,.) = 2, c(b,.) = 2 -> P(b|a)=1, P(a|b)=1/2, P(b|b)=1/2
        docs = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b a b", "b b"]),
        })
        out = {r["doc_id"]: r for r in
               bigram_lm_score(ray.data.from_arrow(docs)).take_all()}
        # doc 0: bigrams (a b), (b a), (a b) -> lps ln1, ln.5, ln1
        assert out[0]["n_bigrams"] == 3
        assert out[0]["avg_logprob"] == round(math.log(0.5) / 3, 6)
        # doc 1: (b b) -> ln .5
        assert out[1]["n_bigrams"] == 1
        assert out[1]["avg_logprob"] == round(math.log(0.5), 6)

    def test_single_token_docs_absent(self, ray_session):
        import pyarrow as pa
        import ray.data

        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            bigram_lm_score,
        )

        docs = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["lonely", "two words"]),
        })
        out = bigram_lm_score(ray.data.from_arrow(docs)).take_all()
        assert [r["doc_id"] for r in out] == [1]

    def test_matches_duckdb(self, ray_session, sf_dir):
        import duckdb
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.data_queries import (
            ORACLE_BIGRAM_LM,
        )
        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            bigram_lm_score,
        )
        from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

        docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
        got = bigram_lm_score(docs).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')")
        want = con.execute(ORACLE_BIGRAM_LM).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want[got.columns])


class TestBPEMerges:
    def _naive_bpe(self, word_counts, k):
        """Deliberately-naive reference: dict-of-tuples symbol sequences,
        greedy left-to-right merge application."""
        vocab = {w: list(w) for w in word_counts}

        merges = []
        for rank in range(1, k + 1):
            pairs = {}
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pairs[p] = pairs.get(p, 0) + word_counts[w]
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            (l, r), c = best
            merges.append((rank, l, r, c))
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
        return merges

    def test_matches_naive_reference(self, ray_session, sf_dir):
        import collections

        import pyarrow.parquet as pq
        import ray.data

        from kafka_connect_jdbc_flatten_ray.stages.textops import bpe_merges
        from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

        docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
        got = [tuple(r) for r in bpe_merges(docs, num_merges=10)
               .itertuples(index=False)]
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        wc = collections.Counter(
            w for s in t.column("text").to_pylist() for w in s.split(" "))
        assert got == self._naive_bpe(wc, 10)

    def test_overlap_greedy(self, ray_session):
        """'aaa' with merge (a,a): greedy left-to-right yields [aa, a] —
        the second merge then pairs (aa, a)."""
        import pyarrow as pa
        import ray.data

        from kafka_connect_jdbc_flatten_ray.stages.textops import bpe_merges

        docs = pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["aaa aaa aaa"]),
        })
        got = [tuple(r) for r in
               bpe_merges(ray.data.from_arrow(docs), num_merges=2)
               .itertuples(index=False)]
        # per word 'aaa': pairs (a,a) x2, count 3 words -> 6
        assert got[0] == (1, "a", "a", 6)
        # after merge: [aa, a] per word -> pair (aa, a) x3
        assert got[1] == (2, "aa", "a", 3)

    def test_vocab_guard(self, ray_session, monkeypatch):
        import pyarrow as pa
        import pytest
        import ray.data

        import kafka_connect_jdbc_flatten_ray.stages.textops as tx

        monkeypatch.setattr(tx, "MAX_BPE_VOCAB", 2)
        docs = pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["one two three four"]),
        })
        with pytest.raises(ValueError, match="MAX_BPE_VOCAB"):
            tx.bpe_merges(ray.data.from_arrow(docs), num_merges=2)


class TestBPEEncode:
    def test_counts_match_naive_apply(self, ray_session):
        import pyarrow as pa
        import ray.data

        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            bpe_encode_counts,
        )

        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["abab ab", "aaa", ""]),
        })
        # merges: (a,b) then (ab,ab)
        out = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode_counts(
            ray.data.from_arrow(docs), [("a", "b"), ("ab", "ab")]
        ).take_all()}
        # 'abab' -> [ab, ab] -> [abab] (1); 'ab' -> [ab] (1) => doc0 = 2
        # 'aaa' -> no merges apply => 3 symbols
        # '' -> one empty word, zero symbols
        assert out == {0: 2, 1: 3, 2: 0}


class TestBigramLMSalted:
    def test_salted_equals_unsalted(self, ray_session, sf_dir):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            bigram_lm_score,
        )
        from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

        docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
        plain = bigram_lm_score(docs).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        for s in (4, 16):
            salted = bigram_lm_score(docs, salt_contexts=s).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True)
            assert salted.equals(plain), s

    def test_salted_guard_names_remedy(self, ray_session, monkeypatch):
        import pyarrow as pa
        import pytest
        import ray.data

        import kafka_connect_jdbc_flatten_ray.stages.windows as win
        from kafka_connect_jdbc_flatten_ray.stages.textops import (
            bigram_lm_score,
        )

        monkeypatch.setattr(win, "MAX_GROUP_ROWS", 3)
        docs = pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array(["the cat " + f"x{i}" for i in range(20)]),
        })
        with pytest.raises(Exception, match="salt_contexts"):
            bigram_lm_score(ray.data.from_arrow(docs),
                            salt_contexts=1).to_pandas()

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

"""Text-analysis operator tests (pure Arrow, no Ray)."""

import pyarrow as pa

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

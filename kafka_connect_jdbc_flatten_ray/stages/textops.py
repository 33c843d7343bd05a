"""Text-analysis operators for training-data pipelines over ``documents``.

All hot paths are vectorized (pyarrow.compute / numpy over flattened token
arrays); stopword sets and compiled state live in actor ``__init__``.

Operators:
- token counting (whitespace tokens; SQL-parity with string_split)
- quality scoring (char/word/punct/stopword counts — integer metrics so a
  DuckDB oracle reproduces them exactly)
- language id (stopword-hit argmax over 4 language sets with a fixed
  priority tie-break, SQL-expressible)
- document fingerprinting (64-bit polynomial rolling hash over bytes,
  vectorized with segmented modpow — not SQL-expressible; rows-only check)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# fixed stopword sets (priority order for ties: en > de > fr > es)
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")

# polynomial fingerprint base; arithmetic is mod 2^64 (natural uint64 wrap)
BASE = np.uint64(1000003)


def _tokens(text: pa.Array):
    """(flat tokens, parent doc indices, tokens-per-doc) via single-space
    split — matches DuckDB ``string_split(text, ' ')``."""
    toks = pc.split_pattern(text, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    parent = np.repeat(np.arange(len(text), dtype=np.int64), lens)
    return pc.list_flatten(toks), parent, lens


def _count_hits(flat: pa.Array, parent: np.ndarray, n_docs: int, words) -> np.ndarray:
    hits = pc.is_in(flat, value_set=pa.array(list(words))).to_numpy(
        zero_copy_only=False
    )
    out = np.zeros(n_docs, np.int64)
    np.add.at(out, parent[hits], 1)
    return out


class TokenCount:
    """doc -> whitespace token count."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        _, _, lens = _tokens(text)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": pa.array(lens, pa.int64())}
        )


class QualityScore:
    """Integer quality metrics: n_chars, n_tokens, punct_chars, stop_hits."""

    def __init__(self):
        self.stop = STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        flat, parent, lens = _tokens(text)
        stop_hits = _count_hits(flat, parent, n, self.stop)
        n_chars = pc.utf8_length(text)
        # punct = chars that are not alnum and not space
        stripped = pc.replace_substring_regex(text, r"[A-Za-z0-9 ]", "")
        punct = pc.utf8_length(stripped)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "punct_chars": pc.cast(punct, pa.int64()),
                "stop_hits": pa.array(stop_hits, pa.int64()),
            }
        )


#: Gopher's required-word set (Rae et al. 2021 §A1.1: a document must
#: contain >= 2 of these to pass the quality rules)
GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")


class GopherQuality:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 — the
    document-level subset that applies to whitespace-tokenized text):
    word-count bounds, mean-word-length bounds, alphabetic-word fraction,
    and the required-word count, plus the composite ``keep`` flag. All
    ratios round to 6 decimals BEFORE threshold comparison so the flag is
    bit-identical to the SQL mirror. Fully vectorized: one split, flat
    per-token kernels, np.add.at segment sums — no per-doc loop."""

    def __init__(
        self,
        min_words: int = 50,
        max_words: int = 100_000,
        min_mean_word_len: float = 3.0,
        max_mean_word_len: float = 10.0,
        min_alpha_frac: float = 0.8,
        min_stop_hits: int = 2,
    ):
        self.min_words = min_words
        self.max_words = max_words
        self.min_mwl = min_mean_word_len
        self.max_mwl = max_mean_word_len
        self.min_alpha = min_alpha_frac
        self.min_stop = min_stop_hits

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        flat, parent, lens = _tokens(text)
        denom = np.maximum(lens, 1)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        tot_len = np.zeros(n, np.int64)
        np.add.at(tot_len, parent, wlen.astype(np.int64))
        mwl = np.round(tot_len / denom, 6)
        alpha = pc.match_substring_regex(
            flat, r"^[A-Za-z]+$"
        ).to_numpy(zero_copy_only=False)
        n_alpha = np.zeros(n, np.int64)
        np.add.at(n_alpha, parent, alpha.astype(np.int64))
        frac_alpha = np.round(n_alpha / denom, 6)
        stop_hits = _count_hits(flat, parent, n, GOPHER_STOP)
        keep = (
            (lens >= self.min_words) & (lens <= self.max_words)
            & (mwl >= self.min_mwl) & (mwl <= self.max_mwl)
            & (frac_alpha >= self.min_alpha)
            & (stop_hits >= self.min_stop)
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(lens, pa.int64()),
                "mean_word_len": pa.array(mwl, pa.float64()),
                "frac_alpha_words": pa.array(frac_alpha, pa.float64()),
                "gopher_stop_hits": pa.array(stop_hits, pa.int64()),
                "keep": pa.array(keep),
            }
        )


class LangId:
    """Stopword-hit language guess with fixed priority tie-break."""

    def __init__(self):
        self.sets = {k: v for k, v in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        flat, parent, _ = _tokens(text)
        counts = {k: _count_hits(flat, parent, n, v) for k, v in self.sets.items()}
        guess = np.empty(n, dtype=object)
        # priority argmax: first language whose count >= all later ones
        c = [counts[k] for k in LANG_PRIORITY]
        guess[:] = LANG_PRIORITY[3]
        m3 = c[2] >= c[3]
        guess[m3] = LANG_PRIORITY[2]
        m2 = (c[1] >= c[2]) & (c[1] >= c[3])
        guess[m2] = LANG_PRIORITY[1]
        m1 = (c[0] >= c[1]) & (c[0] >= c[2]) & (c[0] >= c[3])
        guess[m1] = LANG_PRIORITY[0]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_guess": pa.array(list(guess), pa.string()),
                "hits_en": pa.array(counts["en"], pa.int64()),
                "hits_de": pa.array(counts["de"], pa.int64()),
                "hits_fr": pa.array(counts["fr"], pa.int64()),
                "hits_es": pa.array(counts["es"], pa.int64()),
            }
        )


class RepetitionStats:
    """Gopher-style repetition metrics (Rae et al. 2021 §A1.1), integer
    form so a DuckDB oracle reproduces them hash-exactly:

    - ``n_tokens``          whitespace tokens
    - ``n_distinct_tokens`` distinct tokens (dup-token fraction =
                            1 - distinct/total)
    - ``n_bigrams``         adjacent token pairs (= n_tokens - 1)
    - ``top_bigram_count``  occurrences of the doc's most frequent bigram
                            (top-2-gram fraction = top/total)

    Fully vectorized: one dictionary-encode over the batch's flattened
    tokens, then np.unique/np.maximum.at over integer keys — no per-doc
    Python loop."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        flat, parent, lens = _tokens(text)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vocab = int(codes.max()) + 1 if len(codes) else 1
        # distinct tokens per doc: unique (parent, code) pairs
        n_distinct = np.zeros(n, np.int64)
        if len(codes):
            uniq = np.unique(parent * vocab + codes)
            np.add.at(n_distinct, uniq // vocab, 1)
        # bigrams: adjacent positions with the same parent doc
        same = parent[:-1] == parent[1:] if len(codes) else np.zeros(0, bool)
        a, b, p = codes[:-1][same], codes[1:][same], parent[:-1][same]
        top = np.zeros(n, np.int64)
        if len(p):
            # two-step factorize keeps keys < 2^63: bigram id, then per-doc
            _, big_id = np.unique(a * vocab + b, return_inverse=True)
            nbig = int(big_id.max()) + 1
            combo, counts = np.unique(p * nbig + big_id, return_counts=True)
            np.maximum.at(top, combo // nbig, counts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(lens, pa.int64()),
                "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
                "n_bigrams": pa.array(np.maximum(lens - 1, 0), pa.int64()),
                "top_bigram_count": pa.array(top, pa.int64()),
            }
        )


def _bigram_rows(t: pa.Table) -> pa.Table:
    """Per-batch combiner: one (w1, w2, doc_id, m) row per distinct
    (doc, bigram), m = that bigram's occurrence count in the doc (a doc
    is one input row, so counts never span batches — m is exact)."""
    text = t.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    flat, parent, _ = _tokens(text)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    n_flat = len(flat)
    if n_flat < 2:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64()),
                         "m": pa.array([], pa.int64())})
    same = pa.array(parent[:-1] == parent[1:])
    rep = pa.table({
        "doc_id": pa.array(ids[parent[:-1]]),
        "w1": flat.slice(0, n_flat - 1),
        "w2": flat.slice(1, n_flat - 1),
    }).filter(same)
    agg = pa.TableGroupBy(rep, ["doc_id", "w1", "w2"]).aggregate(
        [("w1", "count")]
    ).rename_columns(["doc_id", "w1", "w2", "m"])
    return pa.table({
        "w1": agg.column("w1"),
        "w2": agg.column("w2"),
        "doc_id": agg.column("doc_id"),
        "m": pc.cast(agg.column("m"), pa.int64()),
    })


def bigram_lm_score(
    docs: ray.data.Dataset, salt_contexts: int | None = None
) -> ray.data.Dataset:
    """Bigram language-model quality score — the CCNet-style perplexity
    filter, MLE-trained on the scored corpus itself:

        score(doc) = round(mean over the doc's bigram occurrences of
                           ln P(w2 | w1), 6)
        P(w2 | w1) = c(w1,w2) / c(w1,·)   (c = corpus occurrence counts)

    100 TB shape: no count-table broadcast. The per-batch combiner emits
    one (w1, w2, doc_id, m) row per distinct (doc, bigram); because the
    training corpus IS the scored corpus, each (w1,w2) group already
    holds every occurrence, so c(w1,w2) is an in-group sum (no separate
    count rows ride the exchange), and each w1 group of the next stage
    sums to c(w1,·) the same way. Three groupbys total, all over small
    integer+token rows — text bodies never shuffle. Docs with < 2 tokens
    have no bigrams and are absent from the output (the SQL mirror's
    inner-join semantics). Hot LEFT contexts (a stop word's w1 group =
    every distinct (doc, follower) pair) are bounded by the loud
    MAX_GROUP_ROWS guard on the unsalted path; ``salt_contexts=S``
    sub-partitions every w1 group by doc hash (the stages/windows.py
    hot-key pattern): per-(w1, salt) partial sums reduce to one c(w1,·)
    row per context, which replicates to the S salted groups — two extra
    exchanges of partial rows, every group bounded by ~|w1 group| / S,
    output identical to the unsalted path row for row."""
    from kafka_connect_jdbc_flatten_ray.stages.windows import MAX_GROUP_ROWS

    group_limit = MAX_GROUP_ROWS  # captured driver-side

    rows = docs.map_batches(_bigram_rows, batch_format="pyarrow",
                            zero_copy_batch=True)

    def _attach_c12(g: pa.Table) -> pa.Table:
        c12 = int(pc.sum(g.column("m")).as_py())
        return pa.table({
            "w1": g.column("w1"),
            "doc_id": g.column("doc_id"),
            "m": g.column("m"),
            "c12": pa.array(np.full(g.num_rows, c12, np.int64)),
        })

    _attach_c12.__name__ = "attach_c12"

    def _attach_c1(g: pa.Table) -> pa.Table:
        if g.num_rows > group_limit:
            w1 = g.column("w1")[0].as_py()
            raise ValueError(
                f"bigram_lm_score: left context {w1!r} spans {g.num_rows} "
                f"(doc, bigram) rows (> {group_limit}); salt the w1 group "
                "by doc hash (windows.py pattern) before scoring"
            )
        m = g.column("m").to_numpy(zero_copy_only=False).astype(np.float64)
        c12 = g.column("c12").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = float(m.sum())
        return pa.table({
            "doc_id": g.column("doc_id"),
            "m": g.column("m"),
            "lp": pa.array(m * np.log(c12 / c1), pa.float64()),
        })

    _attach_c1.__name__ = "attach_c1"

    def _doc_avg(g: pa.Table) -> pa.Table:
        m = g.column("m").to_numpy(zero_copy_only=False)
        lp = g.column("lp").to_numpy(zero_copy_only=False)
        n = int(m.sum())
        return pa.table({
            "doc_id": pa.array([g.column("doc_id")[0].as_py()], pa.int64()),
            "avg_logprob": pa.array([round(float(lp.sum()) / n, 6)],
                                    pa.float64()),
            "n_bigrams": pa.array([n], pa.int64()),
        })

    _doc_avg.__name__ = "doc_avg_logprob"
    stage1 = rows.groupby(["w1", "w2"]).map_groups(
        _attach_c12, batch_format="pyarrow")
    if salt_contexts is None:
        scored = stage1.groupby("w1").map_groups(
            _attach_c1, batch_format="pyarrow")
    else:
        scored = _salted_attach_c1(stage1, salt_contexts, group_limit)
    return scored.groupby("doc_id").map_groups(
        _doc_avg, batch_format="pyarrow")


def _salted_attach_c1(
    stage1: ray.data.Dataset, num_salts: int, group_limit: int
) -> ray.data.Dataset:
    """Salted c(w1,·) attach: doc rows sub-partition by
    splitmix64(doc_id) % S; per-(w1, salt) partial sums reduce to one
    c1 row per w1, which replicates to every salt — so each salted group
    holds its bounded doc-row slice plus exactly one c1 carrier row."""
    from kafka_connect_jdbc_flatten_ray.functions.hashing import _splitmix64

    S = int(num_salts)

    def _salt(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        salt = (_splitmix64(did.view(np.uint64)) % np.uint64(S)).astype(
            np.int32)
        return t.append_column("__salt", pa.array(salt))

    salted = stage1.map_batches(_salt, batch_format="pyarrow",
                                zero_copy_batch=True)
    # c(w1,.) via bounded partials: per-(w1, salt) sums first (each group
    # bounded), then one tiny per-w1 reduce over <= S partial rows
    c1 = (
        salted.groupby(["w1", "__salt"]).sum("m")
        .map_batches(lambda t: pa.table({"w1": t.column("w1"),
                                         "c1_part": t.column("sum(m)")}),
                     batch_format="pyarrow")
        .groupby("w1").sum("c1_part")
    )

    def _replicate(t: pa.Table) -> pa.Table:
        n = t.num_rows
        w1 = t.column("w1")
        if isinstance(w1, pa.ChunkedArray):
            w1 = w1.combine_chunks()
        c = t.column("sum(c1_part)").to_numpy(zero_copy_only=False)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), S))
        return pa.table({
            "w1": w1.take(idx),
            "doc_id": pa.array(np.full(n * S, -1, np.int64)),
            "m": pa.array(np.repeat(c, S).astype(np.int64)),
            "c12": pa.array(np.zeros(n * S, np.int64)),
            "__salt": pa.array(np.tile(np.arange(S, dtype=np.int32), n)),
        })

    carriers = c1.map_batches(_replicate, batch_format="pyarrow")

    def _attach(g: pa.Table) -> pa.Table:
        if g.num_rows > group_limit:
            w1 = g.column("w1")[0].as_py()
            raise ValueError(
                f"bigram_lm_score: salted group for context {w1!r} holds "
                f"{g.num_rows} rows (> {group_limit}); raise salt_contexts"
            )
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        mv = g.column("m").to_numpy(zero_copy_only=False)
        is_c1 = did == -1
        keep = ~is_c1
        if not keep.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64()),
                             "lp": pa.array([], pa.float64())})
        c1v = float(mv[is_c1][0])
        m = mv[keep].astype(np.float64)
        c12 = g.column("c12").to_numpy(zero_copy_only=False)[keep].astype(
            np.float64)
        return pa.table({
            "doc_id": pa.array(did[keep]),
            "m": pa.array(mv[keep]),
            "lp": pa.array(m * np.log(c12 / c1v), pa.float64()),
        })

    _attach.__name__ = "attach_c1_salted"
    return salted.union(carriers).groupby(["w1", "__salt"]).map_groups(
        _attach, batch_format="pyarrow")


def _segmented_pow64(base: np.uint64, exps: np.ndarray) -> np.ndarray:
    """base**exps mod 2^64 (natural wrap), vectorized exp-by-squaring."""
    result = np.ones(len(exps), np.uint64)
    b = np.uint64(base)
    e = exps.astype(np.uint64).copy()
    with np.errstate(over="ignore"):
        while e.any():
            odd = (e & np.uint64(1)).astype(bool)
            if odd.any():
                result[odd] = result[odd] * b
            b = b * b
            e >>= np.uint64(1)
    return result


class Fingerprint:
    """64-bit polynomial rolling-hash fingerprint of the document bytes.

    hash(doc) = sum_i byte_i * BASE^(n-1-i)  (mod 2^64), computed over ALL
    documents at once on the flattened byte buffer — uint64 wraparound IS
    the modulus, so np.add.at segmented sums are exact."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        b = pc.cast(text, pa.large_binary())
        if b.null_count:
            b = pc.fill_null(b, b"")
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        off_buf = np.frombuffer(
            b.buffers()[1], np.int64, count=n + 1, offset=b.offset * 8
        )
        lens = np.diff(off_buf)
        total = int(off_buf[-1] - off_buf[0])
        flat = np.frombuffer(
            b.buffers()[2], np.uint8, count=total, offset=int(off_buf[0])
        ).astype(np.uint64)
        parent = np.repeat(np.arange(n, dtype=np.int64), lens)
        ends = np.cumsum(lens)
        pos = np.arange(total, dtype=np.int64)
        exps = (ends[parent] - 1) - pos
        powers = _segmented_pow64(BASE, exps)
        with np.errstate(over="ignore"):
            terms = powers * flat
        acc = np.zeros(n, np.uint64)
        np.add.at(acc, parent, terms)  # wraps mod 2^64 = the hash modulus
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(acc.view(np.int64), pa.int64()),
            }
        )


def _tf_rows(t: pa.Table) -> pa.Table:
    """Per-batch TF combiner: one (token, doc_id, tf) row per distinct
    (doc, token) pair (a doc is one input row, so its tokens never span
    batches — tf is exact, not partial)."""
    text = t.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    rep = pa.table({
        "doc_id": pa.array(np.repeat(ids, lens)),
        "token": pc.list_flatten(toks),
    })
    agg = pa.TableGroupBy(rep, ["doc_id", "token"]).aggregate(
        [("token", "count")]
    ).rename_columns(["doc_id", "token", "tf"])
    return pa.table({
        "token": agg.column("token"),
        "doc_id": agg.column("doc_id"),
        "tf": pc.cast(agg.column("tf"), pa.int64()),
    })


def _doc_topk_fn(k: int):
    """Per-doc top-k by (score desc, token asc) — the shared rank rule of
    the batch and incremental TF-IDF paths."""

    def _doc_topk(g: pa.Table) -> pa.Table:
        sc = g.column("score").to_numpy(zero_copy_only=False)
        tok = g.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        codes = pc.dictionary_encode(tok)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        # rank by (score desc, token asc): sort token codes by their
        # string order first so lexsort's tie-break is lexicographic
        srt = pc.array_sort_indices(codes.dictionary)
        rankmap = np.empty(len(codes.dictionary), np.int64)
        rankmap[srt.to_numpy(zero_copy_only=False)] = np.arange(
            len(codes.dictionary))
        tok_rank = rankmap[codes.indices.to_numpy(zero_copy_only=False)]
        order = np.lexsort((tok_rank, -sc))[:k]
        out = g.take(pa.array(order))
        return pa.table({
            "doc_id": out.column("doc_id"),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "token": out.column("token"),
            "score": out.column("score"),
        })

    return _doc_topk


def tfidf_top_terms(
    docs: ray.data.Dataset, total_docs: int, k: int = 3
) -> ray.data.Dataset:
    """Top-k TF-IDF terms per document: score = tf * ln(N / df), rounded
    to 6 decimals BEFORE ranking (ties break token-ascending) so the
    value — and the borderline keep/drop decision — is oracle-comparable.

    100 TB shape: no vocabulary broadcast. Per-batch term counts are the
    combiner (one (doc, token, tf) row per distinct pair per batch; df
    partials ride the same rows), df attaches via the union + groupby
    trick the slim dedup family uses (each token's rows meet in one
    group; the exchange carries 8-byte-ish rows, never text bodies), and
    the final per-doc top-k is a second groupby. ``total_docs`` is the
    corpus size N (a count the caller already has — requiring it keeps
    this function one pass instead of two).
    """
    tf = docs.map_batches(_tf_rows, batch_format="pyarrow",
                          zero_copy_batch=True)

    def _attach_idf(g: pa.Table) -> pa.Table:
        """One token's (doc_id, tf) rows: df = number of rows (each doc
        contributes exactly one row per token), idf computed in place."""
        tok = g.column("token")
        n_df = g.num_rows
        tfv = g.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.round(tfv * np.log(float(total_docs) / n_df), 6)
        return pa.table({
            "doc_id": g.column("doc_id"),
            "token": tok,
            "score": pa.array(score, pa.float64()),
        })

    scored = tf.groupby("token").map_groups(
        _attach_idf, batch_format="pyarrow"
    )
    return scored.groupby("doc_id").map_groups(
        _doc_topk_fn(k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# BPE merge training (tokenizer prep)
# ---------------------------------------------------------------------------

#: loud bound on the driver-side vocabulary (distinct words). BPE trains
#: on the word-FREQUENCY table, which is Heaps'-law sublinear in corpus
#: size — the classic Sennrich setup — so the distributed part is the
#: word count and only the compact vocab reaches the driver.
MAX_BPE_VOCAB = 5_000_000


def _bpe_greedy_merge(sym: np.ndarray, starts: np.ndarray,
                      pair: tuple[str, str]) -> tuple[np.ndarray, np.ndarray]:
    """Apply one merge greedily left-to-right to every word at once.
    ``sym`` = flat symbol array, ``starts`` = word start offsets (ends
    with len(sym)). Vectorized: match positions, resolve overlapping runs
    by keeping even positions within each run (= left-to-right greedy),
    then rebuild the flat array with the right-hand symbols dropped."""
    n = len(sym)
    if n < 2:
        return sym, starts
    word_of = np.searchsorted(starts, np.arange(n), side="right")
    m = np.zeros(n, bool)
    m[:-1] = (sym[:-1] == pair[0]) & (sym[1:] == pair[1]) \
        & (word_of[:-1] == word_of[1:])
    if not m.any():
        return sym, starts
    # greedy within runs of consecutive matches: keep every other match
    idx = np.flatnonzero(m)
    run_start = idx[np.concatenate(([True], np.diff(idx) != 1))]
    run_id = np.cumsum(np.concatenate(([True], np.diff(idx) != 1))) - 1
    keep = idx[(idx - run_start[run_id]) % 2 == 0]
    merged = np.zeros(n, bool)
    merged[keep] = True          # position i becomes pair[0]+pair[1]
    drop = np.zeros(n, bool)
    drop[keep + 1] = True        # position i+1 disappears
    out = sym.astype(object).copy()
    out[merged] = pair[0] + pair[1]
    keep_mask = ~drop
    # new word starts: count of surviving symbols before each old start
    surv_before = np.concatenate(([0], np.cumsum(keep_mask)))
    new_starts = surv_before[starts]
    return out[keep_mask], new_starts


def bpe_merges(
    docs: ray.data.Dataset, num_merges: int = 8, text: str = "text"
) -> "pd.DataFrame":
    """Train ``num_merges`` BPE merges (Sennrich et al. 2016) over the
    corpus and return them as (rank, left, right, pair_count), fully
    deterministic: each step merges the adjacent symbol pair with the
    highest total frequency, ties broken (left ASC, right ASC).

    100 TB shape: the DISTRIBUTED pass is a word-frequency count (the
    per-batch combiner emits (word, count) partials; only those shuffle).
    Training then runs on the compact Heaps'-law vocabulary driver-side,
    vectorized numpy over the flat symbol array — guarded loudly at
    MAX_BPE_VOCAB distinct words. Word-internal merges only (no
    end-of-word marker), matching the SQL oracle's greedy string-replace
    unroll stage for stage."""
    import pandas as pd

    def _word_partial(t: pa.Table) -> pa.Table:
        txt = t.column(text)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(toks)
        agg = pa.TableGroupBy(pa.table({"word": flat}), ["word"]).aggregate(
            [("word", "count")]
        ).rename_columns(["word", "count"])
        return pa.table({"word": agg.column("word"),
                         "count": pc.cast(agg.column("count"), pa.int64())})

    vocab_rows = (
        docs.map_batches(_word_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("word").sum("count")
        .take_all()
    )
    if len(vocab_rows) > MAX_BPE_VOCAB:
        raise ValueError(
            f"bpe_merges: vocabulary has {len(vocab_rows)} distinct words "
            f"(> {MAX_BPE_VOCAB}); raise MAX_BPE_VOCAB or pre-filter the "
            "corpus (the word-frequency table must fit the driver)"
        )
    words = [r["word"] for r in vocab_rows]
    wcount = np.array([r["sum(count)"] for r in vocab_rows], np.int64)
    return _train_from_vocab(words, wcount, num_merges)


def _train_from_vocab(
    words: list, wcount: np.ndarray, num_merges: int
) -> "pd.DataFrame":
    """Driver-side BPE training over a compact (word, count) vocabulary —
    shared by batch :func:`bpe_merges` and the term-state read path
    (streaming_terms.bpe_merges_from_state)."""
    import pandas as pd

    # flat symbol array over the vocab (one entry per char initially)
    sym = np.array([c for w in words for c in w], dtype=object)
    lens = np.array([len(w) for w in words], np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))  # len == vocab+1

    merges = []
    for rank in range(1, num_merges + 1):
        n = len(sym)
        if n < 2:
            break
        word_of = np.searchsorted(starts, np.arange(n), side="right")
        valid = np.zeros(n, bool)
        valid[:-1] = word_of[:-1] == word_of[1:]
        li = np.flatnonzero(valid)
        if not len(li):
            break
        left, right = sym[li], sym[li + 1]
        w = wcount[word_of[li] - 1]
        key = pd.DataFrame({"l": left.astype(str), "r": right.astype(str),
                            "c": w})
        agg = key.groupby(["l", "r"], as_index=False)["c"].sum()
        agg = agg.sort_values(["c", "l", "r"],
                              ascending=[False, True, True])
        best = agg.iloc[0]
        merges.append((rank, best["l"], best["r"], int(best["c"])))
        sym, starts = _bpe_greedy_merge(sym, starts, (best["l"], best["r"]))
    return pd.DataFrame(merges,
                        columns=["rank", "left", "right", "pair_count"])


def bpe_encode_counts(
    docs: ray.data.Dataset,
    merges: "pd.DataFrame | list[tuple[str, str]]",
    text: str = "text",
) -> ray.data.Dataset:
    """Apply trained BPE merges (in rank order) to every document and
    count the resulting tokens — the trained-tokenizer analogue of
    TokenCount. The merge list is tiny and broadcast once (ray.put);
    each batch builds ONE flat symbol array over all its docs' words
    (word boundaries stop merges, doc boundaries are implied) and applies
    the merges with the same vectorized greedy run-resolution the trainer
    uses — no per-doc Python in the merge loop."""
    import pandas as pd
    import ray as _ray

    if isinstance(merges, pd.DataFrame):
        pairs = [(l, r) for l, r in zip(merges["left"], merges["right"])]
    else:
        pairs = list(merges)
    mref = _ray.put(pairs)

    def _encode(t: pa.Table) -> pa.Table:
        ms = _ray.get(mref)
        txt = t.column(text)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n = t.num_rows
        flat, parent, lens = _tokens(txt)
        words = flat.to_pylist()
        sym = np.array([c for w in words for c in w], dtype=object)
        wlens = np.fromiter((len(w) for w in words), np.int64, len(words))
        starts = np.concatenate(([0], np.cumsum(wlens)))
        for pair in ms:
            sym, starts = _bpe_greedy_merge(sym, starts, pair)
        # tokens per word = diff of starts; sum per doc
        per_word = np.diff(starts)
        out = np.zeros(n, np.int64)
        if len(per_word):
            np.add.at(out, parent, per_word)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bpe_tokens": pa.array(out, pa.int64()),
        })

    _encode.__name__ = "bpe_encode"
    return docs.map_batches(_encode, batch_format="pyarrow",
                            zero_copy_batch=True)

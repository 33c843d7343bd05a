"""Training-data pipeline queries (dedup / text analysis / ANN) and their
DuckDB oracles where SQL-expressible.

SQL-expressible (full value-hash oracle): exact dedup, token count, quality
metrics, language id, brute-force ANN top-k.
Rows-only (driver records weaker check): MinHash/SimHash/ngram/embedding
near-dup pairs (LSH randomness is seeded and deterministic but not SQL),
document fingerprint (mod-2^64 polynomial hash), IVF ANN.
"""

from __future__ import annotations

import ray.data

from kafka_connect_jdbc_flatten_ray.util import default_pool, read_parquet_clean

from kafka_connect_jdbc_flatten_ray.pipelines import dedup_oracles
from kafka_connect_jdbc_flatten_ray.stages import ann, dedup, textops


def _docs(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def q_dedup_exact(sf_dir: str):
    return dedup.dedup_exact(_docs(sf_dir))


def q_dedup_minhash(sf_dir: str):
    return dedup.dedup_minhash_pairs(_docs(sf_dir), threshold=0.5)


def q_dedup_minhash_slim(sf_dir: str):
    return dedup.dedup_minhash_pairs_slim(_docs(sf_dir), threshold=0.5)


def q_dedup_simhash(sf_dir: str):
    return dedup.dedup_simhash_pairs(_docs(sf_dir), max_hamming=3)


def q_dedup_ngram(sf_dir: str):
    return dedup.dedup_ngram_jaccard_pairs(_docs(sf_dir), threshold=0.5)


def q_dedup_minhash_keep(sf_dir: str):
    return dedup.dedup_minhash_keep(_docs(sf_dir), threshold=0.95)


def q_dedup_clusters(sf_dir: str):
    return dedup.dedup_minhash_clusters(_docs(sf_dir), threshold=0.9)


def q_approx_distinct_users(sf_dir: str):
    from kafka_connect_jdbc_flatten_ray.stages.sketches import approx_distinct

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])
    return approx_distinct(ds, "user_id")


def q_approx_distinct_incremental(sf_dir: str):
    """Streaming counterpart to approx_distinct: fold the event stream in
    three epochs through a lake-resident HLL register file — register max
    is commutative and idempotent, so the final estimate shares the batch
    HLL SQL oracle verbatim."""
    import tempfile

    import numpy as np
    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import sketches

    root = tempfile.mkdtemp(prefix="kcjf_hll_state_")
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])

    def _part(part: int):
        def _f(t):
            ids = t.column("user_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"hll_epoch_part_{part}"
        return _f

    for part in range(3):
        sketches.hll_epoch(
            ds.map_batches(_part(part), batch_format="pyarrow",
                           zero_copy_batch=True),
            root, "user_id",
        )
    return sketches.read_estimate(root)


def q_dedup_embedding_slim(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(0).slice(0, 1)
    dim = len(t.column("embedding")[0])
    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return dedup.dedup_embedding_pairs_slim(emb, dim, threshold=0.35)


def q_dedup_embedding(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(0).slice(0, 1)
    dim = len(t.column("embedding")[0])
    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return dedup.dedup_embedding_pairs(emb, dim, threshold=0.35)


def q_dedup_embedding_incremental(sf_dir: str):
    """Streaming counterpart to dedup_embedding_pairs: fold the vectors in
    three epochs through lake-resident hyperplane-bucket state, then read
    the pair set — touched (table, bucket) stars recompute in full, so
    arrival order never matters and the query shares the batch embedding
    SQL oracle verbatim."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_connect_jdbc_flatten_ray.stages import streaming_dedup as sd

    t = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(0).slice(0, 1)
    dim = len(t.column("embedding")[0])
    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    root = tempfile.mkdtemp(prefix="kcjf_emb_state_")

    def _part(part: int):
        def _f(t):
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"emb_epoch_part_{part}"
        return _f

    for part in range(3):
        sd.embedding_pairs_epoch(
            emb.map_batches(_part(part), batch_format="pyarrow",
                            zero_copy_batch=True),
            root, dim, threshold=0.35,
        )
    return sd.read_embedding_pairs(root)


def q_tfidf_top_terms(sf_dir: str):
    """Top-3 TF-IDF terms per document, scored tf * ln(N/df) rounded to 6
    decimals before ranking; df attaches via the union+groupby trick (no
    vocabulary broadcast — 8-byte-ish exchange rows, never text)."""
    import pyarrow.parquet as pq

    from kafka_connect_jdbc_flatten_ray.stages.textops import tfidf_top_terms

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return tfidf_top_terms(_docs(sf_dir), n, k=3)


ORACLE_TFIDF = """
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
      FROM tf CROSS JOIN n JOIN df USING (token))
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, token) AS BIGINT) AS rank,
       token, score
FROM s QUALIFY rank <= 3
"""


def q_tfidf_incremental(sf_dir: str):
    """Streaming TF-IDF: fold the corpus statistics (per-token document
    frequency + running N) in three epochs through lake-resident df
    state, then score the corpus against the accumulated statistics —
    addition is commutative, so the result equals batch tfidf_top_terms
    and shares its SQL oracle verbatim."""
    import tempfile

    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import streaming_terms as st

    root = tempfile.mkdtemp(prefix="kcjf_df_state_")
    ds = _docs(sf_dir)

    def _part(part: int):
        def _f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"df_epoch_part_{part}"
        return _f

    for part in range(3):
        st.df_counts_epoch(
            ds.map_batches(_part(part), batch_format="pyarrow",
                           zero_copy_batch=True),
            root,
        )
    return st.tfidf_from_state(_docs(sf_dir), root, k=3)


def q_bigram_lm_incremental(sf_dir: str):
    """Streaming bigram LM: fold the corpus bigram counts in three epochs
    through lake-resident state, then score the corpus against the
    accumulated statistics — addition is commutative, so the result
    equals batch bigram_lm_score and shares its SQL oracle verbatim."""
    import tempfile

    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import streaming_terms as st

    root = tempfile.mkdtemp(prefix="kcjf_bigram_state_")
    ds = _docs(sf_dir)

    def _part(part: int):
        def _f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"bigram_epoch_part_{part}"
        return _f

    for part in (1, 2, 0):  # out-of-order folds: addition is commutative
        st.bigram_counts_epoch(
            ds.map_batches(_part(part), batch_format="pyarrow",
                           zero_copy_batch=True),
            root,
        )
    return st.lm_score_from_state(_docs(sf_dir), root)


def q_label_centroids(sf_dir: str):
    """Per-label mean-pooled embedding (class prototypes), long format —
    each batch pre-reduces to one (label, sum, count) row per label, so
    the exchange carries dim-sized partials, never vectors."""
    from kafka_connect_jdbc_flatten_ray.stages.kmeans import (
        group_mean_embeddings,
    )

    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return group_mean_embeddings(emb)


ORACLE_LABEL_CENTROIDS = """
WITH e AS (SELECT label, unnest(embedding) AS v,
                  generate_subscripts(embedding, 1) AS dim
           FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       round(avg(CAST(v AS DOUBLE)), 6) AS mean_val
FROM e GROUP BY label, dim
"""


def q_token_count(sf_dir: str):
    return _docs(sf_dir).map_batches(
        textops.TokenCount(), batch_format="pyarrow", zero_copy_batch=True
    )


def q_text_quality(sf_dir: str):
    return _docs(sf_dir).map_batches(
        textops.QualityScore, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_pool(),
    )


def q_lang_id(sf_dir: str):
    return _docs(sf_dir).map_batches(
        textops.LangId, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_pool(),
    )


def q_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(
        textops.Fingerprint(), batch_format="pyarrow", zero_copy_batch=True
    )


def q_repetition_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(
        textops.RepetitionStats, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_pool(),
    )


def q_dedup_exact_incremental(sf_dir: str):
    """Streaming counterpart to dedup_exact: fold the corpus in three
    epochs through lake-resident fingerprint state, then read the keeper
    set — shares the batch operator's SQL oracle verbatim (min is
    commutative, so any epoch split gives the same answer)."""
    import tempfile

    from kafka_connect_jdbc_flatten_ray.stages import streaming_dedup as sd

    root = tempfile.mkdtemp(prefix="kcjf_dedup_state_")
    docs = _docs(sf_dir)

    def _part(part: int):
        def _f(t):
            import numpy as np
            import pyarrow as pa

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"epoch_part_{part}"
        return _f

    for part in range(3):
        sd.dedup_exact_epoch(
            docs.map_batches(
                _part(part), batch_format="pyarrow", zero_copy_batch=True
            ),
            root,
        )
    return sd.read_keepers(root)


def q_dedup_minhash_incremental(sf_dir: str):
    """Streaming counterpart to dedup_minhash_pairs: fold the corpus in
    three epochs through lake-resident LSH band-bucket state, then read
    the pair set — shares the batch LSH SQL oracle verbatim (touched
    groups are recomputed in full, so arrival order never matters)."""
    import tempfile

    import numpy as np
    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import streaming_dedup as sd

    root = tempfile.mkdtemp(prefix="kcjf_lsh_state_")
    docs = _docs(sf_dir)

    def _part(part: int):
        def _f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"lsh_epoch_part_{part}"
        return _f

    for part in range(3):
        sd.minhash_pairs_epoch(
            docs.map_batches(
                _part(part), batch_format="pyarrow", zero_copy_batch=True
            ),
            root, threshold=0.5,
        )
    return sd.read_pairs(root)


# Horner fold over the document's (ASCII) bytes — exactly the mod-2^64
# polynomial hash Fingerprint computes (HUGEINT holds acc*BASE+b < 2^84).
# ord(c) == utf8 byte only for ASCII text, which the synthetic corpus is;
# the general-bytes case is covered by tests/test_reference_impls.py.
ORACLE_FINGERPRINT = r"""
WITH f AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(CAST(0 AS HUGEINT),
                   list_transform(string_split(text, ''), c -> CAST(ord(c) AS HUGEINT))),
      (acc, b) -> (acc * 1000003 + b) % CAST('18446744073709551616' AS HUGEINT)
    ) AS fp
  FROM documents
)
SELECT doc_id,
  CAST(CASE WHEN fp >= CAST('9223372036854775808' AS HUGEINT)
       THEN fp - CAST('18446744073709551616' AS HUGEINT) ELSE fp END AS BIGINT)
  AS fingerprint
FROM f
"""


# The fake-audio payload is the text's bytes cycled to 2*clamp(len,16,4096)
# bytes, read as s16le samples; every output is then integer arithmetic
# (sums of squares < 2^53 are exact in float64, so even rms is bit-equal).
ORACLE_AUDIO_FEATURES = """
WITH b AS (
  SELECT doc_id, list_transform(string_split(text, ''), c -> ord(c)) AS bytes,
         length(text) AS len,
         2 * greatest(16, least(4096, length(text))) AS need
  FROM documents
), s AS (
  SELECT doc_id, need // 2 AS n_samples,
    list_transform(range(need // 2), i ->
      CASE WHEN bytes[(2*i) % len + 1] + 256 * bytes[(2*i+1) % len + 1] >= 32768
           THEN bytes[(2*i) % len + 1] + 256 * bytes[(2*i+1) % len + 1] - 65536
           ELSE bytes[(2*i) % len + 1] + 256 * bytes[(2*i+1) % len + 1] END) AS smp
  FROM b
)
SELECT doc_id AS media_id,
  CAST(n_samples AS BIGINT) AS n_samples,
  sqrt(list_sum(list_transform(smp, x -> CAST(x*x AS DOUBLE))) / n_samples) AS rms,
  CAST(len(list_filter(range(n_samples - 1), i -> smp[i+1] * smp[i+2] < 0)) AS BIGINT)
    AS zero_crossings,
  CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak
FROM s
"""


def q_model_quality_scores(sf_dir: str):
    """Actor-pool batched inference (stub linear model; real weights-load
    + batch plumbing). Exact oracle: the model is pure arithmetic."""
    from kafka_connect_jdbc_flatten_ray.stages.inference import score_quality

    return score_quality(_docs(sf_dir))


ORACLE_MODEL_QUALITY = """
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
           / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio
  FROM documents
), z AS (
  SELECT doc_id,
         0.0003 * n_chars + 0.02 * n_tokens - 1.5 * punct_ratio + 0.1 AS z
  FROM f
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
       (1.0 / (1.0 + exp(-z))) >= 0.5 AS keep
FROM z
"""


def q_regex_token_count(sf_dir: str):
    """BPE-ish regex token counting: words / digit runs / punctuation runs
    counted with one vectorized count_substring_regex kernel."""
    import pyarrow as pa
    import pyarrow.compute as pc

    pattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

    def _count(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = pc.count_substring_regex(text, pattern)
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "n_regex_tokens": pc.cast(n, pa.int64())}
        )

    return _docs(sf_dir).map_batches(_count, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_REGEX_TOKEN_COUNT = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
         AS n_regex_tokens
FROM documents
"""


def q_corpus_prep(sf_dir: str):
    """Composed training-data pipeline, fully distributed (nothing per-doc
    touches the driver): one pass computes quality metrics + content
    fingerprints and filters (>=10 tokens, >=1 stopword hit); a groupby on
    the fingerprint pair dedups exactly (n_tokens rides along — it is
    functionally dependent on the text); a final tiny aggregate emits the
    corpus stats. One row out."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from kafka_connect_jdbc_flatten_ray.stages.dedup import _fingerprints, _text_col

    def _stage(t: pa.Table) -> pa.Table:
        q = textops.QualityScore()(t)
        keep = pc.and_(
            pc.greater_equal(q.column("n_tokens"), 10),
            pc.greater_equal(q.column("stop_hits"), 1),
        )
        kept = t.filter(keep)
        qk = q.filter(keep)
        h1, h2 = _fingerprints(_text_col(kept))
        import numpy as np

        return pa.table(
            {
                "h1": pa.array(h1.view(np.int64)),
                "h2": pa.array(h2.view(np.int64)),
                "doc_id": kept.column("doc_id"),
                "n_tokens": qk.column("n_tokens"),
            }
        )

    hashed = _docs(sf_dir).map_batches(_stage, batch_format="pyarrow", zero_copy_batch=True)
    winners = hashed.groupby(["h1", "h2"]).min(["doc_id", "n_tokens"])
    stats = winners.aggregate(Count(alias_name="n_docs"),
                              Sum("min(n_tokens)", alias_name="total_tokens"))
    import pandas as pd

    return pd.DataFrame(
        {"n_docs": [int(stats["n_docs"])], "total_tokens": [int(stats["total_tokens"])]}
    )


ORACLE_CORPUS_PREP = """
WITH q AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('the','and','of','to','a','in','is','it'))) AS stop_hits
  FROM documents
), kept AS (
  SELECT * FROM q WHERE n_tokens >= 10 AND stop_hits >= 1
), winners AS (
  SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens FROM kept GROUP BY text
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM winners
"""


def q_corpus_prep_full(sf_dir: str):
    """Composite corpus-prep over the sf tables — exact oracle
    ``corpus_prep_full_sql``; see :func:`corpus_prep_pipeline`."""
    return corpus_prep_pipeline(_docs(sf_dir), _bench_docs(sf_dir))


def corpus_prep_pipeline(
    docs: ray.data.Dataset, bench: ray.data.Dataset
) -> ray.data.Dataset:
    """Composite corpus-prep at full fidelity — the LLM-operator family's
    bench headline: exact-dedup keep (hash-only shuffle) -> contamination
    filter against the ``bench`` corpus (8-byte hash exchange,
    bloom-prefiltered) -> PII scrub (actor pool) -> sequence packing.
    The keep set and the zero-hit set combine through an id-only
    union+groupby (8-byte rows), and the surviving ids filter the corpus
    through ONE text-carrying semi-join exchange (joins.semi_join_ids —
    never a broadcast of a corpus-sized id set, never Ray's native hash
    join, which deadlocks composed with actor pools). Every leg is an
    already-oracled operator; the composition has its own exact oracle
    (dedup_oracles.corpus_prep_full_sql)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from kafka_connect_jdbc_flatten_ray.stages import scrub as sc
    from kafka_connect_jdbc_flatten_ray.stages.export import pack_sequences
    from kafka_connect_jdbc_flatten_ray.stages.joins import semi_join_ids
    # per-doc flags, id-only rows: keep (dedup winner) and contamination
    # hits computed independently, combined by one tiny groupby-sum
    keep = dedup.dedup_exact(docs).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "keep": pa.array(np.ones(t.num_rows, np.int8)),
            "ngram_hits": pa.array(np.zeros(t.num_rows, np.int64)),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    hits = sc.contamination_check_distributed(
        docs, bench, n=8
    ).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "keep": pa.array(np.zeros(t.num_rows, np.int8)),
            "ngram_hits": t.column("ngram_hits"),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    flags = keep.union(hits).groupby("doc_id").aggregate(
        Sum("keep", alias_name="keep"),
        Sum("ngram_hits", alias_name="ngram_hits"),
    )

    def _clean_ids(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.greater(t.column("keep"), 0),
                     pc.equal(t.column("ngram_hits"), 0))
        return pa.table({"doc_id": t.filter(ok).column("doc_id")})

    clean = semi_join_ids(
        docs,
        flags.map_batches(_clean_ids, batch_format="pyarrow",
                          zero_copy_batch=True),
    )
    scrubbed = clean.map_batches(
        sc.ScrubText, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_pool(),
    )
    return pack_sequences(scrubbed, seq_len=128, group_size=100) \
        .select_columns(["group", "seq_idx", "n_real"])


def q_scrub_text(sf_dir: str):
    from kafka_connect_jdbc_flatten_ray.stages.scrub import ScrubText

    return _docs(sf_dir).map_batches(
        ScrubText, batch_format="pyarrow", zero_copy_batch=True, concurrency=default_pool()
    )


ORACLE_SCRUB = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '[0-9]{6,}', '<NUM>', 'g') AS text
FROM documents
"""


def q_sample_30pct(sf_dir: str):
    from kafka_connect_jdbc_flatten_ray.stages.scrub import deterministic_sample

    return deterministic_sample(_docs(sf_dir), 30).select_columns(["doc_id"])


ORACLE_SAMPLE = """
SELECT doc_id FROM documents WHERE (doc_id * 2654435761) % 100 < 30
"""


def q_chunk_docs(sf_dir: str):
    from kafka_connect_jdbc_flatten_ray.stages.scrub import ChunkDocs

    return _docs(sf_dir).map_batches(
        ChunkDocs(size=32, overlap=8), batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_CHUNKS = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
), c AS (
  SELECT doc_id, w,
         unnest(range(CAST((greatest(0, n - 32) + 23) // 24 + 1 AS BIGINT))) AS chunk_idx
  FROM d
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(w[chunk_idx * 24 + 1: chunk_idx * 24 + 32], ' ') AS chunk,
       CAST(len(w[chunk_idx * 24 + 1: chunk_idx * 24 + 32]) AS BIGINT) AS n_chunk_tokens
FROM c
"""


def q_pack_sequences(sf_dir: str):
    """Sequence-packing layout (group, seq_idx, real-token count) — the
    token payloads are hash-ids (rows-only material), but the packing
    LAYOUT is pure arithmetic and oracle-checked."""
    from kafka_connect_jdbc_flatten_ray.stages.export import pack_sequences

    seqs = pack_sequences(_docs(sf_dir), seq_len=128, group_size=100)
    return seqs.select_columns(["group", "seq_idx", "n_real"])


ORACLE_PACK_SEQUENCES = """
WITH g AS (
  SELECT doc_id // 100 AS grp,
         SUM(len(string_split(text, ' '))) AS total
  FROM documents GROUP BY doc_id // 100
), s AS (
  SELECT grp, unnest(range(CAST((total + 127) // 128 AS BIGINT))) AS seq_idx,
         total
  FROM g
)
SELECT CAST(grp AS BIGINT) AS "group",
       CAST(seq_idx AS BIGINT) AS seq_idx,
       CAST(least(128, total - seq_idx * 128) AS BIGINT) AS n_real
FROM s
"""


def q_value_quantiles(sf_dir: str):
    """Exact distributed quantiles over events.value — histogram
    refinement (3 bounded passes), never a global sort."""
    from kafka_connect_jdbc_flatten_ray.stages.quantiles import quantiles_exact

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])
    return quantiles_exact(ds, "value", (0.25, 0.5, 0.9, 0.99))


ORACLE_QUANTILES = """
SELECT unnest([0.25, 0.5, 0.9, 0.99]) AS q,
       unnest(quantile_disc(value, [0.25, 0.5, 0.9, 0.99])) AS value
FROM events
"""


def _bench_docs(sf_dir: str) -> ray.data.Dataset:
    """The query-surface benchmark set: every 17th document (a stand-in
    for an eval corpus drawn from the same distribution)."""
    import pyarrow as pa

    def _f(t):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 17 == 0))

    _f.__name__ = "bench_subset"
    return _docs(sf_dir).map_batches(_f, batch_format="pyarrow",
                                     zero_copy_batch=True)


def q_contamination(sf_dir: str):
    """Benchmark-contamination check, distributed variant: doc and bench
    n-gram hashes exchange (8-byte rows, never text) with a broadcast
    bloom prefilter dropping the clean majority of doc n-grams."""
    from kafka_connect_jdbc_flatten_ray.stages import scrub

    return scrub.contamination_check_distributed(
        _docs(sf_dir), _bench_docs(sf_dir), n=8
    )


def q_contamination_incremental(sf_dir: str):
    """Streaming counterpart: fold the benchmark set in three epochs into
    a lake-resident n-gram registry (hash set + bloom sidecar), then check
    the corpus against the state — set union and bitset OR are commutative
    and idempotent, so the query shares the batch SQL oracle verbatim."""
    import tempfile

    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import streaming_scrub as ss

    root = tempfile.mkdtemp(prefix="kcjf_contam_state_")
    bench = _bench_docs(sf_dir)

    def _part(part: int):
        def _f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"contam_epoch_part_{part}"
        return _f

    for part in range(3):
        ss.benchmark_ngrams_epoch(
            bench.map_batches(_part(part), batch_format="pyarrow",
                              zero_copy_batch=True),
            root, n=8,
        )
    return ss.contamination_check_incremental(_docs(sf_dir), root)


def q_value_quantiles_incremental(sf_dir: str):
    """Streaming counterpart to value_quantiles: fold the event stream in
    three epochs through a lake-resident counted-multiset state, then run
    the weighted refinement over the state — addition is commutative, so
    any epoch split gives the batch answer and the query shares the batch
    SQL oracle verbatim."""
    import tempfile

    import numpy as np
    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import streaming_quantiles as sq

    root = tempfile.mkdtemp(prefix="kcjf_quantile_state_")
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "value"])

    def _part(part: int):
        def _f(t):
            ids = t.column("event_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"quantile_epoch_part_{part}"
        return _f

    for part in range(3):
        sq.value_counts_epoch(
            ds.map_batches(_part(part), batch_format="pyarrow",
                           zero_copy_batch=True),
            root, "value",
        )
    return sq.quantiles_from_state(root, (0.25, 0.5, 0.9, 0.99))


def q_semantic_dedup(sf_dir: str):
    # num_centroids pinned to the SQL oracle's parameter (the operator's
    # default None derives it from corpus size instead)
    return dedup.semantic_dedup_keep(sf_dir, threshold=0.35, num_centroids=16)


def q_ann_topk(sf_dir: str):
    return ann.ann_topk(sf_dir, k=5, num_queries=8)


def q_ann_ivf(sf_dir: str):
    return ann.ann_topk_ivf(sf_dir, k=5, num_queries=8)


def q_ann_ivf_kmeans(sf_dir: str):
    return ann.ann_topk_ivf(sf_dir, k=5, num_queries=8, train=True)


def q_ann_ivf_incremental(sf_dir: str):
    """Streaming IVF: pin the coarse centroids at index creation (the
    FAISS train-once/add-forever contract), fold the vectors in three
    epochs into lake-resident postings (one bucket per centroid), then
    probe — given the same centroids the probe equals batch ann_topk_ivf,
    so the query shares its SQL oracle verbatim."""
    import tempfile

    import numpy as np
    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import streaming_ann as sa

    root = tempfile.mkdtemp(prefix="kcjf_ivf_index_")
    cents = ann.ivf_centroids(sf_dir, 16)
    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def _part(part: int):
        def _f(t):
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"ivf_epoch_part_{part}"
        return _f

    for part in range(3):
        sa.ivf_index_epoch(
            emb.map_batches(_part(part), batch_format="pyarrow",
                            zero_copy_batch=True),
            root, cents if part == 0 else None,
        )
    q_ids, q_mat = ann.load_queries(sf_dir, 8)
    return sa.probe_topk(root, q_ids, q_mat, k=5, nprobe=4)


def _media_ds(sf_dir: str, kind: str) -> ray.data.Dataset:
    """Deterministic fake media synthesized from documents (see
    stages/multimodal.py — codecs are stubbed, plumbing is real)."""
    import pyarrow.parquet as pq

    from kafka_connect_jdbc_flatten_ray.stages import multimodal as mm

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ray.data.from_arrow(mm.synthesize_media(docs, kind))


def q_media_decode(sf_dir: str):
    """Image decode summary. The full DecodeImage output carries the 16-bin
    pixel histogram as a fixed-size list; the query surface reports the
    modal bin + count instead (scalar columns the driver's hash compare and
    the SQL oracle can both express) — same information path, all of it
    derived from the histogram."""
    import numpy as np
    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import multimodal as mm
    from kafka_connect_jdbc_flatten_ray.util import fsl_to_numpy

    def _summarize(t: pa.Table) -> pa.Table:
        hist = fsl_to_numpy(t.column("pixel_hist"))
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "width": t.column("width"),
                "height": t.column("height"),
                "mean_pixel": t.column("mean_pixel"),
                "modal_bucket": pa.array(hist.argmax(axis=1).astype(np.int64)),
                "modal_count": pa.array(hist.max(axis=1).astype(np.int64)),
            }
        )

    return _media_ds(sf_dir, "image").map_batches(
        mm.DecodeImage, batch_format="pyarrow", batch_size=256, concurrency=default_pool()
    ).map_batches(_summarize, batch_format="pyarrow")


def q_video_frames(sf_dir: str):
    from kafka_connect_jdbc_flatten_ray.stages import multimodal as mm

    return _media_ds(sf_dir, "video").map_batches(
        mm.FrameSample, fn_constructor_args=(2,),
        batch_format="pyarrow", batch_size=256, concurrency=default_pool(),
    ).map_batches(  # frame bytes are opaque; report sampled layout
        lambda t: t.select(["media_id", "frame_idx"]), batch_format="pyarrow"
    )


def q_audio_features(sf_dir: str):
    from kafka_connect_jdbc_flatten_ray.stages import multimodal as mm

    return _media_ds(sf_dir, "audio").map_batches(
        mm.AudioFeatures, batch_format="pyarrow", batch_size=256, concurrency=default_pool()
    )


_STOP = "'the','and','of','to','a','in','is','it'"

ORACLE_DEDUP_EXACT = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"

ORACLE_TOKEN_COUNT = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""

def q_bigram_lm_score(sf_dir: str):
    """Bigram-LM (CCNet-style) perplexity scoring, MLE-trained on the
    scored corpus — train + score in three count-row groupbys, no count
    table broadcast (stages/textops.bigram_lm_score)."""
    from kafka_connect_jdbc_flatten_ray.stages.textops import bigram_lm_score

    return bigram_lm_score(_docs(sf_dir))


ORACLE_BIGRAM_LM = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
big AS (
  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
c2 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c1 FROM big GROUP BY w1)
SELECT big.doc_id,
       round(avg(ln(c2.c12 / c1.c1)), 6) AS avg_logprob,
       CAST(count(*) AS BIGINT) AS n_bigrams
FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY big.doc_id
"""


def q_duplicated_spans(sf_dir: str):
    """Duplicated-span statistics (Lee et al. 2021 exact substring-dedup
    signal): width-4 token windows occurring >= 2 times in the corpus,
    per doc — hash-only exchange, in-group corpus totals, zero-dup docs
    re-attached via union+groupby (stages/dedup.duplicated_spans)."""
    return dedup.duplicated_spans(_docs(sf_dir), width=4)


def q_dup_spans_incremental(sf_dir: str):
    """Streaming duplicated-spans: fold the corpus window-hash counts in
    three epochs through lake-resident state, then score the corpus
    against the accumulated counts — addition is commutative, so the
    result equals batch duplicated_spans and shares its SQL oracle."""
    import tempfile

    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import streaming_dedup as sd

    root = tempfile.mkdtemp(prefix="kcjf_span_state_")
    ds = _docs(sf_dir)

    def _part(part: int):
        def _f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"span_epoch_part_{part}"
        return _f

    for part in (2, 1, 0):  # out-of-order folds: addition is commutative
        sd.span_counts_epoch(
            ds.map_batches(_part(part), batch_format="pyarrow",
                           zero_copy_batch=True),
            root, width=4,
        )
    return sd.dup_spans_from_state(_docs(sf_dir), root)


def q_gopher_quality(sf_dir: str):
    """Gopher-rule quality filtering (Rae et al. 2021 §A1.1, document-
    level subset): per-doc metrics + composite keep flag, thresholds
    pinned to the SQL oracle's parameters. min_words=40 / stop>=2 both
    split this corpus, so the flag is value-checked in both branches."""
    from kafka_connect_jdbc_flatten_ray.stages.textops import GopherQuality

    return _docs(sf_dir).map_batches(
        GopherQuality, fn_constructor_kwargs={"min_words": 40},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_pool(),
    )


def _gopher_quality_sql(
    min_words: int = 40, max_words: int = 100_000,
    min_mwl: float = 3.0, max_mwl: float = 10.0,
    min_alpha: float = 0.8, min_stop: int = 2,
) -> str:
    from kafka_connect_jdbc_flatten_ray.stages.textops import GOPHER_STOP

    stop = ",".join(f"'{w}'" for w in GOPHER_STOP)
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         round(list_sum(list_transform(ws, t -> CAST(length(t) AS DOUBLE)))
               / len(ws), 6) AS mean_word_len,
         round(CAST(len(list_filter(ws,
               t -> regexp_matches(t, '^[A-Za-z]+$'))) AS DOUBLE)
               / len(ws), 6) AS frac_alpha_words,
         CAST(len(list_filter(ws, t -> t IN ({stop}))) AS BIGINT)
           AS gopher_stop_hits
  FROM w)
SELECT doc_id, n_words, mean_word_len, frac_alpha_words, gopher_stop_hits,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND mean_word_len >= {min_mwl} AND mean_word_len <= {max_mwl}
        AND frac_alpha_words >= {min_alpha}
        AND gopher_stop_hits >= {min_stop}) AS keep
FROM m
"""


ORACLE_TEXT_QUALITY = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS punct_chars,
       CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP}))) AS BIGINT) AS stop_hits
FROM documents
"""


def _hits(words: tuple[str, ...]) -> str:
    lst = ",".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({lst}))) AS BIGINT)"


ORACLE_LANG_ID = f"""
WITH h AS (
  SELECT doc_id,
         {_hits(textops.STOPWORDS['en'])} AS hits_en,
         {_hits(textops.STOPWORDS['de'])} AS hits_de,
         {_hits(textops.STOPWORDS['fr'])} AS hits_fr,
         {_hits(textops.STOPWORDS['es'])} AS hits_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en'
            WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
            WHEN hits_fr >= hits_es THEN 'fr'
            ELSE 'es' END AS lang_guess,
       hits_en, hits_de, hits_fr, hits_es
FROM h
"""

ORACLE_ANN_TOPK = """
WITH q AS (
  SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qe
  FROM embeddings WHERE vec_id < 8
),
s AS (
  SELECT q.qid, e.vec_id,
         round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6) cos
  FROM q, embeddings e WHERE e.vec_id <> q.qid
)
SELECT qid AS query_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       vec_id, cos
FROM s QUALIFY rank <= 5
"""


def data_queries() -> dict:
    return {
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_pairs": q_dedup_minhash,
        "dedup_minhash_pairs_slim": q_dedup_minhash_slim,
        "dedup_simhash_pairs": q_dedup_simhash,
        "dedup_ngram_jaccard_pairs": q_dedup_ngram,
        "dedup_embedding_pairs": q_dedup_embedding,
        "dedup_embedding_pairs_slim": q_dedup_embedding_slim,
        "dedup_minhash_keep": q_dedup_minhash_keep,
        "semantic_dedup_keep": q_semantic_dedup,
        "value_quantiles": q_value_quantiles,
        "value_quantiles_incremental": q_value_quantiles_incremental,
        "contamination_check": q_contamination,
        "contamination_incremental": q_contamination_incremental,
        "dedup_minhash_clusters": q_dedup_clusters,
        "approx_distinct_users": q_approx_distinct_users,
        "approx_distinct_incremental": q_approx_distinct_incremental,
        "dedup_exact_incremental": q_dedup_exact_incremental,
        "dedup_minhash_incremental": q_dedup_minhash_incremental,
        "dedup_embedding_incremental": q_dedup_embedding_incremental,
        "token_count": q_token_count,
        "tfidf_top_terms": q_tfidf_top_terms,
        "tfidf_incremental": q_tfidf_incremental,
        "label_centroids": q_label_centroids,
        "text_quality": q_text_quality,
        "gopher_quality": q_gopher_quality,
        "duplicated_spans": q_duplicated_spans,
        "dup_spans_incremental": q_dup_spans_incremental,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "bpe_merges_incremental": q_bpe_merges_incremental,
        "bigram_lm_score": q_bigram_lm_score,
        "bigram_lm_incremental": q_bigram_lm_incremental,
        "repetition_stats": q_repetition_stats,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        "corpus_prep": q_corpus_prep,
        "corpus_prep_full": q_corpus_prep_full,
        "model_quality_scores": q_model_quality_scores,
        "regex_token_count": q_regex_token_count,
        "scrub_text": q_scrub_text,
        "sample_30pct": q_sample_30pct,
        "chunk_docs": q_chunk_docs,
        "pack_sequences": q_pack_sequences,
        "ann_cosine_topk": q_ann_topk,
        "ann_topk_ivf": q_ann_ivf,
        "ann_topk_ivf_incremental": q_ann_ivf_incremental,
        "ann_topk_ivf_kmeans": q_ann_ivf_kmeans,
        "media_image_decode": q_media_decode,
        "media_video_frames": q_video_frames,
        "media_audio_features": q_audio_features,
    }


# fake-video layout is pure arithmetic -> SQL-checkable sampling plan
ORACLE_VIDEO_FRAMES = """
SELECT doc_id AS media_id,
       CAST(unnest(range(0, 4 + doc_id % 8, 2)) AS INTEGER) AS frame_idx
FROM documents
"""


ORACLE_REPETITION = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents
),
big AS (
  SELECT doc_id, tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
  FROM tok
),
bg AS (
  SELECT doc_id, tok, nxt, count(*) AS c
  FROM big WHERE nxt IS NOT NULL GROUP BY doc_id, tok, nxt
),
top AS (SELECT doc_id, max(c) AS top_c FROM bg GROUP BY doc_id),
d AS (
  SELECT doc_id, count(*) AS n_tokens,
         count(DISTINCT tok) AS n_distinct_tokens
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id, d.n_tokens, d.n_distinct_tokens,
       d.n_tokens - 1 AS n_bigrams,
       COALESCE(top.top_c, 0) AS top_bigram_count
FROM d LEFT JOIN top USING (doc_id)
"""


def data_oracles() -> dict:
    return {
        "dedup_exact": ORACLE_DEDUP_EXACT,
        # min is commutative: the epoch-folded keeper set equals the batch
        # dedup on the union, so the incremental path shares this oracle
        "dedup_exact_incremental": ORACLE_DEDUP_EXACT,
        "repetition_stats": ORACLE_REPETITION,
        "token_count": ORACLE_TOKEN_COUNT,
        "tfidf_top_terms": ORACLE_TFIDF,
        # df-state folds are order-independent sums and N rides the
        # manifest lineage: rescoring against the accumulated statistics
        # equals the batch pass
        "tfidf_incremental": ORACLE_TFIDF,
        "label_centroids": ORACLE_LABEL_CENTROIDS,
        "text_quality": ORACLE_TEXT_QUALITY,
        "gopher_quality": _gopher_quality_sql(min_words=40),
        "duplicated_spans": dedup_oracles.duplicated_spans_sql(4),
        # span-count folds are order-independent sums, so scoring against
        # the accumulated state equals the batch pass
        "dup_spans_incremental": dedup_oracles.duplicated_spans_sql(4),
        # each BPE merge unrolled as a greedy string-replace CTE stage
        "bpe_merges": bpe_merges_sql(8),
        "bpe_encode": bpe_encode_sql(8),
        # term-count folds are order-independent sums and training is
        # deterministic, so state-trained merges equal the batch pass
        "bpe_merges_incremental": bpe_merges_sql(8),
        "bigram_lm_score": ORACLE_BIGRAM_LM,
        # bigram-count folds are order-independent sums, so scoring
        # against the accumulated state equals the batch pass
        "bigram_lm_incremental": ORACLE_BIGRAM_LM,
        "lang_id": ORACLE_LANG_ID,
        "corpus_prep": ORACLE_CORPUS_PREP,
        # composition of already-oracled legs (dedup keep, contamination
        # shingle mirror, scrub regexes, pack layout) in one statement
        "corpus_prep_full": dedup_oracles.corpus_prep_full_sql(8, 17, 128, 100),
        "model_quality_scores": ORACLE_MODEL_QUALITY,
        "regex_token_count": ORACLE_REGEX_TOKEN_COUNT,
        "scrub_text": ORACLE_SCRUB,
        "sample_30pct": ORACLE_SAMPLE,
        "chunk_docs": ORACLE_CHUNKS,
        "pack_sequences": ORACLE_PACK_SEQUENCES,
        "ann_cosine_topk": ORACLE_ANN_TOPK,
        "media_video_frames": ORACLE_VIDEO_FRAMES,
        "doc_fingerprint": ORACLE_FINGERPRINT,
        "media_audio_features": ORACLE_AUDIO_FEATURES,
        # the MinHash/SimHash family is deterministic integer arithmetic
        # (token hash == the engine's own fingerprint), so the whole LSH
        # pipeline is mirrored stage-by-stage in SQL (dedup_oracles.py)
        "dedup_minhash_pairs": dedup_oracles.minhash_pairs_sql(0.5, "word"),
        "dedup_minhash_pairs_slim": dedup_oracles.minhash_pairs_sql(0.5, "word"),
        # the incremental fold recomputes touched star groups in full, so
        # after all epochs the pair set equals the batch LSH pair set
        "dedup_minhash_incremental": dedup_oracles.minhash_pairs_sql(0.5, "word"),
        "dedup_ngram_jaccard_pairs": dedup_oracles.minhash_pairs_sql(0.5, "char"),
        "dedup_simhash_pairs": dedup_oracles.simhash_pairs_sql(3),
        "dedup_minhash_keep": dedup_oracles.minhash_keep_sql(0.95),
        "dedup_minhash_clusters": dedup_oracles.minhash_clusters_sql(0.9),
        "media_image_decode": dedup_oracles.image_decode_sql(),
        # embedding LSH: plane constants inlined, f64 buckets/cosines with
        # the cosine rounded to 6 decimals before thresholding on both
        # sides (dim=64 matches every testdata scale factor)
        "dedup_embedding_pairs": dedup_oracles.embedding_pairs_sql(0.35, 64),
        "dedup_embedding_pairs_slim": dedup_oracles.embedding_pairs_sql(0.35, 64),
        # full-group recompute makes the epoch folds order-independent, so
        # the incremental pair set shares the batch embedding SQL
        "dedup_embedding_incremental": dedup_oracles.embedding_pairs_sql(0.35, 64),
        # IVF with the SQL-stated centroid-sample rule is exactly checkable
        "ann_topk_ivf": dedup_oracles.ivf_topk_sql(),
        # pinned centroids + postings folded epoch-at-a-time: the probe
        # equals the batch IVF search, so the incremental index shares
        # its oracle
        "ann_topk_ivf_incremental": dedup_oracles.ivf_topk_sql(),
        "semantic_dedup_keep": dedup_oracles.semantic_dedup_sql(0.35),
        "value_quantiles": ORACLE_QUANTILES,
        # counted-multiset folds are order-independent sums: the weighted
        # refinement over the state ranks exactly like the batch pass
        "value_quantiles_incremental": ORACLE_QUANTILES,
        # per-occurrence hit counts vs the benchmark's distinct 8-gram
        # hashes, mirrored as an 8-way positional self-join of the token
        # CTE; the incremental variant folds the registry (set union /
        # bloom OR — commutative AND idempotent) and shares the SQL
        "contamination_check": dedup_oracles.contamination_sql(8, 17),
        "contamination_incremental": dedup_oracles.contamination_sql(8, 17),
        # the HLL ESTIMATE is deterministic given the splitmix64 value hash
        # — the oracle reproduces registers and the harmonic/linear-count
        # estimate exactly (approximate vs TRUTH, exact vs the engine)
        "approx_distinct_users": dedup_oracles.hll_distinct_sql(),
        # register-wise max is commutative+idempotent: the epoch-folded
        # registers equal the batch registers, so the estimate is identical
        "approx_distinct_incremental": dedup_oracles.hll_distinct_sql(),
        # k-means-TRAINED IVF: fixed-iteration Lloyd's with deterministic
        # init is SQL-expressible by unrolling the 4 iterations (lockstep
        # unnest means + renormalization); also recall-tested vs brute force
        "ann_topk_ivf_kmeans": dedup_oracles.ivf_kmeans_topk_sql(),
    }


def q_bpe_merges(sf_dir: str):
    """BPE merge training (Sennrich et al. 2016): 8 merges over the
    corpus — distributed word-frequency count, then deterministic greedy
    merges on the compact vocab (stages/textops.bpe_merges)."""
    from kafka_connect_jdbc_flatten_ray.stages.textops import bpe_merges

    return bpe_merges(_docs(sf_dir), num_merges=8)


def q_bpe_merges_incremental(sf_dir: str):
    """Streaming BPE training: fold the corpus term counts in three
    epochs through the lake-resident term state, then train from the
    accumulated vocabulary — counts are order-independent sums and
    training is deterministic, so the result equals batch bpe_merges and
    shares its SQL oracle verbatim."""
    import tempfile

    import pyarrow as pa

    from kafka_connect_jdbc_flatten_ray.stages import streaming_terms as st

    root = tempfile.mkdtemp(prefix="kcjf_bpe_term_state_")
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "text"])

    def _part(part: int):
        def _f(t):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == part))

        _f.__name__ = f"bpe_epoch_part_{part}"
        return _f

    for part in (1, 0, 2):  # out-of-order folds: addition is commutative
        st.term_counts_epoch(
            ds.map_batches(_part(part), batch_format="pyarrow",
                           zero_copy_batch=True),
            root,  # grouped by lang; the vocab read sums over groups
        )
    return st.bpe_merges_from_state(root, num_merges=8)


def bpe_merges_sql(num_merges: int = 8) -> str:
    """Oracle for textops.bpe_merges, each merge unrolled as one CTE
    stage (the kmeans-Lloyd's-unroll trick): words become symbol strings
    ``' c1  c2  c3 '`` (single space wrapping each symbol, so the pair
    pattern ``' x  y '`` is exact and DuckDB's left-to-right
    non-overlapping replace() IS greedy BPE application — verified on
    the aaa/(a,a) overlap case); pair counts come from the positional
    self-join over the split symbols; argmax ties break (l ASC, r ASC)
    like the engine."""
    # every stage CTE is MATERIALIZED: the scalar subqueries referencing
    # m{{i}} would otherwise be INLINED by DuckDB's optimizer, re-deriving
    # the whole chain per reference (4 refs/stage -> 4^k scans of
    # documents — observed as an fd explosion at k=8)
    ctes = ["""w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY word) AS wid,
         ' ' || array_to_string(string_split(word, ''), '  ') || ' ' AS s,
         c
  FROM w0
)"""]
    for i in range(1, num_merges + 1):
        p = i - 1
        ctes.append(f"""sy{i} AS MATERIALIZED (
  SELECT wid, c,
         unnest(string_split(trim(s), '  ')) AS sym,
         generate_subscripts(string_split(trim(s), '  '), 1) AS pos
  FROM s{p}
),
m{i} AS MATERIALIZED (
  SELECT a.sym AS l, b.sym AS r, CAST(SUM(a.c) AS BIGINT) AS pc
  FROM sy{i} a JOIN sy{i} b ON b.wid = a.wid AND b.pos = a.pos + 1
  GROUP BY a.sym, b.sym
  ORDER BY pc DESC, l, r LIMIT 1
),
s{i} AS MATERIALIZED (
  SELECT wid,
         replace(s, ' ' || (SELECT l FROM m{i}) || '  '
                      || (SELECT r FROM m{i}) || ' ',
                 ' ' || (SELECT l FROM m{i})
                      || (SELECT r FROM m{i}) || ' ') AS s,
         c
  FROM s{p}
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, l AS \"left\", r AS \"right\","
        f" pc AS pair_count FROM m{i}"
        for i in range(1, num_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def q_bpe_encode(sf_dir: str):
    """Token counts under the 8-merge trained BPE tokenizer: train
    (distributed word counts + compact-vocab merges), broadcast the tiny
    merge list, apply per batch with the trainer's vectorized greedy
    kernel (stages/textops.bpe_encode_counts)."""
    from kafka_connect_jdbc_flatten_ray.stages.textops import (
        bpe_encode_counts, bpe_merges,
    )

    merges = bpe_merges(_docs(sf_dir), num_merges=8)
    return bpe_encode_counts(_docs(sf_dir), merges)


def bpe_encode_sql(num_merges: int = 8) -> str:
    """Oracle for q_bpe_encode: the training CTE chain of bpe_merges_sql
    (merges recomputed in SQL), then the same greedy string-replace
    stages applied to every document's words, counting the surviving
    symbols per doc (empty words count zero)."""
    train = bpe_merges_sql(num_merges)
    ctes = train.split("\nSELECT CAST(1", 1)[0]  # keep WITH ... chain only
    apply = [""",
dwords AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
d0 AS MATERIALIZED (
  SELECT doc_id,
         ' ' || array_to_string(string_split(word, ''), '  ') || ' ' AS s
  FROM dwords
)"""]
    for i in range(1, num_merges + 1):
        p = i - 1
        apply.append(f""",
d{i} AS MATERIALIZED (
  SELECT doc_id,
         replace(s, ' ' || (SELECT l FROM m{i}) || '  '
                      || (SELECT r FROM m{i}) || ' ',
                 ' ' || (SELECT l FROM m{i})
                      || (SELECT r FROM m{i}) || ' ') AS s
  FROM d{p}
)""")
    return (
        ctes + "".join(apply)
        + f"""
SELECT doc_id,
       CAST(SUM(CASE WHEN trim(s) = '' THEN 0
                ELSE len(string_split(trim(s), '  ')) END) AS BIGINT)
         AS n_bpe_tokens
FROM d{num_merges}
GROUP BY doc_id"""
    )

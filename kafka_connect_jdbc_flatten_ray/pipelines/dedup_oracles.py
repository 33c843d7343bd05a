"""DuckDB SQL mirrors of the MinHash / SimHash / n-gram dedup machinery.

The engine's token hash is its own content fingerprint —
``Horner(bytes, 1000003) * _A + len  (mod 2**64)`` (stages/dedup.py
``_string_hashes``) — so every downstream LSH value is deterministic
integer arithmetic that plain SQL can reproduce. All mod-2**64 math runs
in HUGEINT (int128); products of two 64-bit values would overflow int128,
so multiplication by a 64-bit constant is split into 32-bit halves:

    (x * c) mod 2**64
      = (x*c_lo + ((x*c_hi) mod 2**32) * 2**32) mod 2**64      (exact)

with every intermediate < 2**97. Constants (_A/_B/_C, the 32 permutation
(a, b) pairs from RandomState(1234), band/char-gram powers of _B) are
computed here in Python and INLINED as literals, which is what makes the
oracle independent of the engine at run time.

The oracles mirror, stage by stage (same names as stages/dedup.py):
tokens -> th -> shingle hashes (word k=3 / char 5-gram) -> 32 permuted
minima (missing shingles => 2**64-1) -> 8 band hashes -> per-(band,
bucket) star pairs (head = min doc_id) -> signature-estimated Jaccard /
Hamming filter -> distinct pairs. Keep/clusters build on the pairs CTE
(clusters via a recursive transitive closure, min reachable id).
"""

from __future__ import annotations

import numpy as np

_M = 1 << 64
_MSTR = "18446744073709551616"
_A = 0x9E3779B97F4A7C15
_B = 0xC2B2AE3D27D4EB4F
_C = 0x165667B19E3779F9

# identical generation to stages/dedup.py:_PERM_A/_PERM_B
_NUM_PERM = 32
_ROWS_PER_BAND = 4
_rng = np.random.RandomState(1234)
_PERM_A = (_rng.randint(1, 2**62, _NUM_PERM).astype(np.uint64) | np.uint64(1))
_PERM_B = _rng.randint(1, 2**62, _NUM_PERM).astype(np.uint64)


def _mul(x: str, c: int) -> str:
    """SQL: (x * c) mod 2**64 for a HUGEINT expression x < 2**64."""
    c_hi, c_lo = c >> 32, c & 0xFFFFFFFF
    return (f"((({x}) * {c_lo} + ((({x}) * {c_hi}) % 4294967296) "
            f"* 4294967296) % {_MSTR})")


_HORNER = (
    "list_reduce("
    "list_prepend(CAST(0 AS HUGEINT), "
    "list_transform(string_split(tok, ''), c -> CAST(ord(c) AS HUGEINT))), "
    f"(acc, b) -> (acc * 1000003 + b) % CAST('{_MSTR}' AS HUGEINT))"
)

# token hashes: (doc_id, pos, th) — th = Horner*_A + len (mod 2**64);
# split_pattern(" ") and string_split(' ') agree, including empty tokens
_TH = f"""
toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
th AS (
  SELECT doc_id, pos,
    CASE WHEN tok = '' THEN CAST(0 AS HUGEINT) ELSE
      ({_mul(_HORNER, _A)} + length(tok)) % {_MSTR}
    END AS th
  FROM toks
)"""

# word 3-shingles: sh = th0*(_A*_B^2) + th1*(_C*_B) + th2*_C (mod 2**64)
_K0 = (_A * _B * _B) % _M
_K1 = (_C * _B) % _M
_K2 = _C
_SH_WORD = f"""
sh AS (
  SELECT a.doc_id,
    (({_mul('a.th', _K0)}) + ({_mul('b.th', _K1)}) + ({_mul('c.th', _K2)}))
      % {_MSTR} AS sh
  FROM th a
  JOIN th b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN th c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
)"""

# char 5-grams: sh = sum_m byte_{i+m} * (_A*_B^(4-m)); bytes < 256 keep
# every product < 2**72 so no split multiply is needed. ord(c) == the utf8
# byte only for ASCII text (the synthetic corpus; the general-bytes case
# is covered by tests/test_reference_impls.py).
_NK = [(_A * pow(_B, 4 - m, _M)) % _M for m in range(5)]
_SH_CHAR = f"""
chars AS (
  SELECT doc_id,
         CAST(ord(unnest(string_split(text, ''))) AS HUGEINT) AS b,
         generate_subscripts(string_split(text, ''), 1) AS pos
  FROM documents
),
sh AS (
  SELECT a.doc_id,
    (a.b * {_NK[0]} + b.b * {_NK[1]} + c.b * {_NK[2]}
     + d.b * {_NK[3]} + e.b * {_NK[4]}) % {_MSTR} AS sh
  FROM chars a
  JOIN chars b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN chars c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  JOIN chars d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
  JOIN chars e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
)"""

_PERMS_VALUES = ",\n    ".join(
    f"({j}, {int(a) >> 32}, {int(a) & 0xFFFFFFFF}, {int(b)})"
    for j, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
)
_PERM_MUL = (f"(((s.sh) * p.pa_lo + (((s.sh) * p.pa_hi) % 4294967296) "
             f"* 4294967296) % {_MSTR})")

# 32 signature minima per doc; docs with no shingles get 2**64-1 everywhere
_SIG = f"""
perms(j, pa_hi, pa_lo, pb) AS (
  VALUES {_PERMS_VALUES}
),
sigmin AS (
  SELECT s.doc_id, p.j, min(({_PERM_MUL} + p.pb) % {_MSTR}) AS v
  FROM sh s CROSS JOIN perms p
  GROUP BY s.doc_id, p.j
),
sigfull AS (
  SELECT d.doc_id, p.j,
         coalesce(s.v, CAST('18446744073709551615' AS HUGEINT)) AS v
  FROM (SELECT doc_id FROM documents) d
  CROSS JOIN perms p
  LEFT JOIN sigmin s ON s.doc_id = d.doc_id AND s.j = p.j
)"""

# band hash over each run of 4 signature values (Horner in _B, mod 2**64)
_B3 = (_B * _B * _B) % _M
_B2 = (_B * _B) % _M
_BANDS = f"""
bands AS (
  SELECT doc_id, j // {_ROWS_PER_BAND} AS band_id,
    CAST(sum(CASE j % {_ROWS_PER_BAND}
      WHEN 0 THEN {_mul('v', _B3)}
      WHEN 1 THEN {_mul('v', _B2)}
      WHEN 2 THEN {_mul('v', _B)}
      ELSE v END) AS HUGEINT) % {_MSTR} AS bh
  FROM sigfull
  GROUP BY doc_id, j // {_ROWS_PER_BAND}
)"""

# star pairs per (band, bucket): head = bucket-min doc_id, one pair per
# other member; est_jaccard = mean signature-component equality (k/32,
# exactly representable, so double compare is exact)
_PAIRS = """
heads AS (
  SELECT band_id, bh, min(doc_id) AS head
  FROM bands GROUP BY band_id, bh
),
cand AS (
  SELECT DISTINCT h.head AS doc_a, b.doc_id AS doc_b
  FROM bands b
  JOIN heads h ON h.band_id = b.band_id AND h.bh = b.bh
  WHERE b.doc_id <> h.head
),
est AS (
  SELECT c.doc_a, c.doc_b,
         avg(CASE WHEN sa.v = sb.v THEN 1.0 ELSE 0.0 END) AS est_jaccard
  FROM cand c
  JOIN sigfull sa ON sa.doc_id = c.doc_a
  JOIN sigfull sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
  GROUP BY c.doc_a, c.doc_b
)"""


def _minhash_ctes(shingles: str) -> str:
    sh = _SH_WORD if shingles == "word" else _SH_CHAR
    base = _TH + "," if shingles == "word" else ""
    return f"{base}{sh},{_SIG},{_BANDS},{_PAIRS}"


def minhash_pairs_sql(threshold: float = 0.5, shingles: str = "word") -> str:
    """Mirror of dedup_minhash_pairs / dedup_minhash_pairs_slim (identical
    outputs) / dedup_ngram_jaccard_pairs (shingles='char')."""
    return (f"WITH {_minhash_ctes(shingles)} "
            f"SELECT doc_a, doc_b, est_jaccard FROM est "
            f"WHERE est_jaccard >= {threshold}")


def minhash_keep_sql(threshold: float = 0.95) -> str:
    """Mirror of dedup_minhash_keep: drop every doc that is the higher-id
    side of a surviving pair."""
    return (f"WITH {_minhash_ctes('word')} "
            f"SELECT doc_id FROM documents WHERE doc_id NOT IN "
            f"(SELECT doc_b FROM est WHERE est_jaccard >= {threshold})")


def minhash_clusters_sql(threshold: float = 0.9) -> str:
    """Mirror of dedup_minhash_clusters: cluster_id = min doc_id of the
    connected component over surviving pairs (transitive closure; the
    engine reaches the same fixpoint by distributed min-label
    propagation)."""
    return f"""WITH RECURSIVE {_minhash_ctes('word')},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM est WHERE est_jaccard >= {threshold}
  UNION
  SELECT doc_b, doc_a FROM est WHERE est_jaccard >= {threshold}
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
)
SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster_id
FROM reach GROUP BY src"""


# SimHash: bit j of the 64-bit simhash = majority vote over token-hash
# bits; pigeonhole = 4 x 16-bit chunks; pairs verified by Hamming <= T.
_SIMHASH = """
votes AS (
  SELECT t.doc_id, r.range AS j,
         sum(CASE WHEN (CAST(t.th AS UBIGINT) >> CAST(r.range AS INTEGER))
                       & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th t, range(64) r
  GROUP BY t.doc_id, r.range
),
sim AS (
  SELECT doc_id,
         CAST(CAST(sum(CASE WHEN v > 0
                       THEN CAST(1 AS HUGEINT) << CAST(j AS INTEGER)
                       ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS UBIGINT)
           AS simv
  FROM votes GROUP BY doc_id
),
chunks AS (
  SELECT s.doc_id, r.range AS chunk_id,
         (s.simv >> CAST(16 * r.range AS INTEGER)) & 65535 AS cv
  FROM sim s, range(4) r
),
sheads AS (
  SELECT chunk_id, cv, min(doc_id) AS head
  FROM chunks GROUP BY chunk_id, cv
),
scand AS (
  SELECT DISTINCT h.head AS doc_a, c.doc_id AS doc_b
  FROM chunks c
  JOIN sheads h ON h.chunk_id = c.chunk_id AND h.cv = c.cv
  WHERE c.doc_id <> h.head
)"""


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Mirror of dedup_simhash_pairs."""
    return (f"WITH {_TH},{_SIMHASH} "
            "SELECT c.doc_a, c.doc_b, "
            "CAST(bit_count(xor(sa.simv, sb.simv)) AS BIGINT) AS hamming "
            "FROM scand c JOIN sim sa ON sa.doc_id = c.doc_a "
            "JOIN sim sb ON sb.doc_id = c.doc_b "
            f"WHERE bit_count(xor(sa.simv, sb.simv)) <= {max_hamming}")


def image_decode_sql() -> str:
    """Mirror of the FAKEIMG decode summary (q_media_decode): the fake
    payload is the text's bytes cycled to w*h pixels with w = 8+id%24,
    h = 6+id%18; mean and the modal 16-bucket histogram entry are integer
    arithmetic (sums < 2**53, so the double mean is bit-exact).
    list_position returns the FIRST max, matching numpy argmax."""
    return """
WITH b AS (
  SELECT doc_id, list_transform(string_split(text, ''), c -> ord(c)) AS bytes,
         length(text) AS len,
         8 + doc_id % 24 AS w, 6 + doc_id % 18 AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h, w * h AS need,
         list_transform(range(w * h), i -> bytes[i % len + 1]) AS pxs
  FROM b
), hist AS (
  SELECT doc_id, w, h, need, pxs,
         list_transform(range(16),
                        bkt -> len(list_filter(pxs, x -> x // 16 = bkt))) AS hs
  FROM px
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(list_sum(pxs) AS DOUBLE) / need AS mean_pixel,
       CAST(list_position(hs, list_max(hs)) - 1 AS BIGINT) AS modal_bucket,
       CAST(list_max(hs) AS BIGINT) AS modal_count
FROM hist"""


def embedding_pairs_sql(
    threshold: float = 0.35, dim: int = 32,
    num_planes: int = 10, num_tables: int = 8,
) -> str:
    """Mirror of dedup_embedding_pairs / _slim: the random-hyperplane LSH
    is deterministic once the plane constants (RandomState(99) float32
    values, carried in float64) are inlined as literals, and the engine
    computes buckets and cosines in float64 with the cosine ROUNDED to 6
    decimals before thresholding — so the last-ulp summation-order
    differences between numpy BLAS and DuckDB's list_inner_product cannot
    flip a keep/drop decision (only a value exactly on a rounding boundary
    could, measure-zero in practice)."""
    rng = np.random.RandomState(99)
    planes = rng.standard_normal(
        (num_tables, dim, num_planes)
    ).astype(np.float32).astype(np.float64)
    rows = []
    for t in range(num_tables):
        for p in range(num_planes):
            vec = ", ".join(repr(float(x)) for x in planes[t, :, p])
            rows.append(f"({t}, {p}, [{vec}]::DOUBLE[])")
    values = ",\n    ".join(rows)
    return f"""
WITH planes(table_id, plane_id, pvec) AS (
  VALUES {values}
),
unitv AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE) /
      greatest(sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 1e-12)) AS u
  FROM embeddings
),
buckets AS (
  SELECT u.vec_id, p.table_id,
         CAST(sum(CASE WHEN list_inner_product(u.u, p.pvec) > 0
                  THEN 1 << p.plane_id ELSE 0 END) AS INTEGER) AS bucket
  FROM unitv u CROSS JOIN planes p
  GROUP BY u.vec_id, p.table_id
),
eheads AS (
  SELECT table_id, bucket, min(vec_id) AS head
  FROM buckets GROUP BY table_id, bucket
),
ecand AS (
  SELECT DISTINCT h.head AS vec_a, b.vec_id AS vec_b
  FROM buckets b
  JOIN eheads h ON h.table_id = b.table_id AND h.bucket = b.bucket
  WHERE b.vec_id <> h.head
),
ecos AS (
  SELECT c.vec_a, c.vec_b,
         round(list_inner_product(ua.u, ub.u), 6) AS cos
  FROM ecand c
  JOIN unitv ua ON ua.vec_id = c.vec_a
  JOIN unitv ub ON ub.vec_id = c.vec_b
)
SELECT vec_a, vec_b, cos FROM ecos WHERE cos >= {threshold}"""


#: shared head of the IVF oracles: unit-normalized vectors + the bounded
#: deterministic centroid sample (`vec_id < sample_cap`, every (n//C)-th
#: row sorted by vec_id — stages/ann.py:ivf_centroids)
def _ivf_head_sql(num_centroids: int, sample_cap: int) -> str:
    return f"""
WITH unitv AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE) /
      greatest(sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 1e-12)) AS u
  FROM embeddings
),
samp AS (
  SELECT vec_id, u,
         row_number() OVER (ORDER BY vec_id) AS rn,
         count(*) OVER () AS n
  FROM unitv WHERE vec_id < {sample_cap}
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, u
  FROM samp
  WHERE (rn - 1) % greatest(n // {num_centroids}, 1) = 0
  ORDER BY vec_id LIMIT {num_centroids}
)"""


#: shared tail: bucket assignment with the given centroid CTE, query-side
#: probe of the nprobe nearest buckets, 6-decimal rounding, (cos DESC,
#: vec_id) ranking — ties break exactly like the engine's stable argsort
def _ivf_probe_tail_sql(
    cents_cte: str, k: int, num_queries: int, nprobe: int
) -> str:
    return f"""
assign AS (
  SELECT v.vec_id, c.cid,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY list_inner_product(v.u, c.u) DESC, c.cid)
           AS r
  FROM unitv v CROSS JOIN {cents_cte} c
),
vbucket AS (SELECT vec_id, cid AS bucket FROM assign WHERE r = 1),
qset AS (SELECT vec_id AS qid, u AS qu FROM unitv WHERE vec_id < {num_queries}),
probe AS (
  SELECT q.qid, c.cid,
         row_number() OVER (PARTITION BY q.qid
                            ORDER BY list_inner_product(q.qu, c.u) DESC, c.cid)
           AS pr
  FROM qset q CROSS JOIN {cents_cte} c
),
icand AS (
  SELECT p.qid, vb.vec_id
  FROM probe p JOIN vbucket vb ON vb.bucket = p.cid
  WHERE p.pr <= {nprobe} AND vb.vec_id <> p.qid
),
scored AS (
  SELECT c.qid AS query_id, c.vec_id,
         round(list_inner_product(q.qu, v.u), 6) AS cos
  FROM icand c
  JOIN qset q ON q.qid = c.qid
  JOIN unitv v ON v.vec_id = c.vec_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       vec_id, cos
FROM scored QUALIFY rank <= {k}"""


def ivf_topk_sql(
    k: int = 5, num_queries: int = 8, num_centroids: int = 16,
    nprobe: int = 4, sample_cap: int = 1024,
) -> str:
    """Mirror of ann_topk_ivf (sampled-centroid variant): the centroid
    sample is `vec_id < sample_cap` sorted by vec_id, every (n // C)-th
    row — a rule SQL can state exactly — and assignment/probe ties break
    on (similarity DESC, centroid-id ASC), matching the engine's stable
    argsort/argmax. Cosines round to 6 decimals before ranking, as in the
    brute-force oracle."""
    return (
        _ivf_head_sql(num_centroids, sample_cap)
        + ",\n"
        + _ivf_probe_tail_sql("cents", k, num_queries, nprobe)
    )


def _norm_expr(col: str) -> str:
    """list_transform renormalization mirroring kmeans._unit_rows."""
    return (
        f"list_transform({col}, x -> x / "
        f"greatest(sqrt(list_sum(list_transform({col}, y -> y * y))), 1e-12))"
    )


def ivf_kmeans_topk_sql(
    k: int = 5, num_queries: int = 8, num_centroids: int = 16,
    nprobe: int = 4, sample_cap: int = 1024, iters: int = 4,
) -> str:
    """Mirror of ann_topk_ivf(train=True): the k-means-TRAINED IVF probe.

    Lloyd's with a fixed iteration count and a deterministic init (the
    bounded sample rule above) is SQL-expressible by unrolling: each
    iteration is assignment (nearest centroid, ties to the lower cid —
    the engine's argmax) + an element-wise mean via lockstep
    unnest/generate_subscripts + renormalization; clusters that receive
    no vectors keep their previous centroid (stages/kmeans.py:113-116 —
    `np.where(counts > 0, sums/counts, cents)` then `_unit_rows`).
    cents0 is normalized TWICE (once in ivf_centroids, once by
    kmeans_fit's `_unit_rows(init)`) to mirror the engine's float path
    bit-for-bit as closely as SQL allows; remaining float-sum
    associativity differences are absorbed by the 6-decimal rounding and
    the (cos DESC, vec_id) tiebreak. Probe/topk tail is shared with the
    sampled-centroid oracle."""
    body = [_ivf_head_sql(num_centroids, sample_cap)]
    body.append(f""",
cents0 AS (SELECT cid, {_norm_expr('u')} AS u FROM cents)""")
    prev = "cents0"
    for it in range(1, iters + 1):
        body.append(f""",
kassign{it} AS (
  SELECT v.vec_id, c.cid, v.u,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY list_inner_product(v.u, c.u) DESC, c.cid)
           AS r
  FROM unitv v CROSS JOIN {prev} c
),
kmean{it} AS (
  SELECT cid, i, sum(x) / count(*) AS mx
  FROM (SELECT a.cid, generate_subscripts(a.u, 1) AS i, unnest(a.u) AS x
        FROM kassign{it} a WHERE a.r = 1)
  GROUP BY cid, i
),
kml{it} AS (SELECT cid, list(mx ORDER BY i) AS mu FROM kmean{it} GROUP BY cid),
cents{it} AS (
  SELECT p.cid,
         CASE WHEN m.mu IS NULL THEN {_norm_expr('p.u')}
              ELSE {_norm_expr('m.mu')} END AS u
  FROM {prev} p LEFT JOIN kml{it} m USING (cid)
)""")
        prev = f"cents{it}"
    body.append(",\n" + _ivf_probe_tail_sql(prev, k, num_queries, nprobe))
    return "".join(body)


def semantic_dedup_sql(
    threshold: float = 0.35, num_centroids: int = 16, sample_cap: int = 1024
) -> str:
    """Mirror of dedup.semantic_dedup_keep: the bounded-sample centroid
    CTE and (sim DESC, cid ASC) assignment are shared with the IVF
    oracle; the prune rule is a plain anti-join — a vector is pruned when
    ANY earlier (smaller vec_id) member of its cluster has cosine >=
    threshold after 6-decimal rounding, kept or not (min-id-wins, like
    the rest of the dedup family)."""
    return (
        _ivf_head_sql(num_centroids, sample_cap)
        + f""",
sassign AS (
  SELECT v.vec_id, c.cid, v.u,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY list_inner_product(v.u, c.u) DESC, c.cid)
           AS r
  FROM unitv v CROSS JOIN cents c
),
sbucket AS (SELECT vec_id, cid, u FROM sassign WHERE r = 1),
spruned AS (
  SELECT DISTINCT b.vec_id
  FROM sbucket a JOIN sbucket b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_inner_product(a.u, b.u), 6) >= {threshold}
)
SELECT v.vec_id, CAST(v.cid AS INTEGER) AS cluster_id
FROM sbucket v
WHERE v.vec_id NOT IN (SELECT vec_id FROM spruned)
"""
    )


def hll_distinct_sql(column: str = "user_id", table: str = "events",
                     p: int = 12) -> str:
    """Mirror of approx_distinct (stages/sketches.py): splitmix64 of the
    id's bit pattern (HUGEINT split-multiply for the two 64-bit constant
    products, UBIGINT for the xor-shifts), register index = top p bits,
    rho from floor(log2(w)) on the remaining bits left-aligned — w always
    carries <= 52 significant bits (the low p are zero), so the double is
    exact and numpy and DuckDB hit the same libm log2 — then the standard
    harmonic estimate with the linear-counting small-range correction."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    c1 = 0xBF58476D1CE4E5B9
    c2 = 0x94D049BB133111EB
    return f"""
WITH z0 AS (
  SELECT (CAST(CAST({column} AS BIGINT) AS HUGEINT)
          + CAST('11400714819323198485' AS HUGEINT)) % {_MSTR} AS z
  FROM {table}
),
z1 AS (
  SELECT CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) AS HUGEINT) AS z
  FROM z0
),
z2 AS (SELECT {_mul('z', c1)} AS z FROM z1),
z3 AS (
  SELECT CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) AS HUGEINT) AS z
  FROM z2
),
z4 AS (SELECT {_mul('z', c2)} AS z FROM z3),
h AS (
  SELECT CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS HUGEINT) AS h
  FROM z4
),
rhos AS (
  SELECT CAST(h >> {64 - p} AS BIGINT) AS idx,
         CASE WHEN h % CAST('{1 << (64 - p)}' AS HUGEINT) = 0
              THEN {64 - p + 1}
              ELSE 63 - CAST(floor(log2(CAST((h % CAST('{1 << (64 - p)}' AS HUGEINT))
                                             * CAST({1 << p} AS HUGEINT) AS DOUBLE)))
                             AS BIGINT) + 1 END AS rho
  FROM h
),
regs AS (SELECT idx, max(rho) AS r FROM rhos GROUP BY idx),
agg AS (
  SELECT sum(power(2.0, -r)) AS present_sum,
         count(*) AS n_present
  FROM regs
),
est AS (
  SELECT CAST({alpha!r} AS DOUBLE) * {m} * {m}
           / (present_sum + ({m} - n_present)) AS raw,
         {m} - n_present AS zeros
  FROM agg
)
SELECT CAST(round(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                  THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                  ELSE raw END) AS BIGINT) AS approx_distinct
FROM est"""


def contamination_sql(n: int = 8, bench_mod: int = 17) -> str:
    """Oracle for contamination_check_distributed / _incremental with the
    benchmark set = documents whose doc_id % bench_mod == 0.

    Mirrors stages/dedup.py:_shingle_hashes_words at word width ``n``: the
    rolling recurrence sh[:-i] = sh[:-i]*B + th[i:]*C over i=1..n-1 expands
    to sh(pos) = th_pos*A*B^(n-1) + sum_i th_{pos+i}*C*B^(n-1-i), stated as
    an n-way positional self-join of the token-hash CTE. ngram_hits counts
    doc n-gram OCCURRENCES (within-doc duplicates included) whose hash
    appears anywhere in the benchmark's distinct hash set — exactly the
    engine's per-occurrence np.add.at / groupby-sum semantics."""
    ks = [(_A * pow(_B, n - 1, _M)) % _M] + [
        (_C * pow(_B, n - 1 - i, _M)) % _M for i in range(1, n)
    ]
    joins = "\n  ".join(
        f"JOIN th t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        for i in range(1, n)
    )
    terms = " + ".join(_mul(f"t{i}.th", ks[i]) for i in range(n))
    return f"""WITH {_TH},
shn AS (
  SELECT t0.doc_id, ({terms}) % {_MSTR} AS sh
  FROM th t0
  {joins}
),
bench AS (SELECT DISTINCT sh FROM shn WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT d.doc_id, count(*) AS ngram_hits
  FROM shn d JOIN bench USING (sh)
  GROUP BY d.doc_id
)
SELECT doc.doc_id,
       COALESCE(h.ngram_hits, 0) > 0 AS contaminated,
       CAST(COALESCE(h.ngram_hits, 0) AS BIGINT) AS ngram_hits
FROM documents doc LEFT JOIN hits h ON h.doc_id = doc.doc_id"""


def corpus_prep_full_sql(
    n: int = 8, bench_mod: int = 17, seq_len: int = 128,
    group_size: int = 100,
) -> str:
    """Oracle for the composite corpus-prep pipeline
    (pipelines/data_queries.q_corpus_prep_full): exact-dedup keep
    (min doc_id per text — the content-equality mirror of the dual
    fingerprints), contamination filter against the
    every-``bench_mod``-th-doc benchmark (the same n-way positional
    shingle mirror as contamination_sql), PII scrub (ORACLE_SCRUB's two
    regexes), then the sequence-packing layout (ORACLE_PACK_SEQUENCES's
    arithmetic) over the clean scrubbed survivors."""
    ks = [(_A * pow(_B, n - 1, _M)) % _M] + [
        (_C * pow(_B, n - 1 - i, _M)) % _M for i in range(1, n)
    ]
    joins = "\n  ".join(
        f"JOIN th t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        for i in range(1, n)
    )
    terms = " + ".join(_mul(f"t{i}.th", ks[i]) for i in range(n))
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    return f"""WITH {_TH},
shn AS (
  SELECT t0.doc_id, ({terms}) % {_MSTR} AS sh
  FROM th t0
  {joins}
),
bench AS (SELECT DISTINCT sh FROM shn WHERE doc_id % {bench_mod} = 0),
keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
chits AS (
  SELECT d.doc_id, count(*) AS c
  FROM shn d JOIN bench USING (sh)
  GROUP BY d.doc_id
),
clean AS (
  SELECT k.doc_id, doc.text
  FROM keep k JOIN documents doc USING (doc_id)
  LEFT JOIN chits h ON h.doc_id = k.doc_id
  WHERE COALESCE(h.c, 0) = 0
),
scrubbed AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(text, '{email}', '<EMAIL>', 'g'),
           '[0-9]{{6,}}', '<NUM>', 'g') AS text
  FROM clean
),
g AS (
  SELECT doc_id // {group_size} AS grp,
         SUM(len(string_split(text, ' '))) AS total
  FROM scrubbed GROUP BY doc_id // {group_size}
),
s AS (
  SELECT grp,
         unnest(range(CAST((total + {seq_len - 1}) // {seq_len} AS BIGINT)))
           AS seq_idx,
         total
  FROM g
)
SELECT CAST(grp AS BIGINT) AS "group",
       CAST(seq_idx AS BIGINT) AS seq_idx,
       CAST(least({seq_len}, total - seq_idx * {seq_len}) AS BIGINT) AS n_real
FROM s"""


def duplicated_spans_sql(n: int = 4) -> str:
    """Oracle for dedup.duplicated_spans: a width-``n`` token window is
    duplicated when its rolling hash occurs >= 2 times across the corpus
    (within-doc repeats count — the Lee et al. 2021 substring-dedup
    occurrence rule). Same n-way positional shingle mirror as
    contamination_sql; dup_frac rounds to 6 decimals on both sides."""
    ks = [(_A * pow(_B, n - 1, _M)) % _M] + [
        (_C * pow(_B, n - 1 - i, _M)) % _M for i in range(1, n)
    ]
    joins = "\n  ".join(
        f"JOIN th t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        for i in range(1, n)
    )
    terms = " + ".join(_mul(f"t{i}.th", ks[i]) for i in range(n))
    return f"""WITH {_TH},
shn AS (
  SELECT t0.doc_id, ({terms}) % {_MSTR} AS sh
  FROM th t0
  {joins}
),
tot AS (SELECT sh, count(*) AS c FROM shn GROUP BY sh),
per AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(CASE WHEN t.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM shn s JOIN tot t USING (sh)
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
       round(CAST(COALESCE(p.n_dup, 0) AS DOUBLE)
             / greatest(COALESCE(p.n_spans, 0), 1), 6) AS dup_frac
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id"""

"""The DuckDB mirrors in pipelines/dedup_oracles.py must stay bit-equal to
the engine: token hashing is the engine's own polynomial fingerprint, so
every LSH stage is deterministic integer arithmetic. These tests pin the
equivalence locally (the driver re-checks at sf0.01); the slowest mirrors
(char-ngram ~20 s, clusters ~17 s SQL) are exercised by the driver and by
scripts/verify_oracles.py rather than per-test-run."""

import duckdb
import ray.data

from kafka_connect_jdbc_flatten_ray.pipelines import dedup_oracles
from kafka_connect_jdbc_flatten_ray.stages import dedup


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def _docs(sf_dir):
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _cmp(ray_ds, con, sql, cols):
    a = ray_ds.to_pandas().sort_values(cols).reset_index(drop=True)
    b = con.execute(sql).df()[list(a.columns)].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    assert len(a) > 0, "degenerate comparison: no rows"
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), c
    return len(a)


class TestMinHashOracle:
    def test_word_pairs_match_sql(self, ray_session, sf_dir):
        _cmp(dedup.dedup_minhash_pairs(_docs(sf_dir), threshold=0.5),
             _con(sf_dir), dedup_oracles.minhash_pairs_sql(0.5, "word"),
             ["doc_a", "doc_b"])

    def test_keep_matches_sql(self, ray_session, sf_dir):
        _cmp(dedup.dedup_minhash_keep(_docs(sf_dir), threshold=0.95),
             _con(sf_dir), dedup_oracles.minhash_keep_sql(0.95), ["doc_id"])


class TestSimHashOracle:
    def test_pairs_match_sql(self, ray_session, sf_dir):
        _cmp(dedup.dedup_simhash_pairs(_docs(sf_dir), max_hamming=3),
             _con(sf_dir), dedup_oracles.simhash_pairs_sql(3),
             ["doc_a", "doc_b"])


class TestImageDecodeOracle:
    def test_summary_matches_sql(self, ray_session, sf_dir):
        from kafka_connect_jdbc_flatten_ray.pipelines.data_queries import (
            q_media_decode,
        )

        n = _cmp(q_media_decode(sf_dir), _con(sf_dir),
                 dedup_oracles.image_decode_sql(),
                 ["media_id"])
        assert n == 500


class TestEmbeddingOracle:
    def test_pairs_match_sql(self, ray_session, sf_dir):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        _cmp(dedup.dedup_embedding_pairs(emb, 64, threshold=0.35),
             con, dedup_oracles.embedding_pairs_sql(0.35, 64),
             ["vec_a", "vec_b"])

    def test_ivf_matches_sql(self, ray_session, sf_dir):
        from kafka_connect_jdbc_flatten_ray.stages import ann

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        _cmp(ann.ann_topk_ivf(sf_dir, k=5, num_queries=8),
             con, dedup_oracles.ivf_topk_sql(),
             ["query_id", "rank"])

    def test_ivf_kmeans_matches_sql(self, ray_session, sf_dir):
        """The TRAINED probe: 4 unrolled Lloyd iterations in SQL must
        reproduce the distributed-k-means engine path exactly."""
        from kafka_connect_jdbc_flatten_ray.stages import ann

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        _cmp(ann.ann_topk_ivf(sf_dir, k=5, num_queries=8, train=True),
             con, dedup_oracles.ivf_kmeans_topk_sql(),
             ["query_id", "rank"])

    def test_hll_matches_sql(self, ray_session, sf_dir):
        import ray.data as rd

        from kafka_connect_jdbc_flatten_ray.stages.sketches import approx_distinct

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        )
        ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        got = int(approx_distinct(ds, "user_id")["approx_distinct"][0])
        want = con.execute(dedup_oracles.hll_distinct_sql()).fetchone()[0]
        assert got == want

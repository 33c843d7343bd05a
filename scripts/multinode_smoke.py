"""Virtual multi-NODE smoke: the same ingest epoch on a simulated 4-node
Ray cluster (ray.cluster_utils.Cluster) — exercises cross-node object
transfer and scheduling that single-node local mode cannot, catching
node-locality assumptions before a real `ray job submit` deployment.

    python scripts/multinode_smoke.py [--nodes 4] [--cpus-per-node 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4)
    ap.add_argument("--cpus-per-node", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=1000)
    args = ap.parse_args()

    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster()
    for _ in range(args.nodes):
        cluster.add_node(num_cpus=args.cpus_per_node, include_dashboard=False)
    ray.init(address=cluster.address, logging_level="ERROR")
    print(json.dumps({"nodes": len(ray.nodes()),
                      "cpus": ray.cluster_resources().get("CPU")}))

    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    from kafka_connect_jdbc_flatten_ray.pipelines import ingest

    lake = tempfile.mkdtemp(prefix="multinode_lake_")
    t0 = time.perf_counter()
    r = ingest.run_epoch(args.sf_dir, lake, replicate=args.replicate)
    sec = time.perf_counter() - t0
    n = ingest.read_lake_table(lake, "cdc_filechange").count()
    events = sum(v["rows_in"] for v in r["tables"].values())
    print(json.dumps({
        "sec": round(sec, 1),
        "root_rows": n,
        "events_per_sec": round(10714 * args.replicate / sec, 1),
    }))

    # LSH dedup on the virtual cluster: the groupby-heavy star-pairing
    # path crosses node boundaries (bucket shards land on all 4 nodes)
    import ray.data as rd

    from kafka_connect_jdbc_flatten_ray.stages import dedup, windows

    docs = rd.read_parquet(f"{args.sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    t0 = time.perf_counter()
    n_pairs = dedup.dedup_minhash_pairs(docs, threshold=0.5).count()
    print(json.dumps({"dedup_minhash_pairs": n_pairs,
                      "sec": round(time.perf_counter() - t0, 1)}))

    # salted sessionize: sub-session stitch moves summaries across nodes
    ev = rd.read_parquet(f"{args.sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    t0 = time.perf_counter()
    a = windows.sessionize(ev, gap_seconds=1800).count()
    b = windows.sessionize(ev, gap_seconds=1800, salt_seconds=3600).count()
    print(json.dumps({"sessions_unsalted": a, "sessions_salted": b,
                      "equal": a == b,
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert a == b, "salted sessionize diverged on the virtual cluster"

    # incremental sessionize: state files written by fold tasks on ANY
    # node must resolve on later epochs (shared-fs assumption of the lake)
    from kafka_connect_jdbc_flatten_ray.stages import streaming_windows as sws

    state = tempfile.mkdtemp(prefix="multinode_winstate_")
    import pyarrow as pa2
    import pyarrow.parquet as pq2
    import numpy as np2

    t = pq2.read_table(f"{args.sf_dir}/events.parquet",
                       columns=["user_id", "event_id", "ts"])
    tsi = t.column("ts").to_numpy().astype("datetime64[us]").astype(np2.int64)
    q1 = int(np2.quantile(tsi, 0.5))
    t0 = time.perf_counter()
    sws.sessionize_epoch(rd.from_arrow(t.filter(pa2.array(tsi <= q1))), state)
    sws.sessionize_epoch(rd.from_arrow(t.filter(pa2.array(tsi > q1))), state)
    inc = sws.read_sessions(state).count()
    print(json.dumps({"incremental_sessions": inc, "batch_sessions": a,
                      "equal": inc == a,
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert inc == a, "incremental sessionize diverged on the virtual cluster"

    # incremental dedup trio on the virtual cluster: fold tasks on any
    # node write state under the shared lake root; the second epoch's
    # folds (possibly on other nodes) must stream that prior state back
    from kafka_connect_jdbc_flatten_ray.stages import streaming_dedup as sd

    ids = docs.select_columns(["doc_id"])  # noqa: F841 (forces schema read)
    droot = tempfile.mkdtemp(prefix="multinode_dedupstate_")
    t0 = time.perf_counter()
    dt = pq2.read_table(f"{args.sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    half = dt.num_rows // 2
    sd.dedup_exact_epoch(rd.from_arrow(dt.slice(0, half)), droot)
    sd.dedup_exact_epoch(rd.from_arrow(dt.slice(half)), droot)
    inc_keep = sd.read_keepers(droot).count()
    batch_keep = dedup.dedup_exact(rd.from_arrow(dt)).count()
    print(json.dumps({"incremental_keepers": inc_keep,
                      "batch_keepers": batch_keep,
                      "equal": inc_keep == batch_keep,
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert inc_keep == batch_keep, "incremental exact dedup diverged"

    lroot = tempfile.mkdtemp(prefix="multinode_lshstate_")
    t0 = time.perf_counter()
    sd.minhash_pairs_epoch(rd.from_arrow(dt.slice(0, half)), lroot,
                           threshold=0.5)
    sd.minhash_pairs_epoch(rd.from_arrow(dt.slice(half)), lroot,
                           threshold=0.5)
    inc_pairs = sd.read_pairs(lroot).count()
    print(json.dumps({"incremental_lsh_pairs": inc_pairs,
                      "batch_lsh_pairs": n_pairs,
                      "equal": inc_pairs == n_pairs,
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert inc_pairs == n_pairs, "incremental LSH diverged"

    # incremental quantiles + contamination + embedding near-dup: the
    # round-4 state family, folded across the virtual cluster the same
    # way (fold tasks on any node, prior state streamed back)
    from kafka_connect_jdbc_flatten_ray.stages import (
        scrub,
        streaming_quantiles as sq,
        streaming_scrub as ssc,
    )
    from kafka_connect_jdbc_flatten_ray.stages.quantiles import quantiles_exact

    qroot = tempfile.mkdtemp(prefix="multinode_qstate_")
    ev_vals = pq2.read_table(f"{args.sf_dir}/events.parquet",
                             columns=["value"])
    vhalf = ev_vals.num_rows // 2
    t0 = time.perf_counter()
    sq.value_counts_epoch(rd.from_arrow(ev_vals.slice(0, vhalf)), qroot, "value")
    sq.value_counts_epoch(rd.from_arrow(ev_vals.slice(vhalf)), qroot, "value")
    inc_q = sq.quantiles_from_state(qroot)
    batch_q = quantiles_exact(rd.from_arrow(ev_vals), "value")
    print(json.dumps({"incremental_quantiles": inc_q["value"].tolist(),
                      "equal": bool(inc_q.equals(batch_q)),
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert inc_q.equals(batch_q), "incremental quantiles diverged"

    croot = tempfile.mkdtemp(prefix="multinode_contamstate_")
    bt = dt.slice(0, max(dt.num_rows // 10, 8))
    bhalf = bt.num_rows // 2
    t0 = time.perf_counter()
    ssc.benchmark_ngrams_epoch(rd.from_arrow(bt.slice(0, bhalf)), croot, n=8)
    ssc.benchmark_ngrams_epoch(rd.from_arrow(bt.slice(bhalf)), croot, n=8)
    inc_c = ssc.contamination_check_incremental(rd.from_arrow(dt), croot)
    inc_hits = int(inc_c.sum("ngram_hits"))
    batch_hits = int(scrub.contamination_check_distributed(
        rd.from_arrow(dt), rd.from_arrow(bt), n=8).sum("ngram_hits"))
    print(json.dumps({"incremental_contam_hits": inc_hits,
                      "batch_contam_hits": batch_hits,
                      "equal": inc_hits == batch_hits,
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert inc_hits == batch_hits, "incremental contamination diverged"

    et = pq2.read_table(f"{args.sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    dim = len(et.column("embedding")[0])
    eroot = tempfile.mkdtemp(prefix="multinode_embstate_")
    ehalf = et.num_rows // 2
    t0 = time.perf_counter()
    sd.embedding_pairs_epoch(rd.from_arrow(et.slice(0, ehalf)), eroot, dim,
                             threshold=0.35)
    sd.embedding_pairs_epoch(rd.from_arrow(et.slice(ehalf)), eroot, dim,
                             threshold=0.35)
    inc_ep = sd.read_embedding_pairs(eroot).count()
    batch_ep = dedup.dedup_embedding_pairs(rd.from_arrow(et), dim,
                                           threshold=0.35).count()
    print(json.dumps({"incremental_emb_pairs": inc_ep,
                      "batch_emb_pairs": batch_ep,
                      "equal": inc_ep == batch_ep,
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert inc_ep == batch_ep, "incremental embedding dedup diverged"

    # term counts, stratified sample and the IVF postings index: the
    # remaining round-4 state families, folded across the virtual cluster
    from kafka_connect_jdbc_flatten_ray.stages import (
        ann as ann_mod,
        streaming_ann as san,
        streaming_sample as ssm,
        streaming_terms as stm,
    )

    dt_full = pq2.read_table(f"{args.sf_dir}/documents.parquet",
                             columns=["doc_id", "lang", "text"])
    troot = tempfile.mkdtemp(prefix="multinode_termstate_")
    t0 = time.perf_counter()
    stm.term_counts_epoch(rd.from_arrow(dt_full.slice(0, half)), troot)
    stm.term_counts_epoch(rd.from_arrow(dt_full.slice(half)), troot)
    inc_terms = int(stm.read_term_counts(troot).sum("count"))
    batch_terms = sum(len(s.split(" "))
                      for s in dt_full.column("text").to_pylist())
    print(json.dumps({"incremental_token_total": inc_terms,
                      "batch_token_total": batch_terms,
                      "equal": inc_terms == batch_terms,
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert inc_terms == batch_terms, "incremental term counts diverged"

    sroot = tempfile.mkdtemp(prefix="multinode_samplestate_")
    ssm.sample_epoch(rd.from_arrow(dt_full.slice(0, half)), sroot)
    ssm.sample_epoch(rd.from_arrow(dt_full.slice(half)), sroot)
    n_langs = len(set(dt_full.column("lang").to_pylist()))
    inc_sample = ssm.read_sample(sroot).count()
    print(json.dumps({"incremental_sample_rows": inc_sample,
                      "expected": 3 * n_langs,
                      "equal": inc_sample == 3 * n_langs}))
    assert inc_sample == 3 * n_langs, "incremental sample diverged"

    iroot = tempfile.mkdtemp(prefix="multinode_ivfstate_")
    cents = ann_mod.ivf_centroids(args.sf_dir, 16)
    t0 = time.perf_counter()
    san.ivf_index_epoch(rd.from_arrow(et.slice(0, ehalf)), iroot, cents)
    san.ivf_index_epoch(rd.from_arrow(et.slice(ehalf)), iroot)
    q_ids, q_mat = ann_mod.load_queries(args.sf_dir, 8)
    inc_ann = san.probe_topk(iroot, q_ids, q_mat, k=5, nprobe=4) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    batch_ann = ann_mod.ann_topk_ivf(args.sf_dir, k=5, num_queries=8) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    print(json.dumps({"incremental_ann_rows": len(inc_ann),
                      "equal": bool(inc_ann.equals(batch_ann)),
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert inc_ann.equals(batch_ann), "incremental IVF probe diverged"

    # incremental bigram-LM state: two epochs folded on the virtual
    # cluster must score identically to the batch pass
    from kafka_connect_jdbc_flatten_ray.stages.textops import bigram_lm_score

    broot = tempfile.mkdtemp(prefix="multinode_bigramstate_")
    dt_txt = dt_full.select(["doc_id", "text"])
    t0 = time.perf_counter()
    stm.bigram_counts_epoch(rd.from_arrow(dt_txt.slice(0, half)), broot)
    stm.bigram_counts_epoch(rd.from_arrow(dt_txt.slice(half)), broot)
    inc_lm = stm.lm_score_from_state(rd.from_arrow(dt_txt), broot) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    batch_lm = bigram_lm_score(rd.from_arrow(dt_txt)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    print(json.dumps({"incremental_lm_rows": len(inc_lm),
                      "equal": bool(inc_lm.equals(batch_lm)),
                      "sec": round(time.perf_counter() - t0, 1)}))
    assert inc_lm.equals(batch_lm), "incremental bigram LM diverged"
    ray.shutdown()
    cluster.shutdown()


if __name__ == "__main__":
    main()

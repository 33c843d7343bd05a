"""CLI corpus-prep driver — the training-data counterpart to run_ingest.

    python scripts/run_corpus_prep.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/corpus [--rows-per-part 100000] [--num-cpus 32]

One streaming pipeline, no driver materialization of documents:

    read documents
      -> model quality scoring (actor pool; keep score >= 0.5)
      -> exact dedup (content fingerprints -> groupby winners -> semi-join
         back via the union+groupby keep pattern)
      -> PII scrub
      -> chunking into overlapping token windows
      -> resumable partitioned export (rerun skips finished partitions)
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build_pipeline(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean
    from ray.data.aggregate import Max

    from kafka_connect_jdbc_flatten_ray.stages.dedup import _fingerprints, _text_col
    from kafka_connect_jdbc_flatten_ray.stages.inference import score_quality
    from kafka_connect_jdbc_flatten_ray.stages.scrub import ChunkDocs, ScrubText

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # quality gate: the scoring stage emits (doc_id, score, keep); re-join
    # of text is avoided by scoring inline on the full rows instead
    def _score_and_filter(t: pa.Table) -> pa.Table:
        from kafka_connect_jdbc_flatten_ray.stages.inference import QualityModel

        scores = QualityModel()(t)
        keep = scores.column("keep")
        return t.filter(keep)

    kept = docs.map_batches(
        _score_and_filter, batch_format="pyarrow", zero_copy_batch=True
    )

    # exact dedup keep: fingerprint rows, per-content winner = min doc_id,
    # then drop losers via the union + groupby anti-join pattern
    def _fp(t: pa.Table) -> pa.Table:
        h1, h2 = _fingerprints(_text_col(t))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "h1": pa.array(h1.view(np.int64)),
                "h2": pa.array(h2.view(np.int64)),
            }
        )

    fps = kept.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)
    winners = fps.groupby(["h1", "h2"]).min("doc_id").map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("min(doc_id)"),
             "win": pa.array(np.ones(t.num_rows, np.int8))}
        ),
        batch_format="pyarrow",
    )
    marked = kept.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"),
             "win": pa.array(np.zeros(t.num_rows, np.int8))}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).union(winners).groupby("doc_id").aggregate(Max("win", alias_name="is_winner"))
    keep_ids = marked.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id").filter(
                pc.equal(pc.cast(t.column("is_winner"), pa.int8()), 1))}
        ),
        batch_format="pyarrow",
    )
    # semi-join text back onto winner ids with the same union+groupby trick
    # is unnecessary: winners ⊂ kept, so filter kept by broadcast of ids
    # would be driver-side. Instead mark rows through one more union pass.
    def _text_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("doc_id"), "text": t.column("text"),
             "tag": pa.array(np.zeros(t.num_rows, np.int8))}
        )

    def _id_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "text": pa.nulls(t.num_rows, pa.string()),
             "tag": pa.array(np.ones(t.num_rows, np.int8))}
        )

    def _shard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("shard", pa.array((ids % 256).astype(np.int32)))

    def _pick_shard(g: pa.Table) -> pa.Table:
        """One shard of docs: keep each doc's text row iff the winner-id
        row is present too (vectorized run detection — no per-doc calls)."""
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, ids))
        ids_s, tag_s = ids[order], tag[order]
        new_doc = np.concatenate(([True], ids_s[1:] != ids_s[:-1]))
        run_id = np.cumsum(new_doc) - 1
        has_winner = np.zeros(run_id[-1] + 1 if len(run_id) else 0, bool)
        np.logical_or.at(has_winner, run_id, tag_s == 1)
        keep = (tag_s == 0) & has_winner[run_id]
        sel = pa.array(order[keep])
        return pa.table(
            {"doc_id": pc.take(g.column("doc_id"), sel),
             "text": pc.take(g.column("text"), sel)}
        )

    survivors = (
        kept.map_batches(_text_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(keep_ids.map_batches(_id_rows, batch_format="pyarrow"))
        .map_batches(_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_pick_shard, batch_format="pyarrow")
    )
    scrubbed = survivors.map_batches(
        ScrubText, batch_format="pyarrow", concurrency=(1, 4)
    )
    return scrubbed.map_batches(
        ChunkDocs(size=128, overlap=16), batch_format="pyarrow",
        zero_copy_batch=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows-per-part", type=int, default=100_000)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from kafka_connect_jdbc_flatten_ray.stages.export import (
        export_corpus_partitioned,
    )

    chunks = build_pipeline(args.sf_dir)
    manifest = export_corpus_partitioned(
        chunks, args.out, key_col="doc_id", rows_per_part=args.rows_per_part
    )
    print(json.dumps({"rows": manifest["rows"],
                      "partitions": len(manifest["partitions"]),
                      "skipped": len(manifest["skipped"])}))
    ray.shutdown()


if __name__ == "__main__":
    main()

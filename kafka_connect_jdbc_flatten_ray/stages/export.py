"""Training-corpus output ops: sharded export and sequence packing.

- export_corpus: resumable training-data layout — size-targeted Parquet
  shards + a manifest (file list, row counts, order-insensitive content
  digest) written after the data, so a consumer can verify completeness and
  a rerun can skip the finished export.
- pack_sequences: LLM-style sequence packing — token ids concatenated into
  fixed-length sequences. Packing runs per doc-id-range group
  (groupby(group).map_groups with in-group doc_id sort), so the output is
  DETERMINISTIC regardless of block boundaries or parallelism — the
  partitioning assumption is the doc_id-range grouping.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.util import arrowize, read_parquet_clean
from kafka_connect_jdbc_flatten_ray.functions.hashing import dataset_digest


def export_corpus(
    ds: ray.data.Dataset, out_dir: str, min_rows_per_file: int = 100_000
) -> dict:
    """Write sharded Parquet + manifest; returns the manifest dict.

    Crash-safe: shards land in a fresh staging directory that atomically
    replaces ``data/`` only after the write completes, so UUID-named shards
    left by a crashed or previous run can never be absorbed into the
    manifest. The verification digest (which embeds the row count) is
    computed in ONE distributed read of the published shards."""
    import shutil
    import uuid

    data_dir = os.path.join(out_dir, "data")
    stage_dir = os.path.join(out_dir, f"_staging-{uuid.uuid4().hex[:12]}")
    os.makedirs(stage_dir)
    try:
        ds.write_parquet(stage_dir, min_rows_per_file=min_rows_per_file)
        files = sorted(f for f in os.listdir(stage_dir) if f.endswith(".parquet"))
        if os.path.isdir(data_dir):
            shutil.rmtree(data_dir)
        os.replace(stage_dir, data_dir)
    except BaseException:
        shutil.rmtree(stage_dir, ignore_errors=True)
        raise
    digest = dataset_digest(
        read_parquet_clean([os.path.join(data_dir, f) for f in files])
    )
    manifest = {
        "files": files,
        "rows": int(digest.split(":")[1]),  # digest format "<hex>:<rows>"
        "digest": digest,
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


class _WritePartition:
    """map_groups writer: one deterministic file per key-range partition,
    written tmp+rename and SKIPPED when the final file already exists — a
    failed run resumes by rewriting only the missing partitions."""

    def __init__(self, data_dir: str):
        self.data_dir = data_dir
        self.__name__ = "write_partition"

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from kafka_connect_jdbc_flatten_ray.state import fs as fsx

        part = int(group.column("__part")[0].as_py())
        fs, root = fsx.resolve(self.data_dir)
        fsx.makedirs(fs, root)
        path = fsx.join(root, f"part-{part:05d}.parquet")
        out = group.drop_columns(["__part"])
        if fsx.exists(fs, path):
            status = "skipped"
        else:
            staged = fsx.staging_path(fs, path)
            pq.write_table(out, staged, filesystem=fs)
            fsx.publish_file(fs, staged, path)
            status = "written"
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "rows": pa.array([out.num_rows], pa.int64()),
                "status": pa.array([status]),
                "path": pa.array([path]),
            }
        )


def export_corpus_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    key_col: str = "doc_id",
    rows_per_part: int = 100_000,
) -> dict:
    """Resumable partitioned export: rows land in key-range partitions
    (``key // rows_per_part``), each written as ONE deterministic file by a
    distributed task that skips partitions already on disk — rerunning
    after a crash redoes only the unfinished partitions. The manifest
    (file list + per-partition rows + digest) is written last."""

    def _assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__part", pa.array((keys // rows_per_part).astype(np.int64))
        )

    data_dir = os.path.join(out_dir, "data")
    stats = (
        ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_WritePartition(data_dir), batch_format="pyarrow")
        .take_all()  # one row per partition
    )
    files = sorted(os.path.basename(r["path"]) for r in stats)
    digest = dataset_digest(
        read_parquet_clean([os.path.join(data_dir, f) for f in files])
    )
    manifest = {
        "files": files,
        "rows": int(digest.split(":")[1]),
        "partitions": {int(r["part"]): int(r["rows"]) for r in stats},
        "skipped": sorted(int(r["part"]) for r in stats if r["status"] == "skipped"),
        "digest": digest,
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def verify_export(out_dir: str) -> bool:
    """Re-read the shards and check the manifest digest."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    files = [os.path.join(out_dir, "data", f) for f in manifest["files"]]
    ds = read_parquet_clean(files)
    return dataset_digest(ds) == manifest["digest"]


PAD = np.int64(0)


class _TokenizeStage:
    """doc batch -> (group, doc_id, token ids list). Token id = stable
    64-bit hash of the token (a stand-in vocabulary)."""

    def __init__(self, group_size: int):
        self.group_size = group_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        from kafka_connect_jdbc_flatten_ray.stages.dedup import _string_hashes

        ids = _string_hashes(flat).view(np.int64)
        ids = np.abs(ids) % np.int64(50_000) + 1  # 1..50000; 0 = PAD
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        tok_list = pa.ListArray.from_arrays(pa.array(offsets), pa.array(ids))
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "group": pa.array((doc_id // self.group_size).astype(np.int64)),
                "doc_id": batch.column("doc_id"),
                "tokens": tok_list,
            }
        )


def _pack_group(seq_len: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")  # deterministic within the group
        stream = np.concatenate([np.asarray(t, np.int64) for t in g["tokens"]])
        n_seqs = -(-len(stream) // seq_len)
        padded = np.full(n_seqs * seq_len, PAD, np.int64)
        padded[: len(stream)] = stream
        group = int(g["group"].iloc[0])
        return pd.DataFrame(
            {
                "group": np.full(n_seqs, group, np.int64),
                "seq_idx": np.arange(n_seqs, dtype=np.int64),
                "tokens": list(padded.reshape(n_seqs, seq_len)),
                "n_real": np.minimum(
                    np.maximum(len(stream) - np.arange(n_seqs) * seq_len, 0), seq_len
                ).astype(np.int64),
            }
        )

    fn.__name__ = "pack_group"
    return fn


def pack_sequences(
    docs: ray.data.Dataset, seq_len: int = 512, group_size: int = 1000
) -> ray.data.Dataset:
    """Pack whitespace-token id streams into fixed-length sequences,
    deterministically per doc-id-range group."""
    tok = docs.map_batches(
        _TokenizeStage(group_size), batch_format="pyarrow", zero_copy_batch=True
    )
    return tok.groupby("group").map_groups(
        arrowize(_pack_group(seq_len)), batch_format="pandas")

"""Incremental (epoch-at-a-time) exact deduplication with lake-resident
fingerprint state.

Batch ``dedup_exact`` (stages/dedup.py:158) rescans the whole corpus; a
streaming ingest should fold ONLY the new epoch's documents against the
fingerprints it has already seen. State is a lake table managed by the
same manifest machinery as the ingest lake and the incremental window
trio (epoch lineage, atomic publish, single-writer CAS):

    dedup_state/bucket=N/epoch-M.parquet   one row per distinct content
                                           fingerprint: (h1, h2, doc_id)
                                           where doc_id = the KEEPER
                                           (min doc_id seen so far)
    dedup_state/manifest.json              buckets -> current state file,
                                           epochs -> lineage

``dedup_exact_epoch`` hashes the epoch's documents with the batch
operator's dual 64-bit content fingerprints, buckets rows by h1 (the
fingerprint IS uniform, so no extra hash pass), and one fold task per
touched bucket streams that bucket's prior state: fingerprints touched
this epoch come into memory, every other row streams straight through to
the new state file (the bucket's full fingerprint population is never
materialized — at 100 TB it dwarfs any epoch). min() is commutative and
associative, so unlike the window operators there is NO watermark
assumption: epochs may arrive in any order and ``read_keepers`` equals
batch ``dedup_exact`` over the union of all folded epochs, row for row.

Reference parity: the reference engine has no dedup; this is the
builder's-brief LLM-data-pipeline surface, the streaming counterpart to
``dedup_exact`` exactly as sessionize_epoch is to sessionize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
from kafka_connect_jdbc_flatten_ray.stages.dedup import _hash_stage
from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
    _guard_fold,
    _split_prior_state,
    _stored_num_buckets,
)
from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

STATE_TABLE = "dedup_state"

_ST_SCHEMA = pa.schema(
    [("h1", pa.int64()), ("h2", pa.int64()), ("doc_id", pa.int64())]
)


def dedup_exact_epoch(
    docs: ray.data.Dataset,
    state_root: str,
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of documents into the lake-resident fingerprint set.

    Distributed: only (h1, h2, doc_id) rows shuffle (never text), one fold
    task per touched bucket, prior state streamed (touched fingerprints in
    memory, the rest pass through), commit is a manifest swap whose epoch
    number was CAS-claimed before any fold task wrote a data file.
    ``num_buckets`` applies only at state creation; afterwards the
    manifest's recorded layout wins (a different count would look up
    fingerprints in the wrong bucket file)."""
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS

    def _bucket(t: pa.Table) -> pa.Table:
        h1 = t.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__bucket", pa.array((h1 % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        _guard_fold(g.num_rows, "dedup_exact_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g.column("h1").to_numpy(zero_copy_only=False))
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "h1", touched, _ST_SCHEMA, staged
        )
        ev = pd.DataFrame(
            {
                "h1": g.column("h1").to_numpy(zero_copy_only=False),
                "h2": g.column("h2").to_numpy(zero_copy_only=False),
                "doc_id": g.column("doc_id").to_numpy(zero_copy_only=False),
                "__stored": np.zeros(g.num_rows, bool),
            }
        )
        if state is not None and len(state):
            state = state.assign(__stored=True)
            both = pd.concat([state, ev], ignore_index=True)
        else:
            both = ev
        grp = both.groupby(["h1", "h2"], sort=False)
        agg = grp.agg(
            doc_id=("doc_id", "min"), __stored=("__stored", "any")
        ).reset_index()
        new_fps = int((~agg["__stored"]).sum())
        out = pa.table(
            {
                "h1": pa.array(agg["h1"].to_numpy(), pa.int64()),
                "h2": pa.array(agg["h2"].to_numpy(), pa.int64()),
                "doc_id": pa.array(agg["doc_id"].to_numpy(), pa.int64()),
            }
        )
        writer.write_table(out.cast(_ST_SCHEMA))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table(
            {
                "bucket": [bucket],
                "state_path": [state_path],
                "fingerprints": [len(agg) + carried],
                "new_fingerprints": [new_fps],
                "epoch_docs": [g.num_rows],
                "dup_docs": [g.num_rows - new_fps],
            }
        )

    _fold.__name__ = "dedup_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            docs.map_batches(_hash_stage, batch_format="pyarrow",
                             zero_copy_batch=True)
            .map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)  # our claim (nonce held): rerunnable
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {
        k: int(sum(r[k] for r in stats))
        for k in ("fingerprints", "new_fingerprints", "epoch_docs", "dup_docs")
    }
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets,
                      "key_pk_cols": ["h1", "h2"], "hash_version": 2},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def reshard_state(state_root: str, new_num_buckets: int) -> dict:
    """Re-bucket the fingerprint state to a new bucket count — the scale
    path when the corpus outgrows the layout it was created with (the
    fold guard trips). Distinct from streaming_windows.reshard_state
    because dedup buckets by the RAW fingerprint (``h1 % N`` — the
    fingerprint is already uniform), not by stable_row_hash of a key
    column; mixing the two would probe the wrong files on the next fold.
    Publishes one state file per new bucket as a manifest epoch that
    replaces the bucket map."""
    import pyarrow.parquet as pq

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    if not m:
        raise ValueError(f"no {STATE_TABLE} manifest at {state_root}")
    epoch = int(m["epoch"]) + 1
    nonce = manifest.claim_epoch(epoch)
    fs, root = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())

    def _rebucket(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:  # hive partition col from the read
            t = t.drop_columns(["bucket"])
        h1 = t.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__bucket",
            pa.array((h1 % np.uint64(new_num_buckets)).astype(np.int32)),
        )

    def _write(t: pa.Table) -> pa.Table:
        bucket = int(t.column("__bucket")[0].as_py())
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, path)
        body = t.drop_columns(["__bucket"]).select(_ST_SCHEMA.names)
        pq.write_table(body.cast(_ST_SCHEMA), staged, filesystem=fs)
        fsx.publish_file(fs, staged, path)
        return pa.table({"bucket": pa.array([bucket], pa.int64()),
                         "path": pa.array([path]),
                         "rows": pa.array([body.num_rows], pa.int64())})

    try:
        stats = (
            read_parquet_clean(files, filesystem=fs)
            .map_batches(_rebucket, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_write, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    part = dict(m.get("partitioning") or {})
    part["num_buckets"] = new_num_buckets
    manifest.publish(
        epoch,
        {int(r["bucket"]): r["path"] for r in stats},
        {"resharded_to": new_num_buckets,
         "rows": int(sum(r["rows"] for r in stats))},
        partitioning=part,
        replace_buckets=True,
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "num_buckets": new_num_buckets,
            "buckets_written": len(stats)}


def read_keepers(state_root: str) -> ray.data.Dataset:
    """Surviving doc_ids (min per distinct content) over every epoch
    folded so far — row-for-row equal to batch ``dedup_exact`` on the
    union of the folded document sets."""
    manifest = TableManifest(state_root, STATE_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())
    ds = read_parquet_clean(sorted(files), filesystem=fs, columns=["doc_id"])
    drop = [c for c in ("bucket",) if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds

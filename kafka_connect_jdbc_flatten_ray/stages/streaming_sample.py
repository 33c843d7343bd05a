"""Incremental (epoch-at-a-time) stratified sample with lake-resident
per-group min-k state.

Batch ``stratified_sample_docs`` (pipelines/relational.py) rescans the
corpus to carve the ``k`` lowest doc_ids of each group (class-balanced
eval-set carving); the streaming counterpart folds only the new epoch:

    sample_state/bucket=N/epoch-M.parquet  (gh int64, lang string,
                                            doc_id int64) — at most k
                                            rows per group
    sample_state/manifest.json             buckets -> current state
                                           file, epochs -> lineage

min-k over a union is min-k of the per-part min-ks, so each epoch batch
pre-shrinks to its local per-group k lowest BEFORE the shuffle, rows
route by ``stable_row_hash(group) % N``, and one fold task per touched
bucket streams its prior state, merges on the REAL group column
(routing collisions never mix groups), dedupes (group, doc_id) — making
re-delivery idempotent — and keeps the k lowest. Any epoch order gives
batch ``stratified_sample_docs`` over the union of the folded epochs;
the query shares that oracle verbatim. State is at most k rows per
group — the smallest state family in the engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash
from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
    _guard_fold,
    _split_prior_state,
    _stored_num_buckets,
)
from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

STATE_TABLE = "sample_state"

_ST_SCHEMA = pa.schema([
    ("gh", pa.int64()),
    ("lang", pa.string()),
    ("doc_id", pa.int64()),
])


def _min_k(t: pa.Table, k: int) -> pa.Table:
    """Per-(gh, lang) k lowest doc_ids, vectorized: lexsort then a
    cumulative within-group rank via run-boundary arithmetic."""
    gh = t.column("gh").to_numpy(zero_copy_only=False)
    did = t.column("doc_id").to_numpy(zero_copy_only=False)
    # lang is 1:1 with gh up to hash collisions; sort on (gh, lang, doc_id)
    # via a stable double sort so colliding groups stay separate
    lang_codes = pc.dictionary_encode(t.column("lang"))
    if isinstance(lang_codes, pa.ChunkedArray):
        lang_codes = lang_codes.combine_chunks()
    lc = lang_codes.indices.to_numpy(zero_copy_only=False)
    order = np.lexsort((did, lc, gh))
    gh_s, lc_s, did_s = gh[order], lc[order], did[order]
    new_grp = np.concatenate(
        ([True], (gh_s[1:] != gh_s[:-1]) | (lc_s[1:] != lc_s[:-1]))
    )
    # drop duplicate (group, doc_id) rows, then rank within group
    dup = np.concatenate(([False], (~new_grp[1:]) & (did_s[1:] == did_s[:-1])))
    keep_rows = ~dup
    gh_s, lc_s, did_s = gh_s[keep_rows], lc_s[keep_rows], did_s[keep_rows]
    new_grp = np.concatenate(
        ([True], (gh_s[1:] != gh_s[:-1]) | (lc_s[1:] != lc_s[:-1]))
    )
    grp_id = np.cumsum(new_grp) - 1
    starts = np.flatnonzero(new_grp)
    rank = np.arange(len(gh_s)) - starts[grp_id]
    sel = rank < k
    return t.take(pa.array(order[keep_rows][sel]))


def sample_epoch(
    docs: ray.data.Dataset,
    state_root: str,
    per_group: int = 3,
    group: str = "lang",
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of documents into the per-group min-k state."""
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    part = (m or {}).get("partitioning") or {}
    stored_k = part.get("per_group")
    if stored_k is not None and int(stored_k) != int(per_group):
        raise ValueError(
            f"state at {state_root} keeps per_group={stored_k}; rows beyond "
            f"it were discarded, so folding at per_group={per_group} would "
            "be wrong — use a fresh state root"
        )
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS

    def _partial(t: pa.Table) -> pa.Table:
        body = pa.table({"lang": t.column(group), "doc_id": t.column("doc_id")})
        gh = stable_row_hash(body, ("lang",)).view(np.int64)
        body = pa.table({
            "gh": pa.array(gh),
            "lang": body.column("lang"),
            "doc_id": body.column("doc_id"),
        })
        shrunk = _min_k(body, per_group)
        vb = shrunk.column("gh").to_numpy(zero_copy_only=False).view(np.uint64)
        return shrunk.append_column(
            "__bucket", pa.array((vb % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        g = g.drop_columns(["__bucket"])
        _guard_fold(g.num_rows, "sample_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g.column("gh").to_numpy(zero_copy_only=False))
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "gh", touched, _ST_SCHEMA, staged
        )
        both = g.select(_ST_SCHEMA.names)
        if state is not None and state.num_rows:
            both = pa.concat_tables([state.select(_ST_SCHEMA.names), both])
        out = _min_k(both.combine_chunks(), per_group)
        writer.write_table(out.select(_ST_SCHEMA.names).cast(_ST_SCHEMA))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "sample_rows": [out.num_rows + carried],
        })

    _fold.__name__ = "sample_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            docs.map_batches(_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {"sample_rows": int(sum(r["sample_rows"] for r in stats))}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets, "key_pk_cols": ["gh"],
                      "hash_version": 2, "per_group": int(per_group),
                      "group": group},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def read_sample(state_root: str) -> ray.data.Dataset:
    """The stratified sample over every epoch folded so far — row-for-row
    equal to batch ``stratified_sample_docs`` on the union of the folded
    document sets."""
    manifest = TableManifest(state_root, STATE_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())
    return read_parquet_clean(files, filesystem=fs,
                              columns=["doc_id", "lang"])

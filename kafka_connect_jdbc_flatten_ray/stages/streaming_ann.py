"""Incremental (epoch-at-a-time) IVF index with lake-resident postings.

Batch ``ann_topk_ivf`` (stages/ann.py) re-assigns the whole corpus to
coarse centroids on every search; a streaming ingest should assign ONLY
the new epoch's vectors and append them to an index it already holds —
the FAISS contract: train the coarse quantizer once, add vectors
forever.

    ivf_index/bucket=C/epoch-M.parquet  the postings of centroid C:
                                        (vec_id int64, vec binary —
                                        the f64 unit vector, same
                                        float path as the batch probe)
    ivf_index/manifest.json             centroids (inline — a few KiB),
                                        buckets -> current posting file,
                                        epochs -> lineage

One lake bucket per centroid. Folds dedupe postings on vec_id, so
re-delivery is idempotent and epochs fold in any order; given the same
pinned centroids, ``probe_topk`` equals batch ``ann_topk_ivf`` on the
union of all folded epochs, row for row — it shares that query's SQL
oracle (pipelines/dedup_oracles.ivf_topk_sql) verbatim.

The probe is where the index pays off at scale: queries read ONLY their
``nprobe`` nearest centroids' posting files (manifest bucket pruning —
nprobe/num_centroids of the index), not the corpus; the scoring itself
is the batch operator's argpartition block kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
from kafka_connect_jdbc_flatten_ray.stages.ann import (
    _global_topk,
    _mat,
    _unit,
)
from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
    _guard_fold,
    _split_prior_state,
)
from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

STATE_TABLE = "ivf_index"


def _post_schema(dim: int) -> pa.Schema:
    return pa.schema([("vec_id", pa.int64()), ("vec", pa.binary(dim * 8))])


def ivf_index_epoch(
    embeddings: ray.data.Dataset,
    state_root: str,
    centroids: np.ndarray | None = None,
) -> dict:
    """Fold one epoch of vectors into the lake-resident IVF postings.

    ``centroids`` (a [C, dim] unit matrix) is required at index creation
    and PINNED there — later epochs load it from the manifest and refuse
    a mismatching argument (re-training the quantizer invalidates every
    posting; that is a new index, not an epoch). Distributed: assignment
    is a broadcast-centroid map_batches, one fold task per touched
    centroid, prior postings streamed (vec_ids seen again dedupe, the
    rest pass through), commit is a CAS-claimed manifest swap."""
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    part = (m or {}).get("partitioning") or {}
    if part.get("centroids") is not None:
        stored = np.asarray(part["centroids"], np.float64)
        if centroids is not None and not np.array_equal(
            np.asarray(centroids, np.float64), stored
        ):
            raise ValueError(
                f"index at {state_root} was built with different centroids; "
                "re-training the quantizer is a new index, not an epoch"
            )
        centroids = stored
    elif centroids is None:
        raise ValueError("centroids are required at index creation")
    cents = np.asarray(centroids, np.float64)
    num_c, dim = cents.shape
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS
    schema = _post_schema(dim)
    cref = ray.put(cents)

    def _assign(t: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(cref)
        unit = _unit(_mat(t.column("embedding")))
        cid = (unit @ c.T).argmax(axis=1).astype(np.int32)
        blob = unit.astype("<f8").tobytes()
        vec = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(dim * 8), len(unit), [None, pa.py_buffer(blob)]
        )
        return pa.table({
            "__bucket": pa.array(cid),
            "vec_id": t.column("vec_id"),
            "vec": vec,
        })

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        _guard_fold(g.num_rows, "ivf_index_epoch", num_c, fold_limit)
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        vid = g.column("vec_id").to_numpy(zero_copy_only=False)
        touched = np.unique(vid)
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "vec_id", touched, schema, staged
        )
        members = pa.table({"vec_id": g.column("vec_id"),
                            "vec": g.column("vec")})
        if state is not None and state.num_rows:
            members = pa.concat_tables(
                [state.select(schema.names), members]).combine_chunks()
        mid = members.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(mid, kind="stable")
        keep = np.ones(len(order), bool)
        keep[1:] = mid[order][1:] != mid[order][:-1]
        members = members.take(pa.array(order[keep]))
        writer.write_table(members.select(schema.names).cast(schema))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "postings": [members.num_rows + carried],
            "epoch_rows": [g.num_rows],
        })

    _fold.__name__ = "ivf_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            embeddings.map_batches(_assign, batch_format="pyarrow",
                                   zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {k: int(sum(r[k] for r in stats))
              for k in ("postings", "epoch_rows")}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_c, "key_pk_cols": ["vec_id"],
                      "hash_version": 2, "dim": int(dim),
                      "centroids": cents.tolist()},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def probe_topk(
    state_root: str,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """Top-k over the folded index: each query reads ONLY its ``nprobe``
    nearest centroids' posting files — row-for-row equal to batch
    ``ann_topk_ivf`` with the index's pinned centroids on the union of
    the folded epochs (same probe rule, same argpartition kernel, same
    cos rounding and tie-break)."""
    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    if not m:
        raise ValueError(f"no {STATE_TABLE} manifest at {state_root}")
    part = m["partitioning"]
    cents = np.asarray(part["centroids"], np.float64)
    dim = int(part["dim"])
    fs, _ = fsx.resolve(state_root)
    # stable sort: centroid-id ascending on ties, matching the SQL oracle
    probe = np.argsort(-(q_mat @ cents.T), axis=1, kind="stable")[:, :nprobe]
    bucket_to_q: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        for b in probe[qi]:
            bucket_to_q.setdefault(int(b), []).append(qi)
    files = manifest.current_files()
    probed = sorted(b for b in bucket_to_q if b in files)
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64())})
    if not probed:
        return ray.data.from_arrow(empty).groupby("query_id").map_groups(
            _global_topk(k), batch_format="pyarrow")
    qref = ray.put((np.asarray(q_ids, np.int64), q_mat, bucket_to_q))

    def _score(paths: list[str]) -> pa.Table:
        import ray as _ray

        ids_all, mat_all, b2q = _ray.get(qref)
        parts = [empty]
        for path in paths:
            # bucket id from the hive dir name (bucket=NNNNN)
            b = int(path.rsplit("bucket=", 1)[1].split("/", 1)[0])
            qis = b2q.get(b)
            if not qis:
                continue
            with fs.open_input_file(path) as f:
                t = pq.read_table(f)
            sub_ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            col = t.column("vec")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            sub = np.frombuffer(
                col.buffers()[1], "<f8", count=len(col) * dim,
                offset=col.offset * dim * 8,
            ).reshape(len(col), dim)
            sims = mat_all[qis] @ sub.T
            nq, nb = sims.shape
            if not nb:
                continue
            kk = min(k + 1, nb)
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(nq), kk)
            cols = top.reshape(-1)
            qarr = ids_all[np.asarray(qis)]
            keep = sub_ids[cols] != qarr[rows]
            parts.append(pa.table({
                "query_id": pa.array(qarr[rows][keep]),
                "vec_id": pa.array(sub_ids[cols][keep].astype(np.int64)),
                "cos": pa.array(sims[rows, cols][keep].astype(np.float64)),
            }))
        return pa.concat_tables(parts)

    # one task per probed posting file (item = its path), local top-k
    # combiner inside, global reduce on query_id
    partial = ray.data.from_items(
        [files[b] for b in probed]
    ).map_batches(
        lambda t: _score(t.column("item").to_pylist()),
        batch_format="pyarrow",
    )
    return partial.groupby("query_id").map_groups(
        _global_topk(k), batch_format="pyarrow")

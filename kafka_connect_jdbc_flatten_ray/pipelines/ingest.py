"""End-to-end CDC ingest pipelines (Ray Data).

Lifecycle (SURVEY.md §3.4):

    tail:    read documents -> EventGen (synthetic CDC log) -> filter by
             checkpoint offsets (the incremental-tail criterion, S2)
    flatten: map_batches(FlattenStage actor pool, batch_format="pyarrow")
             -> (table, bucket, payload) envelopes
    merge:   groupby(table, bucket) hash shuffle -> last-wins replay ->
             atomic bucket-file rewrite in the Parquet lake
    commit:  checkpoint save + per-table manifest swap (epoch = transaction)

All stages stream; nothing materializes the event log. The only wide op is
the single groupby on (table, bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean
from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.sources.cdc_gen import (
    EventGen,
    KEY_SCHEMA_NAME,
    KEY_TYPE,
    TOPIC,
    VALUE_SCHEMA_NAME,
    VALUE_TYPE,
)
from kafka_connect_jdbc_flatten_ray.stages.flatten_stage import FlattenStage
from kafka_connect_jdbc_flatten_ray.stages.merge import (
    MergeRows,
    MergeToLake,
    OFF_COL,
    PART_COL,
)
from kafka_connect_jdbc_flatten_ray.stages.plan import FlattenPlan, build_plan
from kafka_connect_jdbc_flatten_ray.state.checkpoints import CheckpointStore
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

DOC_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


def default_config(**overrides) -> SinkConfig:
    base = dict(
        pk_mode="flatten",
        pk_fields=("filechangekey.repo", "filechangekey.path"),
        insert_mode="upsert",
        delete_enabled=True,
    )
    base.update(overrides)
    return SinkConfig(**base)


def default_plan(cfg: SinkConfig, topic: str = TOPIC) -> FlattenPlan:
    return build_plan(cfg, topic, VALUE_TYPE, VALUE_SCHEMA_NAME, KEY_TYPE, KEY_SCHEMA_NAME)


def event_stream(
    sf_dir: str,
    num_partitions: int = 8,
    include_tombstones: bool = True,
    replicate: int = 1,
    num_blocks: int | None = None,
    evolve_from: int | None = None,
    max_retries: int = SinkConfig.max_retries,
) -> ray.data.Dataset:
    """The change-event tail: documents -> deterministic CDC log.

    The documents read is split into blocks sized so that generation and the
    downstream flatten parallelize across the pool even when the source is a
    single small Parquet file; EventGen additionally yields bounded-size
    event batches regardless of the replication factor.

    ``max_retries`` must match the flatten stage's (cfg.max_retries) for
    Ray to FUSE generator and flatten into one task chain — unfused, the
    full uncompressed event stream round-trips through the object store
    between the two stages (measured ~25% slower at bench scale).
    """
    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    meta = pq.ParquetFile(path).metadata
    n_docs = meta.num_rows
    if num_blocks is None:
        # ~2.2 events/doc; target ~50k events per task — coarse enough to
        # amortize per-task overhead (measured 1.7x faster than 20k/task),
        # fine enough to keep every core busy at bench scales
        est_events = int(n_docs * replicate * 2.2)
        num_blocks = max(1, min(256, est_events // 50_000))
    if meta.num_row_groups <= 1 and n_docs <= 1_000_000:
        # single small file: a read task + SplitBlocks would serialize the
        # pipeline head; read driver-side once and pre-split into blocks
        tbl = pq.read_table(path, columns=DOC_COLUMNS)
        step = -(-n_docs // num_blocks)
        slices = [tbl.slice(i, step) for i in range(0, n_docs, step)]
        docs = ray.data.from_arrow(slices)
    else:
        docs = read_parquet_clean(
            path, columns=DOC_COLUMNS, override_num_blocks=num_blocks,
            strip_max_retries=max_retries,
        )
    gen = EventGen(
        num_partitions=num_partitions,
        include_tombstones=include_tombstones,
        replicate=replicate,
        evolve_from=evolve_from,
    )
    return docs.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True,
                            max_retries=max_retries)


def filter_after_checkpoint(
    events: ray.data.Dataset, offsets: dict[int, int],
    max_retries: int = SinkConfig.max_retries,
) -> ray.data.Dataset:
    """Incremental-tail criterion: keep events with offset > checkpoint for
    their partition (TimestampIncrementingCriteria.java:104-160 analogue)."""
    if not offsets:
        return events
    maxp = max(offsets) + 1
    lut = np.full(maxp + 1, np.int64(-1))
    for p, o in offsets.items():
        lut[p] = o

    def _filter(t: pa.Table) -> pa.Table:
        part = t.column("partition").to_numpy(zero_copy_only=False)
        off = t.column("offset").to_numpy(zero_copy_only=False)
        ck = lut[np.clip(part, 0, maxp)]
        return t.filter(pa.array(off > ck))

    return events.map_batches(_filter, batch_format="pyarrow",
                              zero_copy_batch=True, max_retries=max_retries)


def flatten_envelopes(
    events: ray.data.Dataset,
    cfg: SinkConfig,
    topic: str = TOPIC,
    value_schema_name: str | None = VALUE_SCHEMA_NAME,
    key_schema_name: str | None = KEY_SCHEMA_NAME,
    concurrency=(2, 8),
    batch_size: int | None = None,
    compute: str = "tasks",
    hash_versions: dict[str, int] | None = None,
) -> ray.data.Dataset:
    """The flatten stage (ST1 plan cache amortized per worker).

    ``compute="tasks"`` (default) runs the stage as stateless tasks with a
    per-worker-process plan cache — no actor-pool spin-up, elastic scaling.
    ``compute="actors"`` uses the FlattenStage actor pool (``concurrency``
    sizing) — the right mode when stage state is heavy (models, indexes).

    ``batch_size=None`` processes block-sized batches: when fused with the
    event generator the flatten runs directly on each generated event batch
    (EventGen already targets a bounded events-per-batch) instead of
    re-bundling upstream blocks — re-bundling would serialize the pipeline
    into very few giant tasks.
    """
    if compute == "tasks":
        from kafka_connect_jdbc_flatten_ray.stages.flatten_stage import make_flatten_fn

        return events.map_batches(
            make_flatten_fn(cfg, topic, value_schema_name, key_schema_name,
                            hash_versions),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            max_retries=cfg.max_retries,
        )
    return events.map_batches(
        FlattenStage,
        fn_constructor_args=(cfg, topic, value_schema_name, key_schema_name,
                             hash_versions),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        max_task_retries=cfg.max_retries,
    )


def table_state(
    envelopes: ray.data.Dataset, plan: FlattenPlan, table: str
) -> ray.data.Dataset:
    """Final merged state of ONE table as a streaming Dataset (query path)."""
    tp = next(t for t in plan.tables if t.table == table)

    def _only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("table"), table))

    sub = envelopes.map_batches(_only, batch_format="pyarrow", zero_copy_batch=True)
    merged = sub.groupby("bucket").map_groups(
        MergeRows(tp.key_pk_cols), batch_format="pyarrow"
    )
    # conform every group's output to the PLAN's table schema: a bucket
    # whose keys all predate a schema evolution would otherwise emit rows
    # without the new columns (schema unification must not depend on which
    # generations happen to share a bucket)
    want = tp.data_schema()

    def _conform(t: pa.Table) -> pa.Table:
        for f in want:
            if f.name not in t.column_names:
                t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
        return t.select([f.name for f in want if f.name in t.column_names]
                        + [c for c in t.column_names
                           if c not in {f.name for f in want}])

    return merged.map_batches(_conform, batch_format="pyarrow")


def run_epoch(
    sf_dir: str,
    lake_root: str,
    cfg: SinkConfig | None = None,
    num_partitions: int = 8,
    replicate: int = 1,
    concurrency=(2, 8),
    evolve_from: int | None = None,
    mode: str = "cow",
    compact_after_deltas: int | None = None,
) -> dict:
    """One ingest epoch: tail -> flatten -> merge -> commit. Resumable: a
    rerun skips events at/below the checkpoint and rewrites this epoch's
    bucket files idempotently.

    ``mode="cow"`` (default) rewrites each touched bucket's full state;
    ``mode="mor"`` writes only this epoch's ops as per-bucket DELTA files
    (no prior-state read/rewrite — minimal write amplification) which the
    read path replays through the same last-wins rule; fold deltas back
    into bases with :func:`compact`."""
    cfg = cfg or default_config()
    plan = default_plan(cfg)
    key_cols = {tp.table: tp.key_pk_cols for tp in plan.tables}

    # W4/W5 config gates (DbStructure.java:113-117 + amendIfNecessary):
    # refuse missing tables when auto.create is off, and schema WIDENING
    # when auto.evolve is off — checked against the manifest's recorded
    # schema before any merge work starts (fail fast, nothing written)
    if not (cfg.auto_create and cfg.auto_evolve):
        for tp in plan.tables:
            m = TableManifest(lake_root, tp.table).load()
            if m is None:
                if not cfg.auto_create:
                    raise ValueError(
                        f"Table {tp.table} is missing and auto-creation is "
                        "disabled (auto.create=false)"
                    )
                continue
            if not cfg.auto_evolve and m.get("schema"):
                want = str(tp.data_schema())
                if m["schema"] != want:
                    raise ValueError(
                        f"Table {tp.table} requires schema changes but "
                        "auto-evolution is disabled (auto.evolve=false): "
                        f"stored schema differs from incoming"
                    )

    ck = CheckpointStore(f"{lake_root}/_checkpoints")
    prev = ck.latest_epoch()
    # Epoch numbers are allocated from BOTH the checkpoint store and the
    # table manifests: compact() advances a table's manifest epoch without
    # writing a checkpoint, so numbering from the checkpoint alone would
    # reuse the compaction's epoch for the next ingest delta (and
    # read_lake_table_at's `e > base_epoch` filter would then drop it).
    epoch = -1 if prev is None else prev

    prior_files: dict[tuple[str, int], str] = {}
    # bucket layout is persistent PER TABLE: each existing table's recorded
    # hash version wins over the config default so new epochs keep
    # co-locating each key with its prior bucket (manifests without the
    # field are legacy v1). Resolved per table — a partially migrated lake
    # may legitimately mix versions, and forcing a global minimum would
    # bucket v2 tables with the v1 hash (splitting keys from their state).
    hash_versions: dict[str, int] = {}
    for tp in plan.tables:
        man = TableManifest(lake_root, tp.table)
        m = man.load()
        if m:
            epoch = max(epoch, int(m["epoch"]))
            part = m.get("partitioning") or {}
            if part:
                hash_versions[tp.table] = int(part.get("hash_version", 1))
        for b, path in man.current_files().items():
            prior_files[(tp.table, b)] = path
    epoch += 1
    offsets = ck.load()

    events = event_stream(sf_dir, num_partitions, True, replicate,
                          evolve_from=evolve_from,
                          max_retries=cfg.max_retries)
    events = filter_after_checkpoint(events, offsets,
                                     max_retries=cfg.max_retries)
    env = flatten_envelopes(events, cfg, concurrency=concurrency,
                            hash_versions=hash_versions)
    stats_ds = env.groupby(["table", "bucket"]).map_groups(
        MergeToLake(lake_root, epoch, key_cols, prior_files, mode=mode),
        batch_format="pyarrow",
    )
    # claim this epoch on EVERY plan table before any merge task
    # rename-publishes a bucket file (deterministic paths: a rival writer
    # that computed the same epoch must lose before it can overwrite).
    # On a mid-acquisition loss (the normal contention path) the claims
    # already staked are released so the rival isn't blocked by our corpse.
    claims: dict[str, str] = {}
    try:
        for tp in plan.tables:
            claims[tp.table] = TableManifest(lake_root, tp.table).claim_epoch(epoch)
    except Exception:
        for t in claims:
            TableManifest(lake_root, t).abandon_epoch(epoch)
        raise
    try:
        stats = stats_ds.take_all()  # one small row per (table, bucket)
    except Exception:
        for t in claims:
            TableManifest(lake_root, t).abandon_epoch(epoch)
        raise

    # commit: per-table manifest swap, then checkpoint
    new_offsets = dict(offsets)
    per_table: dict[str, dict] = {}
    bucket_files: dict[str, dict[int, str]] = {}
    for row in stats:
        t = row["table"]
        agg = per_table.setdefault(
            t, {"rows_in": 0, "clears_in": 0, "rows_out": 0, "buckets": 0}
        )
        agg["rows_in"] += row["rows_in"]
        agg["clears_in"] += row["clears_in"]
        agg["rows_out"] += row["rows_out"]
        agg["buckets"] += 1
        bucket_files.setdefault(t, {})[row["bucket"]] = row["path"]
        import json

        for p, o in json.loads(row["offsets_json"] or "{}").items():
            p = int(p)
            if o > new_offsets.get(p, -1):
                new_offsets[p] = int(o)
    for t, files in bucket_files.items():
        part_info = {
            "num_buckets": cfg.num_buckets,
            "key_pk_cols": list(key_cols.get(t, ())),
            "hash_version": hash_versions.get(t, cfg.hash_version),
        }
        tp = next((x for x in plan.tables if x.table == t), None)
        schema_str = str(tp.data_schema()) if tp is not None else None
        if mode == "mor":
            TableManifest(lake_root, t).publish(
                epoch, {}, per_table[t], partitioning=part_info,
                delta_files=files, schema_str=schema_str,
                claim_nonce=claims.get(t),
            )
        else:
            TableManifest(lake_root, t).publish(
                epoch, files, per_table[t], partitioning=part_info,
                schema_str=schema_str, claim_nonce=claims.get(t),
            )
    # tables that saw no rows this epoch never publish: release their
    # claims so the markers don't read as crashed writers
    for t in claims:
        if t not in bucket_files:
            TableManifest(lake_root, t).abandon_epoch(epoch)
    ck.save(epoch, new_offsets, {"tables": per_table})
    # MoR auto-compaction policy: fold deltas once any bucket accumulates
    # more than the threshold (keeps read-time replay bounded)
    if mode == "mor" and compact_after_deltas:
        for t in bucket_files:
            deltas = TableManifest(lake_root, t).current_deltas()
            if deltas and max(len(v) for v in deltas.values()) >= compact_after_deltas:
                compact(lake_root, t)
    return {"epoch": epoch, "tables": per_table, "offsets": new_offsets}


def read_lake_table(lake_root: str, table: str) -> ray.data.Dataset:
    """Current state of a lake table, resolved through its manifest.
    ``lake_root`` may be a POSIX path or a pyarrow.fs URI. Merge-on-read
    deltas (if any) are replayed per bucket through the last-wins rule —
    one distributed task per bucket, no driver materialization."""
    from kafka_connect_jdbc_flatten_ray.state import fs as fsx

    fs, _ = fsx.resolve(lake_root)
    manifest = TableManifest(lake_root, table)
    files = manifest.current_files()
    deltas = manifest.current_deltas()
    if not deltas:
        ds = read_parquet_clean(sorted(files.values()), filesystem=fs)
        drop = [c for c in (PART_COL, OFF_COL, "bucket") if c in ds.schema().names]
        return ds.drop_columns(drop)
    m = manifest.load() or {}
    key_pk_cols = tuple((m.get("partitioning") or {}).get("key_pk_cols", ()))
    work = [
        {"bucket": b, "base": files.get(b, ""),
         "deltas": ";".join(deltas.get(b, []))}
        for b in sorted(set(files) | set(deltas))
    ]

    def _replay(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from kafka_connect_jdbc_flatten_ray.stages.merge import (
            final_columns,
            last_wins,
        )
        from kafka_connect_jdbc_flatten_ray.stages.plan import OP_COL, OP_INSERT

        out = []
        for row in batch.to_pylist():
            parts = []
            n_new = 0
            for dpath in [p for p in row["deltas"].split(";") if p]:
                d = pq.read_table(dpath, filesystem=fs)
                parts.append(d)
                n_new += d.num_rows
            if row["base"]:
                base = pq.read_table(row["base"], filesystem=fs)
                parts.append(base.append_column(
                    OP_COL, pa.array([OP_INSERT] * base.num_rows, pa.string())
                ))
            if not parts:
                continue
            full = (pa.concat_tables(parts, promote_options="permissive")
                    if len(parts) > 1 else parts[0])
            out.append(final_columns(last_wins(full, key_pk_cols, n_new=n_new)))
        if not out:
            return pa.table({})
        return pa.concat_tables(out, promote_options="permissive")

    src = ray.data.from_items(work)
    return src.map_batches(_replay, batch_format="pyarrow", batch_size=1)


def compact(lake_root: str, table: str) -> dict:
    """Fold a merge-on-read table's deltas into fresh base files (one
    distributed task per bucket), then publish a manifest with the deltas
    cleared. Uses the same last-wins replay as the read path; vacuum()
    afterwards reclaims the folded delta files."""
    from kafka_connect_jdbc_flatten_ray.state import fs as fsx

    fs, root = fsx.resolve(lake_root)
    manifest = TableManifest(lake_root, table)
    m = manifest.load()
    if not m:
        return {"buckets": 0}
    deltas = manifest.current_deltas()
    if not deltas:
        return {"buckets": 0}
    files = manifest.current_files()
    key_pk_cols = tuple((m.get("partitioning") or {}).get("key_pk_cols", ()))
    epoch = int(m["epoch"]) + 1
    # claim before the fold tasks rename-publish epoch data files: a rival
    # compactor/ingester that computed the same epoch must lose BEFORE it
    # can overwrite this writer's files (data paths are deterministic)
    nonce = manifest.claim_epoch(epoch)
    work = [
        {"bucket": b, "base": files.get(b, ""),
         "deltas": ";".join(deltas.get(b, []))}
        for b in sorted(set(files) | set(deltas))
    ]

    def _fold(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from kafka_connect_jdbc_flatten_ray.stages.merge import last_wins
        from kafka_connect_jdbc_flatten_ray.stages.plan import OP_COL, OP_INSERT

        rows = []
        for row in batch.to_pylist():
            parts, n_new = [], 0
            for dpath in [p for p in row["deltas"].split(";") if p]:
                d = pq.read_table(dpath, filesystem=fs)
                parts.append(d)
                n_new += d.num_rows
            if row["base"]:
                base = pq.read_table(row["base"], filesystem=fs)
                parts.append(base.append_column(
                    OP_COL, pa.array([OP_INSERT] * base.num_rows, pa.string())
                ))
            if not parts:
                continue
            full = (pa.concat_tables(parts, promote_options="permissive")
                    if len(parts) > 1 else parts[0])
            merged = last_wins(full, key_pk_cols, n_new=n_new)
            b = int(row["bucket"])
            out_dir = fsx.join(root, table, f"bucket={b:05d}")
            fsx.makedirs(fs, out_dir)
            path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
            staged = fsx.staging_path(fs, path)
            pq.write_table(merged, staged, filesystem=fs)
            fsx.publish_file(fs, staged, path)
            rows.append({"bucket": b, "path": path, "rows": merged.num_rows})
        import pyarrow as _pa

        if not rows:
            return _pa.table({"bucket": _pa.array([], _pa.int64()),
                              "path": _pa.array([], _pa.string()),
                              "rows": _pa.array([], _pa.int64())})
        return _pa.Table.from_pylist(rows)

    try:
        res = ray.data.from_items(work).map_batches(
            _fold, batch_format="pyarrow", batch_size=1
        ).take_all()
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["path"] for r in res}
    manifest.publish(
        epoch, bucket_files, {"compacted": True,
                              "rows_out": int(sum(r["rows"] for r in res))},
        clear_deltas=True,
        claim_nonce=nonce,
    )
    return {"buckets": len(res), "epoch": epoch}


def read_lake_table_at(lake_root: str, table: str, epoch: int) -> ray.data.Dataset:
    """TIME-TRAVEL read: the table's state as of ``epoch``, reconstructed
    from the bucket directories' epoch-stamped files (each CoW epoch writes
    a full bucket state, so the as-of state of a bucket is its newest base
    file with epoch <= N, plus any MoR delta files up to N replayed on
    top). Requires the history to still exist — ``vacuum(keep_epochs=k)``
    bounds how far back this can reach."""
    import re

    from kafka_connect_jdbc_flatten_ray.state import fs as fsx

    fs, root = fsx.resolve(lake_root)
    m = TableManifest(lake_root, table).load() or {}
    key_pk_cols = tuple((m.get("partitioning") or {}).get("key_pk_cols", ()))
    pat = re.compile(r"epoch-(\d+)(\.delta)?\.parquet$")
    tdir = fsx.join(root, table)
    work = []
    for binfo in fsx.listdir(fs, tdir):
        if binfo.is_file:
            continue
        base_path, base_epoch = "", -1
        deltas: list[tuple[int, str]] = []
        for finfo in fsx.listdir(fs, binfo.path):
            mt = pat.search(finfo.base_name)
            if not mt or int(mt.group(1)) > epoch:
                continue
            e = int(mt.group(1))
            if mt.group(2):  # delta file
                deltas.append((e, finfo.path))
            elif e > base_epoch:
                base_epoch, base_path = e, finfo.path
        live = sorted(p for e, p in deltas if e > base_epoch)
        if base_path or live:
            work.append({"bucket": binfo.base_name, "base": base_path,
                         "deltas": ";".join(live)})
    if not work:
        return ray.data.from_items([])

    def _replay(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from kafka_connect_jdbc_flatten_ray.stages.merge import (
            final_columns,
            last_wins,
        )
        from kafka_connect_jdbc_flatten_ray.stages.plan import OP_COL, OP_INSERT

        out = []
        for row in batch.to_pylist():
            parts, n_new = [], 0
            for dpath in [p for p in row["deltas"].split(";") if p]:
                d = pq.read_table(dpath, filesystem=fs)
                parts.append(d)
                n_new += d.num_rows
            if row["base"]:
                base = pq.read_table(row["base"], filesystem=fs)
                parts.append(base.append_column(
                    OP_COL, pa.array([OP_INSERT] * base.num_rows, pa.string())
                ))
            if not parts:
                continue
            full = (pa.concat_tables(parts, promote_options="permissive")
                    if len(parts) > 1 else parts[0])
            out.append(final_columns(last_wins(full, key_pk_cols, n_new=n_new)))
        if not out:
            return pa.table({})
        return pa.concat_tables(out, promote_options="permissive")

    return ray.data.from_items(work).map_batches(
        _replay, batch_format="pyarrow", batch_size=1
    )


def lake_lookup(lake_root: str, table: str, key_values: dict) -> list[dict]:
    """Point lookup by key-PK: bucket pruning reads ONE bucket file.

    ``key_values`` maps key-pk column names to values; the bucket is
    recomputed with the same hash the writer used, with num_buckets and the
    key-pk column order read from the table MANIFEST (persisted at publish
    time) — never assumed from defaults, so lakes written with custom
    bucket counts or key layouts prune correctly.
    """
    import pandas as pd
    import pyarrow.parquet as pq
    import numpy as np

    manifest = TableManifest(lake_root, table)
    m = manifest.load() or {}
    part = m.get("partitioning") or {}
    if part:
        num_buckets = int(part["num_buckets"])
        key_pk_cols = tuple(part["key_pk_cols"])
        hash_version = int(part.get("hash_version", 1))
    else:  # pre-partitioning manifests: fall back to the default plan
        cfg = default_config()
        plan = default_plan(cfg)
        tp = next(t for t in plan.tables if t.table == table)
        num_buckets = cfg.num_buckets
        key_pk_cols = tp.key_pk_cols
        hash_version = 1
    if hash_version >= 2:
        from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash

        t1 = pa.table({c: [key_values[c]] for c in key_pk_cols})
        h = stable_row_hash(t1, key_pk_cols)
    else:  # legacy lakes bucketed with the pandas hash
        df = pd.DataFrame({c: [key_values[c]] for c in key_pk_cols})
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    bucket = int(h[0] % np.uint64(num_buckets))
    path = manifest.current_files().get(bucket)
    deltas = manifest.current_deltas().get(bucket, [])
    if path is None and not deltas:
        return []
    if deltas:  # merge-on-read bucket: replay base + deltas for the lookup
        from kafka_connect_jdbc_flatten_ray.stages.merge import last_wins
        from kafka_connect_jdbc_flatten_ray.stages.plan import OP_COL, OP_INSERT

        parts, n_new = [], 0
        for dp in deltas:
            d = pq.read_table(dp, filesystem=manifest.fs)
            parts.append(d)
            n_new += d.num_rows
        if path:
            base = pq.read_table(path, filesystem=manifest.fs)
            parts.append(base.append_column(
                OP_COL, pa.array([OP_INSERT] * base.num_rows, pa.string())
            ))
        full = (pa.concat_tables(parts, promote_options="permissive")
                if len(parts) > 1 else parts[0])
        t = last_wins(full, key_pk_cols, n_new=n_new)
    else:
        t = pq.read_table(path, filesystem=manifest.fs)
    mask = None
    for c, v in key_values.items():
        m = pc.equal(t.column(c), v)
        mask = m if mask is None else pc.and_(mask, m)
    out = t.filter(mask)
    return final_columns_table(out)


def final_columns_table(t: pa.Table) -> list[dict]:
    from kafka_connect_jdbc_flatten_ray.stages.merge import final_columns

    return final_columns(t).to_pylist()


def lake_status(lake_root: str) -> dict:
    """Manifest/lineage summary per table (epochs, rows, bucket counts)."""
    from kafka_connect_jdbc_flatten_ray.state import fs as fsx

    out = {}
    fs, root = fsx.resolve(lake_root)
    if not fsx.exists(fs, root):
        return out
    for table in sorted(i.base_name for i in fsx.listdir(fs, root) if i.is_file is False):
        m = TableManifest(lake_root, table).load()
        if m:
            out[table] = {
                "epoch": m["epoch"],
                "buckets": len(m["buckets"]),
                "epochs": m["epochs"],
            }
    return out


def vacuum(lake_root: str, keep_epochs: int = 2) -> dict[str, int]:
    """Delete bucket files no longer referenced by a manifest and older than
    the last ``keep_epochs`` epochs. Each epoch's merge writes a full new
    bucket state, so old epoch files are pure history; the manifest swap
    keeps in-flight readers consistent."""
    import re

    from kafka_connect_jdbc_flatten_ray.state import fs as fsx

    removed: dict[str, int] = {}
    fs, root = fsx.resolve(lake_root)
    if not fsx.exists(fs, root):
        return removed
    # .parquet covers lake/state buckets; .bin covers the contamination
    # registry's bloom sidecar (contam_state/bloom/epoch-N.bin) — the
    # incremental state tables share the lake's layout, so one vacuum
    # serves both
    pat = re.compile(r"epoch-(\d+)(\.delta)?\.(parquet|bin)$")
    for tinfo in fsx.listdir(fs, root):
        table = tinfo.base_name
        manifest = TableManifest(lake_root, table)
        m = manifest.load()
        if not m:
            continue
        referenced = set(m["buckets"].values())
        for ps in (m.get("deltas") or {}).values():
            referenced.update(ps)
        part = m.get("partitioning") or {}
        if part.get("bloom_path"):
            referenced.add(part["bloom_path"])
        cutoff = m["epoch"] - keep_epochs + 1
        n = 0
        tdir = fsx.join(root, table)
        for binfo in fsx.listdir(fs, tdir):
            if binfo.is_file:
                continue
            for finfo in fsx.listdir(fs, binfo.path):
                match = pat.search(finfo.base_name)
                if match and finfo.path not in referenced and int(match.group(1)) < cutoff:
                    fsx.delete_file(fs, finfo.path)
                    n += 1
        # committed epoch-claim markers below the cutoff are pure history
        # (epoch numbers only move forward, so they can never be re-claimed)
        mpat = re.compile(r"epoch-(\d+)\.json$")
        for finfo in fsx.listdir(fs, fsx.join(tdir, "_epochs")):
            mt = mpat.search(finfo.base_name)
            if mt and int(mt.group(1)) < cutoff:
                fsx.delete_file(fs, finfo.path)
                n += 1
        removed[table] = n
    return removed

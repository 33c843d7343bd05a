"""Key-partitioned last-wins merge: the upsert/tombstone apply stage.

The Ray analogue of the reference's buffered delete-then-insert flush
(BufferedRecords.java:264-298: ALL deletes execute before ALL inserts, per
JDBC batch, with per-key op order preserved — ST3) re-expressed as a
deterministic replay rule instead of buffer gymnastics:

    For each key (record-key PK tuple), let C = max order-rank over its
    clear ops (upsert markers 'M', tombstones 'D'), where
    rank = (kafka_partition << 40) | kafka_offset.  A data row survives iff
    its rank >= C (rows emitted by the clearing upsert share its offset and
    therefore survive their own marker; tombstones emit no rows).

Replaying the same events twice is idempotent (the reference's exactly-once
story, README.md:177-186), and the rule is insensitive to arrival order —
only to (partition, offset) — so parallel replay is safe.

Runs inside ``groupby(["table", "bucket"]).map_groups`` after the hash
shuffle on the key-PK bucket. Schema evolution (W5) happens here: payload
blocks carry their own schemas and are concatenated with promotion (missing
columns -> null), the Parquet analogue of ALTER TABLE ADD COLUMN
(DbStructure.java:127-234).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from kafka_connect_jdbc_flatten_ray.stages.flatten_stage import deserialize_ipc
from kafka_connect_jdbc_flatten_ray.stages.plan import OFF_COL, OP_COL, OP_INSERT, PART_COL

# rank = (partition << OFFSET_BITS) | offset; offsets up to 2^40 ≈ 1.1e12
# cover the 10^10-event target with headroom, partitions up to 2^23.
OFFSET_BITS = 40

INTERNAL_COLS = (OP_COL, PART_COL, OFF_COL)

MERGE_STATS_SCHEMA = pa.schema(
    [
        pa.field("table", pa.string()),
        pa.field("bucket", pa.int32()),
        pa.field("rows_in", pa.int64()),
        pa.field("clears_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("path", pa.string()),
        # per-partition max applied offset within this group (JSON object),
        # aggregated by the driver into the epoch checkpoint
        pa.field("offsets_json", pa.string()),
    ]
)


def _rank(tbl: pa.Table) -> np.ndarray:
    part = tbl.column(PART_COL).to_numpy(zero_copy_only=False).astype(np.int64)
    off = tbl.column(OFF_COL).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(off) and int(off.max()) >= (1 << OFFSET_BITS):
        raise ValueError(
            f"offset {int(off.max())} exceeds the {OFFSET_BITS}-bit rank "
            "budget; raise OFFSET_BITS (partitions shrink accordingly)"
        )
    return (part << OFFSET_BITS) | off


def _promote_to(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Align a chunk to the unified schema: missing columns become nulls,
    differing types cast (the streaming-mode analogue of concat_tables'
    permissive promotion)."""
    import pyarrow.compute as pc

    cols = []
    for f in schema:
        if f.name in tbl.column_names:
            c = tbl.column(f.name)
            if c.type != f.type:
                c = pc.cast(c, f.type)
            cols.append(c)
        else:
            cols.append(pa.nulls(tbl.num_rows, f.type))
    return pa.table(dict(zip(schema.names, cols)))


def concat_payloads(group: pa.Table, prior: pa.Table | None = None) -> pa.Table:
    """Deserialize a (table, bucket) group's payload blocks and concatenate
    with schema promotion (evolution-safe)."""
    tables = [deserialize_ipc(buf) for buf in group.column("payload").to_pylist()]
    if prior is not None and prior.num_rows:
        tables.append(prior)
    if len(tables) == 1:
        return tables[0]
    return pa.concat_tables(tables, promote_options="permissive")


# one warning per worker process: the replay rank (partition << 40 | offset)
# only totally orders a key's ops while the key stays on ONE partition (the
# Kafka keyed-producer guarantee). A key observed on multiple partitions
# (e.g. after a partition-count change) resolves last-wins by partition id,
# which is arbitrary — surface it instead of staying silent.
_warned_key_partition_instability = False


def _check_key_partition_stability(codes: np.ndarray, part: np.ndarray) -> None:
    global _warned_key_partition_instability
    if _warned_key_partition_instability or not len(codes):
        return
    ng = int(codes.max()) + 1
    pmin = np.full(ng, np.iinfo(np.int64).max)
    pmax = np.full(ng, np.int64(-1))
    np.minimum.at(pmin, codes, part)
    np.maximum.at(pmax, codes, part)
    unstable = int((pmin != pmax).sum())
    if unstable:
        import warnings

        _warned_key_partition_instability = True
        warnings.warn(
            f"{unstable} key(s) observed on multiple kafka partitions in one "
            "merge group; the (partition << 40 | offset) replay rank orders "
            "their conflicting ops by partition id, not event time. This "
            "breaks the key<->partition stability assumption (e.g. a "
            "partition-count change mid-stream) — replay from a consistent "
            "stream or rank by event timestamp.",
            RuntimeWarning,
            stacklevel=3,
        )


def last_wins(full: pa.Table, key_cols: tuple[str, ...], n_new: int | None = None) -> pa.Table:
    """Apply the replay rule; returns surviving data rows (op column dropped,
    order columns kept for incremental re-merge).

    Rows at index >= ``n_new`` are prior lake state: they are dominated by a
    clear at rank >= their own (strict survival), while freshly replayed rows
    survive their own event's marker (rank >= clear). This makes re-applying
    an already-applied event replace its stored rows instead of duplicating
    them — replay idempotence (README.md:177-186 exactly-once analogue).
    """
    op = full.column(OP_COL).to_numpy(zero_copy_only=False)
    is_data = op == OP_INSERT
    if key_cols and not is_data.all():
        rank = _rank(full)
        clear_rank = np.where(~is_data, rank, np.int64(-1))
        # max clear rank per key, vectorized via factorized group ids
        if len(key_cols) == 1:
            codes, _ = _factorize_array(full.column(key_cols[0]))
        else:
            codes = _factorize_multi(full, key_cols)
        ngroups = int(codes.max()) + 1 if len(codes) else 0
        maxclear = np.full(ngroups, np.int64(-1))
        np.maximum.at(maxclear, codes[~is_data], clear_rank[~is_data])
        mc = maxclear[codes]
        keep = is_data & (rank >= mc)
        _check_key_partition_stability(
            codes, full.column(PART_COL).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if n_new is not None and n_new < full.num_rows:
            is_prior = np.zeros(full.num_rows, bool)
            is_prior[n_new:] = True
            keep &= ~(is_prior & (rank == mc))
    else:
        keep = is_data
    out = full.filter(pa.array(keep))
    return out.drop_columns([OP_COL])


def _factorize_array(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, int]:
    """Dense group ids via Arrow's hash table (pc.dictionary_encode) — no
    pandas round-trip in the merge hot path. Only group IDENTITY matters
    to the callers, not code order. Nulls get their own group id."""
    import pyarrow.compute as pc

    d = pc.dictionary_encode(col)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    n = len(d.dictionary)
    idx = d.indices
    if idx.null_count:
        idx = pc.fill_null(idx, n)
        n += 1
    return idx.to_numpy(zero_copy_only=False).astype(np.int64), n


def _probe_key_array(tbl: pa.Table, key_cols: tuple[str, ...], schema):
    """One vectorized probe key per row for pc.index_in: the key column
    itself when the pk is a single column, else a LENGTH-PREFIXED string
    concat (len1|val1|len2|val2 — a value containing the separator cannot
    alias another tuple because the lengths disambiguate). Columns are
    cast to the unified schema's field types first so an int32 chunk and
    an int64 clear row produce identical probe keys. Nulls take a 1-byte
    sentinel (a CDC pk is never null; only aliasing a literal one-byte
    \\x00 pk value could collide)."""
    import pyarrow.compute as pc

    def _col(c):
        col = tbl.column(c)
        if schema is not None and schema.field(c).type != col.type:
            col = col.cast(schema.field(c).type)
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    if len(key_cols) == 1:
        return _col(key_cols[0])
    parts = []
    for c in key_cols:
        s = pc.fill_null(pc.cast(_col(c), pa.large_string()), "\x00")
        parts.extend([pc.cast(pc.utf8_length(s), pa.large_string()), s])
    return pc.binary_join_element_wise(*parts, pa.scalar("|", pa.large_string()))


def _factorize_multi(tbl: pa.Table, cols: tuple[str, ...]) -> np.ndarray:
    combined = None
    for c in cols:
        codes, n = _factorize_array(tbl.column(c))
        if combined is None:
            combined = codes
        else:
            combined = combined * np.int64(n) + codes
    # re-densify the combined code (int64 hash factorize — cheap; the
    # expensive string->object conversion is what dictionary_encode avoids)
    import pandas as pd

    dense, _ = pd.factorize(combined, use_na_sentinel=False)
    return dense.astype(np.int64)


def local_prereduce(tbl: pa.Table, key_cols: tuple[str, ...]) -> pa.Table:
    """Within-batch combiner applied BEFORE the shuffle: drop data rows
    already dominated by a same-batch clear, and collapse each key's clears
    to the single max-rank one. Correctness: the max clear per key carries
    all the domination information the global merge needs, and locally
    dominated data rows can never survive globally. For upsert streams where
    several versions of a key land in one batch this roughly halves the
    exchange volume.
    """
    if not key_cols or not tbl.num_rows:
        return tbl
    op = tbl.column(OP_COL).to_numpy(zero_copy_only=False)
    is_data = op == OP_INSERT
    if is_data.all():
        return tbl
    rank = _rank(tbl)
    if len(key_cols) == 1:
        codes, _ = _factorize_array(tbl.column(key_cols[0]))
    else:
        codes = _factorize_multi(tbl, key_cols)
    ngroups = int(codes.max()) + 1 if len(codes) else 0
    maxclear = np.full(ngroups, np.int64(-1))
    np.maximum.at(maxclear, codes[~is_data], rank[~is_data])
    mc = maxclear[codes]
    keep = (is_data & (rank >= mc)) | (~is_data & (rank == mc))
    # a key could have two clear ops at the same rank only if the same event
    # were emitted twice into one batch; keep would then retain both — the
    # global merge is insensitive to duplicate clears, so no dedup needed.
    if keep.all():
        return tbl
    return tbl.filter(pa.array(keep))


def final_columns(tbl: pa.Table) -> pa.Table:
    """Drop internal order columns for user-facing output."""
    drop = [c for c in (PART_COL, OFF_COL, OP_COL) if c in tbl.column_names]
    return tbl.drop_columns(drop)


class MergeRows:
    """map_groups fn for the single-table query path: returns final rows."""

    def __init__(self, key_cols: tuple[str, ...], keep_internal: bool = False):
        self.key_cols = key_cols
        self.keep_internal = keep_internal
        self.__name__ = "MergeRows"  # ray map_groups wants a fn-like name

    def __call__(self, group: pa.Table) -> pa.Table:
        merged = last_wins(concat_payloads(group), self.key_cols)
        return merged if self.keep_internal else final_columns(merged)


class MergeToLake:
    """map_groups fn for the full-ingest path: merges each (table, bucket)
    group with its prior lake state and atomically rewrites the bucket file.

    Idempotent per epoch: the output filename is deterministic and written
    via temp-file + rename (W6 retry-safety analogue, JdbcSinkTask.java:74-99),
    so Ray task retries or a resumed run rewrite the same state.

    Groups whose estimated in-memory size exceeds ``stream_threshold_bytes``
    are merged in STREAMING mode: pass 1 scans only (key, op, rank) columns
    to build the per-key max-clear table, pass 2 re-streams each payload
    (and the prior bucket file row-group by row-group), filters survivors
    against that table and appends them through a ParquetWriter — worker
    heap holds one chunk plus the clear table (one rank per cleared key)
    instead of the whole group. This removes the bucket-fits-in-heap sizing
    constraint (SCALE.md merge-group spill).
    """

    def __init__(
        self,
        lake_root: str,
        epoch: int,
        key_cols_by_table: dict[str, tuple[str, ...]],
        prior_files: dict[tuple[str, int], str] | None = None,
        stream_threshold_bytes: int = 1 << 30,
        filesystem=None,
        mode: str = "cow",
    ):
        from kafka_connect_jdbc_flatten_ray.state import fs as fsx

        self.fs, self.lake_root = fsx.resolve(lake_root, filesystem)
        self.epoch = epoch
        self.key_cols_by_table = key_cols_by_table
        self.prior_files = prior_files or {}
        self.stream_threshold_bytes = stream_threshold_bytes
        if mode not in ("cow", "mor"):
            raise ValueError(f"merge mode must be cow|mor, got {mode}")
        self.mode = mode
        self.__name__ = "MergeToLake"  # ray map_groups wants a fn-like name

    def _stats_row(self, table, bucket, n_in, clears, n_out, path, offsets):
        import json

        return pa.Table.from_pylist(
            [
                {
                    "table": table,
                    "bucket": bucket,
                    "rows_in": n_in,
                    "clears_in": clears,
                    "rows_out": n_out,
                    "path": path,
                    "offsets_json": json.dumps(offsets),
                }
            ],
            schema=MERGE_STATS_SCHEMA,
        )

    def _out_path(self, table: str, bucket: int) -> str:
        from kafka_connect_jdbc_flatten_ray.state import fs as fsx

        out_dir = fsx.join(self.lake_root, table, f"bucket={bucket:05d}")
        fsx.makedirs(self.fs, out_dir)
        return fsx.join(out_dir, f"epoch-{self.epoch:06d}.parquet")

    def _merge_mor(self, group: pa.Table, table: str, bucket: int) -> pa.Table:
        """Merge-on-read epoch: write only this epoch's ops as a DELTA file
        (surviving data rows + one compacted clear row per cleared key,
        op/order columns retained) — no prior-state read or rewrite. The
        read path replays base+deltas through the same last-wins rule; the
        replay's order-insensitivity and idempotence are exactly what make
        the delta representation correct."""
        from kafka_connect_jdbc_flatten_ray.state import fs as fsx

        key_cols = self.key_cols_by_table.get(table, ())
        new_ops = concat_payloads(group)
        part = new_ops.column(PART_COL).to_numpy(zero_copy_only=False)
        off = new_ops.column(OFF_COL).to_numpy(zero_copy_only=False)
        offsets: dict[int, int] = {}
        for p in np.unique(part):
            offsets[int(p)] = int(off[part == p].max())
        n_in = new_ops.num_rows
        op = new_ops.column(OP_COL).to_numpy(zero_copy_only=False)
        clears = int((op != OP_INSERT).sum())
        # local_prereduce collapses to: surviving data rows + max clear/key
        delta = local_prereduce(new_ops, key_cols)
        out_dir = fsx.join(self.lake_root, table, f"bucket={bucket:05d}")
        fsx.makedirs(self.fs, out_dir)
        path = fsx.join(out_dir, f"epoch-{self.epoch:06d}.delta.parquet")
        staged = fsx.staging_path(self.fs, path)
        pq.write_table(delta, staged, filesystem=self.fs)
        fsx.publish_file(self.fs, staged, path)
        n_data = int(
            (delta.column(OP_COL).to_numpy(zero_copy_only=False) == OP_INSERT).sum()
        )
        return self._stats_row(table, bucket, n_in, clears, n_data, path, offsets)

    def __call__(self, group: pa.Table) -> pa.Table:
        table = group.column("table")[0].as_py()
        bucket = group.column("bucket")[0].as_py()
        if self.mode == "mor":
            return self._merge_mor(group, table, bucket)
        prior_path = self.prior_files.get((table, bucket))
        # streaming trigger: estimated uncompressed group size (payload raw
        # sizes are in each container header; prior size from file metadata)
        est = sum(
            int.from_bytes(p.as_py()[1:9], "little") if p.as_py()[0:1] in (b"Z", b"L", b"N")
            else len(p.as_py())
            for p in group.column("payload")
        )
        from kafka_connect_jdbc_flatten_ray.state import fs as fsx

        if prior_path:
            est += fsx.file_size(self.fs, prior_path) * 4  # parquet->arrow blowup
        if est > self.stream_threshold_bytes:
            return self._merge_streaming(group, table, bucket, prior_path)
        prior = pq.read_table(prior_path, filesystem=self.fs) if prior_path else None
        if prior is not None:
            # lake rows are surviving inserts; restore their op for replay
            prior = prior.append_column(
                OP_COL, pa.array([OP_INSERT] * prior.num_rows, pa.string())
            )
        new_ops = concat_payloads(group)
        part = new_ops.column(PART_COL).to_numpy(zero_copy_only=False)
        off = new_ops.column(OFF_COL).to_numpy(zero_copy_only=False)
        offsets: dict[int, int] = {}
        if len(part):
            for p in np.unique(part):
                offsets[int(p)] = int(off[part == p].max())
        full = (
            pa.concat_tables([new_ops, prior], promote_options="permissive")
            if prior is not None and prior.num_rows
            else new_ops
        )
        n_in = full.num_rows
        op = full.column(OP_COL).to_numpy(zero_copy_only=False)
        clears = int((op != OP_INSERT).sum())
        merged = last_wins(
            full, self.key_cols_by_table.get(table, ()), n_new=new_ops.num_rows
        )

        from kafka_connect_jdbc_flatten_ray.state import fs as fsx

        path = self._out_path(table, bucket)
        staged = fsx.staging_path(self.fs, path)
        pq.write_table(merged, staged, filesystem=self.fs)
        fsx.publish_file(self.fs, staged, path)  # atomic publish
        return self._stats_row(
            table, bucket, n_in, clears, merged.num_rows, path, offsets
        )

    def _merge_streaming(
        self, group: pa.Table, table: str, bucket: int, prior_path: str | None
    ) -> pa.Table:
        """Two-pass bounded-memory merge of one (table, bucket) group."""
        key_cols = self.key_cols_by_table.get(table, ())
        payloads = group.column("payload")

        def _chunks():
            """(chunk, is_prior) over payloads then prior row groups."""
            for buf in payloads:
                yield deserialize_ipc(buf.as_py()), False
            if prior_path:
                pf = pq.ParquetFile(self.fs.open_input_file(prior_path))
                for rg in range(pf.metadata.num_row_groups):
                    t = pf.read_row_group(rg)
                    yield t.append_column(
                        OP_COL, pa.array([OP_INSERT] * t.num_rows, pa.string())
                    ), True

        # ---- pass 1: per-key max clear rank + offsets + unified schema ----
        clear_parts: list[pa.Table] = []
        offsets: dict[int, int] = {}
        schemas: list[pa.Schema] = []
        n_in = 0
        clears = 0
        for chunk, is_prior in _chunks():
            n_in += chunk.num_rows
            schemas.append(chunk.schema)
            if not is_prior:
                part = chunk.column(PART_COL).to_numpy(zero_copy_only=False)
                off = chunk.column(OFF_COL).to_numpy(zero_copy_only=False)
                for p in np.unique(part):
                    o = int(off[part == p].max())
                    if o > offsets.get(int(p), -1):
                        offsets[int(p)] = o
                op = chunk.column(OP_COL).to_numpy(zero_copy_only=False)
                is_clear = op != OP_INSERT
                nclear = int(is_clear.sum())
                if nclear and key_cols:
                    clears += nclear
                    rank = _rank(chunk)
                    sel = chunk.select(list(key_cols)).filter(pa.array(is_clear))
                    clear_parts.append(
                        sel.append_column("__mc", pa.array(rank[is_clear]))
                    )
        if clear_parts:
            # per-key max clear rank, Arrow-native (key columns only —
            # bounded by the clear count, never the bucket size)
            clear_tbl = pa.TableGroupBy(
                pa.concat_tables(clear_parts, promote_options="permissive"),
                list(key_cols),
            ).aggregate([("__mc", "max")])
        else:
            clear_tbl = None
        unified = pa.unify_schemas(schemas, promote_options="permissive") \
            if schemas else None
        if clear_tbl is not None:
            # build the clear-key probe ONCE per bucket: per-chunk joint
            # factorize was O(chunks x clears) — measured 64x the CPU at
            # 10x data (4,414 s vs 68.7 s across the stage). index_in is
            # Arrow's hash-join probe: one build over the unique clear
            # keys, then each chunk pays only its own row count.
            mcvals = clear_tbl.column("__mc_max").to_numpy(
                zero_copy_only=False).astype(np.int64)
            clear_probe = _probe_key_array(clear_tbl, key_cols, unified)
        # ---- pass 2: filter survivors per chunk, append via ParquetWriter ----
        from kafka_connect_jdbc_flatten_ray.state import fs as fsx

        path = self._out_path(table, bucket)
        tmp = fsx.staging_path(self.fs, path)
        n_out = 0
        writer = None
        try:
            for chunk, is_prior in _chunks():
                if unified is not None and chunk.schema != unified:
                    chunk = _promote_to(chunk, unified)
                op = chunk.column(OP_COL).to_numpy(zero_copy_only=False)
                keep = op == OP_INSERT
                if clear_tbl is not None and keep.any():
                    import pyarrow.compute as pc

                    rank = _rank(chunk)
                    idx = pc.index_in(
                        _probe_key_array(chunk, key_cols, unified),
                        value_set=clear_probe,
                    )
                    idxnp = pc.fill_null(idx, -1).to_numpy(
                        zero_copy_only=False).astype(np.int64)
                    mc = np.where(idxnp >= 0,
                                  mcvals[np.clip(idxnp, 0, None)],
                                  np.int64(-1))
                    if is_prior:
                        keep &= rank > mc  # strict domination for lake rows
                    else:
                        keep &= rank >= mc
                if not keep.all():
                    chunk = chunk.filter(pa.array(keep))
                chunk = chunk.drop_columns([OP_COL])
                if writer is None:
                    writer = pq.ParquetWriter(tmp, chunk.schema, filesystem=self.fs)
                n_out += chunk.num_rows
                if chunk.num_rows:
                    writer.write_table(chunk)
        finally:
            if writer is not None:
                writer.close()
        if writer is None:  # no rows at all: write an empty file
            empty = (unified or pa.schema([])).empty_table()
            if OP_COL in empty.column_names:
                empty = empty.drop_columns([OP_COL])
            pq.write_table(empty, tmp, filesystem=self.fs)
        fsx.publish_file(self.fs, tmp, path)
        return self._stats_row(table, bucket, n_in, clears, n_out, path, offsets)

"""FlattenStage: the stateful actor-pool map_batches stage.

The Ray analogue of the reference sink task's per-task
FlattenTransformation with its per-SchemaPair instruction cache (ST1,
FlattenTransformation.java:39-54): a callable class for
``map_batches(FlattenStage, batch_format="pyarrow", concurrency=N)`` whose
``__init__`` work (plan building) is cached per schema fingerprint and
amortized across batches.

Output envelope (one row per (table, bucket) micro-block per input batch):

    table: string, bucket: int32, rows: int64, payload: large_binary

``payload`` is an Arrow IPC stream of that table's flattened envelope rows
(data schema + __op/__part/__off). Serializing per (table, bucket) keeps the
merge shuffle (groupby table+bucket) moving compact self-describing blocks —
this is what makes schema evolution safe mid-stream: each payload carries its
own schema and the merge unifies them (W5 analogue, DbStructure.java:127-234).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.stages.kernel import flatten_event_batch
from kafka_connect_jdbc_flatten_ray.stages.plan import (
    OFF_COL,
    FlattenPlan,
    build_plan,
    schema_fingerprint,
)

ENVELOPE_SCHEMA = pa.schema(
    [
        pa.field("table", pa.string()),
        pa.field("bucket", pa.int32()),
        pa.field("rows", pa.int64()),
        pa.field("payload", pa.large_binary()),
    ]
)


# Compressed IPC envelopes shrink the merge-shuffle exchange volume (the
# pipeline's only wide op). The payload container is a 1-byte codec tag +
# uint64le raw size + the WHOLE uncompressed IPC stream compressed as ONE
# frame — Arrow's own per-buffer IPC compression spends a zstd frame per
# column buffer, which on micro-blocks measured 4.6x slower to encode,
# 6.8x slower to decode AND 2.2x larger than one whole-stream frame.
# zstd is the default (the sort exchange is byte-bound: it beat lz4
# end-to-end, 14.3s vs 21.9s at 10.7M events); lz4/none are configurable
# via SinkConfig.envelope_compression.
import struct as _struct

_CODEC_TAGS = {"zstd": b"Z", "lz4": b"L", "none": b"N"}
_TAG_CODECS = {b"Z"[0]: "zstd", b"L"[0]: "lz4", b"N"[0]: "none"}
_CODECS = {"zstd": pa.Codec("zstd"), "lz4": pa.Codec("lz4")}


def serialize_ipc(tbl: pa.Table, codec: str = "zstd") -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    raw = sink.getvalue()
    head = _CODEC_TAGS[codec] + _struct.pack("<Q", raw.size)
    if codec == "none":
        return head + raw.to_pybytes()
    body = _CODECS[codec].compress(raw)
    return head + (body.to_pybytes() if hasattr(body, "to_pybytes") else bytes(body))


def deserialize_ipc(buf) -> pa.Table:
    mv = memoryview(buf) if not isinstance(buf, memoryview) else buf
    codec = _TAG_CODECS.get(mv[0])
    if codec is None:  # legacy payload: a bare (per-buffer-compressed) IPC stream
        return pa.ipc.open_stream(pa.py_buffer(buf)).read_all()
    (rawlen,) = _struct.unpack_from("<Q", mv, 1)
    if codec == "none":
        raw = pa.py_buffer(mv[9:])
    else:
        raw = _CODECS[codec].decompress(mv[9:], decompressed_size=rawlen)
    return pa.ipc.open_stream(pa.py_buffer(raw)).read_all()


def bucket_of(
    tbl: pa.Table, key_cols: tuple[str, ...], num_buckets: int,
    hash_version: int = 2,
) -> np.ndarray:
    """Deterministic hash bucket per row over the key-PK columns.

    This is the engine's explicit skew/partitioning control (SURVEY.md §7.3):
    the merge shuffle key is hash(key-pk) so all ops for a key meet in one
    group. Tables with no key PKs spread rows by offset (no clears to align).

    ``hash_version`` 2 (default) is the Arrow-native stable_row_hash —
    no per-batch pandas round-trip in the engine's hottest path; 1 is the
    legacy pandas hash kept for lakes whose manifests recorded it (bucket
    assignment is persistent lake layout, so the version travels with the
    manifest — see run_epoch / lake_lookup).
    """
    if not key_cols:
        off = tbl.column(OFF_COL).to_numpy(zero_copy_only=False)
        return (off % num_buckets).astype(np.int32)
    if hash_version >= 2:
        from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash

        h = stable_row_hash(tbl, key_cols)
        return (h % np.uint64(num_buckets)).astype(np.int32)
    df = tbl.select(list(key_cols)).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int32)


# Per-worker-process plan cache for the stateless-tasks execution mode:
# plain map_batches functions run in long-lived Ray workers, so a module
# global amortizes plan building exactly like actor state does, without
# paying actor-pool spin-up. Used by make_flatten_fn().
_WORKER_STAGES: dict = {}


def make_flatten_fn(
    cfg: SinkConfig,
    topic: str,
    value_schema_name: str | None,
    key_schema_name: str | None = None,
    hash_versions: dict[str, int] | None = None,
):
    """A plain-function flatten stage for ``map_batches`` (stateless tasks).

    Functionally identical to FlattenStage; prefer it when the per-stage
    state is just the plan cache (cheap to rebuild), so the pipeline skips
    actor-pool startup and scales elastically with the cluster. Use the
    FlattenStage actor pool when stage state is genuinely heavy.
    """
    key = (cfg, topic, value_schema_name, key_schema_name,
           tuple(sorted((hash_versions or {}).items())))

    def flatten_stage_fn(batch: pa.Table) -> pa.Table:
        stage = _WORKER_STAGES.get(key)
        if stage is None:
            stage = FlattenStage(cfg, topic, value_schema_name,
                                 key_schema_name, hash_versions)
            _WORKER_STAGES[key] = stage
        return stage(batch)

    return flatten_stage_fn


class FlattenStage:
    """map_batches callable: change-event batches -> (table, bucket, payload)."""

    def __init__(
        self,
        cfg: SinkConfig,
        topic: str,
        value_schema_name: str | None,
        key_schema_name: str | None = None,
        hash_versions: dict[str, int] | None = None,
    ):
        self.cfg = cfg
        # per-TABLE bucket-hash versions (a partially migrated lake may mix
        # v1 and v2 tables; forcing one global version would bucket a v2
        # table with the v1 hash and split keys from their prior state)
        self.hash_versions = dict(hash_versions or {})
        self.topic = topic
        self.value_schema_name = value_schema_name
        self.key_schema_name = key_schema_name
        # ST1: LRU plan cache keyed by schema fingerprint
        self._plans: OrderedDict[str, FlattenPlan] = OrderedDict()

    def _plan_for(self, batch: pa.Table, topic: str | None = None) -> FlattenPlan:
        vt = batch.schema.field("value").type
        kt = batch.schema.field("key").type if "key" in batch.column_names else None
        topic = topic or self.topic
        fp = topic + "#" + schema_fingerprint(
            vt, kt, self.value_schema_name, self.key_schema_name
        )
        plan = self._plans.get(fp)
        if plan is None:
            plan = build_plan(
                self.cfg, topic, vt, self.value_schema_name, kt, self.key_schema_name
            )
            self._plans[fp] = plan
            while len(self._plans) > self.cfg.instruction_cache_size:
                self._plans.popitem(last=False)
        else:
            self._plans.move_to_end(fp)
        return plan

    def __call__(self, batch: pa.Table) -> pa.Table:
        # multi-topic streams (one connector, many topics — the reference's
        # `topics` config): table names derive from each record's topic, so
        # a mixed batch splits per topic (rare path; single-topic is the
        # zero-extra-work common case)
        tcol = batch.column("topic")
        if batch.num_rows:
            topics = pc.unique(
                tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray) else tcol
            ).to_pylist()
        else:
            topics = [self.topic]
        if len(topics) > 1:
            parts = [
                self._flatten_one(
                    batch.filter(pc.equal(batch.column("topic"), t)), t
                )
                for t in sorted(topics)
            ]
            return pa.concat_tables(parts)
        return self._flatten_one(batch, topics[0] if topics else self.topic)

    def _flatten_one(self, batch: pa.Table, topic: str) -> pa.Table:
        from kafka_connect_jdbc_flatten_ray.stages.merge import local_prereduce

        plan = self._plan_for(batch, topic)
        tables, buckets, rows, payloads = [], [], [], []
        out = flatten_event_batch(plan, self.cfg, batch)
        nb = self.cfg.num_buckets
        for tp in plan.tables:
            tbl = local_prereduce(out[tp.table], tp.key_pk_cols)
            if tbl.num_rows == 0:
                continue
            b = bucket_of(
                tbl, tp.key_pk_cols, nb,
                self.hash_versions.get(tp.table, self.cfg.hash_version),
            )
            if len(np.unique(b)) == 1:
                groups = [(int(b[0]), tbl)]
            else:
                order = np.argsort(b, kind="stable")
                sorted_tbl = tbl.take(pa.array(order))
                bs = b[order]
                bounds = np.flatnonzero(np.diff(bs)) + 1
                starts = np.concatenate(([0], bounds))
                ends = np.concatenate((bounds, [len(bs)]))
                groups = [
                    (int(bs[s]), sorted_tbl.slice(s, e - s)) for s, e in zip(starts, ends)
                ]
            for bucket, sub in groups:
                tables.append(tp.table)
                buckets.append(bucket)
                rows.append(sub.num_rows)
                payloads.append(serialize_ipc(sub, self.cfg.envelope_compression))
        return pa.Table.from_arrays(
            [
                pa.array(tables, pa.string()),
                pa.array(buckets, pa.int32()),
                pa.array(rows, pa.int64()),
                pa.array(payloads, pa.large_binary()),
            ],
            schema=ENVELOPE_SCHEMA,
        )

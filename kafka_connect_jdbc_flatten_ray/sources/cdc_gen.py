"""Deterministic synthetic CDC change-event stream (fixture F-J).

Derives, with no randomness, a source-code repository table
``(repo, path, commit_id, lang, content)`` (BASELINE.json input_hint shape)
from the driver's ``documents`` Parquet table, and from it a change-event log
shaped like the reference's SinkRecord stream: nested value struct with a
struct ('metrics'), an array of structs ('lines'), and a map ('attrs'),
plus op codes insert/upsert/tombstone and kafka coordinates.

Every derivation is pure integer/string arithmetic so a DuckDB oracle can
reproduce the exact same events (and final merged state) in SQL — this is
the engine's correctness gate.

Derivation rules (doc_id = the documents row id; all integer arithmetic):
    repo        = 'repo_' || (doc_id % NUM_REPOS)
    path        = 'src/doc_' || doc_id || '.txt'
    n_versions  = doc_id % 3 + 1           (versions v = 0..n_versions-1)
    tombstone   = doc_id % 7 == 0          (one extra final delete event)
    partition   = doc_id % num_partitions  (key <-> partition is stable, so
                                            per-key order = offset order)
    offset      = doc_id * 4 + v           (tombstone: v = n_versions)
    timestamp   = 1_600_000_000_000 + offset * 1000  (epoch ms)
    commit_id   = 'c' || ((doc_id * 2654435761 + v) % 1000000007)
    size        = n_chars + v
    lines       = [(i+1, 'v' || v || ':' || line_i) for line_i in split(text, \\n)]
    attrs       = {'lang': lang, 'source': source}

The event value schema (Connect name com.example.FileChange -> root
container 'filechange'):

    value: struct {repo, path, commit_id, lang: string, version: int32,
                   size: int64, metrics: struct{n_lines, n_words: int64},
                   lines: list<struct{lineno: int32, line: string}>,
                   attrs: map<string,string>}
    key:   struct FileChangeKey {repo, path}
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NUM_REPOS = 20
TOPIC = "cdc"
VALUE_SCHEMA_NAME = "com.example.FileChange"
KEY_SCHEMA_NAME = "com.example.FileChangeKey"
EPOCH_MS0 = 1_600_000_000_000

LINE_STRUCT = pa.struct([pa.field("lineno", pa.int32()), pa.field("line", pa.string())])
METRICS_STRUCT = pa.struct([pa.field("n_lines", pa.int64()), pa.field("n_words", pa.int64())])
VALUE_TYPE = pa.struct(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit_id", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("version", pa.int32()),
        pa.field("size", pa.int64()),
        pa.field("metrics", METRICS_STRUCT),
        pa.field("lines", pa.list_(LINE_STRUCT)),
        pa.field("attrs", pa.map_(pa.string(), pa.string())),
    ]
)
KEY_TYPE = pa.struct([pa.field("repo", pa.string()), pa.field("path", pa.string())])

# evolved value schema generation 2: adds a 'branch' leaf (schema evolution
# mid-stream; events with version >= evolve_from carry the new schema)
VALUE_TYPE_V2 = pa.struct(list(VALUE_TYPE) + [pa.field("branch", pa.string())])

EVENT_SCHEMA = pa.schema(
    [
        pa.field("topic", pa.string()),
        pa.field("partition", pa.int32()),
        pa.field("offset", pa.int64()),
        pa.field("timestamp", pa.timestamp("ms")),
        pa.field("timestamp_type", pa.string()),
        # explicit op code ('U' upsert / 'D' tombstone): robust tombstone
        # signal even if a downstream block unification drops the value
        # struct's validity bitmap (kernel also accepts null-value-only)
        pa.field("op", pa.string()),
        pa.field("key", KEY_TYPE),
        pa.field("value", VALUE_TYPE),
    ]
)


def _s(a) -> pa.Array:
    """numpy int array -> arrow string array."""
    return pc.cast(pa.array(a), pa.string())


def _concat(*parts) -> pa.Array:
    """Element-wise string concat (scalars broadcast)."""
    args = [p if isinstance(p, (pa.Array, pa.ChunkedArray)) else pa.scalar(p) for p in parts]
    return pc.binary_join_element_wise(*args, "")


def source_code_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> the (repo, path, commit_id, lang, content) table
    (input_hint shape; commit_id at version 0)."""
    did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    repo = _concat("repo_", _s(did % NUM_REPOS))
    path = _concat("src/doc_", _s(did), ".txt")
    commit = _concat("c", _s((did * 2654435761) % 1000000007))
    return pa.table(
        {
            "repo": repo,
            "path": path,
            "commit_id": commit,
            "lang": batch.column("lang"),
            "content": batch.column("text"),
        }
    )


class EventGen:
    """map_batches callable: documents batch -> change-event batch.

    ``replicate`` scales the stream for benchmarks: replica r shifts the
    doc-id space so keys stay distinct and event counts grow linearly.
    ``include_tombstones=False`` produces a pure insert/upsert stream (for
    insert-mode pipelines where delete is disabled).
    """

    def __init__(
        self,
        num_partitions: int = 8,
        include_tombstones: bool = True,
        replicate: int = 1,
        id_stride: int = 10_000_000,
        target_events_per_batch: int = 16384,
        evolve_from: int | None = None,
    ):
        self.num_partitions = num_partitions
        self.include_tombstones = include_tombstones
        self.replicate = replicate
        self.id_stride = id_stride
        self.target = target_events_per_batch
        # schema evolution: events with version >= evolve_from are emitted
        # with the V2 value schema (extra 'branch' leaf = 'main')
        self.evolve_from = evolve_from

    def __call__(self, batch: pa.Table):
        # yield batches of ~target_events_per_batch events (grouping replicas
        # as needed) so downstream batch sizes stay bounded and useful
        # regardless of input block size and replication factor
        n = batch.num_rows
        if n == 0:
            return
        per_replica = max(1, int(n * 2.2))  # ~avg events per doc
        k = max(1, self.target // per_replica)
        base = np.arange(n, dtype=np.int64)
        for start in range(0, self.replicate, k):
            chunk = range(start, min(start + k, self.replicate))
            if len(chunk) == 1:
                out = self._gen(batch, np.int64(chunk[0] * self.id_stride))
            else:
                tile = np.tile(base, len(chunk))
                sub = batch.take(pa.array(tile))
                offs = np.repeat(
                    np.array([r * self.id_stride for r in chunk], np.int64), n
                )
                out = self._gen(sub, offs)
            yield from self._maybe_evolve(out)

    def _maybe_evolve(self, tbl: pa.Table):
        """Split a generated batch into schema generations: events with
        version >= evolve_from are re-emitted with the V2 value schema
        (new 'branch' leaf) — mixed schema generations in one stream."""
        if self.evolve_from is None:
            yield tbl
            return
        value = tbl.column("value")
        if isinstance(value, pa.ChunkedArray):
            value = value.combine_chunks()
        ver = pc.struct_field(value, "version")
        is_v2 = pc.fill_null(
            pc.greater_equal(ver, pa.scalar(self.evolve_from, pa.int32())), False
        )
        t1 = tbl.filter(pc.invert(is_v2))
        if t1.num_rows:
            yield t1
        t2 = tbl.filter(is_v2)
        if t2.num_rows:
            v = t2.column("value")
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            children = [pc.struct_field(v, f.name) for f in VALUE_TYPE]
            branch = pa.array(["main"] * len(v), pa.string())
            v2 = pa.StructArray.from_arrays(
                children + [branch], fields=list(VALUE_TYPE_V2)
            )
            t2 = t2.set_column(
                t2.column_names.index("value"), pa.field("value", VALUE_TYPE_V2), v2
            )
            yield t2

    def _gen(self, batch: pa.Table, id_offset) -> pa.Table:
        did0 = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        did0 = did0 + id_offset
        n_docs = len(did0)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        source = batch.column("source")
        if isinstance(source, pa.ChunkedArray):
            source = source.combine_chunks()
        n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)

        nv = (did0 % 3) + 1
        tomb = (did0 % 7 == 0) if self.include_tombstones else np.zeros(n_docs, bool)
        n_events = nv + tomb
        total = int(n_events.sum())
        starts = np.concatenate(([0], np.cumsum(n_events)))[:-1]
        ridx = np.repeat(np.arange(n_docs), n_events)  # doc index per event
        v = np.arange(total) - starts[ridx]  # version index per event
        is_tomb = tomb[ridx] & (v == nv[ridx])

        did = did0[ridx]
        part = (did % self.num_partitions).astype(np.int32)
        off = did * 4 + v
        ts = EPOCH_MS0 + off * 1000

        ridx_pa = pa.array(ridx)
        repo = _concat("repo_", _s(did % NUM_REPOS))
        path = _concat("src/doc_", _s(did), ".txt")
        commit = _concat("c", _s((did * 2654435761 + v) % 1000000007))
        lang_e = lang.take(ridx_pa)
        source_e = source.take(ridx_pa)
        size = pa.array(n_chars[ridx] + v, pa.int64())

        # per-doc line split, replicated per event, each line prefixed 'v<v>:'
        doc_lines = pc.split_pattern(text, "\n")
        ev_lines = doc_lines.take(ridx_pa)
        lens = pc.list_value_length(ev_lines).to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        flat = pc.list_flatten(ev_lines)
        parent = np.repeat(np.arange(total), lens)
        prefix = _concat("v", _s(v), ":")
        line_vals = _concat(prefix.take(pa.array(parent)), flat)
        lineno = (np.arange(len(parent)) - offsets[parent] + 1).astype(np.int32)
        line_struct = pa.StructArray.from_arrays(
            [pa.array(lineno, pa.int32()), line_vals], fields=list(LINE_STRUCT)
        )
        lines_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), line_struct)

        # metrics struct (ints only -> SQL-exact)
        n_lines = pa.array(lens, pa.int64())
        doc_words = pc.list_value_length(pc.split_pattern(text, " "))
        n_words = pc.cast(doc_words.take(ridx_pa), pa.int64())
        metrics = pa.StructArray.from_arrays([n_lines, n_words], fields=list(METRICS_STRUCT))

        # attrs map {'lang':…, 'source':…} — 2 entries per event
        map_offsets = pa.array(np.arange(total + 1, dtype=np.int32) * 2, pa.int32())
        keys = pa.array(["lang", "source"] * total, pa.string())
        items_np = np.empty(2 * total, dtype=object)
        items_np[0::2] = lang_e.to_numpy(zero_copy_only=False)
        items_np[1::2] = source_e.to_numpy(zero_copy_only=False)
        items = pa.array(items_np, pa.string())
        attrs = pa.MapArray.from_arrays(map_offsets, keys, items)

        value = pa.StructArray.from_arrays(
            [repo, path, commit, lang_e, pa.array(v.astype(np.int32), pa.int32()),
             size, metrics, lines_arr, attrs],
            fields=list(VALUE_TYPE),
            mask=pa.array(is_tomb),  # tombstones: value = null
        )
        key = pa.StructArray.from_arrays([repo, path], fields=list(KEY_TYPE))

        op = np.where(is_tomb, "D", "U")
        return pa.Table.from_arrays(
            [
                pa.array([TOPIC] * total, pa.string()),
                pa.array(part, pa.int32()),
                pa.array(off, pa.int64()),
                pa.array(ts, pa.timestamp("ms")),
                pa.array(["CreateTime"] * total, pa.string()),
                pa.array(op, pa.string()),
                key,
                value,
            ],
            schema=EVENT_SCHEMA,
        )

"""Multi-table incremental tail with per-table checkpoints and round-robin
task partitioning.

Ray analogue of the reference's connector-level table fan-out:
``JdbcSourceConnector_Flatten.java:137-170`` round-robins the monitored
table list across ``maxTasks`` task configs, and each task tails its
tables with an independent stored offset
(``TimestampIncrementingTableQuerier.java:115-146``). Here each table is an
independent pruned/filtered ``read_parquet`` (offset criterion pushed into
the row-group filter) and the per-task union of tables streams as one
Dataset; offsets persist in a JSON checkpoint file (tmp+rename atomic,
like state/checkpoints.py).
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean


class TableSpec(NamedTuple):
    name: str
    path: str
    inc_col: str


def round_robin_assignments(
    tables: list[TableSpec], max_tasks: int
) -> list[list[TableSpec]]:
    """Partition tables across tasks exactly as the reference's
    ``taskConfigs`` does (JdbcSourceConnector_Flatten.java:137-170): at most
    ``max_tasks`` groups, table i -> group i % num_groups."""
    if not tables:
        return []
    num_groups = min(max_tasks, len(tables))
    groups: list[list[TableSpec]] = [[] for _ in range(num_groups)]
    for i, t in enumerate(tables):
        groups[i % num_groups].append(t)
    return groups


class MultiTableOffsets:
    """Per-table incrementing offsets, persisted atomically."""

    def __init__(self, store_dir: str):
        self.path = os.path.join(store_dir, "table_offsets.json")
        os.makedirs(store_dir, exist_ok=True)

    def load(self) -> dict[str, int]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return {k: int(v) for k, v in json.load(f).items()}

    def save(self, offsets: dict[str, int]) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({k: int(v) for k, v in offsets.items()}, f, indent=1)
        os.replace(tmp, self.path)


def _stats_max(path: str, col: str) -> int | None:
    """Max of an incrementing column from Parquet row-group stats (no data
    read) — how the tail learns the new offset to commit. Files written
    without column statistics fall back to scanning just that column."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    idx = md.schema.to_arrow_schema().get_field_index(col)
    maxs = []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            t = pf.read(columns=[col])  # stats absent: one-column scan
            import pyarrow.compute as pc

            v = pc.max(t.column(col)).as_py()
            return int(v) if v is not None else None
        maxs.append(st.max)
    return max(maxs) if maxs else None


def tail_tables(
    specs: list[TableSpec],
    offsets: dict[str, int],
    max_tasks: int = 4,
    columns: dict[str, list[str]] | None = None,
) -> ray.data.Dataset:
    """One tail pass over all tables: each table reads only rows with
    ``inc_col > offsets[name]`` (filter pushdown), normalized to
    (table_name, inc_id) plus any requested per-table columns, unioned
    across the round-robin task groups."""
    parts: list[ray.data.Dataset] = []
    for group in round_robin_assignments(specs, max_tasks):
        for spec in group:
            off = offsets.get(spec.name)
            cols = [spec.inc_col] + (columns or {}).get(spec.name, [])
            flt = pc.field(spec.inc_col) > off if off is not None else None
            ds = read_parquet_clean(spec.path, columns=cols, filter=flt)

            def _norm(t: pa.Table, name=spec.name, col=spec.inc_col) -> pa.Table:
                out = {
                    "table_name": pa.array([name] * t.num_rows, pa.string()),
                    "inc_id": pc.cast(t.column(col), pa.int64()),
                }
                for c in t.column_names:
                    if c != col:
                        out[c] = t.column(c)
                return pa.table(out)

            parts.append(ds.map_batches(_norm, batch_format="pyarrow"))
    if not parts:
        raise ValueError("no tables to tail")
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


class MultiTableTail:
    """Checkpointed multi-table tail: ``poll()`` returns the new rows since
    the last commit; ``commit()`` advances each table's offset to the
    current stats max (the analogue of Connect committing source offsets
    after a poll batch)."""

    def __init__(self, specs: list[TableSpec], store_dir: str, max_tasks: int = 4):
        self.specs = specs
        self.max_tasks = max_tasks
        self.store = MultiTableOffsets(store_dir)

    def poll(self) -> ray.data.Dataset:
        return tail_tables(self.specs, self.store.load(), self.max_tasks)

    def commit(self) -> dict[str, int]:
        offsets = self.store.load()
        for spec in self.specs:
            mx = _stats_max(spec.path, spec.inc_col)
            if mx is not None and mx > offsets.get(spec.name, -(1 << 62)):
                offsets[spec.name] = int(mx)
        self.store.save(offsets)
        return offsets

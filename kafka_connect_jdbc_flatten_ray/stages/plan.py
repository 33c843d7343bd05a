"""Flatten plan: schema walk, table-split grouping, naming, PK resolution.

Pure Python over ``pyarrow`` types — no Ray dependency. This is the analogue
of the reference's instruction building
(FlattenTransformation.java:135-329 ``getMainProcessingInstructions`` and
:647-713 ``getFlattenSchema``), re-expressed as a declarative plan that the
vectorized Arrow kernel (stages/kernel.py) executes per batch.

Semantics reproduced (SURVEY.md §2.2):
- F1  schema walk / leaf enumeration      (FlattenTransformation.java:647-713)
- F2  table-split grouping at the last array/map container (:149-157)
- F8  key-PK propagation                  (:334-368)
- F9  value-PK propagation                (:659-671, :430-437)
- F10 column naming & collision rules     (:229-252)
- F11/F12 field/table renames             (:727-736, JdbcDbWriter.java:85-108)
- F13 container whitelist                 (:696-703)
- F14 case normalization                  (:723-725)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.functions.naming import (
    container_pathname,
    full_path_delimiter,
    table_name,
    ucase,
)

STRUCT, ARRAY, MAP = "struct", "array", "map"

# internal columns that ride through the merge shuffle (never user-visible
# in final tables except the coordinate columns the config asks for)
OP_COL = "__op"  # 'I' data row, 'M' upsert clear marker, 'D' tombstone
PART_COL = "__part"
OFF_COL = "__off"

OP_INSERT, OP_MARKER, OP_DELETE = "I", "M", "D"


def _is_struct(t: pa.DataType) -> bool:
    return pa.types.is_struct(t)


def _is_array(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t)


def _is_map(t: pa.DataType) -> bool:
    return pa.types.is_map(t)


def _is_container(t: pa.DataType) -> bool:
    return _is_struct(t) or _is_array(t) or _is_map(t)


@dataclass(frozen=True)
class Container:
    """One container (struct/array/map) on a path. Equality mirrors
    Container.java:73-82 (name, path, depth, type)."""

    name: str  # lowercase
    path: str  # dotted lowercase names of ancestor containers ("" at root)
    depth: int
    kind: str  # struct | array | map
    optional: bool = field(compare=False, default=False)
    src_name: str = field(compare=False, default="")  # original-case field name

    @property
    def dotted(self) -> str:
        return f"{self.path}.{self.name}" if self.path else self.name


@dataclass
class Leaf:
    """A primitive leaf (struct field, array item or map value).

    ``name_src`` is the logical Connect field name in original case (for an
    array item or map value this is the array/map's own field name —
    FlattenTransformation.java:690,708 pass the container's fieldname down);
    ``src_field`` is the Arrow accessor (struct field name), "" when the
    exploded item itself is the value.
    """

    field_name: str  # lowercase logical name
    name_src: str  # original-case logical name (used for column naming)
    src_field: str  # Arrow struct-field accessor ("" for item leaves)
    containers: tuple[Container, ...]
    dtype: pa.DataType
    optional: bool
    is_pk: bool = False
    target_name: str = ""

    @property
    def path(self) -> str:
        return ".".join(c.name for c in self.containers)


@dataclass(frozen=True)
class CaptureSpec:
    """A value captured during main-path navigation and broadcast into
    every exploded row: a map key or a propagated value-PK field."""

    col: str  # final column name (also the capture id)
    kind: str  # 'map_key' | 'value_pk'
    path_index: int  # index into main_path of the owning container
    src_field: str  # struct field to read (value_pk) or "" (map_key)
    dtype: pa.DataType = pa.string()


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    kind: str  # 'key_pk' | 'leaf' | 'capture' | 'coord'
    dtype: pa.DataType
    optional: bool = True
    key_field: str | None = None  # key_pk: field in the key struct (None=primitive key)
    item_steps: tuple[str, ...] = ()  # leaf: struct-field walk from the exploded item
    leaf_is_item: bool = False  # leaf: True when the exploded item itself is the value
    coord: str | None = None  # coord: topic|partition|offset|timestamp|timestamp_type


@dataclass
class TablePlan:
    table: str  # final lake table name
    schema_name: str  # dotted container path (pre-rename "schema name")
    main_path: tuple[Container, ...]
    columns: tuple[ColumnSpec, ...]
    captures: tuple[CaptureSpec, ...]
    key_pk_cols: tuple[str, ...]  # record-key-derived PKs = delete/clear scope
    pk_cols: tuple[str, ...]  # full PK constraint (metadata)

    def data_schema(self) -> pa.Schema:
        """Arrow schema of flattened data rows (user-visible columns)."""
        return pa.schema([pa.field(c.name, c.dtype, nullable=True) for c in self.columns])

    def envelope_schema(self) -> pa.Schema:
        """data columns + internal op/order columns (merge-stage payload)."""
        return self.data_schema().append(pa.field(OP_COL, pa.string())) \
            .append(pa.field(PART_COL, pa.int32())) \
            .append(pa.field(OFF_COL, pa.int64()))


@dataclass
class FlattenPlan:
    topic: str
    key_kind: str  # 'none' | 'primitive' | 'struct'
    tables: tuple[TablePlan, ...]
    # key-pk extraction shared by every table (and by tombstone fan-out):
    # list of (target column name, key struct field or None, dtype)
    key_pks: tuple[tuple[str, str | None, pa.DataType], ...]
    # db.timezone (JdbcSinkConfig.java:218-220): timestamps rendered as
    # wall-clock in this zone (DateTimeUtils.java calendar-binding analogue)
    db_timezone: str = "UTC"


_COORDS = ("topic", "partition", "offset", "timestamp", "timestamp_type")
_COORD_TYPES = (pa.string(), pa.int32(), pa.int64(), pa.timestamp("ms"), pa.string())


def _walk(
    cfg: SinkConfig,
    logical_name: str,
    accessor: str,
    dtype: pa.DataType,
    nullable: bool,
    depth: int,
    containers: list[Container],
    out: list[Leaf],
) -> None:
    """DFS leaf enumeration — FlattenTransformation.java:647-713.

    ``logical_name`` = Connect field name (array/map items inherit their
    container's name); ``accessor`` = Arrow struct-field access name, "" when
    the node is reached by exploding (array item / map value).
    """
    containers[:] = [c for c in containers if c.depth < depth]
    path = ".".join(c.name for c in containers)
    lname = logical_name.lower()

    if _is_struct(dtype):
        cont = Container(lname, path, depth, STRUCT, nullable, accessor)
        containers.append(cont)
        for f in dtype:
            _walk(cfg, f.name, f.name, f.type, f.nullable, depth + 1, containers, out)
        return

    if _is_array(dtype):
        cont = Container(lname, path, depth, ARRAY, nullable, accessor)
        containers.append(cont)
        item = dtype.value_field
        _walk(cfg, logical_name, "", item.type, item.nullable, depth + 1, containers, out)
        return

    if _is_map(dtype):
        cont = Container(lname, path, depth, MAP, nullable, accessor)
        containers.append(cont)
        item = dtype.item_field
        _walk(cfg, logical_name, "", item.type, item.nullable, depth + 1, containers, out)
        return

    # primitive leaf
    leaf = Leaf(
        field_name=lname,
        name_src=logical_name,
        src_field=accessor,
        containers=tuple(containers),
        dtype=dtype,
        optional=nullable or (containers[-1].optional if containers else False),
    )
    # container whitelist (F13): keep only leaves whose exact dotted container
    # path is whitelisted (FlattenTransformation.java:696-703)
    wl = cfg.whitelist_lc
    if wl and leaf.path not in wl:
        return
    # PK flag (FlattenTransformation.java:704-712): configured pk.fields path
    # match, or a propagate-pk field in its own container
    full = f"{leaf.path}.{lname}"
    if full in cfg.pk_fields_lc or full in cfg.propagate_fields_lc:
        leaf.is_pk = True
    out.append(leaf)


def _propagate_pk_owners(
    cfg: SinkConfig, leaves: list[Leaf]
) -> dict[Container, list[Leaf]]:
    """Map struct container -> propagate-pk leaves it owns (F9 capture,
    FlattenTransformation.java:659-671). A propagate field is a direct
    primitive field of a struct container whose dotted path matches
    flatten.pk_propagate_value_fields."""
    owners: dict[Container, list[Leaf]] = {}
    for leaf in leaves:
        if not leaf.containers:
            continue
        owner = leaf.containers[-1]
        if owner.kind != STRUCT:
            continue
        if f"{leaf.path}.{leaf.field_name}" in cfg.propagate_fields_lc:
            owners.setdefault(owner, []).append(leaf)
    return owners


def _extract_key_pks(
    cfg: SinkConfig, key_type: pa.DataType | None, key_name: str | None
) -> tuple[tuple[tuple[str, str | None, pa.DataType], ...], str]:
    """Key-PK resolution — FlattenTransformation.java:334-368 (F8).

    pk_mode=record_key with flatten: the sink-level FieldsMetadata path
    (FieldsMetadata.java:126-188, oracle JdbcSinkTaskTestPostgresArray.java
    :1877-2010) — key fields become simply-named PK columns in every table
    (pk.fields filters them; empty = all key fields).
    """
    if key_type is None or cfg.pk_mode not in ("flatten", "record_key"):
        return (), "none"
    if cfg.pk_mode == "record_key":
        if not _is_container(key_type):
            # FieldsMetadata.java:289-295: a primitive key needs EXACTLY one
            # configured PK column name (or none -> default); extras are a
            # misconfiguration, not something to silently ignore
            if len(cfg.pk_fields_lc) > 1:
                raise ValueError(
                    "Need exactly one PK column defined since the key schema "
                    f"for records is a primitive type, defined columns are: "
                    f"{cfg.pk_fields_lc}"
                )
            name = cfg.pk_fields_lc[0] if cfg.pk_fields_lc else "key"
            return ((ucase(cfg, name), None, key_type),), "primitive"
        if _is_struct(key_type):
            wanted = set(cfg.pk_fields_lc)
            # FieldsMetadata.java:306-312: configured fields absent from the
            # key schema raise, never silently filter
            key_names = {f.name.lower() for f in key_type}
            missing = wanted - key_names
            if missing:
                raise ValueError(
                    f"PK mode for table is record_key with configured PK "
                    f"fields {sorted(wanted)}, but record key schema does "
                    f"not contain field: {sorted(missing)}"
                )
            pks = [
                (ucase(cfg, f.name), f.name, f.type)
                for f in key_type
                if not wanted or f.name.lower() in wanted
            ]
            return tuple(pks), "struct"
        return (), "none"
    kname = container_pathname(key_name)
    if not _is_container(key_type):
        if f"{kname}.key" in cfg.pk_fields_lc:
            col = full_path_delimiter(cfg, kname, "key", True)
            return ((col, None, key_type),), "primitive"
        return (), "primitive"
    if _is_struct(key_type):
        pks = []
        for f in key_type:
            if f"{kname}.{f.name.lower()}" in cfg.pk_fields_lc:
                col = full_path_delimiter(cfg, kname, f.name, True)
                pks.append((col, f.name, f.type))
        return tuple(pks), "struct"
    return (), "none"


def build_plan(
    cfg: SinkConfig,
    topic: str,
    value_type: pa.DataType,
    value_schema_name: str | None,
    key_type: pa.DataType | None = None,
    key_schema_name: str | None = None,
) -> FlattenPlan:
    """Build the flatten plan for one (key schema, value schema) pair.

    The analogue of the reference's per-SchemaPair instruction list
    (FlattenTransformation.java:135-329); cached per schema fingerprint by
    the FlattenStage actor (ST1).
    """
    if not _is_struct(value_type):
        raise ValueError(
            f"flatten requires a STRUCT value schema, got {value_type} "
            "(the reference likewise only flattens struct-valued records)"
        )
    root_name = container_pathname(value_schema_name)
    leaves: list[Leaf] = []
    _walk(cfg, root_name, "", value_type, False, 0, [], leaves)

    key_pks, key_kind = _extract_key_pks(cfg, key_type, key_schema_name)
    if (cfg.delete_enabled and cfg.pk_mode in ("flatten", "record_key")
            and key_type is not None and not key_pks):
        raise ValueError(
            f"delete_enabled with pk_mode={cfg.pk_mode} but none of pk.fields "
            f"{cfg.pk_fields} resolve into the key schema"
        )

    pk_owners = _propagate_pk_owners(cfg, leaves)

    # F2: group by container prefix up to and including the LAST array/map
    # container; no array/map ancestor -> group under the root container
    # (FlattenTransformation.java:149-157)
    groups: dict[tuple[Container, ...], list[Leaf]] = {}
    for leaf in leaves:
        conts = leaf.containers
        last_am = max(
            (i for i, c in enumerate(conts) if c.kind in (ARRAY, MAP)), default=0
        )
        groups.setdefault(conts[: last_am + 1], []).append(leaf)

    tables: list[TablePlan] = []
    for gkey, gleaves in groups.items():
        schema_name = ".".join(c.name for c in gkey)
        cols: list[ColumnSpec] = []
        used: set[str] = set()
        pk_cols: list[str] = []

        # 1. key-derived PK columns (added first: FlattenTransformation.java:207)
        for col, kfield, kdtype in key_pks:
            cols.append(ColumnSpec(col, "key_pk", kdtype, False, key_field=kfield))
            used.add(col.lower())
            pk_cols.append(col)

        # 2. group leaves, collision naming (F10: :229-252)
        lower_counts: dict[str, int] = {}
        for leaf in gleaves:
            lower_counts[leaf.field_name] = lower_counts.get(leaf.field_name, 0) + 1
        for leaf in gleaves:
            full = lower_counts[leaf.field_name] > 1 or leaf.is_pk
            name = full_path_delimiter(cfg, leaf.path, leaf.name_src, full)
            leaf.target_name = name
            chain = leaf.containers[len(gkey) - 1:]
            if chain[0].kind == STRUCT:
                steps = tuple(c.src_name for c in chain[1:])
            else:
                steps = tuple(c.src_name for c in chain[2:])
            # when the last container is the array/map itself the leaf IS the
            # exploded item (primitive array/map value)
            leaf_is_item = chain[-1].kind in (ARRAY, MAP)
            if not leaf_is_item:
                steps = steps + (leaf.src_field,)
            cols.append(
                ColumnSpec(name, "leaf", leaf.dtype, leaf.optional,
                           item_steps=steps, leaf_is_item=leaf_is_item)
            )
            used.add(name.lower())
            if leaf.is_pk:
                pk_cols.append(name)

        captures: list[CaptureSpec] = []
        # 3. map keys of map containers on the group path (F5 key column,
        #    FlattenTransformation.java:214-246 mapKeys block)
        for i, c in enumerate(gkey):
            if c.kind != MAP:
                continue
            col = full_path_delimiter(cfg, c.dotted, "key", True)
            captures_spec = CaptureSpec(col, "map_key", i, "", pa.string())
            captures.append(captures_spec)
            if col.lower() not in used:
                cols.append(ColumnSpec(col, "capture", pa.string(), False))
                used.add(col.lower())
            # map-key-as-pk (FlattenTransformation.java:683-692)
            dotted_key = f"{c.dotted}key"
            if any(p == dotted_key for p in cfg.propagate_fields_lc):
                pk_cols.append(col)

        # 4. propagated value-PK fields owned by structs on the group path
        #    (F9: :247-260)
        for i, c in enumerate(gkey):
            if c.kind != STRUCT or c not in pk_owners:
                continue
            for pk_leaf in pk_owners[c]:
                col = full_path_delimiter(cfg, pk_leaf.path, pk_leaf.name_src, True)
                captures.append(CaptureSpec(col, "value_pk", i, pk_leaf.src_field, pk_leaf.dtype))
                if col not in pk_cols:
                    pk_cols.append(col)
                if col.lower() not in used:
                    cols.append(ColumnSpec(col, "capture", pk_leaf.dtype, False))
                    used.add(col.lower())

        # 4b. pk.mode=kafka: __connect_topic/partition/offset PK columns
        #     (FieldsMetadata.java kafka mode; oracle test
        #     JdbcSinkTaskTestPostgresArray.java:189-256)
        if cfg.pk_mode == "kafka" and cols:
            knames = (
                tuple(cfg.pk_fields)
                if len(cfg.pk_fields) == 3
                else ("__connect_topic", "__connect_partition", "__connect_offset")
            )
            for kn, coord, ctype in zip(
                knames, ("topic", "partition", "offset"),
                (pa.string(), pa.int32(), pa.int64()),
            ):
                name = ucase(cfg, kn)
                cols.append(ColumnSpec(name, "coord", ctype, False, coord=coord))
                pk_cols.append(name)

        # 5. kafka coordinates (F7: :99-113, :715-721)
        if cfg.flatten_coordinates and cols:
            for cname, coord, ctype in zip(cfg.coordinate_names, _COORDS, _COORD_TYPES):
                cols.append(ColumnSpec(ucase(cfg, cname), "coord", ctype,
                                       coord == "timestamp", coord=coord))

        tables.append(
            TablePlan(
                table=table_name(cfg, topic, schema_name),
                schema_name=schema_name,
                main_path=gkey,
                columns=tuple(cols),
                captures=tuple(captures),
                key_pk_cols=tuple(c for c, _, _ in key_pks),
                pk_cols=tuple(pk_cols),
            )
        )

    return FlattenPlan(topic=topic, key_kind=key_kind, tables=tuple(tables),
                       key_pks=key_pks, db_timezone=cfg.db_timezone)


def schema_fingerprint(
    value_type: pa.DataType, key_type: pa.DataType | None,
    value_name: str | None, key_name: str | None,
) -> str:
    """Cache key for the per-actor plan cache (ST1 instruction cache,
    FlattenTransformation.java:39-54)."""
    return f"{value_name}|{key_name}|{value_type}|{key_type}"

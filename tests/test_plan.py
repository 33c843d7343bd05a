"""Plan-step parity tests against the reference's Postgres oracle names.

Expected table/column names lifted from the reference tests (citations into
/root/reference/src/test/java/no/norsktipping/kafka/connect/jdbc/sink/):
- JdbcSinkTaskTestPostgresArray.java (persons, array/struct nesting, renames,
  whitelist, pk propagation)
- JdbcSinkTaskTestPostgresMap.java (map key columns)
- JdbcSinkTaskTestPostgresArrayDelete.java (root key, uppercase)
No Ray needed — the plan is pure Python.
"""

import pyarrow as pa
import pytest

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan


def person_with_address_type():
    """Fixture F-A: com.example.Person with list<struct Address>."""
    address = pa.struct([pa.field("street", pa.string()), pa.field("number", pa.int8())])
    return pa.struct(
        [
            pa.field("firstname", pa.string()),
            pa.field("lastname", pa.string()),
            pa.field("age", pa.int32()),
            pa.field("float", pa.float32()),
            pa.field("modified", pa.timestamp("ms")),
            pa.field("address", pa.list_(address), nullable=True),
        ]
    )


def cfg(**kw):
    base = dict(pk_mode="none", pk_fields=(), insert_mode="insert", delete_enabled=False)
    base.update(kw)
    return SinkConfig(**base)


class TestTableSplit:
    def test_root_and_array_tables(self):
        # JdbcSinkTaskTestPostgresArray.java:305-306,341-362
        plan = build_plan(cfg(), "atopic", person_with_address_type(), "com.example.Person")
        tables = {t.table: t for t in plan.tables}
        assert set(tables) == {"atopic_person", "atopic_person_address"}
        root = tables["atopic_person"]
        child = tables["atopic_person_address"]
        assert [c.name for c in root.columns if c.kind == "leaf"] == [
            "firstname", "lastname", "age", "float", "modified",
        ]
        assert [c.name for c in child.columns if c.kind == "leaf"] == ["street", "number"]

    def test_coordinates_appended(self):
        # FlattenTransformation.java:715-721; defaults JdbcSinkConfig.java:271-279
        plan = build_plan(cfg(), "atopic", person_with_address_type(), "com.example.Person")
        root = next(t for t in plan.tables if t.table == "atopic_person")
        coord_cols = [c.name for c in root.columns if c.kind == "coord"]
        assert coord_cols == [
            "kafkatopic", "kafkapartition", "kafkaoffset",
            "kafkatimestamp", "kafkatimestamp_type",
        ]

    def test_array_of_arrays_single_table(self):
        # JdbcSinkTaskTestPostgresArray.java:464-572 — table name repeats the
        # container name per array level (:514)
        address = pa.struct([pa.field("street", pa.string()), pa.field("number", pa.int8())])
        t = pa.struct([
            pa.field("firstname", pa.string()),
            pa.field("address", pa.list_(pa.list_(address))),
        ])
        plan = build_plan(cfg(), "atopic", t, "com.example.Person")
        assert {tp.table for tp in plan.tables} == {
            "atopic_person", "atopic_person_address_address",
        }

    def test_unnamed_root_is_literal_root(self):
        # FlattenTransformation.java:744-757; Delete test :625+ 'root'
        t = pa.struct([pa.field("v", pa.string())])
        plan = build_plan(cfg(), "atopic", t, None)
        assert plan.tables[0].table == "atopic_root"


class TestCollisionNaming:
    def test_duplicate_leaf_names_get_full_path(self):
        # F-C: JdbcSinkTaskTestPostgresArray.java:632-657, 728-759
        sub1 = pa.struct([pa.field("firstname", pa.string()), pa.field("modified", pa.timestamp("ms"))])
        sub2 = pa.struct([
            pa.field("firstname", pa.string()),
            pa.field("modified", pa.timestamp("ms")),
            pa.field("record2again", sub1),
        ])
        t = pa.struct([
            pa.field("firstname", pa.string()),
            pa.field("record1", sub1),
            pa.field("record2", sub2),
        ])
        plan = build_plan(cfg(), "atopic", t, "com.example.Person")
        assert len(plan.tables) == 1
        names = [c.name for c in plan.tables[0].columns if c.kind == "leaf"]
        assert "person_firstname" in names
        assert "person_record1_firstname" in names
        assert "person_record2_firstname" in names
        assert "person_record2_record2again_firstname" in names
        assert "person_record2_record2again_modified" in names
        assert "firstname" not in names

    def test_unique_names_stay_simple(self):
        sub = pa.struct([pa.field("inner", pa.string())])
        t = pa.struct([pa.field("outer", pa.string()), pa.field("rec", sub)])
        plan = build_plan(cfg(), "atopic", t, "com.example.Person")
        names = [c.name for c in plan.tables[0].columns if c.kind == "leaf"]
        assert names == ["outer", "inner"]

    def test_rename_fields(self):
        # JdbcSinkTaskTestPostgresArray.java:773-840
        t = person_with_address_type()
        c = cfg(rename_fields=(("person.firstname", "fname"),
                               ("person.address.address.street", "gate")))
        plan = build_plan(c, "atopic", t, "com.example.Person")
        tables = {tp.table: tp for tp in plan.tables}
        assert "fname" in [cc.name for cc in tables["atopic_person"].columns]
        assert "gate" in [cc.name for cc in tables["atopic_person_address"].columns]

    def test_rename_tables_and_whitelist(self):
        # rename: JdbcSinkTaskTestPostgresArray.java:978-988; whitelist :897-994
        t = person_with_address_type()
        c = cfg(rename_tables=(("atopic_person", "people"),),
                whitelist=("person",))
        plan = build_plan(c, "atopic", t, "com.example.Person")
        assert [tp.table for tp in plan.tables] == ["people"]

    def test_uppercase(self):
        # JdbcSinkTaskTestPostgresArrayDelete.java:625-809 uppercase variant
        t = pa.struct([pa.field("v", pa.string())])
        plan = build_plan(cfg(uppercase=True), "atopic", t, None)
        assert plan.tables[0].table == "ATOPIC_ROOT"
        assert [c.name for c in plan.tables[0].columns if c.kind == "leaf"] == ["V"]

    def test_dotted_topic(self):
        # JdbcSinkTaskTestPostgresArray.java:2013-2084
        t = pa.struct([pa.field("v", pa.string())])
        plan = build_plan(cfg(), "no.norsktipping.sales", t, "com.example.salesEvent")
        assert plan.tables[0].table == "no_norsktipping_sales_salesevent"


class TestPkPropagation:
    def test_struct_key_pk(self):
        # F-D: JdbcSinkTaskTestPostgresArray.java:1223-1582
        key = pa.struct([pa.field("keyInt", pa.int32()), pa.field("keyName", pa.string())])
        c = cfg(pk_mode="flatten",
                pk_fields=("personkey.keyint", "person.address.address.street"),
                insert_mode="upsert", delete_enabled=True)
        plan = build_plan(c, "atopic", person_with_address_type(), "com.example.Person",
                          key, "com.example.PersonKey")
        for tp in plan.tables:
            assert tp.key_pk_cols == ("personkey_keyint",)
            assert "personkey_keyint" in [cc.name for cc in tp.columns]
        child = next(t for t in plan.tables if t.table == "atopic_person_address")
        # street is a PK leaf -> full-path named
        assert "person_address_address_street" in [cc.name for cc in child.columns]
        assert "person_address_address_street" in child.pk_cols

    def test_value_pk_propagates_to_child(self):
        # F-D: :1069,1089 — person_float / person_modified appear in child table
        c = cfg(pk_mode="flatten", pk_fields=("personkey.keyint",),
                pk_propagate_value_fields=("person.float", "person.modified"),
                insert_mode="upsert", delete_enabled=True)
        key = pa.struct([pa.field("keyInt", pa.int32())])
        plan = build_plan(c, "atopic", person_with_address_type(), "com.example.Person",
                          key, "com.example.PersonKey")
        child = next(t for t in plan.tables if t.table == "atopic_person_address")
        names = [cc.name for cc in child.columns]
        assert "person_float" in names
        assert "person_modified" in names
        root = next(t for t in plan.tables if t.table == "atopic_person")
        rnames = [cc.name for cc in root.columns]
        # in the home table the propagated fields are PK -> full path named
        assert "person_float" in rnames and "float" not in rnames

    def test_primitive_key_root_key(self):
        # F-H: JdbcSinkTaskTestPostgresArrayDelete.java:811-830 pk.fields=root.key
        c = cfg(pk_mode="flatten", pk_fields=("root.key",),
                insert_mode="upsert", delete_enabled=True)
        t = pa.struct([pa.field("v", pa.string())])
        plan = build_plan(c, "atopic", t, None, pa.string(), None)
        assert plan.key_kind == "primitive"
        assert plan.tables[0].key_pk_cols == ("root_key",)

    def test_delete_requires_key_pk(self):
        c = cfg(pk_mode="flatten", pk_fields=("nosuch.field",),
                insert_mode="upsert", delete_enabled=True)
        t = pa.struct([pa.field("v", pa.string())])
        with pytest.raises(ValueError):
            build_plan(c, "atopic", t, None, pa.string(), None)


class TestMaps:
    def test_primitive_map(self):
        # F-G: JdbcSinkTaskTestPostgresMap.java:96-184 — person_address_key col,
        # value column named after the map field
        t = pa.struct([
            pa.field("firstname", pa.string()),
            pa.field("address", pa.map_(pa.string(), pa.string())),
        ])
        plan = build_plan(cfg(), "atopic", t, "com.example.Person")
        child = next(tp for tp in plan.tables if tp.table == "atopic_person_address")
        names = [cc.name for cc in child.columns]
        assert "person_address_key" in names
        assert "address" in names

    def test_struct_map(self):
        # F-G: JdbcSinkTaskTestPostgresMap.java:195-292
        address = pa.struct([pa.field("street", pa.string()), pa.field("number", pa.int8())])
        t = pa.struct([
            pa.field("firstname", pa.string()),
            pa.field("address", pa.map_(pa.string(), address)),
        ])
        plan = build_plan(cfg(), "atopic", t, "com.example.Person")
        child = next(tp for tp in plan.tables if tp.table == "atopic_person_address")
        names = [cc.name for cc in child.columns if cc.kind in ("leaf", "capture")]
        assert set(names) == {"street", "number", "person_address_key"}


class TestRecordKeyPkValidation:
    """Misconfigured record_key PKs must raise like FieldsMetadata
    (FieldsMetadata.java:289-312), not pass silently."""

    def test_primitive_key_with_two_pk_fields_raises(self):
        from kafka_connect_jdbc_flatten_ray.config import SinkConfig
        from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

        cfg = SinkConfig(pk_mode="record_key", pk_fields=("a", "b"),
                         delete_enabled=False)
        vt = pa.struct([pa.field("x", pa.int64())])
        with pytest.raises(ValueError, match="exactly one PK column"):
            build_plan(cfg, "t", vt, "v", pa.int64(), "k")

    def test_struct_key_missing_configured_field_raises(self):
        from kafka_connect_jdbc_flatten_ray.config import SinkConfig
        from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

        cfg = SinkConfig(pk_mode="record_key", pk_fields=("id", "nope"),
                         delete_enabled=False)
        vt = pa.struct([pa.field("x", pa.int64())])
        kt = pa.struct([pa.field("id", pa.int64())])
        with pytest.raises(ValueError, match="does not contain field.*nope"):
            build_plan(cfg, "t", vt, "v", kt, "k")

    def test_valid_configs_still_build(self):
        from kafka_connect_jdbc_flatten_ray.config import SinkConfig
        from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

        vt = pa.struct([pa.field("x", pa.int64())])
        kt = pa.struct([pa.field("id", pa.int64())])
        cfg = SinkConfig(pk_mode="record_key", pk_fields=("id",),
                         delete_enabled=False)
        assert build_plan(cfg, "t", vt, "v", kt, "k").key_pks
        cfg2 = SinkConfig(pk_mode="record_key", pk_fields=("renamed",),
                          delete_enabled=False)
        assert build_plan(cfg2, "t", vt, "v", pa.int64(), "k").key_pks[0][0] == "renamed"

"""Vectorized flatten-kernel tests against the reference oracle scenarios.

Value expectations from /root/reference test classes
(JdbcSinkTaskTestPostgresArray/Map/ArrayDelete.java); pure Arrow, no Ray.
"""

import pyarrow as pa
import pytest

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.stages.kernel import flatten_event_batch
from kafka_connect_jdbc_flatten_ray.stages.plan import OP_COL, build_plan


ADDRESS = pa.struct([pa.field("street", pa.string()), pa.field("number", pa.int8())])
PERSON = pa.struct(
    [
        pa.field("firstname", pa.string()),
        pa.field("lastname", pa.string()),
        pa.field("age", pa.int32()),
        pa.field("address", pa.list_(ADDRESS)),
    ]
)


def make_batch(values, value_type, keys=None, key_type=None, partitions=None, offsets=None):
    n = len(values)
    cols = {
        "topic": pa.array(["atopic"] * n),
        "partition": pa.array(partitions or [0] * n, pa.int32()),
        "offset": pa.array(offsets or list(range(n)), pa.int64()),
        "timestamp": pa.array([1_600_000_000_000 + i for i in range(n)], pa.timestamp("ms")),
        "timestamp_type": pa.array(["CreateTime"] * n),
        "value": pa.array(values, value_type),
    }
    if keys is not None:
        cols["key"] = pa.array(keys, key_type)
    return pa.table(cols)


def cfg(**kw):
    base = dict(pk_mode="none", pk_fields=(), insert_mode="insert", delete_enabled=False)
    base.update(kw)
    return SinkConfig(**base)


def rows(tbl, op="I"):
    d = tbl.to_pylist()
    return [r for r in d if r[OP_COL] == op]


class TestArrayExplode:
    def test_basic_explode(self):
        # JdbcSinkTaskTestPostgresArray.java:259-362 — one child row per item
        c = cfg()
        plan = build_plan(c, "atopic", PERSON, "com.example.Person")
        batch = make_batch(
            [
                {"firstname": "john", "lastname": "doe", "age": 21,
                 "address": [{"street": "a st", "number": 1}, {"street": "b st", "number": 2}]},
                {"firstname": "jane", "lastname": "roe", "age": 30, "address": []},
            ],
            PERSON,
        )
        out = flatten_event_batch(plan, c, batch)
        root = rows(out["atopic_person"])
        child = rows(out["atopic_person_address"])
        assert len(root) == 2 and len(child) == 2
        assert child[0]["street"] == "a st" and child[0]["number"] == 1
        assert child[1]["street"] == "b st"
        # coordinates injected into every row (F7)
        assert root[0]["kafkatopic"] == "atopic"
        assert child[1]["kafkaoffset"] == 0  # both items from offset-0 record

    def test_null_array_no_child_rows(self):
        # :189-256 / :366-460 — null array -> root row only
        c = cfg()
        plan = build_plan(c, "atopic", PERSON, "com.example.Person")
        batch = make_batch(
            [{"firstname": "x", "lastname": "y", "age": 1, "address": None}], PERSON
        )
        out = flatten_event_batch(plan, c, batch)
        assert len(rows(out["atopic_person"])) == 1
        assert len(rows(out["atopic_person_address"])) == 0

    def test_array_of_arrays(self):
        # :464-572 — inner items land in the single …_address_address table
        t = pa.struct([pa.field("firstname", pa.string()),
                       pa.field("address", pa.list_(pa.list_(ADDRESS)))])
        c = cfg()
        plan = build_plan(c, "atopic", t, "com.example.Person")
        batch = make_batch(
            [{"firstname": "x",
              "address": [[{"street": "s1", "number": 1}],
                          [{"street": "s2", "number": 2}, {"street": "s3", "number": 3}]]}],
            t,
        )
        out = flatten_event_batch(plan, c, batch)
        child = rows(out["atopic_person_address_address"])
        assert [r["street"] for r in child] == ["s1", "s2", "s3"]

    def test_primitive_array(self):
        # F-E array1: list<int32> explode, column named after the array field
        t = pa.struct([pa.field("s", pa.string()), pa.field("array1", pa.list_(pa.int32()))])
        c = cfg()
        plan = build_plan(c, "atopic", t, "com.example.Mainrecord")
        batch = make_batch([{"s": "a", "array1": [7, 8, 9]}], t)
        out = flatten_event_batch(plan, c, batch)
        child = rows(out["atopic_mainrecord_array1"])
        assert [r["array1"] for r in child] == [7, 8, 9]


class TestStructFlattening:
    def test_nested_structs_in_place(self):
        # F-C :575-771 — struct fields merge into the root table
        sub1 = pa.struct([pa.field("firstname", pa.string())])
        sub2 = pa.struct([pa.field("firstname", pa.string()), pa.field("again", sub1)])
        t = pa.struct([pa.field("firstname", pa.string()), pa.field("record2", sub2)])
        c = cfg()
        plan = build_plan(c, "atopic", t, "com.example.Person")
        batch = make_batch(
            [{"firstname": "top", "record2": {"firstname": "mid", "again": {"firstname": "deep"}}}],
            t,
        )
        out = flatten_event_batch(plan, c, batch)
        r = rows(out["atopic_person"])[0]
        assert r["person_firstname"] == "top"
        assert r["person_record2_firstname"] == "mid"
        assert r["person_record2_again_firstname"] == "deep"

    def test_null_nested_struct_gives_nulls(self):
        sub = pa.struct([pa.field("inner", pa.string())])
        t = pa.struct([pa.field("outer", pa.string()), pa.field("rec", sub)])
        c = cfg()
        plan = build_plan(c, "atopic", t, "com.example.Person")
        batch = make_batch([{"outer": "x", "rec": None}], t)
        out = flatten_event_batch(plan, c, batch)
        r = rows(out["atopic_person"])[0]
        assert r["outer"] == "x" and r["inner"] is None


class TestMaps:
    def test_primitive_map(self):
        # F-G :96-184 — person_address_key + value column 'address'
        t = pa.struct([pa.field("firstname", pa.string()),
                       pa.field("address", pa.map_(pa.string(), pa.string()))])
        c = cfg()
        plan = build_plan(c, "atopic", t, "com.example.Person")
        batch = make_batch(
            [{"firstname": "x", "address": [("home", "a st"), ("work", "b st")]}], t
        )
        out = flatten_event_batch(plan, c, batch)
        child = rows(out["atopic_person_address"])
        assert {(r["person_address_key"], r["address"]) for r in child} == {
            ("home", "a st"), ("work", "b st"),
        }

    def test_struct_map(self):
        # F-G :195-292 — struct values flatten to columns, key col kept
        t = pa.struct([pa.field("firstname", pa.string()),
                       pa.field("address", pa.map_(pa.string(), ADDRESS))])
        c = cfg()
        plan = build_plan(c, "atopic", t, "com.example.Person")
        batch = make_batch(
            [{"firstname": "x", "address": [("home", {"street": "a st", "number": 3})]}], t
        )
        out = flatten_event_batch(plan, c, batch)
        child = rows(out["atopic_person_address"])
        assert child[0]["person_address_key"] == "home"
        assert child[0]["street"] == "a st" and child[0]["number"] == 3


class TestPkAndOps:
    KEY = pa.struct([pa.field("keyInt", pa.int32())])

    def c(self, **kw):
        base = dict(pk_mode="flatten", pk_fields=("personkey.keyint",),
                    insert_mode="upsert", delete_enabled=True)
        base.update(kw)
        return cfg(**base)

    def plan(self, c):
        return build_plan(c, "atopic", PERSON, "com.example.Person",
                          self.KEY, "com.example.PersonKey")

    def test_key_pk_in_every_row(self):
        # F-D :1223-1373 — personkey_keyint materializes in root + child rows
        c = self.c()
        batch = make_batch(
            [{"firstname": "a", "lastname": "b", "age": 1,
              "address": [{"street": "s", "number": 1}]}],
            PERSON, keys=[{"keyInt": 42}], key_type=self.KEY,
        )
        out = flatten_event_batch(self.plan(c), c, batch)
        assert rows(out["atopic_person"])[0]["personkey_keyint"] == 42
        assert rows(out["atopic_person_address"])[0]["personkey_keyint"] == 42

    def test_upsert_emits_markers_even_for_null_container(self):
        # FlattenTransformation.java:496-497 — marker emitted when container null
        c = self.c()
        batch = make_batch(
            [{"firstname": "a", "lastname": "b", "age": 1, "address": None}],
            PERSON, keys=[{"keyInt": 1}], key_type=self.KEY,
        )
        out = flatten_event_batch(self.plan(c), c, batch)
        assert len(rows(out["atopic_person_address"], "M")) == 1
        assert len(rows(out["atopic_person_address"], "I")) == 0
        m = rows(out["atopic_person"], "M")[0]
        assert m["personkey_keyint"] == 1 and m["firstname"] is None

    def test_tombstone_fans_out_to_all_tables(self):
        # JdbcSinkTaskTestPostgresArrayDelete.java:82-252
        c = self.c()
        batch = make_batch(
            [None], PERSON, keys=[{"keyInt": 9}], key_type=self.KEY,
        )
        out = flatten_event_batch(self.plan(c), c, batch)
        for t in ("atopic_person", "atopic_person_address"):
            d = rows(out[t], "D")
            assert len(d) == 1 and d[0]["personkey_keyint"] == 9
            assert not rows(out[t], "I") and not rows(out[t], "M")

    def test_tombstone_without_delete_enabled_raises(self):
        c = self.c(delete_enabled=False, insert_mode="insert", pk_mode="none", pk_fields=())
        batch = make_batch([None], PERSON)
        with pytest.raises(ValueError):
            flatten_event_batch(build_plan(c, "atopic", PERSON, "com.example.Person"), c, batch)

    def test_value_pk_propagation_values(self):
        # F-D :1069,1089 — ancestor values broadcast into child rows
        c = self.c(pk_propagate_value_fields=("person.firstname",))
        plan = self.plan(c)
        batch = make_batch(
            [{"firstname": "ann", "lastname": "b", "age": 1,
              "address": [{"street": "s1", "number": 1}, {"street": "s2", "number": 2}]}],
            PERSON, keys=[{"keyInt": 5}], key_type=self.KEY,
        )
        out = flatten_event_batch(plan, c, batch)
        child = rows(out["atopic_person_address"])
        assert [r["person_firstname"] for r in child] == ["ann", "ann"]


class TestDbTimezone:
    """db.timezone wall-clock rendering (JdbcSinkConfig.java:218-220,
    util/DateTimeUtils.java calendar binding)."""

    def test_fixed_offset(self):
        from kafka_connect_jdbc_flatten_ray.stages.kernel import to_wallclock

        arr = pa.array([1600000000000], pa.timestamp("ms"))  # 2020-09-13 12:26:40 UTC
        out = to_wallclock(arr, "+02:00")
        assert str(out[0]) == "2020-09-13 14:26:40"
        out = to_wallclock(arr, "-05:30")
        assert str(out[0]) == "2020-09-13 06:56:40"

    def test_named_zone_dst(self):
        from kafka_connect_jdbc_flatten_ray.stages.kernel import to_wallclock

        # Oslo is CEST (+2) in September, CET (+1) in January
        sept = pa.array([1600000000000], pa.timestamp("ms"))
        jan = pa.array([1610000000000], pa.timestamp("ms"))  # 2021-01-07 06:13:20 UTC
        assert str(to_wallclock(sept, "Europe/Oslo")[0]) == "2020-09-13 14:26:40"
        assert str(to_wallclock(jan, "Europe/Oslo")[0]) == "2021-01-07 07:13:20"


class TestKeyPartitionStabilityWarning:
    def test_warns_when_key_migrates_partitions(self):
        import warnings

        from kafka_connect_jdbc_flatten_ray.stages import merge as m
        from kafka_connect_jdbc_flatten_ray.stages.plan import (
            OFF_COL, OP_COL, PART_COL, OP_INSERT, OP_MARKER,
        )

        t = pa.table(
            {
                "k": pa.array(["a", "a", "b"]),
                "v": pa.array([1, 2, 3]),
                OP_COL: pa.array([OP_INSERT, OP_MARKER, OP_INSERT]),
                PART_COL: pa.array([0, 1, 0], pa.int32()),  # 'a' on two parts
                OFF_COL: pa.array([5, 1, 2], pa.int64()),
            }
        )
        m._warned_key_partition_instability = False
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            m.last_wins(t, ("k",))
        assert any("multiple kafka partitions" in str(x.message) for x in w)
        m._warned_key_partition_instability = False

"""F-I Avro corpus (optional chains + decimal logical type) and coordinate
configuration variants (reference avro/value.avsc, key.avsc;
coordinate names config JdbcSinkConfig.java:271-279)."""

from decimal import Decimal

import pyarrow as pa

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.stages.kernel import flatten_event_batch
from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

CHILD3 = pa.struct(
    [
        pa.field("CHILDLEVEL3STRING1", pa.string()),
        pa.field("CHILDLEVEL3STRING2", pa.string()),
        pa.field("CHILDLEVEL3DECIMAL", pa.decimal128(4, 2)),
    ]
)
CHILDRECORD = pa.struct(
    [
        pa.field("CHILDSTRING1", pa.string()),
        pa.field("CHILDSTRING2", pa.string()),
        pa.field("CHILDLIST", pa.list_(CHILD3)),
    ]
)
ROOTRECORD = pa.struct(
    [
        pa.field("ROOTSTRING1", pa.string()),
        pa.field("ROOTSTRING2", pa.string()),
        pa.field("CHILDRECORD", CHILDRECORD),
    ]
)
VALUE = pa.struct([pa.field("INT", pa.int32()), pa.field("ROOTRECORD", ROOTRECORD)])
KEY = pa.struct([pa.field("INT", pa.int32())])


def batch(values, keys, offsets, cfg_topic="avrotopic", value_type=None):
    n = len(values)
    return pa.table(
        {
            "topic": pa.array([cfg_topic] * n),
            "partition": pa.array([0] * n, pa.int32()),
            "offset": pa.array(offsets, pa.int64()),
            "timestamp": pa.array([1_600_000_000_000] * n, pa.timestamp("ms")),
            "timestamp_type": pa.array(["CreateTime"] * n),
            "key": pa.array(keys, KEY),
            "value": pa.array(values, value_type or VALUE),
        }
    )


def cfg(**kw):
    base = dict(pk_mode="flatten", pk_fields=("nestedtestkey.int",),
                insert_mode="insert", delete_enabled=False)
    base.update(kw)
    return SinkConfig(**base)


class TestAvroCorpus:
    def plan(self, c):
        return build_plan(c, "avrotopic", VALUE, "com.example.NestedTestValue",
                          KEY, "com.example.NestedTestKey")

    def test_tables_and_decimal(self):
        c = cfg()
        plan = self.plan(c)
        names = {tp.table for tp in plan.tables}
        assert names == {
            "avrotopic_nestedtestvalue",
            "avrotopic_nestedtestvalue_rootrecord_childrecord_childlist",
        }
        v = {
            "INT": 7,
            "ROOTRECORD": {
                "ROOTSTRING1": "r1",
                "ROOTSTRING2": "r2",
                "CHILDRECORD": {
                    "CHILDSTRING1": "c1",
                    "CHILDSTRING2": "c2",
                    "CHILDLIST": [
                        {"CHILDLEVEL3STRING1": "a", "CHILDLEVEL3STRING2": "b",
                         "CHILDLEVEL3DECIMAL": Decimal("12.34")},
                        {"CHILDLEVEL3STRING1": "c", "CHILDLEVEL3STRING2": "d",
                         "CHILDLEVEL3DECIMAL": Decimal("-0.07")},
                    ],
                },
            },
        }
        out = flatten_event_batch(plan, c, batch([v], [{"INT": 7}], [0]))
        child = [r for r in out[
            "avrotopic_nestedtestvalue_rootrecord_childrecord_childlist"
        ].to_pylist() if r["__op"] == "I"]
        assert [r["childlevel3decimal"] for r in child] == [
            Decimal("12.34"), Decimal("-0.07"),
        ]
        assert all(r["nestedtestkey_int"] == 7 for r in child)

    def test_optional_chain_nulls(self):
        # null ROOTRECORD -> root row with null nested columns, no child rows
        c = cfg()
        plan = self.plan(c)
        v = {"INT": 1, "ROOTRECORD": None}
        out = flatten_event_batch(plan, c, batch([v], [{"INT": 1}], [0]))
        root = [r for r in out["avrotopic_nestedtestvalue"].to_pylist()
                if r["__op"] == "I"]
        assert len(root) == 1
        assert root[0]["int"] == 1 and root[0]["rootstring1"] is None
        child = [r for r in out[
            "avrotopic_nestedtestvalue_rootrecord_childrecord_childlist"
        ].to_pylist() if r["__op"] == "I"]
        assert child == []


class TestLogicalTypes:
    def test_date_time_decimal_leaves(self):
        # Date/Time/Timestamp/Decimal logical types
        # (PostgreSqlDatabaseDialect.java:212-224 bind surface)
        import datetime as dt

        t = pa.struct(
            [
                pa.field("d", pa.date32()),
                pa.field("t", pa.time32("ms")),
                pa.field("ts", pa.timestamp("ms")),
                pa.field("dec", pa.decimal128(10, 3)),
            ]
        )
        c = cfg()
        plan = build_plan(c, "atopic", t, None)
        v = {
            "d": dt.date(2021, 3, 4),
            "t": dt.time(12, 34, 56),
            "ts": dt.datetime(2021, 3, 4, 12, 0, 0),
            "dec": Decimal("1234567.891"),
        }
        out = flatten_event_batch(plan, c, batch([v], [{"INT": 1}], [0], value_type=t))
        r = [x for x in out["atopic_root"].to_pylist() if x["__op"] == "I"][0]
        assert r["d"] == dt.date(2021, 3, 4)
        assert r["t"] == dt.time(12, 34, 56)
        assert r["ts"] == dt.datetime(2021, 3, 4, 12, 0)
        assert r["dec"] == Decimal("1234567.891")


class TestCoordinateVariants:
    def test_coordinates_disabled(self):
        c = cfg(flatten_coordinates=False)
        plan = build_plan(c, "t", pa.struct([pa.field("v", pa.string())]), None)
        assert [s.kind for s in plan.tables[0].columns] == ["leaf"]
        out = flatten_event_batch(
            plan, c,
            pa.table(
                {
                    "topic": pa.array(["t"]),
                    "partition": pa.array([0], pa.int32()),
                    "offset": pa.array([0], pa.int64()),
                    "timestamp": pa.array([0], pa.timestamp("ms")),
                    "timestamp_type": pa.array(["CreateTime"]),
                    "value": pa.array([{"v": "x"}], pa.struct([pa.field("v", pa.string())])),
                }
            ),
        )
        assert out["t_root"].column_names == ["v", "__op", "__part", "__off"]

    def test_custom_coordinate_names(self):
        c = cfg(coordinate_names=("c_topic", "c_part", "c_off", "c_ts", "c_tstype"))
        plan = build_plan(c, "t", pa.struct([pa.field("v", pa.string())]), None)
        coords = [s.name for s in plan.tables[0].columns if s.kind == "coord"]
        assert coords == ["c_topic", "c_part", "c_off", "c_ts", "c_tstype"]

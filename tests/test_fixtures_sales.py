"""F-E / F-F fixture scenarios: deep mixed nesting, primitive-array PK,
value-PK propagation scope, upsert clears with null containers, tombstones.

Oracle: JdbcSinkTaskTestPostgresArray.java:1708-1873 (sales upsert) and
JdbcSinkTaskTestPostgresArrayDelete.java:432-623 (bigger struct + rename +
tombstone). Uses the merge stage directly (single-process, no Ray session
needed) — the same code path map_groups executes.
"""

import pyarrow as pa

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.stages.kernel import flatten_event_batch
from kafka_connect_jdbc_flatten_ray.stages.merge import final_columns, last_wins
from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

EMPLOYEE = pa.struct([pa.field("id", pa.string()), pa.field("departmentNo", pa.string()),
                      pa.field("mobile", pa.string())])
STAFF = pa.struct([pa.field("supportType", pa.string()), pa.field("employee", EMPLOYEE)])
PAYMENT = pa.struct([pa.field("sumPayed", pa.string()), pa.field("id", pa.string()),
                     pa.field("productCodes", pa.list_(pa.string()))])
SALESINFO = pa.struct([pa.field("id", pa.string()), pa.field("staff", pa.list_(STAFF))])
SALESEVENT = pa.struct([pa.field("payment", PAYMENT), pa.field("companyNo", pa.string()),
                        pa.field("salesInfo", SALESINFO)])
SALESKEY = pa.struct([pa.field("salesNo", pa.string()), pa.field("customerNo", pa.string())])


def batch(values, keys, offsets, value_type=SALESEVENT, key_type=SALESKEY, topic="Sales"):
    n = len(values)
    return pa.table(
        {
            "topic": pa.array([topic] * n),
            "partition": pa.array([1] * n, pa.int32()),
            "offset": pa.array(offsets, pa.int64()),
            "timestamp": pa.array([1_600_000_000_000] * n, pa.timestamp("ms")),
            "timestamp_type": pa.array(["CreateTime"] * n),
            "key": pa.array(keys, key_type),
            "value": pa.array(values, value_type),
        }
    )


def merged(plan, cfg, evbatch):
    out = flatten_event_batch(plan, cfg, evbatch)
    return {
        tp.table: final_columns(last_wins(out[tp.table], tp.key_pk_cols)).to_pylist()
        for tp in plan.tables
    }


class TestSalesUpsert:
    CFG = SinkConfig(
        pk_mode="flatten",
        pk_fields=(
            "saleskey.salesno",
            "salesevent.payment.productcodes.productcodes",
            "salesevent.salesinfo.id",
            "salesevent.salesinfo.staff.staff.employee.id",
        ),
        pk_propagate_value_fields=("salesevent.payment.id",),
        insert_mode="upsert",
        delete_enabled=True,
    )

    def plan(self):
        return build_plan(self.CFG, "Sales", SALESEVENT, "salesEvent", SALESKEY, "salesKey")

    def events(self):
        key = {"salesNo": "132323", "customerNo": "9789789"}
        staff = lambda sid, dep, mob, st: {"supportType": st,
                                           "employee": {"id": sid, "departmentNo": dep, "mobile": mob}}
        e1 = {"payment": {"sumPayed": "1009.05", "id": "XZ-ZZSD23",
                          "productCodes": ["codeX", "codeY", "codeZ"]},
              "companyNo": "NO-122",
              "salesInfo": {"id": "1112", "staff": [
                  staff("232323", "34334", "+47 232334", "marketing"),
                  staff("3442", "2781", "+47 990332", "sales")]}}
        e2 = {"payment": {"sumPayed": "1009.05", "id": "XZ-ZZSD23", "productCodes": None},
              "companyNo": "NO-122",
              "salesInfo": {"id": "1112", "staff": None}}
        e3 = {"payment": {"sumPayed": "1009.05", "id": "XZ-ZZSD23", "productCodes": ["codeX"]},
              "companyNo": "NO-122",
              "salesInfo": {"id": "1112", "staff": [
                  staff("232323", "34334", "+47 232334", "marketing")]}}
        return batch([e1, e2, e3], [key] * 3, [1, 2, 3])

    def test_table_names(self):
        # :1825-1827
        names = {tp.table for tp in self.plan().tables}
        assert names == {
            "sales_salesevent",
            "sales_salesevent_salesinfo_staff",
            "sales_salesevent_payment_productcodes",
        }

    def test_pk_columns(self):
        plan = self.plan()
        tables = {tp.table: tp for tp in plan.tables}
        root = tables["sales_salesevent"]
        assert root.key_pk_cols == ("saleskey_salesno",)
        rnames = [c.name for c in root.columns]
        # id collision (payment.id / salesinfo.id) + PK -> full-path names
        assert "salesevent_payment_id" in rnames
        assert "salesevent_salesinfo_id" in rnames
        pcod = tables["sales_salesevent_payment_productcodes"]
        pnames = [c.name for c in pcod.columns]
        # primitive-array item PK, full path; propagated payment.id present
        assert "salesevent_payment_productcodes_productcodes" in pnames
        assert "salesevent_payment_id" in pnames
        staff_t = tables["sales_salesevent_salesinfo_staff"]
        snames = [c.name for c in staff_t.columns]
        assert "salesevent_salesinfo_staff_staff_employee_id" in snames
        # payment is NOT on the staff group path -> its pk does NOT propagate
        assert "salesevent_payment_id" not in snames

    def test_upsert_null_containers_clear_then_repopulate(self):
        # events 1..3 replayed: event2 clears children (null containers),
        # event3 repopulates one row each -> final counts 1/1/1 (:1841-1873)
        plan = self.plan()
        out = merged(plan, self.CFG, self.events())
        assert len(out["sales_salesevent"]) == 1
        assert len(out["sales_salesevent_salesinfo_staff"]) == 1
        assert len(out["sales_salesevent_payment_productcodes"]) == 1
        srow = out["sales_salesevent_salesinfo_staff"][0]
        assert srow["supporttype"] == "marketing"
        assert srow["salesevent_salesinfo_staff_staff_employee_id"] == "232323"
        prow = out["sales_salesevent_payment_productcodes"][0]
        assert prow["salesevent_payment_productcodes_productcodes"] == "codeX"
        assert prow["salesevent_payment_id"] == "XZ-ZZSD23"

    def test_after_event2_children_empty(self):
        plan = self.plan()
        ev = self.events().slice(0, 2)  # events 1 and 2 only
        out = merged(plan, self.CFG, ev)
        assert len(out["sales_salesevent"]) == 1
        assert len(out["sales_salesevent_salesinfo_staff"]) == 0
        assert len(out["sales_salesevent_payment_productcodes"]) == 0


class TestUpsertReplaceChildren:
    """F-D upsert scenario (JdbcSinkTaskTestPostgresArray.java:1375-1581):
    2 keys x 2 addresses, re-upserted -> 4 child rows, 2 root rows."""

    ADDRESS = pa.struct([pa.field("street", pa.string()), pa.field("number", pa.int8())])
    PERSON = pa.struct([
        pa.field("firstname", pa.string()),
        pa.field("float", pa.float32()),
        pa.field("address", pa.list_(ADDRESS)),
    ])
    PKEY = pa.struct([pa.field("keyInt", pa.int32()), pa.field("keyName", pa.string())])

    CFG = SinkConfig(
        pk_mode="flatten",
        pk_fields=("personkey.keyint", "person.address.address.street"),
        pk_propagate_value_fields=("person.float",),
        insert_mode="upsert",
        delete_enabled=True,
    )

    def test_reupsert_replaces_full_child_set(self):
        plan = build_plan(self.CFG, "atopic", self.PERSON, "com.example.Person",
                          self.PKEY, "com.example.PersonKey")
        k1 = {"keyInt": 1, "keyName": "a"}
        k2 = {"keyInt": 2, "keyName": "b"}
        p = lambda fn, fl, addrs: {"firstname": fn, "float": fl,
                                   "address": [{"street": s, "number": n} for s, n in addrs]}
        ev = batch(
            [
                p("ann", 1.5, [("s1", 1), ("s2", 2)]),
                p("bob", 2.5, [("t1", 1), ("t2", 2)]),
                # re-upsert both keys with different addresses
                p("ann2", 1.5, [("s3", 3), ("s4", 4)]),
                p("bob2", 2.5, [("t3", 3), ("t4", 4)]),
            ],
            [k1, k2, k1, k2],
            [1, 2, 3, 4],
            value_type=self.PERSON,
            key_type=self.PKEY,
            topic="atopic",
        )
        out = merged(plan, self.CFG, ev)
        root = out["atopic_person"]
        child = out["atopic_person_address"]
        assert len(root) == 2
        assert sorted(r["firstname"] for r in root) == ["ann2", "bob2"]
        assert len(child) == 4
        assert sorted(r["person_address_address_street"] for r in child) == [
            "s3", "s4", "t3", "t4",
        ]
        # propagated value-pk appears in child rows
        assert {r["person_float"] for r in child} == {1.5, 2.5}


class TestSalesRecordKeyPk:
    """pk.mode=record_key with flatten (JdbcSinkTaskTestPostgresArray.java
    :1877-2010): key fields become simply-named PK columns everywhere."""

    CFG = SinkConfig(
        pk_mode="record_key",
        pk_fields=("salesNo",),
        pk_propagate_value_fields=("salesevent.payment.id",),
        insert_mode="upsert",
        delete_enabled=True,
    )

    def test_key_columns_and_upsert(self):
        plan = build_plan(self.CFG, "Sales", SALESEVENT, "salesEvent",
                          SALESKEY, "salesKey")
        for tp in plan.tables:
            assert tp.key_pk_cols == ("salesno",)
        key = {"salesNo": "132323", "customerNo": "9789789"}
        e1 = {"payment": {"sumPayed": "1", "id": "X", "productCodes": ["a", "b"]},
              "companyNo": "NO", "salesInfo": {"id": "1", "staff": [
                  {"supportType": "m",
                   "employee": {"id": "e1", "departmentNo": "d", "mobile": "m"}}]}}
        e2 = {"payment": {"sumPayed": "1", "id": "X", "productCodes": ["c"]},
              "companyNo": "NO", "salesInfo": {"id": "1", "staff": [
                  {"supportType": "s",
                   "employee": {"id": "e2", "departmentNo": "d", "mobile": "m"}}]}}
        ev = batch([e1, e2], [key, key], [1, 2])
        out = merged(plan, self.CFG, ev)
        assert len(out["sales_salesevent"]) == 1
        assert out["sales_salesevent"][0]["salesno"] == "132323"
        staff = out["sales_salesevent_salesinfo_staff"]
        assert len(staff) == 1 and staff[0]["supporttype"] == "s"
        codes = out["sales_salesevent_payment_productcodes"]
        assert [r["productcodes"] for r in codes] == ["c"]
        assert codes[0]["salesno"] == "132323"


RECORD4 = pa.struct([pa.field("long", pa.int64()), pa.field("modified", pa.timestamp("ms"))])
RECORD3 = pa.struct([pa.field("string", pa.string()), pa.field("float", pa.float32())])
RECORD2 = pa.struct([pa.field("string", pa.string()), pa.field("float", pa.float32()),
                     pa.field("array3", pa.list_(RECORD4))])
MAINRECORD = pa.struct([
    pa.field("string1", pa.string()), pa.field("string2", pa.string()),
    pa.field("array1", pa.list_(pa.int32())),
    pa.field("array2", pa.list_(RECORD3)),
    pa.field("record2", RECORD2),
])


class TestBiggerStructDelete:
    """F-E + tombstone: renamed tables, delete clears all four
    (JdbcSinkTaskTestPostgresArrayDelete.java:432-623)."""

    CFG = SinkConfig(
        pk_mode="flatten",
        pk_fields=("mainrecordkey.key",),
        insert_mode="upsert",
        delete_enabled=True,
        rename_tables=(
            ("atopic_mainrecord", "biggerstruct_mr"),
            ("atopic_mainrecord_array1", "biggerstruct_array1"),
            ("atopic_mainrecord_array2", "biggerstruct_array2"),
            ("atopic_mainrecord_record2_array3", "biggerstruct_array3"),
        ),
    )
    KEY = pa.struct([pa.field("key", pa.int32())])

    def plan(self):
        return build_plan(self.CFG, "atopic", MAINRECORD, "com.example.Mainrecord",
                          self.KEY, "com.example.MainrecordKey")

    def test_renamed_tables(self):
        names = {tp.table for tp in self.plan().tables}
        assert names == {
            "biggerstruct_mr", "biggerstruct_array1",
            "biggerstruct_array2", "biggerstruct_array3",
        }

    def test_tombstone_clears_all_tables(self):
        plan = self.plan()
        v = {"string1": "a", "string2": "b", "array1": [1, 2],
             "array2": [{"string": "s", "float": 1.5}],
             "record2": {"string": "r", "float": 2.5,
                         "array3": [{"long": 7, "modified": 1_600_000_000_000}]}}
        ev = batch([v, None], [{"key": 9}, {"key": 9}], [1, 2],
                   value_type=MAINRECORD, key_type=self.KEY, topic="atopic")
        out = merged(plan, self.CFG, ev)
        for t in ("biggerstruct_mr", "biggerstruct_array1",
                  "biggerstruct_array2", "biggerstruct_array3"):
            assert out[t] == [], t

    def test_insert_then_populated(self):
        plan = self.plan()
        v = {"string1": "a", "string2": "b", "array1": [1, 2, 3],
             "array2": [{"string": "s", "float": 1.5}],
             "record2": {"string": "r", "float": 2.5,
                         "array3": [{"long": 7, "modified": 1_600_000_000_000}]}}
        ev = batch([v], [{"key": 9}], [1],
                   value_type=MAINRECORD, key_type=self.KEY, topic="atopic")
        out = merged(plan, self.CFG, ev)
        assert len(out["biggerstruct_mr"]) == 1
        assert [r["array1"] for r in out["biggerstruct_array1"]] == [1, 2, 3]
        assert out["biggerstruct_array2"][0]["string"] == "s"
        assert out["biggerstruct_array3"][0]["long"] == 7
        # every row carries the key pk
        assert out["biggerstruct_array3"][0]["mainrecordkey_key"] == 9

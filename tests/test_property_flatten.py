"""Property tests: the vectorized Arrow kernel must agree with the slow
per-row reference interpreter (tests/reference_flatten.py) on random nested
schemas, random values (with nulls), and random op sequences; and the
distributed last-wins merge must agree with naive sequential replay."""

import random

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.stages.kernel import flatten_event_batch
from kafka_connect_jdbc_flatten_ray.stages.merge import final_columns, last_wins
from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

from tests.reference_flatten import flatten_reference, replay_reference

PRIMS = [pa.int64(), pa.string(), pa.bool_(), pa.int32()]
NAMES = ["a", "b", "dup", "x", "longname"]


def random_type(rng: random.Random, depth: int) -> pa.DataType:
    if depth <= 0:
        return rng.choice(PRIMS)
    r = rng.random()
    if r < 0.45:
        return rng.choice(PRIMS)
    if r < 0.75:
        n = rng.randint(1, 3)
        names = rng.sample(NAMES, n)
        return pa.struct([pa.field(nm, random_type(rng, depth - 1)) for nm in names])
    if r < 0.9:
        return pa.list_(random_type(rng, depth - 1))
    return pa.map_(pa.string(), random_type(rng, depth - 1))


def ensure_has_leaf(t: pa.DataType) -> bool:
    if pa.types.is_struct(t):
        return any(ensure_has_leaf(f.type) for f in t)
    if pa.types.is_list(t):
        return ensure_has_leaf(t.value_type)
    if pa.types.is_map(t):
        return ensure_has_leaf(t.item_type)
    return True


def random_value(rng: random.Random, t: pa.DataType, null_p: float = 0.15):
    if rng.random() < null_p:
        return None
    if pa.types.is_struct(t):
        return {f.name: random_value(rng, f.type) for f in t}
    if pa.types.is_list(t):
        return [random_value(rng, t.value_type) for _ in range(rng.randint(0, 3))]
    if pa.types.is_map(t):
        n = rng.randint(0, 3)
        keys = rng.sample(["k1", "k2", "k3", "kk"], n)
        return [(k, random_value(rng, t.item_type)) for k in keys]
    if pa.types.is_string(t):
        return rng.choice(["s1", "s2", ""])
    if pa.types.is_boolean(t):
        return rng.choice([True, False])
    return rng.randint(-5, 5)


def row_key(row: dict) -> tuple:
    return tuple(sorted((k, repr(v)) for k, v in row.items()))


def multiset(rows: list[dict]):
    return sorted(row_key(r) for r in rows)


KEY_TYPE = pa.struct([pa.field("kid", pa.int64()), pa.field("kname", pa.string())])


def make_events(rng: random.Random, value_type, cfg, n):
    events = []
    for i in range(n):
        tomb = cfg.delete_enabled and rng.random() < 0.15
        if tomb:
            value = None
        else:
            # root non-null; nested nulls generated below the root
            value = {f.name: random_value(rng, f.type) for f in value_type}
        events.append(
            {
                "topic": "t",
                "partition": rng.randint(0, 2),
                "offset": i,
                "timestamp": None,
                "timestamp_type": "CreateTime",
                "key": {"kid": rng.randint(0, 3), "kname": rng.choice(["n1", "n2"])},
                "value": value,
            }
        )
    return events


def events_to_batch(events, value_type):
    return pa.table(
        {
            "topic": pa.array([e["topic"] for e in events]),
            "partition": pa.array([e["partition"] for e in events], pa.int32()),
            "offset": pa.array([e["offset"] for e in events], pa.int64()),
            "timestamp": pa.array([None] * len(events), pa.timestamp("ms")),
            "timestamp_type": pa.array([e["timestamp_type"] for e in events]),
            "key": pa.array([e["key"] for e in events], KEY_TYPE),
            "value": pa.array([e["value"] for e in events], value_type),
        }
    )


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 10**9))
def test_kernel_matches_reference_interpreter(seed):
    rng = random.Random(seed)
    # root must be a struct with at least one field
    while True:
        n = rng.randint(1, 3)
        names = rng.sample(NAMES, n)
        value_type = pa.struct(
            [pa.field(nm, random_type(rng, rng.randint(0, 3))) for nm in names]
        )
        if ensure_has_leaf(value_type):
            break
    upsert = rng.random() < 0.5
    mode_roll = rng.random()
    if mode_roll < 0.6:
        pk_mode, pk_fields = "flatten", ("keyrec.kid",)
    elif mode_roll < 0.85:
        pk_mode, pk_fields = "record_key", ("kid",)
    else:
        pk_mode, pk_fields = "flatten", ("keyrec.kid", "keyrec.kname")
    cfg = SinkConfig(
        pk_mode=pk_mode,
        pk_fields=pk_fields,
        insert_mode="upsert" if upsert else "insert",
        delete_enabled=upsert,
        flatten_coordinates=rng.random() < 0.7,
        uppercase=rng.random() < 0.2,
    )
    plan = build_plan(cfg, "t", value_type, "com.example.ValRec", KEY_TYPE,
                      "com.example.KeyRec")
    events = make_events(rng, value_type, cfg, rng.randint(1, 6))
    batch = events_to_batch(events, value_type)

    kernel_out = flatten_event_batch(plan, cfg, batch)
    ref_out = {tp.table: [] for tp in plan.tables}
    for e in events:
        one = flatten_reference(plan, cfg, e)
        for t, rows in one.items():
            ref_out[t].extend(rows)

    for tp in plan.tables:
        got = kernel_out[tp.table].to_pylist()
        want = ref_out[tp.table]
        assert multiset(got) == multiset(want), (
            seed, tp.table, got[:3], want[:3],
        )

    # and: distributed last-wins == naive sequential replay
    for tp in plan.tables:
        merged = final_columns(
            last_wins(kernel_out[tp.table], tp.key_pk_cols)
        ).to_pylist()
        naive = replay_reference({tp.table: ref_out[tp.table]}, tp.key_pk_cols)[tp.table]
        assert multiset(merged) == multiset(naive), (seed, tp.table)

"""Property test: the distributed passthrough sink (bucketed groupby +
Arrow-native merges) must agree with a naive sequential dict replay across
random configs (pk modes, insert/upsert/update, deletes, whitelists) and
random event streams."""

import random

import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

VT = pa.struct([
    pa.field("kid", pa.int64()),
    pa.field("name", pa.string()),
    pa.field("score", pa.int64()),
])
KT = pa.struct([pa.field("kid", pa.int64())])


def make_events(rng, n, with_tombstones):
    evs = []
    for i in range(n):
        kid = rng.randint(0, 4)
        tomb = with_tombstones and rng.random() < 0.2
        evs.append({
            "topic": "t",
            "partition": rng.randint(0, 2),
            "offset": i,
            "key": {"kid": kid},
            "value": None if tomb else {
                "kid": kid, "name": rng.choice(["a", "b", "c"]),
                "score": rng.randint(0, 9),
            },
        })
    return evs


def to_batch(evs):
    return pa.table({
        "topic": pa.array([e["topic"] for e in evs]),
        "partition": pa.array([e["partition"] for e in evs], pa.int32()),
        "offset": pa.array([e["offset"] for e in evs], pa.int64()),
        "timestamp": pa.array([0] * len(evs), pa.timestamp("ms")),
        "timestamp_type": pa.array(["CreateTime"] * len(evs)),
        "key": pa.array([e["key"] for e in evs], KT),
        "value": pa.array([e["value"] for e in evs], VT),
    })


def naive_replay(evs, cfg, initial_rows=None):
    """Sequential reference: apply events in (partition<<40|offset) order."""
    rank = lambda e: (e["partition"] << 40) | e["offset"]
    wl = set(cfg.fields_whitelist_lc)
    def project(v):
        out = {"kid": v["kid"]}
        for f in ("name", "score"):
            if not wl or f in wl:
                out[f] = v[f]
        return out
    if cfg.insert_mode == "insert":
        return [project(e["value"]) for e in sorted(evs, key=rank)
                if e["value"] is not None]
    state = {}
    allowed = None
    if cfg.insert_mode == "update":
        state = {r["kid"]: dict(r) for r in (initial_rows or [])}
        allowed = set(state)
    for e in sorted(evs, key=rank):
        kid = e["key"]["kid"]
        if e["value"] is None:
            if cfg.delete_enabled:
                state.pop(kid, None)
            continue
        if allowed is not None and kid not in allowed:
            continue
        state[kid] = project(e["value"])
    return list(state.values())


def multiset(rows):
    return sorted(tuple(sorted(r.items())) for r in rows)


SEEDS = list(range(40))


@pytest.mark.parametrize("seed", SEEDS)
def test_passthrough_matches_naive(ray_session, seed):
    rng = random.Random(seed)
    mode = rng.choice(["insert", "upsert", "update"])
    delete_enabled = mode == "upsert" and rng.random() < 0.6
    wl = ("name",) if rng.random() < 0.3 else ()
    cfg = SinkConfig(
        flatten=False, pk_mode="record_key", pk_fields=("kid",),
        insert_mode=mode, delete_enabled=delete_enabled,
        fields_whitelist=wl,
    )
    evs = make_events(rng, rng.randint(1, 12), delete_enabled)
    initial = None
    initial_rows = None
    if mode == "update":
        initial_rows = [
            {"kid": k, "name": "init", "score": 100 + k}
            for k in sorted({rng.randint(0, 4) for _ in range(3)})
        ]
        if wl:
            initial_rows = [{k: v for k, v in r.items() if k in ("kid",) + wl}
                            for r in initial_rows]
        initial = ray.data.from_items(initial_rows)
    got = passthrough_table(
        ray.data.from_arrow(to_batch(evs)), cfg, initial=initial
    ).take_all()
    want = naive_replay(evs, cfg, initial_rows)
    assert multiset(got) == multiset(want), (seed, mode, wl, delete_enabled)

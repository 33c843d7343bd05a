"""CLI: fold an event stream epoch-at-a-time through the incremental
window operators (sessions, as-of join, trailing counts) with
lake-resident state, then verify the folded results against the batch
operators over the same events.

    python scripts/run_streaming_windows.py --sf-dir /root/testdata/sf0.001 \
        --state /tmp/winstate [--epochs 3] [--num-cpus 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--state", default="/tmp/kcjf_winstate")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from kafka_connect_jdbc_flatten_ray.stages import streaming_windows as sw
    from kafka_connect_jdbc_flatten_ray.stages import windows as W

    t = pq.read_table(
        f"{args.sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"],
    )
    tsi = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
    qs = np.quantile(tsi, np.linspace(0, 1, args.epochs + 1)[1:-1])
    bounds = [tsi.min() - 1, *[int(q) for q in qs], tsi.max() + 1]
    for e in range(args.epochs):
        part = t.filter(pa.array((tsi > bounds[e]) & (tsi <= bounds[e + 1])))
        t0 = time.perf_counter()
        r1 = sw.sessionize_epoch(rd.from_arrow(part), args.state)
        r2 = sw.asof_epoch(rd.from_arrow(part), args.state)
        r3 = sw.trailing_epoch(rd.from_arrow(part), args.state)
        print(json.dumps({
            "epoch": e, "events": part.num_rows,
            "open_sessions": r1["open_sessions"],
            "closed_sessions": r1["closed_sessions"],
            "asof_rows": r2["joined_rows"], "trailing_rows": r3["rows"],
            "sec": round(time.perf_counter() - t0, 2),
        }))

    # streaming == batch, all three operators
    full = rd.from_arrow(t)
    checks = {
        "sessions": (sw.read_sessions(args.state).count(),
                     W.sessionize(full).count()),
        "asof": (sw.read_asof(args.state).count(),
                 W.asof_join_last_value(full).count()),
        "trailing": (sw.read_trailing(args.state).count(),
                     W.trailing_window_counts(full).count()),
    }
    ok = all(a == b for a, b in checks.values())
    print(json.dumps({"streaming_equals_batch": ok,
                      **{k: list(v) for k, v in checks.items()}}))
    ray.shutdown()
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

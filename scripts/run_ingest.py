"""CLI ingest driver — the `ray job submit` entry point.

    python scripts/run_ingest.py --sf-dir /root/testdata/sf0.01 \
        --lake /tmp/lake [--replicate 1] [--epochs 1] [--num-cpus 32]

Each invocation runs one (or more) checkpointed epochs; rerunning resumes
from the last committed checkpoint and is idempotent.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--lake", required=True)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--grow", action="store_true",
        help="micro-batch demo: epoch e sees replicate=e+1 (one new replica "
        "of the keyspace arrives per epoch; the checkpoint filter ingests "
        "only the new tail)",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    from kafka_connect_jdbc_flatten_ray.pipelines import ingest

    for e in range(args.epochs):
        rep = (e + 1) if args.grow else args.replicate
        t0 = time.perf_counter()
        res = ingest.run_epoch(args.sf_dir, args.lake, replicate=rep)
        res["sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()

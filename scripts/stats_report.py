"""Write STATS.md: per-operator Ray Data stats for the headline pipeline.

    python scripts/stats_report.py [replicate]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    import ray.data as rd

    rd.range(32000, override_num_blocks=32).map_batches(lambda b: b).count()

    from kafka_connect_jdbc_flatten_ray.pipelines import ingest
    from kafka_connect_jdbc_flatten_ray.stages.merge import MergeToLake

    sf = "/root/testdata/sf0.1"
    # untimed warm-up epoch (same as bench.py): spins flatten-plan caches,
    # zstd contexts and the shuffle workers so the recorded stats are warm
    # steady state, not first-touch overhead
    warm = tempfile.mkdtemp()
    ingest.run_epoch(sf, warm, replicate=10)
    cfg = ingest.default_config()
    plan = ingest.default_plan(cfg)
    key_cols = {tp.table: tp.key_pk_cols for tp in plan.tables}
    lake = tempfile.mkdtemp()
    t0 = time.perf_counter()
    env = ingest.flatten_envelopes(ingest.event_stream(sf, replicate=rep), cfg)
    stats_ds = env.groupby(["table", "bucket"]).map_groups(
        MergeToLake(lake, 0, key_cols, {}), batch_format="pyarrow"
    )
    stats_ds.take_all()
    sec = time.perf_counter() - t0
    with open("STATS.md", "w") as f:
        f.write(
            f"# Headline pipeline per-operator stats\n\n"
            f"sf0.1 × replicate={rep} ({10714 * rep:,} events), 32 CPUs, "
            f"push-based sort shuffle — total {sec:.2f}s "
            f"({10714 * rep / sec:,.0f} events/s).\n\n```\n"
        )
        f.write(stats_ds.stats())
        f.write("\n```\n")
    print(f"wrote STATS.md ({sec:.2f}s)")
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Small engine utilities."""

from __future__ import annotations


def default_pool(min_actors: int = 1) -> tuple[int, int]:
    """Actor-pool sizing matched to the cluster: cap at half the cluster's
    CPUs (leaving headroom for upstream reads and downstream writes) with a
    floor of 4 — hardcoding a small cap starves a large node/cluster, and
    claiming every CPU starves the other pipeline stages."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return (min_actors, max(4, cpus // 2))

"""Distributed mini k-means (Lloyd's) over an embedding Dataset — the
iterative-algorithm pattern on Ray Data:

- centroids broadcast once per iteration (``ray.put``; every task reads the
  same copy),
- assignment + per-centroid partial sums computed INSIDE ``map_batches``
  (the combiner: each batch emits at most k rows, so the driver reduce sees
  k x #batches tiny rows, never the vectors),
- the k-row model update happens on the driver (model averaging — the one
  legitimately driver-sized object in the loop).

Used to train IVF coarse centroids (stages/ann.py) instead of the
deterministic row-group sample; empty clusters re-seed from the running
mean. Deterministic given the seed/init."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from kafka_connect_jdbc_flatten_ray.util import default_pool, fsl_to_numpy


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


class _AssignPartial:
    """One batch -> (centroid id, count, vector sum) partial rows."""

    def __init__(self, cents_ref):
        self.cents = ray.get(cents_ref) if not isinstance(cents_ref, np.ndarray) else cents_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = fsl_to_numpy(batch.column("embedding"), np.float64)
        unit = _unit_rows(mat)
        k, dim = self.cents.shape
        assign = (unit @ self.cents.T).argmax(axis=1)
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros((k, dim), np.float64)
        np.add.at(sums, assign, unit)
        # also the within-batch inertia contribution (cosine distance)
        sims = (unit * self.cents[assign]).sum(axis=1)
        present = counts > 0
        return pa.table(
            {
                "cid": pa.array(np.flatnonzero(present).astype(np.int32)),
                "count": pa.array(counts[present].astype(np.int64)),
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums[present].reshape(-1)), dim
                ),
                "sim_sum": pa.array(
                    np.bincount(assign, weights=sims, minlength=k)[present]
                ),
            }
        )


def kmeans_fit(
    embeddings: ray.data.Dataset,
    dim: int,
    k: int,
    iters: int = 5,
    init: np.ndarray | None = None,
    seed: int = 13,
) -> tuple[np.ndarray, list[float]]:
    """Fit k unit-normalized centroids; returns (centroids, per-iteration
    mean cosine similarity — monotone non-decreasing for Lloyd's on the
    sphere up to re-seeding)."""
    if init is not None:
        cents = _unit_rows(np.asarray(init, np.float64))
    else:
        # Forgy init from points sampled ACROSS blocks (the head of an
        # ordered dataset is one stratum — sampling only it collapses
        # centroids): each batch contributes a few seeded rows, the driver
        # sees O(#batches) vectors, and k are drawn from that spread.
        def _sample(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.select(["embedding"])
            r = np.random.RandomState(seed ^ t.num_rows)
            idx = np.unique(r.randint(0, t.num_rows, size=3))
            return t.select(["embedding"]).take(pa.array(idx))

        pool = embeddings.map_batches(
            _sample, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        mat = np.asarray([np.asarray(p["embedding"], np.float64) for p in pool])
        rng = np.random.RandomState(seed)
        pick = rng.choice(len(mat), size=min(k, len(mat)), replace=False)
        cents = _unit_rows(mat[pick])
        if len(cents) < k:  # degenerate tiny datasets
            cents = np.vstack([cents, _unit_rows(rng.standard_normal((k - len(cents), dim)))])
    history: list[float] = []
    for _ in range(iters):
        cref = ray.put(cents)
        partial = embeddings.map_batches(
            _AssignPartial, fn_constructor_args=(cref,),
            batch_format="pyarrow", zero_copy_batch=True, concurrency=default_pool(),
        )
        rows = partial.take_all()  # <= k rows per batch (tiny model partials)
        counts = np.zeros(k, np.float64)
        sums = np.zeros((k, dim), np.float64)
        sim_total, n_total = 0.0, 0
        for r in rows:
            c = int(r["cid"])
            counts[c] += r["count"]
            sums[c] += np.asarray(r["vsum"], np.float64)
            sim_total += float(r["sim_sum"])
            n_total += int(r["count"])
        history.append(sim_total / max(1, n_total))
        new = np.where(
            counts[:, None] > 0, sums / np.maximum(counts[:, None], 1), cents
        )
        cents = _unit_rows(new)
    return cents, history


def group_mean_embeddings(
    embeddings: ray.data.Dataset, group: str = "label"
) -> ray.data.Dataset:
    """Per-group mean-pooled embedding (class centroids / label
    prototypes), long format (group, dim, mean_val) with mean_val rounded
    to 6 decimals — scalar rows the driver's hash compare and a SQL
    oracle can both express.

    100 TB shape: each batch pre-reduces to one (group, sum_vec, count)
    row per group (the combiner), so the exchange carries dim*8-byte
    partials per (group, batch), never vectors; the final fold is one
    tiny map_groups per group."""
    from kafka_connect_jdbc_flatten_ray.util import fsl_to_numpy

    def _partial(t: pa.Table) -> pa.Table:
        g = t.column(group).to_numpy(zero_copy_only=False)
        m = fsl_to_numpy(t.column("embedding"), np.float64)
        uniq, inv = np.unique(g, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "group": pa.array(uniq.astype(np.int64)),
            "sum_vec": pa.FixedSizeListArray.from_arrays(
                pa.array(sums.reshape(-1)), m.shape[1]),
            "n": pa.array(counts),
        })

    def _finish(t: pa.Table) -> pa.Table:
        grp = int(t.column("group")[0].as_py())
        sums = fsl_to_numpy(t.column("sum_vec"), np.float64).sum(axis=0)
        n = int(t.column("n").to_numpy(zero_copy_only=False).sum())
        mean = np.round(sums / n, 6)
        dim = len(mean)
        return pa.table({
            "label": pa.array(np.full(dim, grp, np.int64)),
            "dim": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
            "mean_val": pa.array(mean, pa.float64()),
        })

    _finish.__name__ = "centroid_finish"
    return embeddings.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("group").map_groups(_finish, batch_format="pyarrow")

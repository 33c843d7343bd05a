"""Exact distributed quantiles via histogram refinement.

Three bounded passes, no global sort (a full ``ds.sort`` is an
all-to-all exchange of every row; quantiles only need counts):

1. min/max + row count (per-batch combiner, one tiny row per batch);
2. fixed-width histogram over [min, max] (per-batch bincount partials,
   summed on the driver — kilobytes regardless of input size);
3. collect ONLY the values inside the bins that contain the requested
   ranks (a filter map_batches; each such bin holds a tiny fraction of
   the data when the histogram is fine enough), then select the exact
   rank element driver-side from that small set.

If a rank bin is pathologically overfull (heavily duplicated value), the
collect pass still returns exactly that bin's values — memory is bounded
by the largest duplicate run, which no exact method can avoid short of
counting duplicates; ``max_collect`` guards it loudly.

Matches DuckDB ``quantile_disc(col, q)``: the element at 1-based rank
``ceil(q * n)`` of the sorted values (verified in tests over random and
duplicate-heavy inputs).

``weight`` generalizes every pass to pre-counted values (one row per
distinct value carrying its multiplicity) — the read path of the
incremental quantile state (stages/streaming_quantiles.py), whose
answers must equal the unweighted batch pass over the raw rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

NUM_BINS = 8192
#: loud bound on driver-side rank-bin collection, counted in ROWS that
#: pass 3 would actually ship (in the weighted/counted-multiset path one
#: row per DISTINCT value, not per multiplicity — a single value with a
#: billion-count state row collects as ONE row)
MAX_COLLECT = 5_000_000


def _vals_weights(
    batch: pa.Table, column: str, weight: str | None
) -> tuple[np.ndarray, np.ndarray]:
    """NaN-filtered float64 values and their int64 multiplicities (all
    ones when ``weight`` is None)."""
    v = batch.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
    ok = ~np.isnan(v)
    if weight is None:
        w = np.ones(int(ok.sum()), np.int64)
    else:
        w = batch.column(weight).to_numpy(zero_copy_only=False).astype(np.int64)
        w = w[ok]
    return v[ok], w


def _minmax_count(batch: pa.Table, column: str, weight: str | None) -> pa.Table:
    v, w = _vals_weights(batch, column, weight)
    if not len(v):
        return pa.table({"lo": pa.array([], pa.float64()),
                         "hi": pa.array([], pa.float64()),
                         "n": pa.array([], pa.int64())})
    return pa.table({"lo": [float(v.min())], "hi": [float(v.max())],
                     "n": [int(w.sum())]})


def _hist_partial(
    batch: pa.Table, column: str, lo: float, width: float, weight: str | None
) -> pa.Table:
    v, w = _vals_weights(batch, column, weight)
    idx = np.clip(((v - lo) / width).astype(np.int64), 0, NUM_BINS - 1)
    # rows per bin (what pass 3 would collect); exact int64 either way
    rows = np.bincount(idx, minlength=NUM_BINS).astype(np.int64)
    if weight is None:
        counts = rows  # all-ones weights: multiplicity == row count
    else:
        # int64 accumulation (a float64-weighted bincount silently loses
        # exactness past 2^53 occurrences per bin)
        counts = np.zeros(NUM_BINS, np.int64)
        np.add.at(counts, idx, w)
    kind = pa.list_(pa.int64(), NUM_BINS)
    return pa.table({"counts": pa.array([counts], kind),
                     "rows": pa.array([rows], kind)})


def quantiles_exact(
    ds: ray.data.Dataset,
    column: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    weight: str | None = None,
) -> pd.DataFrame:
    """Exact ``quantile_disc`` values for ``qs`` over ``ds[column]``.

    ``weight`` names an int64 multiplicity column: each row then counts as
    ``weight`` occurrences of ``column`` (the counted-multiset layout of
    the incremental quantile state). Returns a DataFrame (q, value) — one
    row per requested quantile."""
    from kafka_connect_jdbc_flatten_ray.util import fsl_to_numpy

    # pass 1: bounds + count (tiny rows only reach the driver)
    mm = ds.map_batches(
        lambda t: _minmax_count(t, column, weight), batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    if not mm:
        return pd.DataFrame({"q": list(qs), "value": [np.nan] * len(qs)})
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)
    n = sum(r["n"] for r in mm)
    ranks = {q: int(np.ceil(q * n)) if q > 0 else 1 for q in qs}  # 1-based
    if hi == lo:
        return pd.DataFrame({"q": list(qs), "value": [lo] * len(qs)})
    width = (hi - lo) / NUM_BINS

    # pass 2: histogram partials (one NUM_BINS row per batch, summed here)
    parts = ds.map_batches(
        lambda t: _hist_partial(t, column, lo, width, weight),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    counts = np.zeros(NUM_BINS, np.int64)
    rows_hist = np.zeros(NUM_BINS, np.int64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        counts += fsl_to_numpy(b.column("counts"), np.int64).sum(axis=0)
        rows_hist += fsl_to_numpy(b.column("rows"), np.int64).sum(axis=0)
    cum = np.cumsum(counts)

    # which bins hold the requested ranks, and how many values precede them
    need_bins: dict[int, int] = {}
    for q, r in ranks.items():
        b = int(np.searchsorted(cum, r, side="left"))
        need_bins[b] = int(cum[b - 1]) if b else 0
    # bound on what pass 3 SHIPS: rows, not multiplicities — the weighted
    # (counted-multiset) path collects one row per distinct value, so an
    # already-pre-aggregated heavy duplicate never trips the guard
    if sum(rows_hist[b] for b in need_bins) > MAX_COLLECT:
        raise ValueError(
            f"rank bins hold > {MAX_COLLECT} rows (heavy duplication); "
            "raise MAX_COLLECT or pre-aggregate duplicates (weight=)"
        )

    # pass 3: collect only the rank bins' values
    bset = np.array(sorted(need_bins), np.int64)

    def _collect(t: pa.Table) -> pa.Table:
        v, w = _vals_weights(t, column, weight)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, NUM_BINS - 1)
        sel = np.isin(idx, bset)
        return pa.table({"value": pa.array(v[sel], pa.float64()),
                         "bin": pa.array(idx[sel], pa.int64()),
                         "w": pa.array(w[sel], pa.int64())})

    vparts, bparts, wparts = [], [], []
    for b in ds.map_batches(_collect, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        vparts.append(b.column("value").to_numpy(zero_copy_only=False))
        bparts.append(b.column("bin").to_numpy(zero_copy_only=False))
        wparts.append(b.column("w").to_numpy(zero_copy_only=False))
    vals_all = np.concatenate(vparts) if vparts else np.empty(0)
    bins_all = np.concatenate(bparts) if bparts else np.empty(0, np.int64)
    ws_all = np.concatenate(wparts) if wparts else np.empty(0, np.int64)
    out = []
    for q, r in ranks.items():
        b = int(np.searchsorted(cum, r, side="left"))
        in_bin = bins_all == b
        order = np.argsort(vals_all[in_bin], kind="stable")
        vals = vals_all[in_bin][order]
        wcum = np.cumsum(ws_all[in_bin][order])
        # first sorted element whose cumulative multiplicity reaches the
        # rank's offset inside the bin == the unweighted vals[r-prec-1]
        pos = int(np.searchsorted(wcum, r - need_bins[b], side="left"))
        out.append((q, float(vals[pos])))
    return pd.DataFrame({"q": [o[0] for o in out],
                         "value": [o[1] for o in out]})

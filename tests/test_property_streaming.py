"""Property tests for the incremental-state equivalence contract: for ANY
input multiset and ANY partition of it into epochs (any order), folding
the epochs must give the batch answer — the commutative-fold guarantee
the streaming operators are built on."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_jdbc_flatten_ray.stages import (
    streaming_dedup as sd,
    streaming_quantiles as sq,
)
from kafka_connect_jdbc_flatten_ray.stages.dedup import dedup_exact
from kafka_connect_jdbc_flatten_ray.stages.quantiles import quantiles_exact

_SETTINGS = settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

QS = (0.25, 0.5, 0.9)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=4, max_size=120),
    assign=st.lists(st.integers(0, 2), min_size=4, max_size=120),
    order=st.permutations([0, 1, 2]),
)
@_SETTINGS
def test_quantile_folds_equal_batch_for_any_split(ray_session, tmp_path_factory,
                                                  vals, assign, order):
    v = np.asarray(vals, np.float64)
    a = np.resize(np.asarray(assign), len(v))
    root = str(tmp_path_factory.mktemp("qprop"))
    for part in order:
        sub = v[a == part]
        if not len(sub):
            continue
        sq.value_counts_epoch(
            ray.data.from_arrow(pa.table({"value": pa.array(sub)})),
            root, "value", num_buckets=4)
    inc = sq.quantiles_from_state(root, QS)
    batch = quantiles_exact(
        ray.data.from_arrow(pa.table({"value": pa.array(v)})), "value", QS)
    assert inc.equals(batch)


@given(
    texts=st.lists(st.text(alphabet="abc ", min_size=0, max_size=12),
                   min_size=3, max_size=60),
    assign=st.lists(st.integers(0, 2), min_size=3, max_size=60),
    order=st.permutations([0, 1, 2]),
)
@_SETTINGS
def test_dedup_folds_equal_batch_for_any_split(ray_session, tmp_path_factory,
                                               texts, assign, order):
    ids = np.arange(len(texts), dtype=np.int64)
    a = np.resize(np.asarray(assign), len(ids))
    tbl = pa.table({"doc_id": pa.array(ids),
                    "text": pa.array(texts, pa.string())})
    root = str(tmp_path_factory.mktemp("ddprop"))
    for part in order:
        sub = tbl.filter(pa.array(a == part))
        if not sub.num_rows:
            continue
        sd.dedup_exact_epoch(ray.data.from_arrow(sub), root, num_buckets=4)
    inc = sorted(r["doc_id"] for r in sd.read_keepers(root).take_all())
    batch = sorted(r["doc_id"]
                   for r in dedup_exact(ray.data.from_arrow(tbl)).take_all())
    assert inc == batch

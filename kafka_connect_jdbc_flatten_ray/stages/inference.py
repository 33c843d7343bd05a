"""Batched model-inference stage pattern: a callable CLASS for an actor
pool — the model loads ONCE per actor in ``__init__`` (the expensive step:
weights from disk/object store), and ``__call__`` scores whole Arrow
batches vectorized.

No ML runtime ships in this container, so the bundled model is a
deterministic linear scorer over text statistics (a stand-in with real
weights-loading mechanics — swap ``_load_weights`` for a real
torch/onnx load and the Ray-side plumbing is unchanged). Because the stub
is pure arithmetic it has an exact SQL oracle, so the stage is value-hash
verified end to end."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.util import default_pool

# the "published" model: weights over [n_chars, n_tokens, punct_ratio, 1]
_WEIGHTS = (0.0003, 0.02, -1.5, 0.1)


class QualityModel:
    """Actor-pool inference stage: doc batches -> quality scores.

    batch_size tuning note: scores are cheap, so large batches amortize
    dispatch; a real transformer would instead bound batch_size by
    sequence-length x memory.
    """

    def __init__(self, weights_ref=None):
        # once per actor: fetch weights from the object store (or load a
        # checkpoint file in a real deployment)
        import ray

        if weights_ref is None:
            self.w = np.array(_WEIGHTS, np.float64)
        else:
            self.w = np.asarray(ray.get(weights_ref), np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        n_tokens = pc.list_value_length(pc.split_pattern(text, " ")).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        stripped = pc.replace_substring_regex(text, "[A-Za-z0-9 ]", "")
        punct = pc.utf8_length(stripped).to_numpy(zero_copy_only=False).astype(np.float64)
        punct_ratio = punct / np.maximum(n_chars, 1.0)
        z = (
            self.w[0] * n_chars
            + self.w[1] * n_tokens
            + self.w[2] * punct_ratio
            + self.w[3]
        )
        score = 1.0 / (1.0 + np.exp(-z))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "quality_score": pa.array(np.round(score, 6)),
                "keep": pa.array(score >= 0.5),
            }
        )


def score_quality(docs: ray.data.Dataset, concurrency=None) -> ray.data.Dataset:
    """Run the quality model as an actor pool (weights broadcast once)."""
    import ray

    if concurrency is None:
        concurrency = default_pool()  # resolved at call time, post-ray.init
    wref = ray.put(list(_WEIGHTS))
    return docs.map_batches(
        QualityModel,
        fn_constructor_args=(wref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
        concurrency=concurrency,
    )

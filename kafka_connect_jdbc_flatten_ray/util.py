"""Small engine utilities."""

from __future__ import annotations


def fsl_to_numpy(col, dtype=None):
    """Flatten a fixed-size-list column to a 2-D numpy array [n, width],
    correctly for SLICED arrays: ``Array.values`` ignores slice offsets
    (it returns the whole child buffer), so a Ray block handed to us as a
    non-zero-offset slice would misalign or over-read. ``flatten()`` is
    offset-aware. Accepts a ChunkedArray or Array."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if pa.types.is_fixed_size_list(col.type):
        width = col.type.list_size
        assert len(flat) == n * width, "fixed-size-list flatten misaligned"
    elif n == 0:
        # empty block (Ray emits them after filters / skewed splits): no
        # rows to infer the width from — [0, 0] keeps matmul-shaped callers
        # total-row-count-correct without a crash
        width = 0
    else:  # variable list<T> with uniform element count (e.g. embeddings)
        assert len(flat) % n == 0, "ragged list column"
        width = len(flat) // n
    mat = np.asarray(flat).reshape(n, width)
    return mat.astype(dtype) if dtype is not None else mat


def pandas_to_arrow(df, schema=None):
    """``pa.Table.from_pandas`` minus the ``b'pandas'`` schema metadata.

    That metadata blob makes ``hash(schema)`` raise (its reconstruction
    dict is unhashable), which defeats Ray's block-schema deduplication
    and spams ``Failed to hash the schemas`` from every stage that reads
    a file written this way. All engine writes/returns of pandas frames
    go through here so lake files and map_groups outputs carry clean,
    hashable Arrow schemas."""
    import pyarrow as pa

    t = pa.Table.from_pandas(df, preserve_index=False, schema=schema)
    return t.replace_schema_metadata(None)


def _strip_schema_metadata(t):
    return t.replace_schema_metadata(None)


def read_parquet_clean(*args, **kwargs):
    """``ray.data.read_parquet`` plus a fused, metadata-only strip stage.

    Parquet files written through pandas carry a ``b'pandas'`` schema
    metadata blob that makes ``hash(schema)`` raise, defeating Ray's
    block-schema deduplication (`Failed to hash the schemas` warned from
    every downstream shuffle reduce). The strip is
    ``replace_schema_metadata(None)`` — zero-copy, fused into the read."""
    import ray.data

    strip_args = {}
    if "strip_max_retries" in kwargs:
        # match downstream stages' remote args so Ray still fuses the
        # whole read->strip->transform chain into one task
        strip_args["max_retries"] = kwargs.pop("strip_max_retries")
    return ray.data.read_parquet(*args, **kwargs).map_batches(
        _strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True,
        **strip_args,
    )


def arrowize(fn):
    """Wrap a pandas-returning ``map_groups`` function so its output block
    is a clean Arrow table (see :func:`pandas_to_arrow`): the group logic
    stays vectorized pandas, but downstream stages and shuffle reduces see
    hashable, metadata-free schemas and zero-copy Arrow blocks."""

    def wrapped(g):
        return pandas_to_arrow(fn(g))

    wrapped.__name__ = getattr(fn, "__name__", "arrowized")
    return wrapped


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

"""fsl_to_numpy: offset-aware fixed-size-list flattening (ADVICE round-2
items — `Array.values` ignores slice offsets, so a Ray block handed to a
kernel as a non-zero-offset slice would misalign or over-read)."""

import numpy as np
import pyarrow as pa

from kafka_connect_jdbc_flatten_ray.util import fsl_to_numpy


def _fsl(mat: np.ndarray) -> pa.Array:
    n, w = mat.shape
    return pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), w)


class TestFslToNumpy:
    def test_round_trip(self):
        mat = np.arange(24, dtype=np.float64).reshape(6, 4)
        out = fsl_to_numpy(_fsl(mat))
        np.testing.assert_array_equal(out, mat)

    def test_sliced_array_respects_offset(self):
        mat = np.arange(24, dtype=np.float64).reshape(6, 4)
        arr = _fsl(mat)
        sl = arr.slice(2, 3)  # rows 2..4 — `.values` would return ALL 24
        out = fsl_to_numpy(sl)
        np.testing.assert_array_equal(out, mat[2:5])

    def test_sliced_survives_combine_chunks(self):
        mat = np.arange(40, dtype=np.int64).reshape(10, 4)
        ch = pa.chunked_array([_fsl(mat).slice(3, 4)])
        out = fsl_to_numpy(ch)
        np.testing.assert_array_equal(out, mat[3:7])

    def test_dtype_cast(self):
        mat = np.arange(8, dtype=np.int64).reshape(2, 4)
        out = fsl_to_numpy(_fsl(mat), np.float32)
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, mat.astype(np.float32))

    def test_slice_zero(self):
        mat = np.arange(8, dtype=np.float64).reshape(2, 4)
        out = fsl_to_numpy(_fsl(mat).slice(0, 1))
        np.testing.assert_array_equal(out, mat[:1])


class TestStatsFallback:
    def test_stats_max_without_statistics(self, tmp_path):
        """Parquet written with statistics disabled must fall back to a
        one-column scan instead of raising AttributeError."""
        import pyarrow.parquet as pq

        from kafka_connect_jdbc_flatten_ray.sources.multi_tail import _stats_max

        path = str(tmp_path / "nostats.parquet")
        t = pa.table({"inc": pa.array([5, 9, 3], pa.int64()),
                      "v": ["a", "b", "c"]})
        pq.write_table(t, path, write_statistics=False)
        assert _stats_max(path, "inc") == 9

    def test_stats_max_with_statistics(self, tmp_path):
        import pyarrow.parquet as pq

        from kafka_connect_jdbc_flatten_ray.sources.multi_tail import _stats_max

        path = str(tmp_path / "stats.parquet")
        pq.write_table(pa.table({"inc": pa.array([5, 9, 3], pa.int64())}), path)
        assert _stats_max(path, "inc") == 9

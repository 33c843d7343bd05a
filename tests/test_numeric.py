"""Table-driven test of the NUMERIC best-fit mapping, mirroring the Java
switch in GenericDatabaseDialect.java:1050-1101 case by case."""

import pyarrow as pa
import pytest

from kafka_connect_jdbc_flatten_ray.functions.numeric import numeric_type


class TestBestFit:
    @pytest.mark.parametrize(
        "precision,scale,expected",
        [
            (1, 0, pa.int8()), (2, 0, pa.int8()),
            (3, 0, pa.int16()), (4, 0, pa.int16()),
            (5, 0, pa.int32()), (9, 0, pa.int32()),
            (10, 0, pa.int64()), (18, 0, pa.int64()),
            # negative scale still integer down to SCALE_LOW
            (9, -5, pa.int32()), (18, -84, pa.int64()),
            # positive scale -> double
            (5, 2, pa.float64()), (18, 17, pa.float64()),
            # precision >= 19 -> Decimal
            (19, 0, pa.decimal128(19, 0)), (38, 10, pa.decimal128(38, 10)),
            # scale below SCALE_LOW falls through to Decimal (clamped >= 0)
            (9, -100, pa.decimal128(9, 0)),
        ],
    )
    def test_switch(self, precision, scale, expected):
        assert numeric_type(precision, scale, "best_fit") == expected


class TestPrecisionOnly:
    @pytest.mark.parametrize(
        "precision,scale,expected",
        [
            (2, 0, pa.int8()), (4, 0, pa.int16()), (9, 0, pa.int32()),
            (18, 0, pa.int64()),
            # any nonzero scale -> Decimal in precision_only mode
            (9, 2, pa.decimal128(9, 2)),
            (19, 0, pa.decimal128(19, 0)),
        ],
    )
    def test_switch(self, precision, scale, expected):
        assert numeric_type(precision, scale, "precision_only") == expected


class TestNoneMode:
    def test_always_decimal(self):
        assert numeric_type(5, 0, "none") == pa.decimal128(5, 0)
        assert numeric_type(18, 2, "none") == pa.decimal128(18, 2)

    def test_scale_unset_sentinel_maps_to_high_clamped(self):
        # decimalScale: UNSET (-127) -> SCALE_HIGH (127), clamped to arrow's
        # scale <= precision envelope
        assert numeric_type(10, -127, "none") == pa.decimal128(10, 10)

    def test_bad_mode(self):
        with pytest.raises(ValueError):
            numeric_type(5, 0, "bogus")

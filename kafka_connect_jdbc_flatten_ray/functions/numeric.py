"""NUMERIC precision best-fit mapping (S7 completion).

Pure-function reproduction of the reference source connector's
``numeric.mapping`` schema synthesis:

- modes: ``none`` | ``precision_only`` | ``best_fit``
  (JdbcSourceConnectorConfig.java:767-801 ``NumericMapping``)
- the precision/scale switch: GenericDatabaseDialect.java:1050-1101
  (NUMERIC case of ``addFieldToSchema``), including the
  ``decimalScale`` UNSET sentinel handling (:1431-1433).

Used when synthesizing Arrow schemas for numeric source columns; Connect's
``Decimal`` logical type maps to ``pa.decimal128``.
"""

from __future__ import annotations

import pyarrow as pa

NUMERIC_TYPE_SCALE_LOW = -84
NUMERIC_TYPE_SCALE_HIGH = 127
NUMERIC_TYPE_SCALE_UNSET = -127

MODES = ("none", "precision_only", "best_fit")


def _int_by_precision(precision: int) -> pa.DataType:
    # GenericDatabaseDialect.java:1054-1063 / 1071-1080
    if precision > 9:
        return pa.int64()
    if precision > 4:
        return pa.int32()
    if precision > 2:
        return pa.int16()
    return pa.int8()


def _decimal(precision: int, scale: int) -> pa.DataType:
    # Decimal.builder(decimalScale(defn)) — :1092-1101, :1431-1433
    if scale == NUMERIC_TYPE_SCALE_UNSET:
        scale = NUMERIC_TYPE_SCALE_HIGH
    # arrow decimal128 requires 0 <= scale <= precision <= 38; Connect's
    # byte-backed Decimal has no such bound, so clamp to the representable
    # envelope (documented deviation for out-of-range JDBC metadata)
    precision = min(max(precision, 1), 38)
    scale = min(max(scale, 0), precision)
    return pa.decimal128(precision, scale)


def numeric_type(precision: int, scale: int, mode: str = "best_fit") -> pa.DataType:
    """Arrow type for a JDBC NUMERIC(precision, scale) column under the
    given ``numeric.mapping`` mode. Mirrors the Java switch exactly:

    - precision_only: scale == 0 and precision < 19 -> smallest int
    - best_fit: precision < 19 and SCALE_LOW <= scale < 1 -> smallest int;
                precision < 19 and scale > 0 -> float64
    - anything else (and mode none) -> Decimal(decimalScale)
    """
    if mode not in MODES:
        raise ValueError(f"numeric.mapping must be one of {MODES}, got {mode}")
    if mode == "precision_only":
        if scale == 0 and precision < 19:
            return _int_by_precision(precision)
    elif mode == "best_fit":
        if precision < 19:
            if NUMERIC_TYPE_SCALE_LOW <= scale < 1:
                return _int_by_precision(precision)
            if scale > 0:
                return pa.float64()
    return _decimal(precision, scale)

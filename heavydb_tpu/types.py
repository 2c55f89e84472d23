"""SQL type system for the TPU engine.

Equivalent role to the reference's `Shared/sqltypes.h` (SQLTypeInfo) and
`Shared/InlineNullValues.h`: logical SQL types, their on-device physical
dtypes, and sentinel ("inline") null values.

Design notes (TPU-first):
- Nulls are stored as in-band sentinels (the minimum value of the integer
  physical type; NaN for floats) exactly like HeavyDB's inline nulls, so a
  column is ONE dense device array — no validity bitmaps in storage.  The
  expression compiler derives validity masks on the fly; XLA fuses the
  compare into the consuming op.
- DECIMAL is a scaled int64 (HeavyDB: Shared/sqltypes.h kDECIMAL with
  scale/precision); arithmetic rescales like the reference's analyzer.
- TEXT defaults to 32-bit dictionary encoding (HeavyDB: kENCODING_DICT),
  so string columns are int32 id arrays on device; the dictionary lives on
  the host (storage/string_dict.py).
- DATE is int32/int64 days-since-epoch (HeavyDB kENCODING_DATE_IN_DAYS),
  TIME is int64 seconds-since-midnight, TIMESTAMP is int64 at a power-of-ten
  precision (0/3/6/9 → s/ms/us/ns).
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field, replace
from typing import Any, Optional

import numpy as np


class SQLTypeKind(enum.Enum):
    BOOLEAN = "BOOLEAN"
    TINYINT = "TINYINT"
    SMALLINT = "SMALLINT"
    INT = "INTEGER"
    BIGINT = "BIGINT"
    FLOAT = "FLOAT"
    DOUBLE = "DOUBLE"
    DECIMAL = "DECIMAL"
    TEXT = "TEXT"
    DATE = "DATE"
    TIME = "TIME"
    TIMESTAMP = "TIMESTAMP"
    NULLT = "NULL"  # type of a bare NULL literal
    # geospatial (reference Shared/sqltypes.h kPOINT..kMULTIPOLYGON);
    # stored as flat f64 coordinate payloads via the array machinery
    GEO_POINT = "POINT"
    GEO_LINESTRING = "LINESTRING"
    GEO_POLYGON = "POLYGON"
    GEO_MULTIPOLYGON = "MULTIPOLYGON"


class Encoding(enum.Enum):
    NONE = "NONE"
    DICT = "DICT"  # dictionary-encoded string (int32 ids)
    FIXED = "FIXED"  # fixed-width narrowing (e.g. BIGINT ENCODING FIXED(32))
    DAYS = "DAYS"  # date in days
    GEOINT = "GEOINT"  # compressed WGS84 coords (int32 fixed-point)


_INT_KINDS = {
    SQLTypeKind.TINYINT,
    SQLTypeKind.SMALLINT,
    SQLTypeKind.INT,
    SQLTypeKind.BIGINT,
}
_FLOAT_KINDS = {SQLTypeKind.FLOAT, SQLTypeKind.DOUBLE}
_TIME_KINDS = {SQLTypeKind.DATE, SQLTypeKind.TIME, SQLTypeKind.TIMESTAMP}
_GEO_KINDS = {
    SQLTypeKind.GEO_POINT, SQLTypeKind.GEO_LINESTRING,
    SQLTypeKind.GEO_POLYGON, SQLTypeKind.GEO_MULTIPOLYGON,
}


@dataclass(frozen=True)
class TypeInfo:
    """Logical SQL type + physical encoding. Analogue of SQLTypeInfo."""

    kind: SQLTypeKind
    nullable: bool = True
    precision: int = 0  # DECIMAL precision, TIMESTAMP sub-second digits
    scale: int = 0  # DECIMAL scale
    encoding: Encoding = Encoding.NONE
    comp_param: int = 0  # dict id for DICT, bit width for FIXED
    # ARRAY column of this element type (reference sqltypes.h kARRAY with
    # subtype; stored as per-row variable-length lists, ArrayNoneEncoder)
    is_array: bool = False

    def elem_type(self) -> "TypeInfo":
        """Element TypeInfo of an array type."""
        return replace(self, is_array=False)

    def as_array(self) -> "TypeInfo":
        return replace(self, is_array=True)

    # ---- classification ----
    @property
    def is_integer(self) -> bool:
        return self.kind in _INT_KINDS and not self.is_array

    @property
    def is_fp(self) -> bool:
        return self.kind in _FLOAT_KINDS and not self.is_array

    @property
    def is_decimal(self) -> bool:
        return self.kind == SQLTypeKind.DECIMAL and not self.is_array

    @property
    def is_number(self) -> bool:
        return (self.is_integer or self.is_fp or self.is_decimal) \
            and not self.is_array

    @property
    def is_string(self) -> bool:
        return self.kind == SQLTypeKind.TEXT and not self.is_array

    @property
    def is_dict_string(self) -> bool:
        return (self.kind == SQLTypeKind.TEXT
                and self.encoding == Encoding.DICT and not self.is_array)

    @property
    def is_none_string(self) -> bool:
        """TEXT ENCODING NONE (reference kENCODING_NONE): raw strings in
        storage, lazily interned into a per-generation dictionary at
        query time (the StringDictionaryProxy role) so every dictionary
        string kernel applies unchanged."""
        return (self.kind == SQLTypeKind.TEXT
                and self.encoding == Encoding.NONE and not self.is_array)

    @property
    def is_time(self) -> bool:
        return self.kind in _TIME_KINDS and not self.is_array

    @property
    def is_boolean(self) -> bool:
        return self.kind == SQLTypeKind.BOOLEAN

    @property
    def is_geo(self) -> bool:
        return self.kind in _GEO_KINDS

    @property
    def is_geo_compressed(self) -> bool:
        """GEOINT32 fixed-point coordinate payload (reference
        kENCODING_GEOINT, comp 32)."""
        return self.kind in _GEO_KINDS and self.encoding == Encoding.GEOINT

    @property
    def is_null_type(self) -> bool:
        return self.kind == SQLTypeKind.NULLT

    # ---- physical representation ----
    def np_dtype(self) -> np.dtype:
        """Physical numpy/JAX dtype of the stored column."""
        if self.is_array:
            # device handle of an array column: the global rowid (int32);
            # lengths/offsets/flat values ride as aux arrays (ArrayFn)
            return np.dtype(np.int32)
        if self.encoding == Encoding.FIXED and self.comp_param in (8, 16, 32):
            # fixed-width narrowing (reference kENCODING_FIXED): logical
            # type stays (BIGINT...), storage/device dtype narrows
            return np.dtype(f"int{self.comp_param}")
        k = self.kind
        if k == SQLTypeKind.BOOLEAN:
            return np.dtype(np.int8)
        if k == SQLTypeKind.TINYINT:
            return np.dtype(np.int8)
        if k == SQLTypeKind.SMALLINT:
            return np.dtype(np.int16)
        if k == SQLTypeKind.INT:
            return np.dtype(np.int32)
        if k == SQLTypeKind.BIGINT:
            return np.dtype(np.int64)
        if k == SQLTypeKind.FLOAT:
            return np.dtype(np.float32)
        if k == SQLTypeKind.DOUBLE:
            return np.dtype(np.float64)
        if k == SQLTypeKind.DECIMAL:
            return np.dtype(np.int64)
        if k == SQLTypeKind.TEXT:
            # dict ids; none-encoded TEXT also EXECUTES as int32 ids of
            # its lazily-built dictionary (storage stays raw strings)
            return np.dtype(np.int32)
        if k == SQLTypeKind.DATE:
            return np.dtype(np.int32)  # days since epoch
        if k == SQLTypeKind.TIME:
            return np.dtype(np.int64)  # seconds since midnight
        if k == SQLTypeKind.TIMESTAMP:
            return np.dtype(np.int64)
        if k in _GEO_KINDS:
            return np.dtype(np.float64)  # coordinate element
        raise TypeError(f"no physical dtype for {k}")

    def null_sentinel(self):
        """In-band null value (HeavyDB Shared/InlineNullValues.h semantics)."""
        dt = self.np_dtype()
        if dt.kind == "f":
            return np.nan
        return int(np.iinfo(dt).min)

    # ---- display ----
    def sql_name(self) -> str:
        if self.is_array:
            if self.kind in _GEO_KINDS:
                srid = f", {self.comp_param}" if self.comp_param else ""
                return f"GEOMETRY({self.kind.value}{srid})"
            return self.elem_type().sql_name() + "[]"
        if self.kind == SQLTypeKind.DECIMAL:
            return f"DECIMAL({self.precision},{self.scale})"
        if self.kind == SQLTypeKind.TIMESTAMP and self.precision:
            return f"TIMESTAMP({self.precision})"
        return self.kind.value

    def with_nullable(self, nullable: bool) -> "TypeInfo":
        return replace(self, nullable=nullable)

    def __str__(self) -> str:
        return self.sql_name() + ("" if self.nullable else " NOT NULL")


# Convenience constructors
def boolean(nullable=True):
    return TypeInfo(SQLTypeKind.BOOLEAN, nullable)


def tinyint(nullable=True):
    return TypeInfo(SQLTypeKind.TINYINT, nullable)


def smallint(nullable=True):
    return TypeInfo(SQLTypeKind.SMALLINT, nullable)


def integer(nullable=True):
    return TypeInfo(SQLTypeKind.INT, nullable)


def bigint(nullable=True):
    return TypeInfo(SQLTypeKind.BIGINT, nullable)


def float_(nullable=True):
    return TypeInfo(SQLTypeKind.FLOAT, nullable)


def double(nullable=True):
    return TypeInfo(SQLTypeKind.DOUBLE, nullable)


def decimal(precision, scale, nullable=True):
    return TypeInfo(SQLTypeKind.DECIMAL, nullable, precision=precision, scale=scale)


def text_dict(dict_id=0, nullable=True):
    return TypeInfo(
        SQLTypeKind.TEXT, nullable, encoding=Encoding.DICT, comp_param=dict_id
    )


def text_none(nullable=True):
    return TypeInfo(SQLTypeKind.TEXT, nullable, encoding=Encoding.NONE)


def date(nullable=True):
    return TypeInfo(SQLTypeKind.DATE, nullable)


def time_(nullable=True):
    return TypeInfo(SQLTypeKind.TIME, nullable)


def timestamp(precision=0, nullable=True):
    return TypeInfo(SQLTypeKind.TIMESTAMP, nullable, precision=precision)


def geo(kind: SQLTypeKind, srid: int = 0, nullable=True, compressed=None):
    """Geo column TypeInfo: is_array=True so storage/aux/rowid-handle
    machinery is shared with ARRAY columns; payload = flat f64 coords,
    or GEOINT32 fixed-point int32 when compressed (reference
    kENCODING_GEOINT: SRID-4326 columns compress by default —
    Geospatial/CompressionRuntime.h formulas, ~1e-7° tolerance)."""
    if compressed is None:
        compressed = srid == 4326
    return TypeInfo(
        kind, nullable, comp_param=srid, is_array=True,
        encoding=Encoding.GEOINT if compressed else Encoding.NONE,
    )


def null_type():
    return TypeInfo(SQLTypeKind.NULLT, True)


_INT_RANK = {
    SQLTypeKind.TINYINT: 0,
    SQLTypeKind.SMALLINT: 1,
    SQLTypeKind.INT: 2,
    SQLTypeKind.BIGINT: 3,
}
_RANK_INT = {v: k for k, v in _INT_RANK.items()}


def common_numeric_type(a: TypeInfo, b: TypeInfo) -> TypeInfo:
    """Binary-operation result type (reference: Analyzer::analyze_type_info /
    common_numeric_type in Analyzer/Analyzer.cpp)."""
    nullable = a.nullable or b.nullable
    if a.is_null_type:
        return b.with_nullable(True)
    if b.is_null_type:
        return a.with_nullable(True)
    if a.kind == SQLTypeKind.DOUBLE or b.kind == SQLTypeKind.DOUBLE:
        return double(nullable)
    if a.kind == SQLTypeKind.FLOAT or b.kind == SQLTypeKind.FLOAT:
        # float op decimal/bigint → double for precision; float op smaller int → float
        other = b if a.kind == SQLTypeKind.FLOAT else a
        if other.is_decimal or other.kind == SQLTypeKind.BIGINT:
            return double(nullable)
        return float_(nullable)
    if a.is_decimal or b.is_decimal:
        # widen to a common decimal
        ap, asc = (a.precision, a.scale) if a.is_decimal else (19, 0)
        bp, bsc = (b.precision, b.scale) if b.is_decimal else (19, 0)
        scale = max(asc, bsc)
        prec = min(19, max(ap - asc, bp - bsc) + scale)
        return decimal(prec, scale, nullable)
    if a.is_integer and b.is_integer:
        rank = max(_INT_RANK[a.kind], _INT_RANK[b.kind])
        return TypeInfo(_RANK_INT[rank], nullable)
    if a.is_time and b.is_time and a.kind == b.kind:
        prec = max(a.precision, b.precision)
        return TypeInfo(a.kind, nullable, precision=prec)
    if a.kind == b.kind:
        return a.with_nullable(nullable)
    raise TypeError(f"no common type for {a} and {b}")


def decimal_multiplier(ti: TypeInfo) -> int:
    return 10**ti.scale if ti.is_decimal else 1


def literal_type(value: Any) -> TypeInfo:
    """Infer the TypeInfo of a Python literal."""
    if value is None:
        return null_type()
    if isinstance(value, bool):
        return boolean(nullable=False)
    if isinstance(value, int):
        if -(2**31) <= value < 2**31:
            return integer(nullable=False)
        return bigint(nullable=False)
    if isinstance(value, float):
        return double(nullable=False)
    if isinstance(value, str):
        return TypeInfo(SQLTypeKind.TEXT, nullable=False)
    raise TypeError(f"unsupported literal {value!r}")

"""Driver-side reimplementation of Spark's ``xxhash64`` expression.

Why: bucket routing hashes the partition-key literal with ``F.xxhash64`` —
launching a Spark job (``spark.range(1)...first()``) just to hash ONE
literal adds a ~100 ms scheduler round-trip to every point ``lookup()``,
an API advertised as cheap. Computing the same XXH64 value in Python on
the driver makes routing free; the row-level hashing that defines bucket
LAYOUT stays the JVM built-in, so the two only ever have to AGREE, which
``tests/test_xxhash.py`` property-checks against ``F.xxhash64`` itself
across every supported type (that test, not this file, is the contract).

Algorithm: XXH64 with Spark's fixed seed 42 and Spark's per-type input
encoding (the width-sensitivity that bit lookup() once lives here):

* byte/short/int/boolean hash as a 4-byte lane (``hashInt``),
* long/timestamp as an 8-byte lane (``hashLong``),
* float/double via their IEEE bit patterns (4-/8-byte lane; -0.0
  normalizes to 0.0 first, matching Spark's canonicalization),
* date as its epoch-days int,
* string as its UTF-8 bytes through the full streaming XXH64.

All arithmetic is explicit mod-2^64; results are returned SIGNED to match
the JVM long that ``F.xxhash64`` yields.
"""

from __future__ import annotations

import datetime as _dt
import struct
from typing import Any

from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampType,
)

_SPARK_SEED = 42

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    x &= _M64
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h &= _M64
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed(v: int) -> int:
    v &= _M64
    return v - (1 << 64) if v >= (1 << 63) else v


def _hash_int(value: int, seed: int = _SPARK_SEED) -> int:
    """4-byte lane: Spark's XXH64.hashInt (byte/short/int/boolean/float)."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _signed(_fmix(h))


def _hash_long(value: int, seed: int = _SPARK_SEED) -> int:
    """8-byte lane: Spark's XXH64.hashLong (long/double/timestamp)."""
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((value & _M64) * _P2 & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _signed(_fmix(h))


def _hash_bytes(data: bytes, seed: int = _SPARK_SEED) -> int:
    """Full streaming XXH64 over a byte string (Spark's hashUnsafeBytes:
    32-byte stripes, then 8-byte words, one 4-byte word, then bytes)."""
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = length - 32
        while off <= limit:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, off)
            v1 = (_rotl((v1 + k1 * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + k2 * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + k3 * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + k4 * _P2) & _M64, 31) * _P1) & _M64
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + length) & _M64
    while off + 8 <= length:
        (k,) = struct.unpack_from("<Q", data, off)
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        off += 8
    if off + 4 <= length:
        (k,) = struct.unpack_from("<I", data, off)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        off += 4
    while off < length:
        h ^= (data[off] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        off += 1
    return _signed(_fmix(h))


_EPOCH_DATE = _dt.date(1970, 1, 1)


def spark_xxhash64(value: Any, dtype: DataType) -> int | None:
    """``F.xxhash64(lit(value).cast(dtype))`` computed on the driver, or
    None when the type isn't covered (caller falls back to a Spark job).
    NULL input returns None as well — Spark's xxhash64 passes the seed
    through unchanged for nulls, but bucket routing never hashes nulls
    (partition keys are non-null), so callers treat None as 'use Spark'.
    """
    if value is None:
        return None
    if isinstance(dtype, (ByteType, ShortType, IntegerType)):
        return _hash_int(int(value))
    if isinstance(dtype, LongType):
        return _hash_long(int(value))
    if isinstance(dtype, BooleanType):
        return _hash_int(1 if value else 0)
    if isinstance(dtype, StringType):
        return _hash_bytes(str(value).encode("utf-8"))
    if isinstance(dtype, FloatType):
        f = float(value)
        if f == 0.0:
            f = 0.0  # -0.0 -> 0.0, Spark canonicalization
        (bits,) = struct.unpack("<i", struct.pack("<f", f))
        return _hash_int(bits)
    if isinstance(dtype, DoubleType):
        d = float(value)
        if d == 0.0:
            d = 0.0
        (bits,) = struct.unpack("<q", struct.pack("<d", d))
        return _hash_long(bits)
    if isinstance(dtype, DateType):
        if isinstance(value, _dt.datetime):
            value = value.date()
        if isinstance(value, _dt.date):
            return _hash_int((value - _EPOCH_DATE).days)
        return None  # string literal: let Spark parse + hash it
    if isinstance(dtype, TimestampType):
        if isinstance(value, _dt.datetime):
            # PySpark's OWN literal conversion (naive datetimes go through
            # time.mktime => the driver's OS-local timezone; tz-aware go
            # through timegm) — computing UTC micros here instead routed
            # timestamp keys to the wrong bucket on any non-UTC host, and
            # crashed on tz-aware values. toInternal reproduces F.lit's
            # exact micros for both.
            return _hash_long(TimestampType().toInternal(value))
        return None  # string literal: let Spark parse + hash it
    return None

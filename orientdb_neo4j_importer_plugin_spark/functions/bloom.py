"""Per-file key bloom filters — point-lookup file skipping beyond min/max.

Why: in-bucket file skipping (`SnapshotTable._lookup_files`) prunes on the
partition key's per-file min/max range. That works for compacted,
key-clustered base files (tight disjoint ranges) but is USELESS for the two
file classes that matter most at scale:

* MOR **delta files** hold one batch's random key sample, so their key
  range spans nearly the whole bucket — min/max never excludes anything,
  and a point lookup in a 100-delta bucket reads 100 files.
* Base files rewritten with ``compact(cluster_by=<scan column>)`` trade
  key clustering for scan-column clustering — every file's key range
  widens to the full bucket and point lookups degrade to O(bucket).

A per-file bloom filter over the partition key restores O(files actually
containing the key) reads in both cases: membership is tested on the
driver against manifest metadata (no data IO), a set bit pattern miss
proves the key is absent, and false positives only cost a harmless extra
file read — never a wrong result. This is the parquet/Iceberg
bloom-filter-index idea re-homed into our JSON manifests, where the
DRIVER can consult it during metadata-only planning (parquet's own bloom
pages live in the data file and would need an executor round-trip).

Construction uses Kirsch–Mitzenmacher double hashing ("Less Hashing, Same
Performance", ESA 2006): the k probe positions are derived from ONE 64-bit
hash h as ``pos_i = (lo32(h) + i * (hi32(h) | 1)) mod m``. The single hash
is Spark's ``xxhash64`` — computed JVM-side when building (one vectorized
expression over the written files) and reproduced bit-exactly on the
driver by `functions.xxhash.spark_xxhash64` when probing, the same
already-property-tested agreement that bucket routing relies on. Forcing
the stride odd avoids degenerate short cycles when m is even.

Reference parity: the reference's UNIQUE_HASH_INDEX on the idempotency key
(``ONeo4jImporterVerticesAndEdgesMigrator.java:363-370``) is what makes its
point lookups cheap; the bloom is our metadata-side analogue for files.
"""

from __future__ import annotations

import base64
import math

import numpy as np

# 9.585 bits/key + 7 probes ≈ 1% false-positive rate (standard bloom math)
DEFAULT_FPP = 0.01
# cap a single file's filter at 1 MiB of bits (128 KiB raw, ~171 KiB b64
# in the manifest). A file would need >~109k distinct keys to exceed 1%
# fpp under this cap; realized fpp is stored so readers can judge.
DEFAULT_MAX_BITS = 1 << 20
# don't persist filters whose realized fpp is this bad — they skip nothing
USELESS_FPP = 0.5

_LO32 = np.uint64(0xFFFFFFFF)
_M64 = (1 << 64) - 1


def bloom_params(n: int, fpp: float = DEFAULT_FPP, max_bits: int = DEFAULT_MAX_BITS) -> tuple[int, int]:
    """(m bits, k probes) for n keys at target fpp; m word-aligned and
    capped (k re-optimized for the capped m, never above 16)."""
    n = max(1, int(n))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    m = min(m, max_bits)
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def realized_fpp(n: int, m: int, k: int) -> float:
    """Expected false-positive rate of a (m, k) filter holding n keys."""
    return (1.0 - math.exp(-k * n / m)) ** k


def build_bloom(hashes: np.ndarray, m: int, k: int) -> bytes:
    """Bitset (little-endian packed, m/8 bytes) with every hash's k
    positions set. `hashes` is int64 (Spark xxhash64 output) or uint64."""
    h = np.ascontiguousarray(hashes, dtype=np.int64).view(np.uint64)
    lo = h & _LO32
    hi = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    pos = (lo[:, None] + i[None, :] * hi[:, None]) % np.uint64(m)
    idx = np.unique(pos.ravel())
    bits = np.zeros(m // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                     (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))
    return bits.tobytes()


def might_contain(bits: bytes, m: int, k: int, h: int) -> bool:
    """Driver-side probe: True = key may be in the file, False = key is
    PROVABLY absent. `h` is the signed xxhash64 of the key value."""
    h &= _M64
    lo = h & 0xFFFFFFFF
    hi = (h >> 32) | 1
    for i in range(k):
        pos = (lo + i * hi) % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def encode_bloom(bits: bytes) -> str:
    return base64.b64encode(bits).decode("ascii")


def decode_bloom(s: str) -> bytes:
    return base64.b64decode(s.encode("ascii"))

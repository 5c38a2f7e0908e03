"""Driver-side replica of Spark's ``hash()`` (Murmur3 x86_32, seed 42).

Bucket partition pruning needs the bucket id of a *predicate literal* at
PLANNING time — before any Spark job exists — so the planner re-computes
exactly what ``F.pmod(F.hash(col), n)`` computed at write time. The
algorithm is public: Austin Appleby's MurmurHash3 (public domain) as
specialized by Spark's ``Murmur3_x86_32`` / ``HashExpression`` codegen —
ints hash as one 4-byte block, longs as two, strings as their UTF-8
bytes with Spark's nonstandard one-byte-at-a-time tail (each tail byte
goes through the full mixK1/mixH1 round, unlike reference MurmurHash3).

``tests/test_bucketing.py`` pins this module against ``F.hash`` itself
over a battery of boundary values — the parity test, not this comment,
is the correctness guarantee.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFF
_SEED = 42


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _signed32(x: int) -> int:
    x &= _MASK
    return x - (1 << 32) if x >= (1 << 31) else x


def hash_int32(value: int, seed: int = _SEED) -> int:
    """Murmur3_x86_32.hashInt — Spark's hash of an int/short/byte."""
    h1 = _mix_h1(seed & _MASK, _mix_k1(value & _MASK))
    return _signed32(_fmix(h1, 4))


def hash_int64(value: int, seed: int = _SEED) -> int:
    """Murmur3_x86_32.hashLong — low word then high word."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _MASK, _mix_k1(v & _MASK))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _MASK))
    return _signed32(_fmix(h1, 8))


def hash_bytes(data: bytes, seed: int = _SEED) -> int:
    """Murmur3_x86_32.hashUnsafeBytes — 4-byte little-endian blocks,
    then Spark's per-byte tail (bytes are SIGNED, as in Java)."""
    h1 = seed & _MASK
    n = len(data)
    aligned = n - (n % 4)
    for i in range(0, aligned, 4):
        block = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(block))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:
            b -= 256  # Java bytes are signed; negatives sign-extend
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    return _signed32(_fmix(h1, n))


def spark_hash(value, type_str: str, seed: int = _SEED) -> int | None:
    """``F.hash(lit)`` for a Python literal typed by a Spark
    ``simpleString`` type name. None = this (value, type) combination
    is not safely hashable driver-side — callers must treat that as
    "cannot prune", never as a bucket id.

    ``seed`` replicates Spark's multi-argument fold: ``F.hash(a, b)``
    hashes ``b`` with ``hash(a)`` as the seed, so
    ``spark_hash(v, t, spark_hash(v, t))`` equals ``F.hash(col, col)``
    — the second independent hash the bloom index uses for double
    hashing."""
    if value is None or isinstance(value, bool):
        return None
    if type_str == "int":
        if not isinstance(value, int) or not (-(1 << 31) <= value < (1 << 31)):
            return None
        return hash_int32(value, seed)
    if type_str == "bigint":
        if not isinstance(value, int) or not (-(1 << 63) <= value < (1 << 63)):
            return None
        return hash_int64(value, seed)
    if type_str == "string":
        if not isinstance(value, str):
            return None
        return hash_bytes(value.encode("utf-8"), seed)
    return None


def spark_bucket(value, type_str: str, n_buckets: int) -> int | None:
    """``pmod(hash(value), n_buckets)`` — the engine's bucket transform.
    Python's ``%`` on a signed int already matches Spark's pmod (result
    takes the sign of the divisor)."""
    h = spark_hash(value, type_str)
    if h is None:
        return None
    return h % n_buckets


def bloom_positions(
    value, type_str: str, m_bits: int, k: int
) -> list[int] | None:
    """The k bloom bit positions of a literal under the engine's bloom
    scheme — double hashing (Kirsch-Mitzenmotter):
    ``pos_i = pmod(h1 + i*h2, m)`` with ``h1 = hash(v)`` and
    ``h2 = hash(v, v)`` (Spark's seed-fold, see :func:`spark_hash`).
    None = literal not driver-hashable -> caller must NOT prune."""
    h1 = spark_hash(value, type_str)
    if h1 is None:
        return None
    h2 = spark_hash(value, type_str, h1)
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bloom_may_contain(
    bitmap: bytes, m_bits: int, k: int, value, type_str: str
) -> bool:
    """Membership test against a bloom bitmap assembled from the
    engine's 64-bit-word little-endian layout. True = maybe present
    (or unprovable); False = PROVABLY absent, safe to skip the file."""
    pos = bloom_positions(value, type_str, m_bits, k)
    if pos is None:
        return True
    return all((bitmap[p >> 3] >> (p & 7)) & 1 for p in pos)

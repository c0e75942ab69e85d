"""Hashing kernels.

The reference encodes strings with seeded xxh3_64
(reference: src/trainer/code/string_encoder.py:10,96-101). Neither the
``xxhash`` C package nor xxh3 is available here, and Spark's built-in
``xxhash64`` SQL function is XXH64 (seed 42). This engine therefore
standardizes on **XXH64** as its string hash:

- JVM side: ``pyspark.sql.functions.xxhash64`` (whole-stage codegen).
- Driver/UDF side: the pure-Python XXH64 below (public algorithm,
  https://github.com/Cyan4973/xxHash spec), bit-identical to the
  reference C implementation for byte inputs.

``xxh64`` here hashes raw UTF-8 bytes with an explicit seed, which is the
portable contract the string tables need (model_seed-driven, stable across
driver and executors). Note Spark's ``xxhash64`` SQL function hashes
Spark's internal value encoding with fixed seed 42, so it is only used
where the seed does not need to vary (e.g. MinHash base hashing).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """XXH64 of ``data`` (str treated as UTF-8) with ``seed``; unsigned 64-bit."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def masked_hash(string: str, n_bits: int, seed: int) -> int:
    """Seeded string hash masked to ``n_bits + 1`` low bits.

    Mirrors the reference's string-table hash
    (reference: src/trainer/code/string_encoder.py:96-101), with XXH64
    substituted for xxh3_64 (see module docstring).
    """
    assert 0 < n_bits < 64
    mask = (1 << (n_bits + 1)) - 1
    return xxh64(string, seed) & mask

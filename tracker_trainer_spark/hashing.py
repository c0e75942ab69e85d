"""Hashing kernels.

The reference encodes strings with seeded xxh3_64
(reference: src/trainer/code/string_encoder.py:10,96-101). The string
tables route every hash through ONE seam — ``string_hash`` — which is
the reference's ``xxh3_64_intdigest`` whenever the ``xxhash`` C package
is importable (bit-parity: models/string tables interchange with
reference-trained artifacts), and the pure-Python XXH64 below otherwise
(public algorithm, https://github.com/Cyan4973/xxHash spec). The active
algorithm is recorded as ``STRING_HASH_NAME`` and persisted in model
artifacts so a table built under one algorithm is never silently decoded
under the other.

Spark's built-in ``xxhash64`` SQL function is XXH64 over Spark's
internal value encoding with fixed seed 42, so it is only used where the
seed does not need to vary (e.g. MinHash base hashing); ``string_hash``
hashes raw UTF-8 bytes with an explicit seed — the portable contract the
string tables need (model_seed-driven, stable across driver and
executors).
"""

from __future__ import annotations

try:  # gated: the xxhash C package is absent in this container
    from xxhash import xxh3_64_intdigest as _xxh3_64  # type: ignore

    HAS_XXH3 = True
except ImportError:
    HAS_XXH3 = False

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


STRING_HASH_NAME = "xxh3_64" if HAS_XXH3 else "xxh64"


def string_hash(data: bytes | str, seed: int = 0) -> int:
    """Seeded 64-bit string hash for the string tables
    (reference: src/trainer/code/string_encoder.py:10): xxh3_64 when the
    ``xxhash`` package is importable, pure-Python XXH64 fallback."""
    if HAS_XXH3:
        return _xxh3_64(data, seed)
    return xxh64(data, seed)


def masked_hash(string: str, n_bits: int, seed: int) -> int:
    """Seeded string hash masked to ``n_bits + 1`` low bits.

    Mirrors the reference's string-table hash
    (reference: src/trainer/code/string_encoder.py:96-101); algorithm
    per ``string_hash`` (see module docstring).
    """
    assert 0 < n_bits < 64
    mask = (1 << (n_bits + 1)) - 1
    return string_hash(string, seed) & mask

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


# ---------------------------------------------------------------------------
# Pure-Python XXH3-64 (public algorithm, https://github.com/Cyan4973/xxHash;
# scalar path of the spec).  Closes the bit-parity gap with the reference's
# ``xxh3_64_intdigest`` (src/trainer/code/string_encoder.py:10,99-101) without
# the prohibited C package: string tables and model artifacts built here
# interchange bit-exactly with reference-trained ones.  Validated against
# golden vectors generated from the canonical C implementation (the xxhash
# header vendored by Apache Arrow) across every length path and seed mix —
# see tests/test_hashing_parity.py.  Driver/table-side speed (µs per short
# string) — the encode hot path memoizes per table.
# ---------------------------------------------------------------------------

# The canonical 192-byte default secret (XXH3_kSecret).
_SECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e"
)
_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_AVAL_M = 0x165667919E3779F9
_RRMXMX_M = 0x9FB21C651E98DF25


def _r32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 4], "little")


def _r64(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 8], "little")


def _swap32(x: int) -> int:
    return int.from_bytes(x.to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes(x.to_bytes(8, "little"), "big")


def _xxh64_avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    return h ^ (h >> 32)


def _xxh3_avalanche(h: int) -> int:
    h ^= h >> 37
    h = (h * _AVAL_M) & _M64
    return h ^ (h >> 32)


def _fold128(a: int, b: int) -> int:
    p = a * b
    return (p & _M64) ^ (p >> 64)


def _mix16(data: bytes, i: int, sec: bytes, s: int, seed: int) -> int:
    lo = _r64(data, i) ^ ((_r64(sec, s) + seed) & _M64)
    hi = _r64(data, i + 8) ^ ((_r64(sec, s + 8) - seed) & _M64)
    return _fold128(lo, hi)


def _xxh3_long(data: bytes, seed: int) -> int:
    n = len(data)
    if seed == 0:
        sec = _SECRET
    else:  # custom secret: per-16-byte (+seed, -seed) of the default
        cs = bytearray(192)
        for i in range(12):
            cs[16 * i:16 * i + 8] = (
                (_r64(_SECRET, 16 * i) + seed) & _M64).to_bytes(8, "little")
            cs[16 * i + 8:16 * i + 16] = (
                (_r64(_SECRET, 16 * i + 8) - seed) & _M64).to_bytes(8, "little")
        sec = bytes(cs)
    acc = [_P32_3, _P1, _P2, _P3, _P4, _P32_2, _P5, _P32_1]

    def accum(stripe_off: int, s_off: int) -> None:
        for lane in range(8):
            dv = _r64(data, stripe_off + 8 * lane)
            dk = dv ^ _r64(sec, s_off + 8 * lane)
            acc[lane ^ 1] = (acc[lane ^ 1] + dv) & _M64
            acc[lane] = (acc[lane]
                         + (dk & 0xFFFFFFFF) * (dk >> 32)) & _M64

    stripes_per_block = (192 - 64) // 8  # 16
    block_len = 64 * stripes_per_block   # 1024
    nb_blocks = (n - 1) // block_len
    for b in range(nb_blocks):
        for s in range(stripes_per_block):
            accum(b * block_len + 64 * s, 8 * s)
        for lane in range(8):  # scramble
            a = acc[lane]
            a ^= a >> 47
            a ^= _r64(sec, 192 - 64 + 8 * lane)
            acc[lane] = (a * _P32_1) & _M64
    tail = nb_blocks * block_len
    for s in range(((n - 1) - tail) // 64):
        accum(tail + 64 * s, 8 * s)
    accum(n - 64, 192 - 64 - 7)  # last (overlapping) stripe
    out = (n * _P1) & _M64
    for i in range(4):
        out = (out + _fold128(acc[2 * i] ^ _r64(sec, 11 + 16 * i),
                              acc[2 * i + 1] ^ _r64(sec, 19 + 16 * i))) & _M64
    return _xxh3_avalanche(out)


def xxh3_64(data: bytes | str, seed: int = 0) -> int:
    """XXH3-64 of ``data`` (str treated as UTF-8) with ``seed``;
    unsigned 64-bit.  Bit-compatible with ``xxhash.xxh3_64_intdigest``
    and therefore with reference client SDKs."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    if n == 0:
        return _xxh64_avalanche(
            seed ^ _r64(_SECRET, 56) ^ _r64(_SECRET, 64))
    if n <= 3:
        combined = ((data[0] << 16) | (data[n >> 1] << 24)
                    | data[n - 1] | (n << 8))
        bitflip = ((_r32(_SECRET, 0) ^ _r32(_SECRET, 4)) + seed) & _M64
        return _xxh64_avalanche(combined ^ bitflip)
    if n <= 8:
        seed ^= (_swap32(seed & 0xFFFFFFFF) << 32)
        seed &= _M64
        in64 = _r32(data, n - 4) | (_r32(data, 0) << 32)
        h = in64 ^ ((_r64(_SECRET, 8) ^ _r64(_SECRET, 16)) - seed) & _M64
        # rrmxmx finalizer
        h ^= _rotl(h, 49) ^ _rotl(h, 24)
        h = (h * _RRMXMX_M) & _M64
        h ^= (h >> 35) + n
        h &= _M64
        h = (h * _RRMXMX_M) & _M64
        return h ^ (h >> 28)
    if n <= 16:
        lo = _r64(data, 0) ^ (
            ((_r64(_SECRET, 24) ^ _r64(_SECRET, 32)) + seed) & _M64)
        hi = _r64(data, n - 8) ^ (
            ((_r64(_SECRET, 40) ^ _r64(_SECRET, 48)) - seed) & _M64)
        acc = (n + _swap64(lo) + hi + _fold128(lo, hi)) & _M64
        return _xxh3_avalanche(acc)
    if n <= 128:
        acc = (n * _P1) & _M64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc += _mix16(data, 48, _SECRET, 96, seed)
                    acc += _mix16(data, n - 64, _SECRET, 112, seed)
                acc += _mix16(data, 32, _SECRET, 64, seed)
                acc += _mix16(data, n - 48, _SECRET, 80, seed)
            acc += _mix16(data, 16, _SECRET, 32, seed)
            acc += _mix16(data, n - 32, _SECRET, 48, seed)
        acc += _mix16(data, 0, _SECRET, 0, seed)
        acc += _mix16(data, n - 16, _SECRET, 16, seed)
        return _xxh3_avalanche(acc & _M64)
    if n <= 240:
        acc = (n * _P1) & _M64
        for i in range(8):
            acc = (acc + _mix16(data, 16 * i, _SECRET, 16 * i, seed)) & _M64
        acc = _xxh3_avalanche(acc)
        for i in range(8, n // 16):
            # XXH3_MIDSIZE_STARTOFFSET = 3
            acc = (acc + _mix16(data, 16 * i, _SECRET,
                                16 * (i - 8) + 3, seed)) & _M64
        # XXH3_SECRET_SIZE_MIN(136) - XXH3_MIDSIZE_LASTOFFSET(17) = 119
        acc = (acc + _mix16(data, n - 16, _SECRET, 119, seed)) & _M64
        return _xxh3_avalanche(acc)
    return _xxh3_long(data, seed)


STRING_HASH_NAME = "xxh3_64"


def string_hash(data: bytes | str, seed: int = 0) -> int:
    """Seeded 64-bit string hash for the string tables
    (reference: src/trainer/code/string_encoder.py:10): the C
    ``xxh3_64_intdigest`` when the ``xxhash`` package is importable,
    else the bit-identical pure-Python port above — ONE algorithm
    either way, so artifacts interchange with reference-trained models
    unconditionally (P8/A8 parity; the former xxh64 fallback made
    STRING_HASH_NAME environment-dependent)."""
    if HAS_XXH3:
        return _xxh3_64(data, seed)
    return xxh3_64(data, seed)


def masked_hash(string: str, n_bits: int, seed: int) -> int:
    """Seeded string hash masked to ``n_bits + 1`` low bits.

    Mirrors the reference's string-table hash
    (reference: src/trainer/code/string_encoder.py:96-101); algorithm
    per ``string_hash`` (see module docstring).
    """
    assert 0 < n_bits < 64
    mask = (1 << (n_bits + 1)) - 1
    return string_hash(string, seed) & mask

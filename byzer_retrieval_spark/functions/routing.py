"""Shard routing: murmur3_x86_32(seed=0) reference-compatible hashing.

The reference routes a document to a shard with
``Utils.route(id, numWorkers)``: ``id % n`` for long ids, else
``abs(murmurhash3_x86_32(str(id).encode(), seed=0)) % n`` where abs() of
Integer.MIN_VALUE is fixed up to 0 (reference: Utils.java:137-145 with
the murmur3 implementation at Utils.java:187-255 and the abs fixup at
Utils.java:190-193).

Spark's built-in ``F.hash`` IS murmur3_x86_32 but with seed 42 and no
abs, so for bit-for-bit reference routing compatibility we carry our own
implementation — scalar for the driver, numpy-vectorized for bulk, and a
pandas UDF for DataFrames. Our engine's *internal* sharding only needs
any deterministic hash (SURVEY §1.2), so the index builder defaults to
the JVM-side ``xxhash64`` expression (zero Python); this module exists
for reference-parity routing and its tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Scalar murmur3_x86_32 returning a signed 32-bit int (Java parity)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n & ~0x3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


_M64 = 0xFFFFFFFFFFFFFFFF
_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Pure-python XXH64 (Yann Collet's public spec), signed-64 result.

    Bit-for-bit equal to Spark's ``F.xxhash64`` on a string/binary
    column (Spark hashes the UTF-8 bytes with seed 42), so driver-side
    code — e.g. DuckDB-oracle generators — can predict the engine's
    ``pmod(xxhash64(_id), num_shards)`` shard assignment without a
    SparkSession. Validated against the JVM in tests/test_pure_units.py.
    """
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            v1 = (_rotl64((v1 + int.from_bytes(data[i : i + 8], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            v2 = (_rotl64((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            v3 = (_rotl64((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            v4 = (_rotl64((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = (h * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl64((int.from_bytes(data[i : i + 8], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = (_rotl64(h ^ k, 27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XXP1) & _M64
        h = (_rotl64(h, 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl64(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - 0x10000000000000000 if h >= 0x8000000000000000 else h


def engine_shard(_id: str, num_shards: int) -> int:
    """The engine's own shard assignment (indexer.py:144) predicted
    driver-side: ``pmod(xxhash64(utf8(_id)), num_shards)``."""
    return xxhash64(str(_id).encode("utf-8")) % num_shards


def route(doc_id, num_shards: int) -> int:
    """Reference-exact shard routing (Utils.route semantics)."""
    if isinstance(doc_id, (int, np.integer)) and not isinstance(doc_id, bool):
        return int(doc_id) % num_shards
    h = murmur3_x86_32(str(doc_id).encode("utf-8"), seed=0)
    # Java Math.abs fixup: abs(Integer.MIN_VALUE) -> 0 (Utils.java:190-193)
    a = 0 if h == -0x80000000 else abs(h)
    return a % num_shards


def route_series(ids: pd.Series, num_shards: int) -> pd.Series:
    """Vectorized-enough routing over a pandas batch (for a pandas UDF).

    murmur3 over variable-length strings doesn't vectorize cleanly in
    numpy; this maps the scalar over an Arrow batch, which is still
    batch-at-a-time from Spark's perspective. The engine's default
    sharding path never calls this (it uses xxhash64 JVM-side).
    """
    return ids.map(lambda i: route(i, num_shards)).astype("int32")

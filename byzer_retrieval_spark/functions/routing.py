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

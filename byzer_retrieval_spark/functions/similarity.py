"""Similarity search over embedding columns (array<float>).

Two tiers, matching how this runs at 100 TB:

- brute_force_cosine_topk: exact top-k by cosine — dot products as pure
  Catalyst expressions (zip_with + aggregate, JVM-side, codegen'd).
  O(N·d) scan, no shuffle except the final TakeOrderedAndProject. This
  is the baseline/oracle.
- lsh_cosine_topk: random-hyperplane LSH (fixed-seed hyperplanes →
  sign-bit bucket). The scan prunes to buckets within ``probe_hamming``
  of the query's bucket — at scale the bucket id becomes a partition
  column so Catalyst prunes entire partitions; recall is tunable via
  (num_planes, probe_hamming). Approximate by design; pytest pins
  recall ≥ 0.9 @ k=10 on the deterministic test vectors.

Also random_hyperplane_buckets — the bucketing primitive shared with
embedding near-dup (dedup.embedding_dup_pairs' scale path).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _qnorm(q: Sequence[float]) -> float:
    # sequential left-to-right accumulation — the SQL oracle embeds this
    # exact literal so both engines share it bit-for-bit
    acc = 0.0
    for x in q:
        acc += float(x) * float(x)
    import math

    return math.sqrt(acc)


def _cosine_expr(vec_col: str, q: Sequence[float]):
    qn = _qnorm(q)
    qarr = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qarr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col).cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return dot / (norm * F.lit(qn))


def brute_force_cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query: Sequence[float], k: int = 10
) -> DataFrame:
    """Exact ANN baseline: (id, cosine) top-k, ties by id asc."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.round(_cosine_expr(vec_col, query), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def hyperplanes(dim: int, num_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def bucket_of(vec: Sequence[float], planes: np.ndarray) -> int:
    signs = (planes @ np.asarray(vec, dtype=np.float64)) > 0
    return int(sum(1 << i for i, s in enumerate(signs) if s))


def random_hyperplane_buckets(
    df: DataFrame, vec_col: str, planes: np.ndarray, out_col: str = "bucket"
) -> DataFrame:
    """Sign-bit LSH bucket id as a Column expression (JVM-side dot
    products — no Python in the scan)."""
    b = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        parr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), parr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        b = b + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out_col, b)


def lsh_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    num_planes: int = 12,
    probe_hamming: int = 2,
    num_tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket in ANY of ``num_tables``
    independent tables (standard OR-amplification: per-neighbor recall
    1-(1-p_table)^T). Recall/cost trade-off is (num_planes ↑ precision,
    probe_hamming & num_tables ↑ recall)."""
    dim = len(query)
    cand_filter = F.lit(False)
    bucketed = df
    for t in range(num_tables):
        planes = hyperplanes(dim, num_planes, seed + t)
        qb = bucket_of(query, planes)
        col = f"__bucket_{t}"
        bucketed = random_hyperplane_buckets(bucketed, vec_col, planes, out_col=col)
        cand_filter = cand_filter | (
            F.bit_count(F.col(col).bitwiseXOR(F.lit(qb))) <= probe_hamming
        )
    cand = bucketed.filter(cand_filter)
    return (
        cand.select(
            F.col(id_col).alias("id"),
            F.round(_cosine_expr(vec_col, query), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def cosine_sql_expr(vec_col: str, query: Sequence[float]) -> str:
    """DuckDB cosine expression mirroring _cosine_expr OPERATION-FOR-
    OPERATION (sequential dot products, shared literal query norm) so
    both engines agree to ≤1 ulp."""
    qlist = "[" + ", ".join(f"{float(x)!r}" for x in query) + "]::DOUBLE[]"
    qn = f"{_qnorm(query)!r}"
    v = f"{vec_col}::DOUBLE[]"
    return (
        f"(list_dot_product({v}, {qlist}) / (sqrt(list_dot_product({v}, {v})) * {qn}))"
    )


def cosine_topk_sql(
    table: str, id_col: str, vec_col: str, query: Sequence[float], k: int = 10
) -> str:
    """DuckDB oracle for brute_force_cosine_topk."""
    c = cosine_sql_expr(vec_col, query)
    return (
        f"SELECT {id_col} AS id, round({c}, 6) AS cosine "
        f"FROM {table} ORDER BY {c} DESC, {id_col} ASC LIMIT {k}"
    )

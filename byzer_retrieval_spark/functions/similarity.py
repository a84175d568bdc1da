"""Similarity search over embedding columns (array<float>).

Two tiers, matching how this runs at 100 TB:

- brute_force_cosine_topk: exact top-k by cosine — dot products as pure
  Catalyst expressions (zip_with + aggregate, JVM-side, codegen'd).
  O(N·d) scan, no shuffle except the final TakeOrderedAndProject. This
  is the baseline/oracle.
- LshVectorIndex: BUILD-TIME random-hyperplane bucketing, persisted as
  parquet partitioned by (tbl, bucket). This is the engine's analog of
  the reference's per-shard persisted ANN index (Lucene HNSW,
  XLucene95HnswVectorsFormat.java:119-149): the expensive structure is
  computed once at index time, and queries prune to the probe buckets
  via PARTITION filters — a query touches ``num_tables × |probe set|``
  bucket directories, never the full table. Recall is tunable via
  (num_planes, num_tables, probe_hamming); probe_hamming = num_planes
  degrades gracefully to an exact scan of one table replica.

Also random_hyperplane_buckets — the bucketing primitive (pure Catalyst
dot products, no Python in the scan).
"""

from __future__ import annotations

import itertools
import json
import os
from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
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


def probe_buckets(qb: int, num_planes: int, probe_hamming: int) -> List[int]:
    """All bucket ids within ``probe_hamming`` bits of ``qb``."""
    out = [qb]
    for r in range(1, min(probe_hamming, num_planes) + 1):
        for bits in itertools.combinations(range(num_planes), r):
            flip = 0
            for bpos in bits:
                flip |= 1 << bpos
            out.append(qb ^ flip)
    return out


class LshVectorIndex:
    """Persisted random-hyperplane LSH index (the build-time ANN path).

    Layout: ``path/data/tbl=<t>/bucket=<b>/*.parquet`` storing
    (id, vec) — one replica per hash table — plus ``meta.json``. Both
    ``tbl`` and ``bucket`` are PARTITION columns, so the probe filter
    ``(tbl = t) AND bucket IN (...)`` prunes whole directories at plan
    time; at 10^12 vectors a query reads num_tables × |probes| buckets
    (~num_tables·Σ C(planes,i) directories), never the corpus.

    Reference capability matched: the per-shard HNSW graph Lucene builds
    at index time (SchemaUtils.java:104-110) — same contract (persisted
    ANN structure, approximate recall, build-once query-many), different
    algorithm because LSH bucketing maps onto columnar partition pruning
    while graph traversal does not.
    """

    def __init__(
        self,
        path: str,
        num_planes: int = 12,
        num_tables: int = 2,
        seed: int = 42,
    ):
        self.path = path
        self.num_planes = num_planes
        self.num_tables = num_tables
        self.seed = seed

    @property
    def data_path(self) -> str:
        return os.path.join(self.path, "data")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def exists(self) -> bool:
        return os.path.exists(self.meta_path)

    def build(self, df: DataFrame, id_col: str, vec_col: str, dim: int) -> None:
        """Bucket every vector in every table (JVM dot products) and
        persist partitioned by (tbl, bucket). One narrow pass + one
        partitioned write; no shuffle beyond the write repartition."""
        reps = []
        base = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<float>").alias("vec")
        )
        for t in range(self.num_tables):
            planes = hyperplanes(dim, self.num_planes, self.seed + t)
            reps.append(
                random_hyperplane_buckets(base, "vec", planes, out_col="bucket")
                .withColumn("tbl", F.lit(t))
            )
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        (
            out.repartition("tbl", "bucket")
            .write.partitionBy("tbl", "bucket")
            .mode("overwrite")
            .parquet(self.data_path)
        )
        os.makedirs(self.path, exist_ok=True)
        with open(self.meta_path, "w") as f:
            json.dump(
                {
                    "num_planes": self.num_planes,
                    "num_tables": self.num_tables,
                    "seed": self.seed,
                    "dim": dim,
                },
                f,
            )

    def candidates(
        self, spark: SparkSession, query: Sequence[float], probe_hamming: int
    ) -> DataFrame:
        """Distinct (id, vec) whose bucket is within probe_hamming of
        the query's bucket in ANY table — via partition filters only."""
        dim = len(query)
        data = spark.read.parquet(self.data_path)
        if probe_hamming >= self.num_planes:
            # exact mode: one full replica (still one num_tables-th of
            # the index) — used by the correctness oracle
            return data.filter(F.col("tbl") == 0).select("id", "vec")
        cond = F.lit(False)
        for t in range(self.num_tables):
            planes = hyperplanes(dim, self.num_planes, self.seed + t)
            qb = bucket_of(query, planes)
            probes = probe_buckets(qb, self.num_planes, probe_hamming)
            cond = cond | (
                (F.col("tbl") == t) & F.col("bucket").isin([int(x) for x in probes])
            )
        return data.filter(cond).select("id", "vec").dropDuplicates(["id"])

    def topk(
        self,
        spark: SparkSession,
        query: Sequence[float],
        k: int = 10,
        probe_hamming: int = 2,
    ) -> DataFrame:
        """Approximate cosine top-k over the probed buckets. Per-neighbor
        recall = 1-(1-p_table)^T (OR-amplification); probe_hamming >=
        num_planes makes it exact."""
        cand = self.candidates(spark, query, probe_hamming)
        return brute_force_cosine_topk(cand, "id", "vec", query, k)

    def dup_pairs(
        self, spark: SparkSession, threshold: float = 0.95
    ) -> DataFrame:
        """Near-duplicate pairs (cosine >= threshold): candidates share a
        bucket in ANY table (one shuffle join on the (tbl, bucket) key —
        never all-pairs), then verified with the exact cosine. The
        scalable replacement for dedup.embedding_dup_pairs' self-join."""
        data = spark.read.parquet(self.data_path).select("tbl", "bucket", "id", "vec")
        a, b_ = data.alias("a"), data.alias("b")
        cand = (
            a.join(
                b_,
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.vec").alias("vec_a"),
                F.col("b.vec").alias("vec_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        dot = F.aggregate(
            F.zip_with(
                F.col("vec_a").cast("array<double>"),
                F.col("vec_b").cast("array<double>"),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        norm = lambda c: F.sqrt(
            F.aggregate(
                F.col(c).cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        return (
            cand.withColumn("cosine", F.round(dot / (norm("vec_a") * norm("vec_b")), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
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

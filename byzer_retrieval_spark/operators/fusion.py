"""Rank fusion across recalls (SURVEY §2.1 M1-M5).

The reference's master merges multiple recall results either by raw
score-sum (hash-merge id→Σscore, RetrievalMaster.java:326-342) or, for
hybrid queries, reciprocal-rank fusion where the doc at 0-based rank i
of a recall contributes 1/(i+60) (RetrievalMaster.java:162-192, formula
at :179), followed by a global sort desc + limit (:344-357) and
``_score`` injection (:359-364).

Spark-first: score-sum is union→groupBy(_id).sum; RRF is a window
row_number per recall. Note the reference's ``containsKey`` quirk at
:175 (last-occurrence-wins within one recall) is equivalent to standard
RRF whenever ids are unique within a recall — always true post-upsert
(SURVEY §2.1 M2).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # 1/(rank + 60), rank 0-based (RetrievalMaster.java:179)


def score_sum_fuse(recalls: List[DataFrame], limit: int) -> DataFrame:
    """Each recall: (_id, _score[, ...]) → Σ score per _id, top-limit."""
    u = recalls[0].select("_id", "_score")
    for r in recalls[1:]:
        u = u.unionByName(r.select("_id", "_score"))
    return (
        u.groupBy("_id")
        .agg(F.sum("_score").alias("_score"))
        .orderBy(F.col("_score").desc(), F.col("_id").asc())
        .limit(limit)
    )


def rrf_fuse(recalls: List[DataFrame], limit: int, k: int = RRF_K) -> DataFrame:
    """RRF: doc at 0-based rank i in a recall contributes 1/(i+k)."""
    parts = []
    for r in recalls:
        w = Window.orderBy(F.col("_score").desc(), F.col("_id").asc())
        parts.append(
            r.select("_id", "_score")
            .withColumn("__rank", F.row_number().over(w) - F.lit(1))
            .select("_id", (F.lit(1.0) / (F.col("__rank") + F.lit(float(k)))).alias("_score"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("_id")
        .agg(F.sum("_score").alias("_score"))
        .orderBy(F.col("_score").desc(), F.col("_id").asc())
        .limit(limit)
    )


def rrf_fuse_keyed(
    recalls: List[DataFrame], limit: int, k: int = RRF_K
) -> DataFrame:
    """RRF over recalls that CARRY the docs table's physical key:
    each recall has (shard_id, __docid, _id, _score). The fused result
    keeps (shard_id, __docid) so the caller's stored-field join runs on
    the docs PARTITION column (dynamic partition pruning + row-group
    pruning) instead of a full-table ``_id`` equi-join — the 100 TB
    version of ``rrf_fuse``. Ranks and tie-breaks are identical
    ((_score desc, _id asc) per recall; shard_id/__docid are functions
    of _id within one snapshot, so the extra grouping keys change
    nothing)."""
    parts = []
    for r in recalls:
        w = Window.orderBy(F.col("_score").desc(), F.col("_id").asc())
        parts.append(
            r.select("shard_id", "__docid", "_id", "_score")
            .withColumn("__rank", F.row_number().over(w) - F.lit(1))
            .select(
                "shard_id",
                "__docid",
                "_id",
                (F.lit(1.0) / (F.col("__rank") + F.lit(float(k)))).alias("_score"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("shard_id", "__docid", "_id")
        .agg(F.sum("_score").alias("_score"))
        .orderBy(F.col("_score").desc(), F.col("_id").asc())
        .limit(limit)
        .select("shard_id", "__docid", "_score")
    )


def rrf_fuse_keyed_tagged(
    recalls_tagged: DataFrame, limits: DataFrame, k: int = RRF_K
) -> DataFrame:
    """RRF over ONE frame of keyed recalls tagged with (query_id,
    __recall) — the batched analog of ``rrf_fuse_keyed`` (round 5:
    hybrid batch members fuse their keyword and vector winners without
    leaving the one job). Ranks within each (query, recall) by
    (_score desc, _id asc), contributes 1/(rank+k), sums per (query,
    doc) and cuts each query at its own limit (``limits``: (query_id,
    __klim) — broadcast, not a WHEN-chain). Rank and tie-break
    semantics per query are identical to rrf_fuse_keyed. Returns
    (query_id, shard_id, __docid, _id, _score)."""
    w_r = Window.partitionBy("query_id", "__recall").orderBy(
        F.col("_score").desc(), F.col("_id").asc()
    )
    contrib = recalls_tagged.withColumn(
        "__rank", F.row_number().over(w_r) - F.lit(1)
    ).select(
        "query_id",
        "shard_id",
        "__docid",
        "_id",
        (F.lit(1.0) / (F.col("__rank") + F.lit(float(k)))).alias("_score"),
    )
    fused = contrib.groupBy("query_id", "shard_id", "__docid", "_id").agg(
        F.sum("_score").alias("_score")
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("_id").asc()
    )
    return (
        fused.withColumn("__rn", F.row_number().over(w_q))
        .join(F.broadcast(limits), "query_id")
        .filter(F.col("__rn") <= F.col("__klim"))
        .select("query_id", "shard_id", "__docid", "_id", "_score")
    )


def score_sum_fuse_tagged(tagged: DataFrame, limit: int) -> DataFrame:
    """Score-sum fusion over ONE frame of per-recall results tagged
    with ``query_id`` (e.g. api.batch_search output) — the one-job
    variant of ``score_sum_fuse`` (no per-recall DataFrames, no
    repeated subtree execution)."""
    return (
        tagged.select("_id", "_score")
        .groupBy("_id")
        .agg(F.sum("_score").alias("_score"))
        .orderBy(F.col("_score").desc(), F.col("_id").asc())
        .limit(limit)
    )


def rrf_fuse_tagged(tagged: DataFrame, limit: int, k: int = RRF_K) -> DataFrame:
    """RRF over one query_id-tagged frame: rank within each recall by
    (_score desc, _id asc), contribute 1/(rank+k), sum — the one-job
    variant of ``rrf_fuse``."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("_id").asc()
    )
    return (
        tagged.select("query_id", "_id", "_score")
        .withColumn("__rank", F.row_number().over(w) - F.lit(1))
        .select(
            "_id",
            (F.lit(1.0) / (F.col("__rank") + F.lit(float(k)))).alias("_score"),
        )
        .groupBy("_id")
        .agg(F.sum("_score").alias("_score"))
        .orderBy(F.col("_score").desc(), F.col("_id").asc())
        .limit(limit)
    )


def rrf_fuse_lists(ranked_lists: List[List], k: int = RRF_K) -> dict:
    """Pure-function RRF over already-ranked id lists (unit-test surface,
    FIXTURES §F4 query 14)."""
    out: dict = {}
    for lst in ranked_lists:
        for i, key in enumerate(lst):
            out[key] = out.get(key, 0.0) + 1.0 / (i + k)
    return out

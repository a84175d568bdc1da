"""Vector KNN search over a stored array<float> column (SURVEY §2.1 Q3).

The reference's vector path is Lucene HNSW with COSINE similarity
(KnnFloatVectorQuery, reference: RetrievalWorker.java:346-366; field def
SchemaUtils.java:104-110, maxConn=16 beamWidth=100). Our Spark-first
equivalents:

- EXACT brute-force cosine top-k (this module): the dot products are
  pure Catalyst expressions over the columnar docs scan — at any k,
  strictly better recall than HNSW (recall 1.0), and on a cluster the
  scan parallelizes perfectly. Filters compose as ordinary Column
  predicates BEFORE scoring — exactly Lucene's filtered-KNN semantics.
- APPROXIMATE path at extreme scale: the persisted
  functions/similarity.LshVectorIndex — bucket ids are PARTITION
  columns computed at build time, so a query's probe set prunes whole
  bucket directories (the engine's analog of the reference's
  index-time HNSW graph).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from byzer_retrieval_spark.functions.similarity import _cosine_expr
from byzer_retrieval_spark.operators.context import IndexContext
from byzer_retrieval_spark.plans.query import SearchQuery


def vector_topk(ctx: IndexContext, query: SearchQuery) -> DataFrame:
    """Filtered exact KNN: top-k by cosine over ``query.vector_field``.

    Returns (_score=cosine, stored fields...), ordered (score desc, _id).
    """
    from byzer_retrieval_spark.operators.filtering import filtered_docs

    cand = filtered_docs(ctx, query.filters)
    docs = cand if cand is not None else ctx.docs()
    docs = ctx.exclude_tombstones(docs)
    stored = ctx.stored_columns()
    scored = docs.withColumn(
        "_score", _cosine_expr(query.vector_field, [float(x) for x in query.vector])
    )
    return (
        scored.orderBy(F.col("_score").desc(), F.col("_id").asc())
        .limit(query.limit)
        .select("_score", *stored)
    )

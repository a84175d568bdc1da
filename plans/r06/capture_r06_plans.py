"""Capture .explain("formatted") for every query path touched in the
round-6 optimization, writing plans/r06/<name>_{before,after}.txt.

Run AFTER from the repo root:   python plans/r06/capture_r06_plans.py after
Run BEFORE from the r5 worktree: PYTHONPATH=/tmp/r5_baseline \
    python plans/r06/capture_r06_plans.py before
(the script only uses APIs present in both trees)
"""

from __future__ import annotations

import io
import os
import shutil
import sys
from contextlib import redirect_stdout

OUT = os.path.dirname(os.path.abspath(__file__))
TAG = sys.argv[1] if len(sys.argv) > 1 else "after"


def cap(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    import numpy as np

    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.operators.wand import search_wand
    from byzer_retrieval_spark.plans.query import SearchQuery
    from byzer_retrieval_spark.session import get_spark
    from byzer_retrieval_spark.sources.corpus import corpus_df

    spark = get_spark(app_name=f"plans_r06_{TAG}", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    root = f"/tmp/plans_r06_{TAG}"
    shutil.rmtree(root, ignore_errors=True)
    eng = RetrievalEngine(spark, root)
    src = corpus_df(spark, 2000, partitions=8, embedding_dim=16)
    cfg = IndexConfig(num_shards=4, hot_term_split_threshold=256)
    eng.build(src, cfg=cfg, resume=False)
    eng.build_vector_ann("embedding", kind="ivf", num_clusters=8)
    ctx = eng.query_ctx()

    def qvec(seed: int):
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(16)
        return [float(x) for x in (v / np.linalg.norm(v))]

    plans = {}

    # WAND single keyword query (stats attachment shape changed in r6)
    plans["wand_term_query"] = cap(
        search_wand(ctx, SearchQuery(keyword="import return",
                                     fields=["content"], limit=10))
    )
    # prefix query (kept the broadcast-stats shape in r6)
    plans["wand_prefix_query"] = cap(
        search_wand(ctx, SearchQuery(keyword="sym_1* class",
                                     fields=["content"], limit=10))
    )
    # full single-query search with stored fields
    plans["search_fast_full"] = cap(
        eng.search(SearchQuery(keyword="import return",
                               fields=["content"], limit=10))
    )
    # batch keyword path
    plans["batch_search"] = cap(
        eng.batch_search(
            [SearchQuery(keyword=f"sym_{i}_0 import", fields=["content"],
                         limit=10) for i in range(8)]
        )
    )
    # mixed gated/ungated batch (r6: split stream + cogroup frames)
    plans["batch_search_mixed_gated"] = cap(
        eng.batch_search(
            [SearchQuery(keyword=f"sym_{i}_0 import", fields=["content"],
                         filters=(
                             {"and": [{"field": "lang", "value": "python"}]}
                             if i % 4 == 3 else {}
                         ),
                         limit=10) for i in range(8)]
        )
    )
    # batched unfiltered + filtered vector probes (r6: slim rank
    # windows, no dedup exchange on the unreplicated IVF index)
    plans["batch_vector_ann"] = cap(
        eng.batch_search(
            [SearchQuery(vector=qvec(10 + i), vector_field="embedding",
                         limit=10) for i in range(6)]
        )
    )
    plans["batch_vector_ann_filtered"] = cap(
        eng.batch_search(
            [SearchQuery(vector=qvec(30 + i), vector_field="embedding",
                         filters={"and": [{"field": "lang",
                                           "value": "python"}]},
                         limit=10) for i in range(6)]
        )
    )
    # single vector query over the persisted IVF index
    plans["vector_topk_ann"] = cap(
        eng.search(SearchQuery(vector=qvec(1), vector_field="embedding",
                               limit=10))
    )
    # hybrid keyword+vector RRF
    plans["hybrid_rrf"] = cap(
        eng.search(SearchQuery(keyword="import return", fields=["content"],
                               vector=qvec(2), vector_field="embedding",
                               limit=10))
    )
    # the build's postings pipeline (write plan shape: stage A -> shuffle
    # -> stage B); captured via the blocks lineage rebuilt the same way
    # build_index does
    from pyspark.sql import functions as F

    from byzer_retrieval_spark.functions.analyzer import tokenize_expr

    staged = ctx.docs().select("shard_id", "__docid", "_id")
    try:
        from byzer_retrieval_spark.operators.indexer import (
            POSTING_BLOCK_SCHEMA,
            POSTING_SEGMENT_SCHEMA,
            _segment_merge_builder,
            _segment_postings_builder,
        )

        sel = corpus_df(spark, 200, partitions=4).select(
            F.lit(0).alias("shard_id"),
            F.monotonically_increasing_id().alias("__docid"),
            F.coalesce(F.col("content"), F.lit("")).alias("content"),
        )
        blocks = (
            sel.mapInArrow(
                _segment_postings_builder("content", ["import"], 256, False,
                                          split_in_arrow=True),
                schema=POSTING_SEGMENT_SCHEMA,
            )
            .repartition("shard_id", "field", "term", "split_id")
            .sortWithinPartitions("shard_id", "field", "term", "split_id")
            .mapInArrow(_segment_merge_builder(128),
                        schema=POSTING_BLOCK_SCHEMA)
        )
        plans["build_postings_pipeline"] = cap(blocks)
    except ImportError:
        from byzer_retrieval_spark.operators.indexer import (
            PARTIAL_POSTING_SCHEMA,
            POSTING_BLOCK_SCHEMA,
            _merge_block_builder,
            _partial_postings_builder,
        )

        toks = tokenize_expr(F.coalesce(F.col("content"), F.lit("")),
                             "whitespace")
        sel = corpus_df(spark, 200, partitions=4).select(
            F.lit(0).alias("shard_id"),
            F.monotonically_increasing_id().alias("__docid"),
            toks.alias("toks"),
        )
        blocks = (
            sel.mapInArrow(
                _partial_postings_builder("content", ["import"], 256, False),
                schema=PARTIAL_POSTING_SCHEMA,
            )
            .repartition("shard_id", "field", "term", "split_id")
            .sortWithinPartitions("shard_id", "field", "term", "split_id",
                                  "__docid")
            .mapInArrow(_merge_block_builder(128), schema=POSTING_BLOCK_SCHEMA)
        )
        plans["build_postings_pipeline"] = cap(blocks)

    for name, text in plans.items():
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(text)
        print("wrote", f"{name}_{TAG}.txt")


if __name__ == "__main__":
    main()

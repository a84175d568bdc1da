"""Lucene-faithful dl quantization (SmallFloat byte4 norms, SURVEY §1.3).

With IndexConfig(lucene_dl_quantization=True), posting blocks carry the
byte4-rounded dl while avgdl stays exact — both engine scorer paths must
be SCORE-identical to the brute-force oracle running the same quantized
formula."""

import numpy as np
import pytest

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.functions.bm25 import quantize_dl, quantize_dl_expr
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery


def test_quantize_expr_matches_numpy(spark):
    from pyspark.sql import functions as F

    vals = [0, 1, 5, 23, 24, 25, 40, 100, 127, 128, 129, 1000, 5000, 123456]
    df = spark.createDataFrame([(v,) for v in vals], "dl int")
    got = [r["q"] for r in df.select(quantize_dl_expr(F.col("dl")).alias("q")).collect()]
    assert got == list(quantize_dl(np.array(vals)))


@pytest.fixture(scope="module")
def quantized_engine(spark, corpus_rows, tmp_path_factory):
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("idx_q")))
    src = spark.createDataFrame(
        [{k: v for k, v in r.items() if k != "_id"} for r in corpus_rows]
    )
    eng.build(
        src,
        cfg=IndexConfig(
            num_shards=4, hot_term_split_threshold=64, lucene_dl_quantization=True
        ),
        resume=False,
    )
    return eng


@pytest.mark.parametrize(
    "keyword", ["def return", "import", "sym_17_0", "+def +class lambda"]
)
def test_quantized_score_identity(quantized_engine, corpus_rows, keyword):
    oracle = BM25Oracle(
        corpus_rows, text_field="content", key_field="_id",
        lucene_dl_quantization=True,
    )
    q = SearchQuery(keyword=keyword, fields=["content"], limit=10)
    exp = oracle.search(keyword, limit=10)
    fast = [(r["_id"], r["_score"]) for r in quantized_engine.search(q).collect()]
    slow = [(r["_id"], r["_score"]) for r in quantized_engine.search_slow(q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow]
    np.testing.assert_allclose([f[1] for f in fast], [e[1] for e in exp], rtol=1e-12)
    np.testing.assert_allclose([s[1] for s in slow], [e[1] for e in exp], rtol=1e-12)


def test_quantization_changes_scores(quantized_engine, corpus_rows):
    """Sanity: quantized scores actually differ from exact-dl scores
    (guards against the flag silently not applying)."""
    exact_oracle = BM25Oracle(corpus_rows, text_field="content", key_field="_id")
    q_oracle = BM25Oracle(
        corpus_rows, text_field="content", key_field="_id",
        lucene_dl_quantization=True,
    )
    e = dict(exact_oracle.search("def return", limit=50))
    qd = dict(q_oracle.search("def return", limit=50))
    diffs = [k for k in e if k in qd and abs(e[k] - qd[k]) > 1e-12]
    assert diffs, "quantization should perturb at least one score"

"""Multi-analyzed-field queries with phrase / prefix / fuzzy / group
clauses: the reference weights every field 1.0 and sums per-field clause
scores (RetrievalWorker.java:341). The WAND fast path and the DataFrame
path are independent implementations — rank+score agreement across both
is the consistency check (the single-field brute-force oracle is
exercised elsewhere)."""

import numpy as np
import pytest

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.operators.scorer_df import search_df
from byzer_retrieval_spark.operators.wand import search_fast
from byzer_retrieval_spark.plans.query import SearchQuery

ROWS = [
    {"_id": "1", "title": "quick brown fox", "body": "the lazy dog sleeps"},
    {"_id": "2", "title": "lazy dog", "body": "quick brown cat and quick brown dog"},
    {"_id": "3", "title": "brown quick inverted", "body": "dog fox dog"},
    {"_id": "4", "title": "unrelated words", "body": "nothing to see here"},
    {"_id": "5", "title": "quick brown quick", "body": "quick brown everywhere"},
    {"_id": "6", "title": "quibk brown", "body": "typo laden quikc text"},
]


@pytest.fixture(scope="module")
def mf_engine(spark, tmp_path_factory):
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("idx_mf")))
    eng.build(
        spark.createDataFrame(ROWS),
        cfg=IndexConfig(
            num_shards=2, analyzed_fields=("title", "body"), id_columns=()
        ),
        resume=False,
    )
    return eng


QUERIES = [
    '"quick brown"',            # phrase matched in both fields sums
    '"quick brown" dog',
    '+"quick brown" -fox',
    "qui*",                     # prefix hits title AND body → 2.0
    "qui* dog",
    "quick~1",                  # fuzzy: quick/quibk/quikc
    "+quick~1 -fox",
    "+(dog cat) quick",
    "quick brown dog fox",      # plain multi-term across fields
]


@pytest.mark.parametrize("keyword", QUERIES)
def test_multifield_fast_equals_slow(mf_engine, keyword):
    q = SearchQuery(keyword=keyword, limit=10)  # no fields → all analyzed
    ctx = mf_engine.ctx()
    fast = [(r["_id"], round(r["_score"], 9)) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], round(r["_score"], 9)) for r in search_df(ctx, q).collect()]
    assert fast == slow
    assert len(fast) > 0


def test_multifield_prefix_counts_per_field(mf_engine):
    """CONSTANT_SCORE is per field-clause: doc 5 matches qui* in BOTH
    fields → score 2.0; doc 1 only in title → 1.0."""
    q = SearchQuery(keyword="qui*", limit=10)
    got = {r["_id"]: r["_score"] for r in mf_engine.search(q).collect()}
    assert got["5"] == pytest.approx(2.0)  # qui* in title AND body
    assert got["1"] == pytest.approx(1.0)  # qui* in title only


def test_multifield_phrase_sums_fields(mf_engine):
    """Doc 5 contains 'quick brown' in title AND body — its phrase score
    is the sum of two per-field phrase clauses, so it outranks docs
    matching in one field with equal tf."""
    q = SearchQuery(keyword='"quick brown"', limit=10)
    rows = [(r["_id"], r["_score"]) for r in mf_engine.search(q).collect()]
    assert rows[0][0] == "5"

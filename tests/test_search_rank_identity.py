"""Oracle end-to-end rank-identity (SURVEY §5.2, FIXTURES §F4 queries 1-6).

Both scorer paths (WAND fast path, DataFrame slow path) must return the
same top-k _ids in the same order as the brute-force BM25 oracle, with
scores equal to float64 tolerance."""

import numpy as np
import pytest

from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery


@pytest.fixture(scope="module")
def oracle(corpus_rows):
    return BM25Oracle(corpus_rows, text_field="content", key_field="_id")


def both_paths(eng, q):
    fast = [(r["_id"], r["_score"]) for r in eng.search(q).collect()]
    slow = [(r["_id"], r["_score"]) for r in eng.search_slow(q).collect()]
    return fast, slow


def assert_rank_identical(got, exp):
    assert [g[0] for g in got] == [e[0] for e in exp]
    if got:
        np.testing.assert_allclose(
            [g[1] for g in got], [e[1] for e in exp], rtol=1e-9
        )


QUERIES = [
    ("sym_17_0", 10),          # F4-1 rare term df=1
    ("import", 10),            # F4-2 hot term (block-max skipping)
    ("def return", 10),        # F4-3 multi-term OR
    ("+import -sym_17_0", 10), # F4-4 required/negated
    ("self class lambda", 15),
    ("+def +class lambda", 10),
]


@pytest.mark.parametrize("keyword,k", QUERIES)
def test_rank_identity(corpus_engine, oracle, keyword, k):
    q = SearchQuery(keyword=keyword, fields=["content"], limit=k)
    exp = oracle.search(keyword, limit=k)
    fast, slow = both_paths(corpus_engine, q)
    assert_rank_identical(fast, exp)
    assert_rank_identical(slow, exp)


def test_match_all_with_filter(corpus_engine, oracle, corpus_rows):
    # F4-5: keyword "*" + lang filter (RetrievalWorker.java:336-338)
    filt = {"and": [{"field": "lang", "value": "python"}]}
    q = SearchQuery(keyword="*", filters=filt, limit=1000)
    got = corpus_engine.search(q).collect()
    exp = oracle.search("*", filters=filt, limit=1000)
    assert [r["_id"] for r in got] == [e[0] for e in exp]
    assert all(r["_score"] == 1.0 for r in got)
    assert all(r["lang"] == "python" for r in got)


def test_nested_boolean_filter_with_keyword(corpus_engine, oracle):
    # F4-6: nested and/or filter tree + keyword (Utils.java:258-304)
    filt = {
        "and": [
            {"field": "lang", "value": "java"},
            {
                "or": [
                    {"field": "repo", "value": "org1/repo1"},
                    {"field": "repo", "value": "org3/repo3"},
                ]
            },
        ]
    }
    q = SearchQuery(keyword="class", fields=["content"], filters=filt, limit=10)
    exp = oracle.search("class", filters=filt, limit=10)
    got = [(r["_id"], r["_score"]) for r in corpus_engine.search(q).collect()]
    assert_rank_identical(got, exp)


def test_filters_never_affect_scores(corpus_engine, oracle):
    # Occur.FILTER semantics (Utils.java:303): a doc's score is the same
    # with and without a filter it passes
    q_all = SearchQuery(keyword="def", fields=["content"], limit=200)
    scored = {r["_id"]: r["_score"] for r in corpus_engine.search(q_all).collect()}
    filt = {"and": [{"field": "lang", "value": "python"}]}
    q_f = SearchQuery(keyword="def", fields=["content"], filters=filt, limit=200)
    for r in corpus_engine.search(q_f).collect():
        assert r["_score"] == pytest.approx(scored[r["_id"]], rel=1e-12)


def test_empty_and_pure_negative(corpus_engine):
    assert corpus_engine.search(SearchQuery(keyword="", limit=5)).count() == 0
    assert corpus_engine.search(SearchQuery(keyword="-import", limit=5)).count() == 0
    assert (
        corpus_engine.search(SearchQuery(keyword="zz_never_a_term", limit=5)).count()
        == 0
    )


def test_wand_pruning_engages_and_stays_exact(corpus_engine, oracle):
    """The 'import' query has >32 blocks (pruning active); exactness is
    covered above — here we assert the fast path really returns k and
    agrees with the slow path on a larger k."""
    q = SearchQuery(keyword="import return", fields=["content"], limit=50)
    fast, slow = both_paths(corpus_engine, q)
    assert len(fast) == 50
    assert [f[0] for f in fast] == [s[0] for s in slow]

"""Prefix queries (SimpleQueryParser ``foo*``, RetrievalWorker.java:339-343):
CONSTANT_SCORE multi-term expansion, rank-identical across the WAND fast
path, the DataFrame path, and the brute-force oracle."""

import numpy as np
import pytest

from byzer_retrieval_spark.operators.scorer_df import search_df
from byzer_retrieval_spark.operators.wand import search_fast
from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery, parse_keyword


@pytest.fixture(scope="module")
def oracle(corpus_rows):
    return BM25Oracle(corpus_rows, text_field="content", key_field="_id")


def test_parse_prefixes():
    p = parse_keyword("imp* +sym* -ret* def")
    assert p.prefixes == ("imp",)
    assert p.must_prefixes == ("sym",)
    assert p.not_prefixes == ("ret",)
    assert p.should == ("def",)
    # lone '*' stays match-all; trailing '*' on empty stem is a term char
    assert parse_keyword("*").match_all


PREFIX_QUERIES = [
    ("imp*", 10),               # pure prefix (constant score, _id order)
    ("imp* def", 10),           # prefix + scored term
    ("+sym_17* import", 10),    # must prefix
    ("def -sym_17*", 10),       # not prefix
]


@pytest.mark.parametrize("keyword,k", PREFIX_QUERIES)
def test_prefix_rank_identity(corpus_engine, oracle, keyword, k):
    q = SearchQuery(keyword=keyword, fields=["content"], limit=k)
    ctx = corpus_engine.ctx()
    exp = oracle.search(keyword, limit=k)
    fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow]
    if fast:
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_prefix_has_matches(corpus_engine, oracle):
    assert len(oracle.search("imp*", limit=5)) > 0
    assert len(oracle.search("+sym_17* import", limit=5)) > 0


FUZZY_QUERIES = [
    ("impor~1", 10),            # 1-edit fuzzy ('import' matches)
    ("impor~1 def", 10),        # fuzzy + scored term
    ("+impor~1 class", 10),     # must fuzzy
    ("def -impor~1", 10),       # not fuzzy
    ("retur~ def", 10),         # default maxEdits=2
]


@pytest.mark.parametrize("keyword,k", FUZZY_QUERIES)
def test_fuzzy_rank_identity(corpus_engine, oracle, keyword, k):
    q = SearchQuery(keyword=keyword, fields=["content"], limit=k)
    ctx = corpus_engine.ctx()
    exp = oracle.search(keyword, limit=k)
    fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow]
    if fast:
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_parse_fuzzy():
    p = parse_keyword("impor~1 +foo~ -bar~3 baz")
    assert p.fuzzies == (("impor", 1),)
    assert p.must_fuzzies == (("foo", 2),)
    assert p.not_fuzzies == (("bar", 3),)
    assert p.should == ("baz",)


GROUP_QUERIES = [
    ("+(import return) def", 10),   # must-any group + scored term
    ("+(sym_17_0 sym_18_0) import", 10),
    ("(def class) -lambda", 10),    # plain group = flattened OR
    ("-(lambda await) import", 10), # -(a b) == -a -b
    ("def | class", 10),            # | is the OR separator
]


@pytest.mark.parametrize("keyword,k", GROUP_QUERIES)
def test_group_rank_identity(corpus_engine, oracle, keyword, k):
    q = SearchQuery(keyword=keyword, fields=["content"], limit=k)
    ctx = corpus_engine.ctx()
    exp = oracle.search(keyword, limit=k)
    fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow]
    if fast:
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_parse_groups():
    p = parse_keyword("+(a b) (c d) -(e f) g | h")
    assert p.must_any_groups == (("a", "b"),)
    assert set(p.should) >= {"a", "b", "c", "d", "g", "h"}
    assert "|" not in p.should
    assert set(p.must_not) == {"e", "f"}


def test_group_equivalence_pipe_vs_space(corpus_engine, oracle):
    a = oracle.search("def | class", limit=20)
    b = oracle.search("def class", limit=20)
    assert a == b

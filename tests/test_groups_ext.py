"""Nested groups and phrase/prefix/fuzzy members inside groups
(SimpleQueryParser long-tail, round-3): parse shapes + rank identity
across the WAND fast path, the DataFrame path and the brute-force
oracle. Reference: RetrievalWorker.java:339-341 gets these free from
Lucene's SimpleQueryParser."""

import numpy as np
import pytest

from byzer_retrieval_spark.operators.scorer_df import search_df
from byzer_retrieval_spark.operators.wand import search_fast
from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery, parse_keyword


def test_parse_nested_and_member_kinds():
    p = parse_keyword("+(a (b c)) d")
    assert set(p.must_any_groups[0]) == {"a", "b", "c"}
    assert set(p.should) == {"a", "b", "c", "d"}
    p = parse_keyword('+("a b" c* d~1 e) f')
    assert set(p.any_groups_ext[0]) == {
        ("phrase", ("a", "b"), 0),
        ("prefix", "c"),
        ("fuzzy", "d", 1),
        ("term", "e"),
    }
    # the legacy term projection omits mixed groups entirely (a partial
    # projection would read as a stricter gate)
    assert p.must_any_groups == ()
    assert p.phrases == (("a", "b"),) and p.prefixes == ("c",)
    p = parse_keyword('-("a b" c) d')
    assert p.not_phrases == (("a", "b"),) and "c" in p.must_not
    p = parse_keyword('+("a b"~2 c)')
    assert ("phrase", ("a", "b"), 2) in p.any_groups_ext[0]
    assert p.near_phrases == ((("a", "b"), 2),)
    # quotes shield parens; plain groups add no gate
    p = parse_keyword("(a b) c")
    assert p.must_any_groups == () and set(p.should) == {"a", "b", "c"}
    # round 4: a nested -(...) is now the GROUP's local MUST_NOT (the
    # true nested-BooleanQuery semantics; r3 hoisted it to a top-level
    # NOT, which was stricter) — the group compiles to bool_groups
    p = parse_keyword("(a -(spam ham)) d")
    assert p.bool_groups == (
        (
            "should",
            (("term", "a"),),
            (),
            (("term", "spam"), ("term", "ham")),
        ),
    )
    assert set(p.should) == {"d"} and p.must_not == ()
    p = parse_keyword("+(a -(spam)) d")
    assert p.bool_groups[0][0] == "must"
    assert p.bool_groups[0][3] == (("term", "spam"),)


def test_parse_group_local_signs():
    """Round 4 — the last SimpleQueryParser gap: ``+``/``-`` on atoms
    INSIDE a group compile to nested-BooleanQuery bool_groups."""
    p = parse_keyword("(+a b) c")
    assert p.bool_groups == (
        ("should", (("term", "b"),), (("term", "a"),), ()),
    )
    assert set(p.should) == {"c"}
    p = parse_keyword("(a -b) c")
    assert p.bool_groups == (
        ("should", (("term", "a"),), (), (("term", "b"),)),
    )
    p = parse_keyword('+(+"a b" c* -d~1)')
    assert p.bool_groups == (
        (
            "must",
            (("prefix", "c"),),
            (("phrase", ("a", "b"), 0),),
            (("fuzzy", "d", 1),),
        ),
    )
    # sign-free groups keep the exact flattening path
    p = parse_keyword("(a b) c")
    assert p.bool_groups == () and set(p.should) == {"a", "b", "c"}


@pytest.fixture(scope="module")
def oracle(corpus_rows):
    return BM25Oracle(corpus_rows, text_field="content", key_field="_id")


GROUP_QUERIES = [
    '+("import return" sym_3_0) def',   # phrase-or-rare-term gate
    '+(sym_1* class) return',           # prefix member gate
    '+(impor~1 lambda) def',            # fuzzy member gate
    '+(def (class lambda)) if',         # nested plain group
    '-("import return" lambda) def if', # NOT group with phrase member
    '+("def if"~2 sym_2_0) return',     # slop phrase member gate
]


@pytest.mark.parametrize("keyword", GROUP_QUERIES)
def test_group_ext_rank_identity(corpus_engine, oracle, keyword):
    q = SearchQuery(keyword=keyword, fields=["content"], limit=10)
    ctx = corpus_engine.ctx()
    exp = oracle.search(keyword, limit=10)
    fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow], keyword
    if fast:
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_group_gate_actually_gates(corpus_engine, oracle):
    """A +group whose members miss a doc must exclude it even when the
    other should-clauses match strongly."""
    kw = '+("zzz qqq" nonexistent_member_xyz) def return'
    q = SearchQuery(keyword=kw, fields=["content"], limit=10)
    assert corpus_engine.search(q).count() == 0
    assert oracle.search(kw, limit=10) == []


BOOL_GROUP_QUERIES = [
    "(+def return) lambda",        # group-local MUST + should member
    "(def -return) lambda",        # group-local NOT
    "(+def +class) if",            # two group-local MUSTs
    "+(+class -lambda def) return",  # MUST group with local +/-
    "-(+def class) return",        # NOT group with a local MUST
    '(+"def return" class) if',    # phrase as group-local MUST
    "(sym_1* -def) return",        # prefix should + local NOT
    "(a -(spam ham)) def",         # nested -(...) = group-local NOT
]


@pytest.mark.parametrize("keyword", BOOL_GROUP_QUERIES)
def test_bool_group_rank_identity(corpus_engine, oracle, keyword):
    """Group-local +/- — first-class in the WAND scorer as of round 5:
    search_fast must ACCEPT these queries (no declarative fallback) and
    both paths must be rank- AND score-identical to the brute-force
    oracle."""
    q = SearchQuery(keyword=keyword, fields=["content"], limit=10)
    ctx = corpus_engine.ctx()
    exp = oracle.search(keyword, limit=10)
    fast_df = search_fast(ctx, q)
    assert fast_df is not None, f"WAND path refused bool-group query {keyword!r}"
    fast = [(r["_id"], r["_score"]) for r in fast_df.collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow], keyword
    if fast:
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_bool_group_conditional_score(corpus_engine, oracle):
    """The group's member scores must NOT leak into docs the group does
    not match: with '(def -return) lambda', a doc containing def AND
    return scores ONLY lambda."""
    kw = "(def -return) lambda"
    got = {
        r["_id"]: r["_score"]
        for r in corpus_engine.search(
            SearchQuery(keyword=kw, fields=["content"], limit=1000)
        ).collect()
    }
    exp = dict(oracle.search(kw, limit=10**6))
    assert got == pytest.approx(exp)

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
    # a signed NESTED group must never invert: -(...) atoms become NOTs
    p = parse_keyword("(a -(spam ham)) d")
    assert set(p.should) == {"a", "d"} and set(p.must_not) == {"spam", "ham"}
    p = parse_keyword("+(a -(spam)) d")
    assert p.must_any_groups == (("a",),) and "spam" in p.must_not


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

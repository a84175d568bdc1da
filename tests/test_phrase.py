"""Phrase queries (Lucene SimpleQueryParser '"..."' syntax,
RetrievalWorker.java:339-341): rank identity across the WAND fast path,
the DataFrame path, and the brute-force oracle, with phrase clauses in
SHOULD / MUST / MUST_NOT roles and positions round-tripping through
upsert and compaction."""

import numpy as np
import pytest

from byzer_retrieval_spark.operators.scorer_df import search_df
from byzer_retrieval_spark.operators.wand import search_fast
from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery, parse_keyword


@pytest.fixture(scope="module")
def oracle(corpus_rows):
    return BM25Oracle(corpus_rows, text_field="content", key_field="_id")


def test_parse_phrases():
    p = parse_keyword('"a b" +"c d e" -"x y" foo +bar -baz "solo"')
    assert p.phrases == (("a", "b"),)
    assert p.must_phrases == (("c", "d", "e"),)
    assert p.not_phrases == (("x", "y"),)
    # one-token phrases degrade to terms, keeping their +/- role
    assert "solo" in p.should and "bar" in p.must and "baz" in p.must_not
    assert set(p.phrase_terms) == {"a", "b", "c", "d", "e", "x", "y"}


PHRASE_QUERIES = [
    ('"import import"', 10),
    ('"import return"', 10),
    ('"def if" class', 10),          # phrase + should term
    ('+"import return" -lambda', 10),  # must phrase + not term
    ('self -"import import"', 10),   # not phrase
    ('"return if public"', 10),      # 3-term phrase
]


@pytest.mark.parametrize("keyword,k", PHRASE_QUERIES)
def test_phrase_rank_identity(corpus_engine, oracle, keyword, k):
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


def test_phrase_has_matches(corpus_engine, oracle):
    """Guard against a vacuous test: the corpus must actually contain
    the tested phrases."""
    exp = oracle.search('"import import"', limit=5)
    assert len(exp) > 0


def test_phrase_survives_upsert_and_compact(spark, corpus_rows, tmp_path):
    """Positions must round-trip through the delta (upsert) path and the
    compaction re-encode."""
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    rows = [
        {"_id": "1", "content": "alpha beta gamma"},
        {"_id": "2", "content": "beta alpha beta gamma"},
        {"_id": "3", "content": "gamma beta alpha"},
    ]
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    q = SearchQuery(keyword='"beta gamma"', fields=["content"], limit=10)
    ids = [r["_id"] for r in eng.search(q).collect()]
    assert set(ids) == {"1", "2"}

    # upsert doc 3 so it now contains the phrase (delta segment)
    eng.upsert(spark.createDataFrame([{"_id": "3", "content": "beta gamma beta gamma"}]))
    ids = [r["_id"] for r in eng.search(q).collect()]
    assert "3" in ids and set(ids) == {"1", "2", "3"}

    # delete doc 1 and compact: positions re-encoded per surviving posting
    eng.delete_by_ids(["1"])
    eng.compact()
    ids = [r["_id"] for r in eng.search(q).collect()]
    assert set(ids) == {"2", "3"}


def test_group_gate_applies_to_phrase_only_docs(spark, tmp_path):
    """'+(a b) "x y"' on a corpus where a doc matches the phrase but
    neither group term: the must-ANY group gate must exclude it even
    when NO group term has postings in the doc's shard (regression:
    empty-clause exact() returned group_hits=[] and the gate was
    skipped for merge_extras docs)."""
    import hashlib

    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.plans.query import SearchQuery

    rows = [
        {"_id": str(i), "content": c}
        for i, c in enumerate(
            [
                "x y only phrase here",       # phrase, NO group term
                "aterm x y together",         # phrase AND group term
                "bterm without the phrase",   # group term, no phrase
                "x alone y alone",            # neither (no adjacency)
            ]
        )
    ]
    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(
            num_shards=2,
            analyzed_fields=("content",),
            id_columns=(),
            hot_term_split_threshold=64,
        ),
        resume=False,
    )
    q = SearchQuery(keyword='+(aterm bterm) "x y"', fields=["content"], limit=10)
    fast = sorted(r["_id"] for r in eng.search(q).collect())
    slow = sorted(r["_id"] for r in eng.search_slow(q).collect())
    # doc 1 (phrase + group term) and doc 2 (group term; bare phrase is
    # a SHOULD clause) match; doc 0 (phrase only) must NOT
    assert fast == slow == ["1", "2"], (fast, slow)

    # guaranteed empty-term-clause shard: NO group term exists anywhere,
    # so the must-ANY group is unsatisfiable → zero results even though
    # the phrase matches (pre-fix: the phrase doc leaked through)
    q2 = SearchQuery(
        keyword='+(nosuchterm othernosuch) "x y"', fields=["content"], limit=10
    )
    assert eng.search(q2).count() == 0
    assert eng.search_slow(q2).count() == 0


def test_parse_slop_phrases():
    p = parse_keyword('"a b"~2 +"c d"~1 -"x y"~3 "e f" plain')
    assert p.near_phrases == ((("a", "b"), 2),)
    assert p.must_near_phrases == ((("c", "d"), 1),)
    assert p.not_near_phrases == ((("x", "y"), 3),)
    assert p.phrases == (("e", "f"),)  # slop-0 stays an exact phrase
    assert set(p.phrase_terms) >= {"a", "b", "c", "d", "x", "y", "e", "f"}


SLOP_QUERIES = [
    ('"import return"~1', 10),
    ('"import return"~2 class', 10),     # near + should term
    ('"def if"~3', 10),
    ('+"import return"~2 -lambda', 10),  # must near + not term
    ('self -"import return"~1', 10),     # not near
    ('"return if public"~1', 10),        # 3-term near
]


@pytest.mark.parametrize("keyword,k", SLOP_QUERIES)
def test_slop_phrase_rank_identity(corpus_engine, oracle, keyword, k):
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


def test_slop_zero_via_tilde_equals_exact_phrase(corpus_engine, oracle):
    """`"a b"~0` must behave exactly like `"a b"` (both parse to the
    exact-phrase clause)."""
    p = parse_keyword('"import return"~0')
    assert p.phrases == (("import", "return"),) and not p.near_phrases


def test_three_term_slop_minimal_match_parity(spark, tmp_path):
    """Round 4: the NEAR matcher uses Lucene's minimal-match condition
    for ANY arity — a selection of one position per term with adjusted
    spread <= slop must exist. 'a c b' vs "a b c"~1 has minimal spread
    2 (the classic transposition-needs-slop-2 case), so it must NOT
    match at slop 1 (the r3 per-member ±slop matcher wrongly accepted
    it); 'a b x c' has spread 1 and must match. Engine fast path, the
    declarative path and the python oracle must all agree."""
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    rows = [
        {"_id": "swap", "content": "a c b"},
        {"_id": "gap", "content": "a b x c"},
        {"_id": "exact", "content": "a b c"},
        {"_id": "far", "content": "a x x x b x x c"},
    ]
    eng = RetrievalEngine(spark, str(tmp_path / "slop3"))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    oracle = BM25Oracle(rows, text_field="content", key_field="_id")
    for kw, expected in [
        ('"a b c"~1', {"gap", "exact"}),
        ('"a b c"~2', {"swap", "gap", "exact"}),
        ('"a b c"~0', {"exact"}),
    ]:
        q = SearchQuery(keyword=kw, fields=["content"], limit=10)
        ctx = eng.ctx()
        fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
        slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
        exp = oracle.search(kw, limit=10)
        assert {f[0] for f in fast} == expected, kw
        assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow], kw
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_repeated_term_slop_injective_assignment(spark, tmp_path):
    """Round 4: repeated-term sloppy phrases require an INJECTIVE
    position assignment — no two slots of a repeated term may share one
    physical position (Lucene SloppyPhraseMatcher advanceRepeats). For
    '"a b a"~2' the doc 'a b x x x a' has tf(a)=2 and a window that the
    r3 necessary-condition matcher accepted by reusing a@0 for slots 0
    and 2, but every true assignment has adjusted spread >= 3 — it must
    NOT match. WAND fast path, declarative path, the one-job batch path
    and the python oracle must all agree."""
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    rows = [
        {"_id": "reuse", "content": "a b x x x a"},
        {"_id": "good", "content": "a b c a"},
        {"_id": "exact", "content": "a b a"},
        {"_id": "single", "content": "a b c"},
    ]
    eng = RetrievalEngine(spark, str(tmp_path / "repslop"))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    oracle = BM25Oracle(rows, text_field="content", key_field="_id")
    for kw, expected in [
        ('"a b a"~2', {"good", "exact"}),  # 'reuse' is the pinned reject
        ('"a b a"~1', {"good", "exact"}),
        ('"a b a"', {"exact"}),
    ]:
        q = SearchQuery(keyword=kw, fields=["content"], limit=10)
        ctx = eng.ctx()
        fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
        slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
        exp = oracle.search(kw, limit=10)
        assert {f[0] for f in fast} == expected, kw
        assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow], kw
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )
    # the one-job batch path rides the same _phrase_match
    batch = eng.batch_search(
        [SearchQuery(keyword='"a b a"~2', fields=["content"], limit=10)]
    ).collect()
    assert {r["_id"] for r in batch} == {"good", "exact"}


def test_sloppy_freq_weight_reorders_loose_matches(spark, tmp_path):
    """Round 5: each sloppy match weighs 1/(L+1) with L its minimal
    window length (Lucene SloppyPhraseMatcher sloppyFreq). For
    '"a b"~2', doc 'loose' ('a x x b a x x b') has TWO matches at L=2
    (phrase_tf = 2/3) while doc 'tight' ('a b c c c c c c') has ONE
    exact match (phrase_tf = 1): under the r4 weight-1 semantics loose
    (tf 2) outranked tight (tf 1); sloppyFreq must rank tight first.
    WAND fast path, declarative path, the one-job batch path and the
    python oracle must all agree on the REORDER."""
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    rows = [
        {"_id": "loose", "content": "a x x b a x x b"},
        {"_id": "tight", "content": "a b c c c c c c"},
    ]
    eng = RetrievalEngine(spark, str(tmp_path / "sloppyfreq"))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    oracle = BM25Oracle(rows, text_field="content", key_field="_id")
    assert oracle.near_tf(0, ("a", "b"), 2) == pytest.approx(2.0 / 3.0)
    assert oracle.near_tf(1, ("a", "b"), 2) == pytest.approx(1.0)
    q = SearchQuery(keyword='"a b"~2', fields=["content"], limit=10)
    ctx = eng.ctx()
    fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    exp = oracle.search('"a b"~2', limit=10)
    assert [f[0] for f in fast] == ["tight", "loose"]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow]
    assert fast[0][1] > fast[1][1]
    np.testing.assert_allclose(
        [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
    )
    batch = eng.batch_search([q]).collect()
    assert [r["_id"] for r in batch] == ["tight", "loose"]

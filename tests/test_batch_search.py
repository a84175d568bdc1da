"""Batch query fan-out (operators/batch.py): N queries in ONE job must
be rank- AND score-identical, per query, to N individual searches."""

import time

import numpy as np
import pytest

from byzer_retrieval_spark.plans.query import SearchQuery


QUERIES = [
    "def return",
    "import",
    "sym_17_0",
    "+import -sym_17_0",
    "self class lambda",
    "+def +class lambda",
    "nonexistent_term_xyz def",
]


def test_batch_matches_single(corpus_engine):
    qs = [SearchQuery(keyword=k, fields=["content"], limit=10) for k in QUERIES]
    batched = corpus_engine.batch_search(qs)
    rows = batched.collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["query_id"], []).append((r["_id"], r["_score"]))
    for qid, q in enumerate(qs):
        single = [
            (r["_id"], r["_score"]) for r in corpus_engine.search(q).collect()
        ]
        got = by_qid.get(qid, [])
        assert [g[0] for g in got] == [s[0] for s in single], (qid, q.keyword)
        if got:
            np.testing.assert_allclose(
                [g[1] for g in got], [s[1] for s in single], rtol=1e-12
            )


def test_vector_queries_not_batchable():
    """A hybrid/vector query must never run through the keyword-only
    batch scorer (it would silently drop the vector recall)."""
    from byzer_retrieval_spark.operators.batch import is_batchable
    from byzer_retrieval_spark.plans.query import parse_keyword

    q = SearchQuery(keyword="merge vector", vector=[0.1, 0.2], vector_field="embedding")
    assert not is_batchable(parse_keyword(q.keyword, "whitespace"), q)
    q2 = SearchQuery(keyword="merge vector")
    assert is_batchable(parse_keyword(q2.keyword, "whitespace"), q2)


def test_operator_rejects_match_all(corpus_engine):
    """The low-level operator still refuses match-all (no scoring
    clauses to share — the engine facade is what falls back); phrases
    are batchable since round 4."""
    from byzer_retrieval_spark.operators.batch import batch_search

    with pytest.raises(ValueError, match="not batchable"):
        batch_search(
            corpus_engine.query_ctx(),
            [SearchQuery(keyword="*", fields=["content"], limit=5)],
        )


def test_batch_phrases_match_single(corpus_engine):
    """Exact and sloppy phrase clauses (should/must/not kinds) run IN
    the one-job batch scorer (round 4) and must stay rank- and
    score-identical to the per-query WAND path."""
    from byzer_retrieval_spark.operators.batch import is_batchable
    from byzer_retrieval_spark.plans.query import parse_keyword

    kws = [
        '"def return"',
        '"def return"~2 class',
        '+"def return" import',
        '-"def return" import',
        '"return def"~3',
    ]
    qs = [SearchQuery(keyword=k, fields=["content"], limit=10) for k in kws]
    for q in qs:
        assert is_batchable(parse_keyword(q.keyword, "whitespace"), q), q.keyword
    rows = corpus_engine.batch_search(qs).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["query_id"], []).append((r["_id"], r["_score"]))
    for qid, q in enumerate(qs):
        single = [
            (r["_id"], r["_score"]) for r in corpus_engine.search(q).collect()
        ]
        got = by_qid.get(qid, [])
        assert [g[0] for g in got] == [s[0] for s in single], (qid, q.keyword)
        if got:
            np.testing.assert_allclose(
                [g[1] for g in got], [s[1] for s in single], rtol=1e-12
            )


def test_batch_universal_shapes_match_single(corpus_engine):
    """Filtered, prefix, fuzzy, group, phrase (fallback) and plain-term
    queries in ONE batch must each be rank- and score-identical to the
    single-query path (reference filter() accepts ANY SearchQuery list,
    RetrievalMaster.java:201-250)."""
    qs = [
        SearchQuery(
            keyword="def return",
            fields=["content"],
            filters={"and": [{"field": "lang", "value": "py"}]},
            limit=10,
        ),
        SearchQuery(keyword="sym_1* def", fields=["content"], limit=10),
        SearchQuery(keyword="impor~1", fields=["content"], limit=10),
        SearchQuery(keyword="+(def class) lambda", fields=["content"], limit=10),
        SearchQuery(keyword='"def return"', fields=["content"], limit=10),
        SearchQuery(keyword="import self", fields=["content"], limit=10),
    ]
    rows = corpus_engine.batch_search(qs).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["query_id"], []).append((r["_id"], r["_score"]))
    for qid, q in enumerate(qs):
        single = [
            (r["_id"], r["_score"]) for r in corpus_engine.search(q).collect()
        ]
        got = by_qid.get(qid, [])
        assert [g[0] for g in got] == [s[0] for s in single], (qid, q.keyword)
        if got:
            np.testing.assert_allclose(
                [g[1] for g in got], [s[1] for s in single], rtol=1e-12
            )


def test_batch_respects_tombstones(spark, corpus_rows, tmp_path):
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    src = spark.createDataFrame(
        [{k: v for k, v in r.items() if k != "_id"} for r in corpus_rows[:60]]
    )
    eng.build(src, cfg=IndexConfig(num_shards=2, hot_term_split_threshold=64), resume=False)
    q = SearchQuery(keyword="def return", fields=["content"], limit=10)
    before = [r["_id"] for r in eng.search(q).collect()]
    eng.delete_by_ids(before[:2])
    got = [r["_id"] for r in eng.batch_search([q]).collect()]
    single = [r["_id"] for r in eng.search(q).collect()]
    assert got == single
    assert not (set(before[:2]) & set(got))


def test_batch_amortizes_scheduling(corpus_engine):
    """The batch's win is paying the job floor once: 20 queries in one
    job must run much faster than 20 sequential jobs (conservatively
    pinned at 4x to stay robust to host noise)."""
    kws = [f"sym_{i}_0 def" for i in range(20)]
    qs = [SearchQuery(keyword=k, fields=["content"], limit=5) for k in kws]
    t0 = time.time()
    corpus_engine.batch_search(qs).collect()
    t_batch = time.time() - t0
    t0 = time.time()
    for q in qs[:5]:
        corpus_engine.search(q).collect()
    t_five = time.time() - t0
    est_sequential = t_five * 4  # 20 queries
    assert t_batch < est_sequential, (t_batch, est_sequential)


def test_batch_tombstones_do_not_displace_live_docs(spark, corpus_rows, tmp_path):
    """Delete MOST of the current top-k: the batch result must equal the
    single-query result exactly — deleted docs must be denied BEFORE the
    per-shard top-k cut, or live lower-ranked docs get displaced."""
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    src = spark.createDataFrame(
        [{k: v for k, v in r.items() if k != "_id"} for r in corpus_rows[:80]]
    )
    eng.build(src, cfg=IndexConfig(num_shards=2, hot_term_split_threshold=64), resume=False)
    q = SearchQuery(keyword="def return", fields=["content"], limit=10)
    top = [r["_id"] for r in eng.search(q).collect()]
    eng.delete_by_ids(top[:8])  # kill 8 of the top 10
    single = [(r["_id"], r["_score"]) for r in eng.search(q).collect()]
    got = [(r["_id"], r["_score"]) for r in eng.batch_search([q]).collect()]
    assert len(single) == 10  # corpus has plenty of live matches left
    assert got == single


def test_batch_respects_per_query_fields(spark, tmp_path):
    """Two queries over DIFFERENT analyzed fields in one batch: each
    must score and gate only against ITS field."""
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    rows = [
        {"_id": str(i), "title": t, "body": b}
        for i, (t, b) in enumerate(
            [
                ("alpha beta", "gamma delta"),
                ("alpha alpha", "delta delta"),
                ("beta", "alpha alpha alpha"),   # 'alpha' only in body
                ("gamma", "alpha beta"),
            ]
        )
    ]
    eng = RetrievalEngine(spark, str(tmp_path / "idx2"))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(
            num_shards=2,
            analyzed_fields=("title", "body"),
            id_columns=(),
            hot_term_split_threshold=64,
        ),
        resume=False,
    )
    qt = SearchQuery(keyword="alpha", fields=["title"], limit=10)
    qb = SearchQuery(keyword="alpha", fields=["body"], limit=10)
    batched = eng.batch_search([qt, qb]).collect()
    by_qid = {}
    for r in batched:
        by_qid.setdefault(r["query_id"], []).append((r["_id"], r["_score"]))
    for qid, q in [(0, qt), (1, qb)]:
        single = [(r["_id"], r["_score"]) for r in eng.search(q).collect()]
        assert by_qid.get(qid, []) == single, (qid, by_qid.get(qid), single)
    # doc 2 has 'alpha' only in body: must NOT appear for the title query
    assert "2" not in [i for i, _ in by_qid[0]]
    assert "2" in [i for i, _ in by_qid[1]]


def test_batch_bool_groups_match_single(corpus_engine):
    """Group-local +/- (nested BooleanQuery) and +(...) gates with
    phrase/prefix/fuzzy members are batchable as of round 5 — every
    shape must be rank- and score-identical to the single-query WAND
    path in ONE batch."""
    from byzer_retrieval_spark.operators.batch import is_batchable
    from byzer_retrieval_spark.plans.query import parse_keyword

    kws = [
        "(+def return) lambda",          # group-local MUST
        "(def -return) lambda",          # group-local NOT
        "+(+class -lambda def) return",  # MUST group with local +/-
        "-(+def class) return",          # NOT group with a local MUST
        '(+"def return" class) if',      # phrase as group-local MUST
        "(sym_1* -def) return",          # prefix should + local NOT
        '+("import return" sym_3_0) def',  # phrase member +(...) gate
        "+(sym_1* class) return",        # prefix member +(...) gate
        "+(impor~1 lambda) def",         # fuzzy member +(...) gate
        "def return",                    # plain control
    ]
    qs = [SearchQuery(keyword=k, fields=["content"], limit=10) for k in kws]
    for q in qs:
        assert is_batchable(parse_keyword(q.keyword, "whitespace"), q), q.keyword
    rows = corpus_engine.batch_search(qs).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["query_id"], []).append((r["_id"], r["_score"]))
    for qid, q in enumerate(qs):
        single = [
            (r["_id"], r["_score"]) for r in corpus_engine.search(q).collect()
        ]
        got = by_qid.get(qid, [])
        assert [g[0] for g in got] == [s[0] for s in single], (qid, q.keyword)
        if got:
            np.testing.assert_allclose(
                [g[1] for g in got], [s[1] for s in single], rtol=1e-9
            )


def test_batch_match_all_members(corpus_engine):
    """Round 5: match-all keyword members of a batch ride the
    batch_filter one-scan machinery (shared docs scan, constant 1.0
    score, _id tie order) instead of per-query fallback — results must
    be identical to per-query search(): filters honored (stored AND
    analyzed leaves), q.sorts IGNORED exactly like search() does."""
    qs = [
        SearchQuery(keyword="*", fields=["content"], limit=7),
        SearchQuery(
            keyword="*",
            filters={"and": [{"field": "lang", "value": "python"}]},
            limit=5,
        ),
        SearchQuery(
            keyword="*",
            filters={"field": "content", "value": "import"},
            limit=6,
        ),
        SearchQuery(keyword="def return", fields=["content"], limit=5),
        # sorts must be ignored for match-all (score-ordered surface)
        SearchQuery(
            keyword="*",
            sorts=[{"field": "path", "order": "desc"}],
            limit=4,
        ),
        # a filter matching nothing → empty member, others unaffected
        SearchQuery(
            keyword="*",
            filters={"and": [{"field": "lang", "value": "cobol"}]},
            limit=3,
        ),
    ]
    rows = corpus_engine.batch_search(qs).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["query_id"], []).append((r["_id"], r["_score"]))
    assert by_qid.get(5, []) == []
    for qid, q in enumerate(qs):
        single = [
            (r["_id"], r["_score"]) for r in corpus_engine.search(q).collect()
        ]
        got = by_qid.get(qid, [])
        assert [g[0] for g in got] == [s[0] for s in single], qid
        assert [g[1] for g in got] == [s[1] for s in single], qid

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


def test_batch_rejects_unbatchable(corpus_engine):
    with pytest.raises(ValueError, match="not batchable"):
        corpus_engine.batch_search(
            [SearchQuery(keyword='"def return"', fields=["content"], limit=5)]
        )
    with pytest.raises(ValueError, match="not batchable"):
        corpus_engine.batch_search(
            [SearchQuery(keyword="def", filters={"and": [{"field": "lang", "value": "go"}]}, limit=5)]
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

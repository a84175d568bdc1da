"""Fusion across recalls (F4-13) + checkpoint/resume (north_rule)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.plans.query import SearchQuery


def test_score_sum_fusion(corpus_engine):
    """F4-13: two keyword recalls merged by groupBy(_id).sum(score) +
    global limit (RetrievalMaster.java:326-357)."""
    q1 = SearchQuery(keyword="def", fields=["content"], limit=30)
    q2 = SearchQuery(keyword="class", fields=["content"], limit=30)
    r1 = {r["_id"]: r["_score"] for r in corpus_engine.search(q1).collect()}
    r2 = {r["_id"]: r["_score"] for r in corpus_engine.search(q2).collect()}
    exp = {}
    for d in (r1, r2):
        for k, v in d.items():
            exp[k] = exp.get(k, 0.0) + v
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = corpus_engine.multi_search([q1, q2], limit=10).collect()
    assert [r["_id"] for r in got] == [t[0] for t in top]
    for r, t in zip(got, top):
        assert r["_score"] == pytest.approx(t[1], rel=1e-9)


def test_rrf_fusion_dataframe(corpus_engine):
    """RRF over two recalls: 1/(rank+60), 0-based (RetrievalMaster.java:179)."""
    q1 = SearchQuery(keyword="def", fields=["content"], limit=20)
    q2 = SearchQuery(keyword="class", fields=["content"], limit=20)
    l1 = [r["_id"] for r in corpus_engine.search(q1).collect()]
    l2 = [r["_id"] for r in corpus_engine.search(q2).collect()]
    from byzer_retrieval_spark.operators.fusion import rrf_fuse_lists

    exp = sorted(rrf_fuse_lists([l1, l2]).items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = corpus_engine.multi_search([q1, q2], rrf=True, limit=10).collect()
    assert [r["_id"] for r in got] == [e[0] for e in exp]
    for r, e in zip(got, exp):
        assert r["_score"] == pytest.approx(e[1], rel=1e-9)


# ---- resume-from-checkpoint -----------------------------------------------
def test_resume_skips_unchanged_shards(spark, corpus_rows, tmp_path):
    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    src = spark.createDataFrame(
        [{k: v for k, v in r.items() if k != "_id"} for r in corpus_rows]
    )
    cfg = IndexConfig(num_shards=4, hot_term_split_threshold=64)
    m1 = eng.build(src, cfg=cfg, resume=True, source_desc="run1")
    assert m1["shards_built"] == 4

    # full re-run over identical input: nothing recomputed
    m2 = eng.build(src, cfg=cfg, resume=True, source_desc="run2")
    assert m2["shards_built"] == 0
    assert m2["shards_skipped_by_resume"] == 4

    # simulate an interrupted build: one shard's manifest lost
    store = eng.store()
    store.clear_shard_manifest(2)
    m3 = eng.build(src, cfg=cfg, resume=True, source_desc="run3")
    assert m3["shards_built"] == 1
    assert m3["shards_skipped_by_resume"] == 3

    # stats identical to a from-scratch build
    stats_a = {
        (r["field"], r["term"]): (r["df"], r["cf"])
        for r in store.stats(spark).collect()
    }
    eng2 = RetrievalEngine(spark, str(tmp_path / "idx_fresh"))
    eng2.build(src, cfg=cfg, resume=False)
    stats_b = {
        (r["field"], r["term"]): (r["df"], r["cf"])
        for r in eng2.store().stats(spark).collect()
    }
    assert stats_a == stats_b

    # and search results identical
    q = SearchQuery(keyword="def return", fields=["content"], limit=10)
    a = [(r["_id"], r["_score"]) for r in eng.search(q).collect()]
    b = [(r["_id"], r["_score"]) for r in eng2.search(q).collect()]
    assert a == b


def test_resume_rebuilds_changed_shard(spark, corpus_rows, tmp_path):
    """A changed row changes its shard's fingerprint → only that shard
    rebuilds; results reflect the new content."""
    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    rows = [{k: v for k, v in r.items() if k != "_id"} for r in corpus_rows[:50]]
    cfg = IndexConfig(num_shards=4, hot_term_split_threshold=10**9)
    eng.build(spark.createDataFrame(rows), cfg=cfg, resume=True)

    rows2 = [dict(r) for r in rows]
    rows2[7]["content"] = rows2[7]["content"] + " freshterm_xyz"
    m = eng.build(spark.createDataFrame(rows2), cfg=cfg, resume=True)
    assert 1 <= m["shards_built"] < 4
    got = eng.search(
        SearchQuery(keyword="freshterm_xyz", fields=["content"], limit=5)
    ).collect()
    assert len(got) == 1 and got[0]["path"] == rows2[7]["path"]


def test_multi_search_one_job_path_matches_per_query(corpus_engine):
    """multi_search's batched fusion (rrf_fuse_tagged /
    score_sum_fuse_tagged over ONE batch_search job) must be
    value-identical to the per-query recalls + list fusion."""
    from byzer_retrieval_spark.operators.fusion import rrf_fuse, score_sum_fuse
    from byzer_retrieval_spark.plans.query import SearchQuery

    qs = [
        SearchQuery(keyword="def return", fields=["content"], limit=15),
        SearchQuery(keyword="import self", fields=["content"], limit=15),
        SearchQuery(keyword="+class lambda", fields=["content"], limit=15),
    ]
    recalls = [corpus_engine.search(q) for q in qs]
    for rrf in (False, True):
        got = [
            (r["_id"], round(r["_score"], 9))
            for r in corpus_engine.multi_search(qs, rrf=rrf).collect()
        ]
        ref_fuse = rrf_fuse(recalls, 15) if rrf else score_sum_fuse(recalls, 15)
        exp = [(r["_id"], round(r["_score"], 9)) for r in ref_fuse.collect()]
        assert got == exp, f"rrf={rrf}"


def test_multi_search_falls_back_for_phrase_recall(corpus_engine):
    """A phrase recall in the list forces the per-query path — results
    must still match the list fusion."""
    from byzer_retrieval_spark.operators.fusion import score_sum_fuse
    from byzer_retrieval_spark.plans.query import SearchQuery

    qs = [
        SearchQuery(keyword='"def return"', fields=["content"], limit=10),
        SearchQuery(keyword="import", fields=["content"], limit=10),
    ]
    got = [
        (r["_id"], round(r["_score"], 9))
        for r in corpus_engine.multi_search(qs).collect()
    ]
    recalls = [corpus_engine.search(q) for q in qs]
    exp = [
        (r["_id"], round(r["_score"], 9))
        for r in score_sum_fuse(recalls, 10).collect()
    ]
    assert got == exp

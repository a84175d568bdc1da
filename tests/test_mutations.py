"""Mutations: upsert-wins, deletes, truncate, compact (FIXTURES queries
11-12; reference W1-W7 semantics)."""

import pytest

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.plans.query import SearchQuery
from tests.conftest import F2_ROWS


@pytest.fixture()
def mut_engine(spark, tmp_path):
    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    eng.build(
        spark.createDataFrame(F2_ROWS),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    return eng


def q(keyword, **kw):
    return SearchQuery(keyword=keyword, fields=["content"], limit=10, **kw)


def test_upsert_wins(mut_engine, spark):
    """F4-11: re-ingest _id=2 with new content; old content must stop
    matching, new content must match (delete-then-insert semantics,
    RetrievalWorker.java:232-238)."""
    new = spark.createDataFrame(
        [{"_id": "2", "name": "b", "content": "completely different words",
          "raw_content": "completely different words"}]
    )
    mut_engine.upsert(new)
    ids = [r["_id"] for r in mut_engine.search(q("test document")).collect()]
    assert "2" not in ids and set(ids) == {"3", "4"}
    got = mut_engine.search(q("completely")).collect()
    assert [r["_id"] for r in got] == ["2"]
    assert got[0]["raw_content"] == "completely different words"
    # get_by_ids returns exactly one live version
    assert mut_engine.get_by_ids(["2"]).count() == 1


def test_delete_by_ids_then_requery(mut_engine):
    """F4-12a: deleteByIds([1]) then the query-9 family."""
    n = mut_engine.delete_by_ids(["1"])
    assert n == 1
    assert mut_engine.search(q("hello")).count() == 0
    assert mut_engine.get_by_ids(["1"]).count() == 0
    # other docs unaffected
    assert {r["_id"] for r in mut_engine.search(q("test")).collect()} == {"2", "3", "4"}


def test_delete_by_filter_plain_and_analyzed(mut_engine):
    """F4-12b: deleteByFilter on an exact field and on an analyzed field
    (value parsed as query — SchemaUtils.java:170-173)."""
    assert mut_engine.delete_by_filter({"name": "b"}) == 1
    assert mut_engine.search(
        q("hello", filters={"and": [{"field": "name", "value": "b"}]})
    ).count() == 0
    # analyzed-field condition: any token matches → deletes docs 3,4
    n = mut_engine.delete_by_filter({"content": "Another Third"})
    assert n == 2
    assert mut_engine.search(q("document")).count() == 0
    assert mut_engine.search(q("hello")).count() == 1  # doc 1 still live


def test_truncate(mut_engine):
    """F4-12c: truncate → match-all returns 0 (RetrievalWorker.java:395-406)."""
    mut_engine.truncate()
    store = mut_engine.store()
    assert store.current_snapshot() is None
    assert not store.read_shard_manifests()


def test_compact_refreshes_stats(mut_engine, spark):
    """Lucene-faithful: deleted docs stay in df/avgdl until merge;
    compact() is the merge."""
    ctx0 = mut_engine.ctx()
    n0 = ctx0.n_docs("content")
    mut_engine.delete_by_ids(["1"])
    # before compact: stats unchanged (tombstone only)
    ctx1 = mut_engine.ctx()
    assert ctx1.n_docs("content") == n0
    res = mut_engine.compact()
    assert res["compacted_shards"] >= 1
    ctx2 = mut_engine.ctx()
    assert ctx2.n_docs("content") == n0 - 1
    # doc 1's unique term is gone from stats
    from pyspark.sql import functions as F

    assert ctx2.stats().filter(F.col("term") == "hello").count() == 0
    # search still correct post-compact
    assert mut_engine.search(q("hello")).count() == 0
    assert {r["_id"] for r in mut_engine.search(q("test")).collect()} == {"2", "3", "4"}
    # scores post-compact equal a fresh build of the live corpus
    fresh_rows = [r for r in F2_ROWS if r["_id"] != "1"]
    root2 = mut_engine.root + "_fresh"
    eng2 = RetrievalEngine(spark, root2)
    eng2.build(
        spark.createDataFrame(fresh_rows),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    a = [(r["_id"], r["_score"]) for r in mut_engine.search(q("test document")).collect()]
    b = [(r["_id"], r["_score"]) for r in eng2.search(q("test document")).collect()]
    assert [x[0] for x in a] == [x[0] for x in b]
    for (_, sa), (_, sb) in zip(a, b):
        assert sa == pytest.approx(sb, rel=1e-12)


def test_upsert_then_compact_matches_fresh_build(mut_engine, spark):
    new = spark.createDataFrame(
        [{"_id": "2", "name": "b", "content": "completely different words",
          "raw_content": "x"}]
    )
    mut_engine.upsert(new)
    mut_engine.compact()
    ctx = mut_engine.ctx()
    assert ctx.n_docs() == 4  # still 4 live docs
    ids = [r["_id"] for r in mut_engine.search(q("different")).collect()]
    assert ids == ["2"]

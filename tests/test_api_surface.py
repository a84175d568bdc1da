"""Reference python-client surface parity: create_table (schema DSL),
BuildFromLocal (JSON rows, upsert semantics), search (JSON in/out)."""

import json

import pytest

from byzer_retrieval_spark.api import RetrievalEngine


@pytest.fixture()
def eng(spark, tmp_path):
    return RetrievalEngine(spark, str(tmp_path / "idx"))


REF_SCHEMA = (
    "st(field(_id,string),field(name,string),"
    "field(content,string,analyze),field(raw_content,string,no_index))"
)


def test_create_table_then_build_from_local_then_search_json(eng):
    """The reference's end-to-end flow (test_retrieval.py:258-289
    re-expressed): create table → BuildFromLocal JSON rows → commit
    (implicit snapshot) → search with a JSON SearchQuery."""
    cfg = eng.create_table("db1", "t1", REF_SCHEMA, num_shards=2)
    assert cfg.analyzed_fields == ("content",)
    assert "raw_content" in cfg.stored_fields

    rows = [
        json.dumps({"_id": "1", "name": "a", "content": "hello world",
                    "raw_content": "hello world"}),
        json.dumps({"_id": "2", "name": "b", "content": "This is a test document",
                    "raw_content": "This is a test document"}),
        json.dumps({"_id": "3", "name": "c", "content": "Another test document",
                    "raw_content": "Another test document"}),
    ]
    eng.build_from_local(rows, "db1", "t1")

    res = json.loads(
        eng.search_json(
            json.dumps(
                {"keyword": "test document", "fields": ["content"], "limit": 10}
            ),
            "db1",
            "t1",
        )
    )
    assert {r["_id"] for r in res} == {"2", "3"}
    assert all("_score" in r for r in res)
    assert all("content" not in r for r in res)  # Store.NO parity
    assert res[0]["raw_content"].endswith("document")

    # BuildFromLocal again = upsert by _id (updateDocument semantics)
    eng.build_from_local(
        [json.dumps({"_id": "2", "name": "b", "content": "replaced words",
                     "raw_content": "x"})],
        "db1",
        "t1",
    )
    res2 = json.loads(
        eng.search_json(
            json.dumps({"keyword": "test", "fields": ["content"], "limit": 10}),
            "db1",
            "t1",
        )
    )
    assert {r["_id"] for r in res2} == {"3"}

    # multi-query JSON → score-sum fusion output shape
    fused = json.loads(
        eng.search_json(
            json.dumps(
                [
                    {"keyword": "hello", "fields": ["content"], "limit": 10},
                    {"keyword": "replaced", "fields": ["content"], "limit": 10},
                ]
            ),
            "db1",
            "t1",
        )
    )
    assert {r["_id"] for r in fused} == {"1", "2"}


def test_build_from_local_requires_id(eng):
    eng.create_table("db1", "t2", REF_SCHEMA, num_shards=2)
    with pytest.raises(ValueError, match="_id"):
        eng.build_from_local([json.dumps({"name": "x", "content": "y"})], "db1", "t2")


def test_cluster_info_commit_shutdown(spark, tmp_path):
    """ClusterInfo / Commit / Shutdown parity surfaces
    (RetrievalFlightServer.java:131,306,354)."""
    import hashlib

    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.plans.query import SearchQuery
    from byzer_retrieval_spark.sources.corpus import gen_rows

    eng = RetrievalEngine(spark, str(tmp_path / "ci"))
    eng.build(
        spark.createDataFrame(gen_rows(50)),
        database="db1",
        table="t1",
        cfg=IndexConfig(num_shards=2, hot_term_split_threshold=64),
        resume=False,
    )
    info = eng.cluster_info()
    assert info["master"].startswith("local")
    t = [x for x in info["tables"] if (x["database"], x["table"]) == ("db1", "t1")]
    assert t and t[0]["n_docs"] == 50 and t[0]["num_shards"] == 2

    sid = eng.commit("db1", "t1")
    assert sid == eng.store("db1", "t1").current_snapshot_id() >= 0

    q = SearchQuery(keyword="def", fields=["content"], limit=5)
    assert eng.search(q, "db1", "t1").count() > 0
    eng.shutdown()  # caches dropped; engine still usable afterward
    assert eng.search(q, "db1", "t1").count() > 0

"""LocalByzerStorage client parity: the python_api.md flow end-to-end —
schema_builder → write_builder → query_builder (filters, sorts,
full-text, vector, hybrid) → deletes (python_api.md:24-232,
byzer_storage_direct_query_example.py:229-295)."""

import math

import pytest

from byzer_retrieval_spark.client import (
    DataType,
    FieldOption,
    LocalByzerStorage,
    SortOption,
)


@pytest.fixture(scope="module")
def storage(spark, tmp_path_factory):
    st = LocalByzerStorage(
        spark,
        str(tmp_path_factory.mktemp("byzer_store")),
        namespace="byzerai_store",
        database="my_database",
        table="my_table",
        num_shards=2,
    )
    (
        st.schema_builder()
        .add_field("_id", DataType.STRING)
        .add_field("title", DataType.STRING)
        .add_field("content", DataType.STRING, [FieldOption.ANALYZE])
        .add_field("raw_content", DataType.STRING, [FieldOption.NO_INDEX])
        .add_array_field("vector", DataType.FLOAT)
        .add_field("mtime", DataType.DOUBLE, [FieldOption.SORT])
        .add_field("is_active", DataType.INTEGER)
        .add_field("count", DataType.INTEGER)
        .execute()
    )
    items = []
    for i in range(12):
        items.append(
            {
                "_id": f"doc{i}",
                "title": f"title {i}",
                "content": (
                    "calculator module alpha" if i % 3 == 0 else "parser module beta"
                ),
                "raw_content": f"raw text {i}",
                "vector": [1.0, 0.0, 0.0] if i < 6 else [0.0, 1.0, 0.0],
                "mtime": 1_600_000_000.0 + i,
                "is_active": i % 2,
                "count": i * 10,
            }
        )
    st.write_builder().add_items(items, search_fields=["content"]).execute()
    assert st.commit()
    return st


def test_get_by_id(storage):
    doc = storage.get_by_id("doc3")
    assert doc["_id"] == "doc3" and doc["raw_content"] == "raw text 3"
    assert "content" not in doc  # Store.NO
    assert storage.get_by_id("missing") is None


def test_condition_query_sort_limit(storage):
    res = (
        storage.query_builder()
        .and_filter()
        .add_condition("is_active", 1)
        .build()
        .add_sort("mtime", SortOption.DESC)
        .set_limit(3)
        .execute()
    )
    assert [r["_id"] for r in res] == ["doc11", "doc9", "doc7"]


def test_full_text_search(storage):
    res = (
        storage.query_builder()
        .set_search_query("calculator", fields=["content"])
        .set_limit(10)
        .execute()
    )
    assert {r["_id"] for r in res} == {"doc0", "doc3", "doc6", "doc9"}
    assert all("_score" in r for r in res)


def test_vector_search(storage):
    res = (
        storage.query_builder()
        .set_vector_query([1.0, 0.0, 0.0], fields=["vector"])
        .set_limit(6)
        .execute()
    )
    assert {r["_id"] for r in res} == {f"doc{i}" for i in range(6)}
    assert all(math.isclose(r["_score"], 1.0, rel_tol=1e-6) for r in res)


def test_filtered_vector_search(storage):
    # LuceneKNNTest.java:22-110 semantics: filter applies BEFORE knn
    res = (
        storage.query_builder()
        .set_vector_query([1.0, 0.0, 0.0], fields=["vector"])
        .set_limit(12)
        .execute()
    )
    top6 = [r["_score"] for r in res[:6]]
    assert all(s > res[6]["_score"] for s in top6)

    res_f = (
        storage.query_builder()
        .set_vector_query([1.0, 0.0, 0.0], fields=["vector"])
        .set_limit(12)
        .execute()
    )
    qb = storage.query_builder()
    qb.set_vector_query([1.0, 0.0, 0.0], fields=["vector"]).set_limit(12)
    qb.and_filter().add_condition("is_active", 1).build()
    res_f = qb.execute()
    assert all(r["is_active"] == 1 for r in res_f)


def test_hybrid_rrf(storage):
    """keyword + vector → RRF fusion (LocalRetrievalMaster.java:185)."""
    qb = storage.query_builder()
    qb.set_search_query("calculator", fields=["content"])
    qb.set_vector_query([1.0, 0.0, 0.0], fields=["vector"])
    qb.set_limit(5)
    res = qb.execute()
    assert res
    # doc0 and doc3 match BOTH recalls (calculator + first-cluster vector)
    assert {"doc0", "doc3"} <= {r["_id"] for r in res}
    # RRF scores: two-recall max is 2/60 at ranks 0
    assert all(0 < r["_score"] <= 2.0 / 60 + 1e-9 for r in res)


def test_range_filter_builder(storage):
    qb = storage.query_builder()
    qb.and_filter().add_range("mtime", 1_600_000_002.0, 1_600_000_004.0).build()
    res = qb.set_limit(100).execute()
    assert {r["_id"] for r in res} == {"doc2", "doc3", "doc4"}


def test_delete_and_truncate(storage):
    assert storage.delete_by_id("doc5") == 1
    assert storage.get_by_id("doc5") is None
    res = (
        storage.query_builder()
        .set_search_query("parser", fields=["content"])
        .set_limit(20)
        .execute()
    )
    assert "doc5" not in {r["_id"] for r in res}
    assert storage.truncate_table()
    assert not storage.commit()  # no snapshot after truncate

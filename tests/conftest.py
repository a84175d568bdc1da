import hashlib
import shutil

import pytest

from byzer_retrieval_spark.session import get_spark
from byzer_retrieval_spark.sources.corpus import gen_rows


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus_rows():
    """200-file synthetic code corpus with python-side _id (matches the
    engine's sha256(repo|path|commit))."""
    rows = gen_rows(200)
    for r in rows:
        r["_id"] = hashlib.sha256(
            f"{r['repo']}|{r['path']}|{r['commit']}".encode()
        ).hexdigest()
    return rows


@pytest.fixture(scope="session")
def corpus_engine(spark, corpus_rows, tmp_path_factory):
    """Session-scoped engine with the corpus index built once."""
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    root = str(tmp_path_factory.mktemp("idx_corpus"))
    eng = RetrievalEngine(spark, root)
    src = spark.createDataFrame(
        [{k: v for k, v in r.items() if k != "_id"} for r in corpus_rows]
    )
    eng.build(
        src,
        cfg=IndexConfig(num_shards=4, hot_term_split_threshold=64),
        resume=False,
        source_desc="pytest corpus 200",
    )
    return eng


# F2 kv_docs — the reference's own test rows (LuceneKNNTest.java:55-103,
# test_retrieval.py:262-289), vectors dropped (out of v1 scope)
F2_ROWS = [
    {"_id": "1", "name": "a", "content": "hello world",
     "raw_content": "hello world"},
    {"_id": "2", "name": "b", "content": "This is a test document",
     "raw_content": "This is a test document"},
    {"_id": "3", "name": "c", "content": "Another test document",
     "raw_content": "Another test document"},
    {"_id": "4", "name": "d", "content": "Third test document",
     "raw_content": "Third test document"},
]


@pytest.fixture(scope="session")
def f2_engine(spark, tmp_path_factory):
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    root = str(tmp_path_factory.mktemp("idx_f2"))
    eng = RetrievalEngine(spark, root)
    eng.build(
        spark.createDataFrame(F2_ROWS),
        cfg=IndexConfig(
            num_shards=2, analyzed_fields=("content",), id_columns=()
        ),
        resume=False,
    )
    return eng


# F3 rag_files — byzer_storage example schema (python_api.md:46-57)
def f3_rows():
    rows = []
    for i in range(20):
        rows.append(
            {
                "_id": f"file{i:02d}",
                "file_path": f"/proj/src/f{i}.py" if i % 2 == 0 else f"/proj/doc/f{i}.md",
                "title": f"title file {i}",
                "content": f"calculator module number{i} "
                + ("alpha beta" if i % 3 == 0 else "gamma delta"),
                "raw_content": f"raw {i}",
                "mtime": 1_600_000_000.0 + i,
                "is_active": i % 2,
                "count": i * 10,
            }
        )
    return rows


@pytest.fixture(scope="session")
def f3_engine(spark, tmp_path_factory):
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig

    root = str(tmp_path_factory.mktemp("idx_f3"))
    eng = RetrievalEngine(spark, root)
    eng.build(
        spark.createDataFrame(f3_rows()),
        cfg=IndexConfig(
            num_shards=2, analyzed_fields=("content", "title"), id_columns=()
        ),
        resume=False,
    )
    return eng

"""Read-path concurrency: the snapshot-keyed context cache must be safe
under concurrent searches and invalidate correctly when a mutation
commits between queries."""

import hashlib
from concurrent.futures import ThreadPoolExecutor

import pytest

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.plans.query import SearchQuery
from byzer_retrieval_spark.sources.corpus import gen_rows


@pytest.fixture(scope="module")
def conc_engine(spark, tmp_path_factory):
    rows = gen_rows(300)
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("conc")))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=4, hot_term_split_threshold=64),
        resume=False,
    )
    return eng, rows


def test_parallel_searches_agree_with_serial(conc_engine):
    eng, _ = conc_engine
    queries = [
        SearchQuery(keyword=kw, fields=["content"], limit=10)
        for kw in ["def return", "import", "+def -import", '"def return"', "cls*"]
    ] * 4
    serial = [
        [(r["_id"], round(r["_score"], 6)) for r in eng.search(q).collect()]
        for q in queries
    ]
    with ThreadPoolExecutor(max_workers=8) as ex:
        parallel = list(
            ex.map(
                lambda q: [
                    (r["_id"], round(r["_score"], 6)) for r in eng.search(q).collect()
                ],
                queries,
            )
        )
    assert parallel == serial


def test_cache_invalidates_after_mutation(conc_engine):
    eng, rows = conc_engine
    q = SearchQuery(keyword="def return", fields=["content"], limit=10)
    before = eng.search(q).collect()
    assert before
    victim = before[0]["_id"]
    eng.delete_by_ids([victim])
    after = [r["_id"] for r in eng.search(q).collect()]
    assert victim not in after

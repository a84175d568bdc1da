"""Code-aware analyzer end-to-end: index built in `code` mode must be
rank-identical to the brute-force oracle in the same mode, with
case-insensitive matching (FIXTURES: query set 1-4, lowercased)."""

import hashlib

import numpy as np
import pytest

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery
from byzer_retrieval_spark.sources.corpus import gen_rows


@pytest.fixture(scope="module")
def code_engine(spark, tmp_path_factory):
    rows = gen_rows(100)
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("idx_code")))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=2, analyzer="code", hot_term_split_threshold=64),
        resume=False,
    )
    for r in rows:
        r["_id"] = hashlib.sha256(
            f"{r['repo']}|{r['path']}|{r['commit']}".encode()
        ).hexdigest()
    return eng, BM25Oracle(rows, mode="code")


@pytest.mark.parametrize(
    "keyword",
    [
        "IMPORT Return",          # uppercase query matches lowercased index
        "print x",                # code mode splits print(x) into tokens
        "+def -sym_3_0 class",
        '"import return"',        # phrase over code-mode positions
        "SYM_3* class",           # prefix (stem lowercased by the analyzer)
        "impor~1 def",            # fuzzy over the code-mode dictionary
        "+(def class) return",    # must-any group
    ],
)
def test_code_mode_rank_identity(code_engine, keyword):
    eng, oracle = code_engine
    q = SearchQuery(keyword=keyword, fields=["content"], limit=10)
    got = [(r["_id"], r["_score"]) for r in eng.search(q).collect()]
    slow = [(r["_id"], r["_score"]) for r in eng.search_slow(q).collect()]
    exp = oracle.search(keyword, limit=10)
    assert [g[0] for g in got] == [e[0] for e in exp] == [s[0] for s in slow]
    if got:
        np.testing.assert_allclose([g[1] for g in got], [e[1] for e in exp], rtol=1e-9)


def test_code_mode_punctuation_stripped(code_engine):
    eng, oracle = code_engine
    # whitespace mode treats 'print(x)' as one token; code mode finds 'print'
    q = SearchQuery(keyword="print", fields=["content"], limit=5)
    assert eng.search(q).count() == len(oracle.search("print", limit=5))
    assert eng.search(q).count() > 0

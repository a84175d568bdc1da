"""Seeded randomized cross-check: random corpora + random queries mixing
every supported SimpleQueryParser construct (terms, +/-, phrases,
prefixes, fuzzies, groups) must agree across the WAND fast path, the
DataFrame path, and the brute-force oracle. Deterministic (seeded) so
failures reproduce."""

import random

import numpy as np
import pytest

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.operators.scorer_df import search_df
from byzer_retrieval_spark.operators.wand import search_fast
from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "alphabet", "alpine", "betamax", "gamble", "delphi", "epsilom",
]


def _gen_docs(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        k = rng.randint(3, 14)
        rows.append({"_id": str(i), "content": " ".join(rng.choices(VOCAB, k=k))})
    return rows


def _gen_query(rng: random.Random) -> str:
    parts = []
    n_clauses = rng.randint(1, 4)
    for _ in range(n_clauses):
        role = rng.choice(["", "", "", "+", "-"])
        kind = rng.choice(["term", "term", "phrase", "prefix", "fuzzy", "group"])
        if kind == "term":
            parts.append(role + rng.choice(VOCAB))
        elif kind == "phrase":
            w = rng.sample(VOCAB, 2)
            parts.append(f'{role}"{w[0]} {w[1]}"')
        elif kind == "prefix":
            parts.append(role + rng.choice(["alp", "bet", "gam", "del", "ep"]) + "*")
        elif kind == "fuzzy":
            parts.append(role + rng.choice(["alpa", "betta", "gama", "delto"]) + "~1")
        else:
            w = rng.sample(VOCAB, 2)
            parts.append(f"{role}({w[0]} {w[1]})")
    q = " ".join(parts)
    # a query with only prohibited clauses matches nothing in every
    # implementation — keep at least one positive clause for signal
    if all(p.startswith("-") for p in parts):
        q += " " + rng.choice(VOCAB)
    return q


@pytest.fixture(scope="module")
def rand_engine(spark, tmp_path_factory):
    rng = random.Random(20260816)
    rows = _gen_docs(rng, 80)
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("idx_rand")))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=3, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    return eng, rows


def test_random_query_cross_check(rand_engine):
    eng, rows = rand_engine
    oracle = BM25Oracle(rows, text_field="content", key_field="_id")
    rng = random.Random(7)
    ctx = eng.ctx()
    checked = 0
    for i in range(14):
        kw = _gen_query(rng)
        q = SearchQuery(keyword=kw, fields=["content"], limit=20)
        exp = oracle.search(kw, limit=20)
        fast_df = search_fast(ctx, q)
        fast = (
            [(r["_id"], r["_score"]) for r in fast_df.collect()]
            if fast_df is not None
            else None
        )
        slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
        assert [s[0] for s in slow] == [e[0] for e in exp], (kw, slow[:5], exp[:5])
        if fast is not None:
            assert [f[0] for f in fast] == [e[0] for e in exp], (kw, fast[:5], exp[:5])
            if fast:
                np.testing.assert_allclose(
                    [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9,
                    err_msg=kw,
                )
        checked += 1
    assert checked == 14

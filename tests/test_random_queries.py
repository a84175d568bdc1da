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


# ---- round 5: FULL-grammar fuzz (signed groups, repeated-term sloppy
# phrases, fuzzies, per-query filters) at N >= 200 via the one-job batch


def _gen_docs_full(rng: random.Random, n: int):
    cats = ["py", "java", "go", "rs"]
    rows = []
    for i in range(n):
        k = rng.randint(3, 16)
        rows.append(
            {
                "_id": f"{i:04d}",
                "content": " ".join(rng.choices(VOCAB, k=k)),
                "num": rng.randint(0, 99),
                "cat": rng.choice(cats),
            }
        )
    return rows


def _gen_member(rng: random.Random) -> str:
    kind = rng.choice(["term", "term", "prefix", "phrase"])
    if kind == "term":
        return rng.choice(VOCAB)
    if kind == "prefix":
        return rng.choice(["alp", "bet", "gam", "del", "ep"]) + "*"
    w = rng.sample(VOCAB, 2)
    return f'"{w[0]} {w[1]}"'


def _gen_query_full(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 4)):
        role = rng.choice(["", "", "", "+", "-"])
        kind = rng.choice(
            [
                "term", "term", "phrase", "slop", "slop_rep",
                "prefix", "fuzzy", "group", "signed_group",
            ]
        )
        if kind == "term":
            parts.append(role + rng.choice(VOCAB))
        elif kind == "phrase":
            w = rng.sample(VOCAB, rng.randint(2, 3))
            parts.append(role + '"' + " ".join(w) + '"')
        elif kind == "slop":
            w = rng.sample(VOCAB, rng.randint(2, 3))
            parts.append(role + '"' + " ".join(w) + f'"~{rng.randint(1, 3)}')
        elif kind == "slop_rep":
            # sample WITH replacement from a tight subset → repeated
            # terms exercise the injective-assignment matcher
            w = rng.choices(VOCAB[:4], k=rng.randint(2, 3))
            parts.append(role + '"' + " ".join(w) + f'"~{rng.randint(1, 3)}')
        elif kind == "prefix":
            parts.append(role + rng.choice(["alp", "bet", "gam", "del", "ep"]) + "*")
        elif kind == "fuzzy":
            parts.append(
                role
                + rng.choice(["alpa", "betta", "gama", "delto", "alphabat"])
                + f"~{rng.randint(1, 2)}"
            )
        elif kind == "group":
            ms = [_gen_member(rng) for _ in range(rng.randint(2, 3))]
            parts.append(role + "(" + " ".join(ms) + ")")
        else:  # signed_group: group-local +/- with >= 1 positive member
            ms = [_gen_member(rng)]
            for _ in range(rng.randint(1, 2)):
                ms.append(rng.choice(["+", "-", ""]) + _gen_member(rng))
            rng.shuffle(ms)
            parts.append(role + "(" + " ".join(ms) + ")")
    if all(p.startswith("-") for p in parts):
        parts.append(rng.choice(VOCAB))
    return " ".join(parts)


def _gen_filters(rng: random.Random):
    leaves = []
    if rng.random() < 0.6:
        lo = rng.randint(0, 60)
        leaves.append({"field": "num", "min": lo, "max": lo + rng.randint(5, 40)})
    if rng.random() < 0.5:
        leaves.append({"field": "cat", "value": rng.choice(["py", "java", "go", "rs"])})
    if not leaves:
        return {}
    if len(leaves) == 1:
        return leaves[0]
    return {rng.choice(["and", "or"]): leaves}


@pytest.fixture(scope="module")
def rand_engine_full(spark, tmp_path_factory):
    rng = random.Random(20260817)
    rows = _gen_docs_full(rng, 120)
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("idx_rand5")))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=3, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    return eng, rows


def test_full_grammar_batch_fuzz(rand_engine_full):
    """Round 5: N=200 queries drawn from the COMPLETE grammar — signed
    groups, repeated-term sloppy phrases (sloppyFreq weights), fuzzies,
    per-query filters — run through the ONE-JOB batch and compared to
    the brute-force oracle per query (ids AND scores)."""
    eng, rows = rand_engine_full
    oracle = BM25Oracle(rows, text_field="content", key_field="_id")
    rng = random.Random(99)
    queries, specs = [], []
    for _ in range(200):
        kw = _gen_query_full(rng)
        filt = _gen_filters(rng) if rng.random() < 0.4 else {}
        queries.append(
            SearchQuery(keyword=kw, filters=filt, fields=["content"], limit=15)
        )
        specs.append((kw, filt))
    res = eng.batch_search(queries).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append((r["_id"], r["_score"]))
    n_nonempty = 0
    for qid, (kw, filt) in enumerate(specs):
        got = sorted(by_q.get(qid, []), key=lambda kv: (-kv[1], kv[0]))
        exp = oracle.search(kw, filters=filt, limit=15)
        assert [g[0] for g in got] == [e[0] for e in exp], (qid, kw, filt)
        if got:
            n_nonempty += 1
            np.testing.assert_allclose(
                [g[1] for g in got], [e[1] for e in exp], rtol=1e-9,
                err_msg=f"{qid}: {kw} {filt}",
            )
    assert n_nonempty >= 100  # non-vacuous: most queries return rows


# ---- round 5: the same full grammar under per_shard_stats mode (each
# shard scores with its OWN df/N/avgdl — reference numNodes>1 parity).
# The oracle is the merge of per-shard BM25Oracles, with the shard
# membership predicted driver-side by routing.engine_shard (pure-python
# XXH64) — so this fuzz also end-to-end-validates the hash against the
# engine's real pmod(xxhash64(_id), n) sharding: a single hash mismatch
# would misplace a doc's stats and break rank identity.


@pytest.fixture(scope="module")
def rand_engine_pss(spark, tmp_path_factory):
    rng = random.Random(20260818)
    rows = _gen_docs_full(rng, 120)
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("idx_rand_pss")))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(
            num_shards=3,
            analyzed_fields=("content",),
            id_columns=(),
            per_shard_stats=True,
        ),
        resume=False,
    )
    return eng, rows


def _merged_pss_oracle(rows, kw, filt, limit, num_shards=3):
    from byzer_retrieval_spark.functions.routing import engine_shard

    out = []
    for s in range(num_shards):
        sub_rows = [r for r in rows if engine_shard(r["_id"], num_shards) == s]
        if not sub_rows:
            continue
        sub = BM25Oracle(sub_rows, text_field="content", key_field="_id")
        out.extend(sub.search(kw, filters=filt, limit=limit))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out[:limit]


def test_full_grammar_batch_fuzz_per_shard_stats(rand_engine_pss):
    """N=120 full-grammar queries (signed groups, sloppy phrases,
    fuzzies, filters) through the ONE-JOB batch on a per-shard-stats
    index, each vs the merged per-shard oracle (ids AND scores)."""
    eng, rows = rand_engine_pss
    rng = random.Random(515)
    queries, specs = [], []
    for _ in range(120):
        kw = _gen_query_full(rng)
        filt = _gen_filters(rng) if rng.random() < 0.4 else {}
        queries.append(
            SearchQuery(keyword=kw, filters=filt, fields=["content"], limit=15)
        )
        specs.append((kw, filt))
    by_q = {}
    for r in eng.batch_search(queries).collect():
        by_q.setdefault(r["query_id"], []).append((r["_id"], r["_score"]))
    n_nonempty = 0
    for qid, (kw, filt) in enumerate(specs):
        got = sorted(by_q.get(qid, []), key=lambda kv: (-kv[1], kv[0]))
        exp = _merged_pss_oracle(rows, kw, filt, 15)
        assert [g[0] for g in got] == [e[0] for e in exp], (qid, kw, filt)
        if got:
            n_nonempty += 1
            np.testing.assert_allclose(
                [g[1] for g in got], [e[1] for e in exp], rtol=1e-9,
                err_msg=f"{qid}: {kw} {filt}",
            )
    assert n_nonempty >= 60


def test_full_grammar_pss_dual_path_sample(rand_engine_pss):
    """A seeded sample through BOTH single-query paths on the
    per-shard-stats index (WAND fast path serves the mode as of r5)."""
    eng, rows = rand_engine_pss
    rng = random.Random(616)
    ctx = eng.ctx()
    n_fast = 0
    for _ in range(8):
        kw = _gen_query_full(rng)
        q = SearchQuery(keyword=kw, fields=["content"], limit=15)
        exp = _merged_pss_oracle(rows, kw, {}, 15)
        fast_df = search_fast(ctx, q)
        slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
        assert [s[0] for s in slow] == [e[0] for e in exp], (kw, slow[:5], exp[:5])
        if fast_df is not None:
            n_fast += 1
            fast = [(r["_id"], r["_score"]) for r in fast_df.collect()]
            assert [f[0] for f in fast] == [e[0] for e in exp], kw
            if fast:
                np.testing.assert_allclose(
                    [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9,
                    err_msg=kw,
                )
    assert n_fast >= 4  # the fast path actually served most shapes


def test_full_grammar_dual_path_sample(rand_engine_full):
    """A seeded sample of the same grammar through BOTH single-query
    paths (WAND fast + declarative) — guards path-specific drift that
    the batch fuzz alone would miss."""
    eng, rows = rand_engine_full
    oracle = BM25Oracle(rows, text_field="content", key_field="_id")
    rng = random.Random(4242)
    ctx = eng.ctx()
    for _ in range(10):
        kw = _gen_query_full(rng)
        q = SearchQuery(keyword=kw, fields=["content"], limit=15)
        exp = oracle.search(kw, limit=15)
        fast_df = search_fast(ctx, q)
        slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
        assert [s[0] for s in slow] == [e[0] for e in exp], (kw, slow[:5], exp[:5])
        if fast_df is not None:
            fast = [(r["_id"], r["_score"]) for r in fast_df.collect()]
            assert [f[0] for f in fast] == [e[0] for e in exp], kw
            if fast:
                np.testing.assert_allclose(
                    [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9,
                    err_msg=kw,
                )

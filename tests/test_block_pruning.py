"""Block-max pruning correctness under small blocks: with block_size=8
the per-shard clause block counts exceed PRUNE_MIN_BLOCKS, so the
two-phase pruning branch genuinely executes — including the round-3
extension that keeps pruning ON for SHOULD-kind phrase/prefix/fuzzy
clauses (extras decode only survivor ranges). Rank identity vs the
brute-force oracle and the DataFrame path is the lossless-pruning
proof obligation (operators/wand.py)."""

import numpy as np
import pytest

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.operators.scorer_df import search_df
from byzer_retrieval_spark.operators.wand import PRUNE_MIN_BLOCKS, search_fast
from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery


@pytest.fixture(scope="module")
def small_block_engine(spark, tmp_path_factory):
    import hashlib

    from byzer_retrieval_spark.sources.corpus import gen_rows

    rows = gen_rows(400)
    for r in rows:
        r["_id"] = hashlib.sha256(
            f"{r['repo']}|{r['path']}|{r['commit']}".encode()
        ).hexdigest()
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("smallblk")))
    eng.build(
        spark.createDataFrame(
            [{k: v for k, v in r.items() if k != "_id"} for r in rows]
        ),
        cfg=IndexConfig(num_shards=2, block_size=8),
        resume=False,
    )
    return eng, rows


def _assert_identity(eng, rows, keyword, k=10):
    oracle = BM25Oracle(rows)
    q = SearchQuery(keyword=keyword, fields=["content"], limit=k)
    ctx = eng.ctx()
    exp = oracle.search(keyword, limit=k)
    fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow], keyword
    if fast:
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_pruning_branch_is_reachable(small_block_engine):
    """Sanity: hot-term clauses at block_size=8 really exceed
    PRUNE_MIN_BLOCKS per shard (else this file tests nothing)."""
    eng, _ = small_block_engine
    ctx = eng.ctx()
    from pyspark.sql import functions as F

    per_shard = (
        ctx.postings()
        .filter(F.col("term").isin(["def", "return", "if"]))
        .groupBy("shard_id")
        .count()
        .collect()
    )
    assert all(r["count"] > PRUNE_MIN_BLOCKS for r in per_shard)


TERM_QUERIES = [
    "def return if",            # 3 hot clauses, heavy pruning
    "sym_3_0 def return",       # rare + hot
    "+def return -lambda",      # gated pruning
    "+(class lambda) def if",   # group gate under pruning
]

EXTRA_QUERIES = [
    '"import return" def if',     # hot phrase + hot terms
    '"import return" sym_3_0 def return',  # rare term narrows ranges
    'sym_1* def return if',       # prefix constant clause + terms
    'retur~1 def if',             # fuzzy termset clause + terms
    '"def if" sym_2* def return', # phrase + prefix together
    '"import return"~2 def if',   # SLOPPY phrase under pruning
    'sym_3_0 "def if"~1 def return',  # near + rare term narrows ranges
]


@pytest.mark.parametrize("keyword", TERM_QUERIES)
def test_term_pruning_rank_identity(small_block_engine, keyword):
    eng, rows = small_block_engine
    _assert_identity(eng, rows, keyword)


@pytest.mark.parametrize("keyword", EXTRA_QUERIES)
def test_extras_keep_pruning_lossless(small_block_engine, keyword):
    eng, rows = small_block_engine
    _assert_identity(eng, rows, keyword)


def test_must_not_extras_fall_back_exhaustive(small_block_engine):
    """MUST/NOT extras disable pruning (θ0 proof breaks) but must stay
    rank-identical through the exhaustive branch."""
    eng, rows = small_block_engine
    for kw in ['+"import return" def if', 'def if -"import return"']:
        _assert_identity(eng, rows, kw)


@pytest.fixture(scope="module")
def two_field_engine(spark, tmp_path_factory):
    """Two analyzed fields + tiny blocks: multi-field queries must keep
    pruning lossless (per-FIELD pseudo-clauses for prefix/fuzzy extras
    — a per-spec entry would understate the clause max and prune
    illegally)."""
    import random

    rng = random.Random(7)
    words = ["def", "return", "if", "class", "lambda", "import", "self"]
    rows = []
    for i in range(400):
        t = " ".join(rng.choice(words) for _ in range(6)) + f" sym_{i%37}_t"
        b = " ".join(rng.choice(words) for _ in range(30)) + f" sym_{i%37}_b"
        rows.append({"_id": str(i), "title": t, "body": b})
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("twofld")))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(
            num_shards=2, block_size=8,
            analyzed_fields=("title", "body"), id_columns=(),
        ),
        resume=False,
    )
    return eng


MULTIFIELD_QUERIES = [
    "def return if",              # hot terms in BOTH fields
    "sym_1* def return",          # prefix matches in both fields (the r3 fix)
    "sym_2* sym_3* def if",       # two prefix clauses
    "retur~1 def class",          # fuzzy across fields
    '"def return" if class',     # phrase across fields
]


@pytest.mark.parametrize("keyword", MULTIFIELD_QUERIES)
def test_multifield_pruning_rank_identity(two_field_engine, keyword):
    """fast (pruned) vs DataFrame path on a 2-field index — the two
    independent implementations must agree exactly."""
    q = SearchQuery(keyword=keyword, fields=["title", "body"], limit=10)
    ctx = two_field_engine.ctx()
    fast = [(r["_id"], round(r["_score"], 9)) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], round(r["_score"], 9)) for r in search_df(ctx, q).collect()]
    assert fast == slow, keyword
    assert fast, keyword  # non-vacuous

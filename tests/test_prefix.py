"""Prefix queries (SimpleQueryParser ``foo*``, RetrievalWorker.java:339-343):
CONSTANT_SCORE multi-term expansion, rank-identical across the WAND fast
path, the DataFrame path, and the brute-force oracle."""

import numpy as np
import pytest

from byzer_retrieval_spark.operators.scorer_df import search_df
from byzer_retrieval_spark.operators.wand import search_fast
from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery, parse_keyword


@pytest.fixture(scope="module")
def oracle(corpus_rows):
    return BM25Oracle(corpus_rows, text_field="content", key_field="_id")


def test_parse_prefixes():
    p = parse_keyword("imp* +sym* -ret* def")
    assert p.prefixes == ("imp",)
    assert p.must_prefixes == ("sym",)
    assert p.not_prefixes == ("ret",)
    assert p.should == ("def",)
    # lone '*' stays match-all; trailing '*' on empty stem is a term char
    assert parse_keyword("*").match_all


PREFIX_QUERIES = [
    ("imp*", 10),               # pure prefix (constant score, _id order)
    ("imp* def", 10),           # prefix + scored term
    ("+sym_17* import", 10),    # must prefix
    ("def -sym_17*", 10),       # not prefix
]


@pytest.mark.parametrize("keyword,k", PREFIX_QUERIES)
def test_prefix_rank_identity(corpus_engine, oracle, keyword, k):
    q = SearchQuery(keyword=keyword, fields=["content"], limit=k)
    ctx = corpus_engine.ctx()
    exp = oracle.search(keyword, limit=k)
    fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow]
    if fast:
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_prefix_has_matches(corpus_engine, oracle):
    assert len(oracle.search("imp*", limit=5)) > 0
    assert len(oracle.search("+sym_17* import", limit=5)) > 0


FUZZY_QUERIES = [
    ("impor~1", 10),            # 1-edit fuzzy ('import' matches)
    ("impor~1 def", 10),        # fuzzy + scored term
    ("+impor~1 class", 10),     # must fuzzy
    ("def -impor~1", 10),       # not fuzzy
    ("retur~ def", 10),         # default maxEdits=2
]


@pytest.mark.parametrize("keyword,k", FUZZY_QUERIES)
def test_fuzzy_rank_identity(corpus_engine, oracle, keyword, k):
    q = SearchQuery(keyword=keyword, fields=["content"], limit=k)
    ctx = corpus_engine.ctx()
    exp = oracle.search(keyword, limit=k)
    fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow]
    if fast:
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_parse_fuzzy():
    p = parse_keyword("impor~1 +foo~ -bar~3 baz")
    assert p.fuzzies == (("impor", 1),)
    assert p.must_fuzzies == (("foo", 2),)
    assert p.not_fuzzies == (("bar", 3),)
    assert p.should == ("baz",)


GROUP_QUERIES = [
    ("+(import return) def", 10),   # must-any group + scored term
    ("+(sym_17_0 sym_18_0) import", 10),
    ("(def class) -lambda", 10),    # plain group = flattened OR
    ("-(lambda await) import", 10), # -(a b) == -a -b
    ("def | class", 10),            # | is the OR separator
]


@pytest.mark.parametrize("keyword,k", GROUP_QUERIES)
def test_group_rank_identity(corpus_engine, oracle, keyword, k):
    q = SearchQuery(keyword=keyword, fields=["content"], limit=k)
    ctx = corpus_engine.ctx()
    exp = oracle.search(keyword, limit=k)
    fast = [(r["_id"], r["_score"]) for r in search_fast(ctx, q).collect()]
    slow = [(r["_id"], r["_score"]) for r in search_df(ctx, q).collect()]
    assert [f[0] for f in fast] == [e[0] for e in exp] == [s[0] for s in slow]
    if fast:
        np.testing.assert_allclose(
            [f[1] for f in fast], [e[1] for e in exp], rtol=1e-9
        )


def test_parse_groups():
    p = parse_keyword("+(a b) (c d) -(e f) g | h")
    assert p.must_any_groups == (("a", "b"),)
    assert set(p.should) >= {"a", "b", "c", "d", "g", "h"}
    assert "|" not in p.should
    assert set(p.must_not) == {"e", "f"}


def test_group_equivalence_pipe_vs_space(corpus_engine, oracle):
    a = oracle.search("def | class", limit=20)
    b = oracle.search("def class", limit=20)
    assert a == b


def test_constant_score_tie_cut_fresh_and_after_upsert(spark, tmp_path):
    """Round 4: on a fresh build (docid_id_order snapshot flag) the
    shard scorers cut constant-score boundary ties EXACTLY — a
    prefix-only query whose matches all tie at 1.0 must still return
    the global (score desc, _id asc) top-k; after an upsert the flag
    clears (doc ids above the high-water mark break _id order) and the
    tie-keep path must produce the identical contract."""
    import hashlib

    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.oracle import BM25Oracle
    from byzer_retrieval_spark.plans.query import SearchQuery
    from byzer_retrieval_spark.sources.corpus import gen_rows

    rows = gen_rows(120)
    eng = RetrievalEngine(spark, str(tmp_path / "tiecut"))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=4, hot_term_split_threshold=64),
        resume=False,
    )
    for r in rows:
        r["_id"] = hashlib.sha256(
            f"{r['repo']}|{r['path']}|{r['commit']}".encode()
        ).hexdigest()
    assert eng.ctx().docid_id_order is True
    q = SearchQuery(keyword="sym_1*", fields=["content"], limit=7)
    oracle = BM25Oracle(rows)
    exp = [i for i, _ in oracle.search("sym_1*", limit=7)]
    got = [r["_id"] for r in eng.search(q).collect()]
    assert got == exp and len(got) == 7

    # upsert a doc whose _id sorts FIRST among the tied matches but
    # whose __docid is above the high-water mark — only the tie-keep
    # path can rank it correctly
    new = dict(rows[0])
    new["_id"] = "0" * 64  # lexicographically before every sha256 id
    new["content"] = "sym_1_0 tied content"
    up = spark.createDataFrame([{k: v for k, v in new.items()}])
    eng.upsert(up)
    assert eng.ctx().docid_id_order is False
    rows2 = [r for r in rows if r["_id"] != new["_id"]] + [new]
    oracle2 = BM25Oracle(rows2)
    exp2 = [i for i, _ in oracle2.search("sym_1*", limit=7)]
    got2 = [r["_id"] for r in eng.search(q).collect()]
    assert got2 == exp2
    assert got2[0] == new["_id"]  # the upserted id wins the tie-break


def test_compact_restores_docid_id_order(spark, tmp_path):
    """Round 5: compact re-validates per-shard __docid↔_id monotonicity
    and restores the docid_id_order flag when the invariant holds again
    (upserts clear it) — including the no-tombstone compact after a
    pure-insert upsert. An order-breaking insert must NOT restore it;
    deleting the offender and compacting must."""
    import hashlib

    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.oracle import BM25Oracle
    from byzer_retrieval_spark.plans.query import SearchQuery
    from byzer_retrieval_spark.sources.corpus import gen_rows

    rows = gen_rows(80)
    eng = RetrievalEngine(spark, str(tmp_path / "ordrestore"))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=2, hot_term_split_threshold=64),
        resume=False,
    )
    for r in rows:
        r["_id"] = hashlib.sha256(
            f"{r['repo']}|{r['path']}|{r['commit']}".encode()
        ).hexdigest()
    assert eng.ctx().docid_id_order is True
    q = SearchQuery(keyword="sym_1*", fields=["content"], limit=7)

    # pure-insert upsert whose _id sorts AFTER every sha256 hex id:
    # per-shard order still holds, but the flag clears conservatively
    hi = dict(rows[0])
    hi["_id"] = "z" * 64
    hi["content"] = "sym_1_0 zz content"
    eng.upsert(spark.createDataFrame([hi]))
    assert eng.ctx().docid_id_order is False
    out = eng.compact()  # no tombstones — flag-only re-validation
    assert out["compacted_shards"] == 0 and "snapshot_id" in out
    assert eng.ctx().docid_id_order is True
    rows_a = rows + [hi]
    exp = [i for i, _ in BM25Oracle(rows_a).search("sym_1*", limit=7)]
    assert [r["_id"] for r in eng.search(q).collect()] == exp

    # order-BREAKING insert (_id sorts first, __docid lands last):
    # compact must refuse to restore the flag
    lo = dict(rows[1])
    lo["_id"] = "0" * 64
    lo["content"] = "sym_1_0 early content"
    eng.upsert(spark.createDataFrame([lo]))
    assert eng.ctx().docid_id_order is False
    eng.compact()
    assert eng.ctx().docid_id_order is False
    rows_b = rows_a + [lo]
    exp_b = [i for i, _ in BM25Oracle(rows_b).search("sym_1*", limit=7)]
    got_b = [r["_id"] for r in eng.search(q).collect()]
    assert got_b == exp_b and got_b[0] == lo["_id"]

    # delete the offender; the tombstone-driven compact rewrite
    # re-validates and restores the exact tie-cut
    eng.delete_by_ids([lo["_id"]])
    out = eng.compact()
    assert out["compacted_shards"] >= 1
    assert eng.ctx().docid_id_order is True
    exp_c = [i for i, _ in BM25Oracle(rows_a).search("sym_1*", limit=7)]
    assert [r["_id"] for r in eng.search(q).collect()] == exp_c

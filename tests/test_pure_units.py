"""Unit tests for the pure (no-Spark) building blocks (SURVEY §5.1)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from byzer_retrieval_spark.functions.analyzer import CODE, WHITESPACE, tokenize_py
from byzer_retrieval_spark.functions.bm25 import (
    B,
    K1,
    _byte4_to_int,
    _int_to_byte4,
    math_idf,
    quantize_dl,
)
from byzer_retrieval_spark.functions.encoding import (
    decode_posting_block,
    encode_posting_block,
    varbyte_decode,
    varbyte_encode,
)
from byzer_retrieval_spark.functions.routing import murmur3_x86_32, route
from byzer_retrieval_spark.operators.fusion import rrf_fuse_lists
from byzer_retrieval_spark.plans.query import parse_keyword
from byzer_retrieval_spark.schema import SchemaParseError, parse_schema


# ---- varbyte / delta-gap codec -----------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=500)
)
def test_varbyte_roundtrip_property(values):
    v = np.asarray(values, dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(v)) == v).all()


def test_varbyte_boundaries():
    edges = [0, 1, 127, 128, 16383, 16384, 2**28 - 1, 2**28, 2**35, 2**49, 2**63 - 1]
    v = np.asarray(edges, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(v)).tolist() == edges


def test_posting_block_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**12, size=2000, replace=False))
    assert (decode_posting_block(encode_posting_block(ids, 0), 0) == ids).all()
    base = int(ids[0]) - 5
    assert (decode_posting_block(encode_posting_block(ids, base), base) == ids).all()


# ---- routing (reference Utils.route parity) -----------------------------
def test_route_long_matches_utils_test_vector():
    # UtilsTest.java:168-178: route(10L, 3) == 1
    assert route(10, 3) == 1


def test_murmur3_known_vectors():
    # published murmur3_x86_32 test vectors, seed 0
    assert murmur3_x86_32(b"", 0) == 0
    assert murmur3_x86_32(b"hello", 0) == 0x248BFA47
    assert murmur3_x86_32(b"hello, world", 0) == 0x149BBB7F


def test_route_string_in_range():
    for s in ["a", "doc-1", "面试", "x" * 100]:
        for n in (1, 3, 7, 16):
            assert 0 <= route(s, n) < n


# ---- analyzer -----------------------------------------------------------
def test_whitespace_mode_reference_exact():
    # WhitespaceAnalyzer: split on whitespace, case kept, punct attached
    assert tokenize_py("foo(bar) Baz\t qux\n") == ["foo(bar)", "Baz", "qux"]
    assert tokenize_py("") == []
    assert tokenize_py("   ") == []


def test_code_mode_standard_like():
    assert tokenize_py("Foo(bar) BAZ_1 x->y", CODE) == ["foo", "bar", "baz_1", "x", "y"]


# ---- keyword parser -------------------------------------------------------
def test_parse_keyword_buckets():
    p = parse_keyword("+import -markdown def return")
    assert p.must == ("import",)
    assert p.must_not == ("markdown",)
    assert p.should == ("def", "return")
    assert p.scoring_terms == ("import", "def", "return")


def test_parse_match_all_and_empty():
    assert parse_keyword("*").match_all
    assert parse_keyword(None).empty
    assert parse_keyword("  ").empty


# ---- schema DSL -----------------------------------------------------------
def test_schema_reference_case():
    # SchemaParseTest.java:122-147 shape, incl. multiline tolerance
    s = parse_schema(
        """st(
        field(_id,long),
        field(name,string),
        field(content,string,analyze),
        field(vector,array(float))
        )"""
    )
    assert [f.name for f in s.fields] == ["_id", "name", "content", "vector"]
    assert s.analyzed_fields == ["content"]
    assert not s.field("content").stored  # Store.NO for analyzed
    assert s.field("vector").spark_type().simpleString() == "array<float>"


def test_schema_rejects_garbage():
    with pytest.raises(SchemaParseError):
        parse_schema("st(field(x,unknown_type))")
    with pytest.raises(SchemaParseError):
        parse_schema("notst(field(x,long))")


# ---- BM25 math ----------------------------------------------------------
def test_idf_formula():
    assert math.isclose(math_idf(1, 200), math.log(1 + 199.5 / 1.5))


def test_smallfloat_quantization_monotone_lossy():
    # free range exact, larger values rounded down, monotone non-decreasing
    for v in range(24):
        assert _byte4_to_int(_int_to_byte4(v)) == v
    prev = -1
    for v in [25, 40, 100, 1000, 65536, 10**6]:
        q = _byte4_to_int(_int_to_byte4(v))
        assert q <= v
        assert q >= prev
        prev = q
    arr = quantize_dl(np.array([5, 1000, 123456]))
    assert arr[0] == 5 and arr[1] <= 1000


# ---- RRF pure function (FIXTURES §F4 query 14) ----------------------------
def test_rrf_shape():
    fused = rrf_fuse_lists([["a", "b", "c"], ["b", "a"]])
    assert math.isclose(fused["a"], 1 / 60 + 1 / 61)
    assert math.isclose(fused["b"], 1 / 61 + 1 / 60)
    assert math.isclose(fused["c"], 1 / 62)


# ---- corpus generator guarantees (FIXTURES §F1) ---------------------------
def test_corpus_determinism_and_skew():
    from collections import Counter

    from byzer_retrieval_spark.sources.corpus import gen_batch, gen_rows

    rows = gen_rows(300)
    # deterministic regardless of batching
    a = gen_batch(np.arange(100, 140))
    b = gen_batch(np.arange(100, 200))
    assert a["content"].tolist() == b["content"].tolist()[:40]
    df = Counter()
    for r in rows:
        df.update(set(tokenize_py(r["content"])))
    hot = [t for t, c in df.items() if c > 0.5 * len(rows)]
    assert len(hot) >= 5
    assert sum(1 for c in df.values() if c == 1) >= 100
    # two unique syms per doc
    assert df["sym_17_0"] == 1 and df["sym_17_1"] == 1


def test_sorts_to_columns_accepts_tuples_and_strings(spark):
    """Convenience shapes: ("f","desc") tuples, bare "f" strings, and
    the canonical {"f":"desc"} dicts all compile; bad tuties raise
    ValueError not AttributeError."""
    import pytest

    from byzer_retrieval_spark.plans.query import sorts_to_columns

    cols = sorts_to_columns([{"a": "desc"}, ("b", "desc"), ("c",), "d"])
    assert len(cols) == 4
    reprs = [str(c) for c in cols]
    assert "DESC" in reprs[0] and "DESC" in reprs[1]
    assert "ASC" in reprs[2] and "ASC" in reprs[3]
    with pytest.raises(ValueError):
        sorts_to_columns([("a", "desc", "extra")])


def test_embedding_generator_deterministic_and_normalized():
    """Round 5 (ANN bench shapes): embeddings are a pure function of
    (row id, column) — identical under any partitioning of the
    generating range — and L2-normalized."""
    from byzer_retrieval_spark.sources.corpus import gen_embedding_batch

    a = gen_embedding_batch(np.arange(50, 70), 64)
    b = gen_embedding_batch(np.arange(50, 120), 64)
    np.testing.assert_array_equal(a, b[:20])
    np.testing.assert_allclose(
        np.linalg.norm(a, axis=1), np.ones(20), rtol=1e-5
    )
    # distinct ids → distinct vectors (non-vacuous)
    assert not np.array_equal(a[0], a[1])


def test_xxhash64_known_vectors():
    """Pinned XXH64 values, JVM-validated: every (input, seed) pair was
    checked bit-for-bit against Spark's F.xxhash64 (seed 42) and, for
    b'' at seed 0, against the published XXH64 reference vector
    0xEF46DB3751D8E999. Inputs cross the 32-byte stripe boundary and
    include multi-byte UTF-8."""
    from byzer_retrieval_spark.functions.routing import engine_shard, xxhash64

    pinned = [
        (b"", 42, -7444071767201028348),
        (b"", 0, -1205034819632174695),  # == 0xEF46DB3751D8E999 signed
        (b"a", 42, -8582455328737087284),
        (b"abc", 42, 1423657621850124518),
        (b"12345678", 42, 6863040065134489090),
        (b"0123456789abcdef0123456789abcdef", 42, 7380026953736478117),
        (b"0123456789abcdef0123456789abcdefX", 42, 6490393984247241068),
        ("héllo ☃".encode(), 42, -795967252315003436),
    ]
    for data, seed, want in pinned:
        assert xxhash64(data, seed=seed) == want, (data, seed)
    # engine_shard = pmod(xxhash64(str(_id)), n) — the indexer's routing
    assert [engine_shard(str(i), 4) for i in range(12)] == [
        0, 0, 1, 2, 2, 2, 3, 1, 0, 0, 0, 3,
    ]


@given(st.binary(max_size=100), st.integers(min_value=0, max_value=2**31))
@settings(max_examples=200, deadline=None)
def test_xxhash64_signed_range(data, seed):
    from byzer_retrieval_spark.functions.routing import xxhash64

    h = xxhash64(data, seed=seed)
    assert -(2**63) <= h < 2**63

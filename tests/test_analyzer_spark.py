"""All three tokenizer implementations (Catalyst expr, Arrow UDF, pure
Python) must agree token-for-token in both modes; Spark's hash
cross-checks our murmur3 implementation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from byzer_retrieval_spark.functions.analyzer import (
    CODE,
    MODES,
    WHITESPACE,
    tokenize_expr,
    tokenize_py,
    tokenize_udf,
)

SAMPLES = [
    "import os\nreturn foo(bar)",
    "  leading and   trailing  ",
    "UPPER lower MiXeD_case x123",
    "def f(x): return x+1  # comment",
    "",
    "tabs\tand\nnewlines\r\nmixed",
    "punct!@# attached,tokens. (grouped)",
]


@pytest.mark.parametrize("mode", [WHITESPACE, CODE])
def test_three_tokenizers_agree(spark, mode):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["text"])
    got_expr = [
        r["toks"]
        for r in df.select(tokenize_expr(F.col("text"), mode).alias("toks")).collect()
    ]
    got_udf = [
        r["toks"]
        for r in df.select(tokenize_udf(mode)(F.col("text")).alias("toks")).collect()
    ]
    exp = [tokenize_py(s, mode) for s in SAMPLES]
    assert got_expr == exp
    assert got_udf == exp


def test_murmur3_matches_spark_builtin_seed42(spark):
    """Spark's F.hash is murmur3_x86_32(seed=42) with a NON-canonical
    per-byte tail, so it equals the canonical algorithm (which the
    reference's Utils.java implements and we reproduce) only on
    4-byte-multiple inputs — cross-validate on those."""
    from byzer_retrieval_spark.functions.routing import murmur3_x86_32

    vals = ["abcd", "hellohel", "sym_17_0", "x" * 48]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    spark_hashes = [r["h"] for r in df.select(F.hash("s").alias("h")).collect()]
    ours = [murmur3_x86_32(v.encode("utf-8"), seed=42) for v in vals]
    assert spark_hashes == ours


def test_code_mode_query_expectations():
    """FIXTURES: query set 1-4 with lowercased expectations in code mode."""
    assert tokenize_py("IMPORT Return", CODE) == ["import", "return"]
    assert tokenize_py("sym_17_3", CODE) == ["sym_17_3"]


ADVERSARIAL = [
    "", "   ", "a", " a b  c\t\nd\x0b\fe\r ", "x　y unicode space",
    "tab\tsep", "newline\n\nend", "é ü ñ", "a" * 500 + " b",
    "\t\x0b\f\r", "one",
]


def test_token_count_expr_equals_size_of_tokenize_expr(spark):
    """round 6: the staging scan computes dl via a count-only regex
    (no token-array materialization) — must equal
    size(tokenize_expr) on every input, both modes."""
    from byzer_retrieval_spark.functions.analyzer import token_count_expr

    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], ["s"])
    for mode in MODES:
        bad = df.select(
            F.size(tokenize_expr(F.col("s"), mode)).alias("a"),
            token_count_expr(F.col("s"), mode).alias("b"),
        ).filter("a <> b").count()
        assert bad == 0, mode


def test_ascii_split_whitespace_matches_ws_class():
    """round 6: stage A tokenizes via pyarrow ascii_split_whitespace —
    its separator set (C isspace) must be exactly the analyzer's
    explicit [ \\t\\n\\x0b\\f\\r] class, token-for-token after the
    empty-drop (which both paths apply)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from byzer_retrieval_spark.functions.analyzer import _WS_CLASS, tokenize_py

    arr = pa.array(ADVERSARIAL)
    re2 = [
        [t for t in row if t]
        for row in pc.split_pattern_regex(arr, pattern=_WS_CLASS + "+").to_pylist()
    ]
    ws = [
        [t for t in row if t]
        for row in pc.ascii_split_whitespace(arr).to_pylist()
    ]
    assert re2 == ws
    assert ws == [tokenize_py(s) for s in ADVERSARIAL]

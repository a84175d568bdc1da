"""Tokenizers, in three executable forms that must agree token-for-token.

The reference analyzes every ``analyze`` field — at index time AND query
time — with Lucene's WhitespaceAnalyzer (reference:
RetrievalWorker.java:67,339 and schema/SchemaUtils.java:171): split on
Unicode whitespace, case preserved, punctuation kept attached.
BASELINE.json's north_star additionally asks for a code-aware
StandardAnalyzer-like mode (word characters, lowercased). We ship both
as an ``AnalyzerMode``.

Three implementations per mode, kept rank-identity-test-equal:

1. ``tokenize_expr(col)``   — pure Catalyst Column expression (JVM-side,
   whole-stage-codegen'd). THE hot path for index builds: no Python at
   all, Tungsten does the splitting.
2. ``tokenize_udf()``       — vectorized Arrow pandas UDF. The
   extension point the north_star names; used when a custom analyzer
   can't be expressed as built-ins. Batch-at-a-time, never per-row.
3. ``tokenize_py(text)``    — plain Python, used by the brute-force
   BM25 oracle in tests and by query parsing on the driver.

DuckDB oracle equivalents (for the driver's correctness gate) are in
``duckdb_tokens_sql``.
"""

from __future__ import annotations

import re
from typing import List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

WHITESPACE = "whitespace"  # reference-exact (WhitespaceAnalyzer)
CODE = "code"  # StandardAnalyzer-like, code-aware default

# One EXPLICIT whitespace class shared by all three implementations and
# the DuckDB oracle. Java's \s is ASCII-only while Python's \s is
# Unicode and RE2's \s omits \x0b — relying on \s would make the JVM
# index, the Python query parser, and the oracle disagree on documents
# containing Unicode whitespace ( , 　, ...). We standardize on
# Java's ASCII set [ \t\n\x0b\f\r] everywhere; deviation from Lucene's
# Character.isWhitespace (which also splits Unicode spaces) is
# documented in SURVEY §1.2.
_WS_CLASS = "[ \\t\\n\\x0b\\f\\r]"
_WS_RE = re.compile(_WS_CLASS + "+")
# \w in Python (unicode) ~= [\p{L}\p{N}_]; Java needs the explicit class
_CODE_RE_PY = re.compile(r"\w+", re.UNICODE)
_CODE_RE_JAVA = r"[\p{L}\p{N}_]+"  # for Spark regexp_extract_all
_CODE_RE_DUCK = r"[\p{L}\p{N}_]+"  # RE2 syntax for the DuckDB oracle

MODES = (WHITESPACE, CODE)


def tokenize_py(text: str, mode: str = WHITESPACE) -> List[str]:
    if mode == WHITESPACE:
        return [t for t in _WS_RE.split(text) if t]
    if mode == CODE:
        return _CODE_RE_PY.findall(text.lower())
    raise ValueError(f"unknown analyzer mode {mode!r}")


def tokenize_expr(col: Column, mode: str = WHITESPACE) -> Column:
    """Catalyst expression producing array<string> of tokens (hot path)."""
    if mode == WHITESPACE:
        return F.filter(F.split(col, _WS_CLASS + "+"), lambda t: t != "")
    if mode == CODE:
        return F.regexp_extract_all(F.lower(col), F.lit(_CODE_RE_JAVA), 0)
    raise ValueError(f"unknown analyzer mode {mode!r}")


def token_count_expr(col: Column, mode: str = WHITESPACE) -> Column:
    """``size(tokenize_expr(col, mode))`` without materializing the
    token array (round 6): a token is a maximal run of non-separator
    characters, so counting matches of the complement class equals the
    filtered-split length exactly — one codegen'd regex pass, no array
    allocation. Equality with tokenize_expr is test-pinned."""
    if mode == WHITESPACE:
        return F.regexp_count(col, F.lit("[^ \\t\\n\\x0b\\f\\r]+"))
    if mode == CODE:
        return F.regexp_count(F.lower(col), F.lit(_CODE_RE_JAVA))
    raise ValueError(f"unknown analyzer mode {mode!r}")


def tokenize_udf(mode: str = WHITESPACE):
    """Arrow-vectorized pandas UDF tokenizer (custom-analyzer slot)."""
    from pyspark.sql.functions import pandas_udf

    if mode == WHITESPACE:

        @pandas_udf(ArrayType(StringType()))
        def tok(s: pd.Series) -> pd.Series:
            return s.fillna("").map(lambda t: [x for x in _WS_RE.split(t) if x])

    elif mode == CODE:

        @pandas_udf(ArrayType(StringType()))
        def tok(s: pd.Series) -> pd.Series:
            return s.fillna("").str.lower().map(_CODE_RE_PY.findall)

    else:
        raise ValueError(f"unknown analyzer mode {mode!r}")
    return tok


def duckdb_tokens_sql(text_expr: str, mode: str = WHITESPACE) -> str:
    """DuckDB SQL fragment: array of tokens equal to tokenize_py(mode)."""
    if mode == WHITESPACE:
        return (
            f"list_filter(regexp_split_to_array({text_expr}, "
            f"'{_WS_CLASS}+'), x -> x <> '')"
        )
    if mode == CODE:
        return f"regexp_extract_all(lower({text_expr}), '{_CODE_RE_DUCK}')"
    raise ValueError(f"unknown analyzer mode {mode!r}")

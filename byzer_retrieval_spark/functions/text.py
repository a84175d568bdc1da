"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Design rule: every operator is a pure Catalyst Column expression (JVM,
whole-stage codegen — no Python in the hot path) AND has an equivalent
ANSI-SQL form (``*_sql``) runnable by DuckDB, so the driver's
correctness gate can verify them value-for-value.

Scale: all are narrow (per-row) transformations — no shuffle, columnar
scan in, columnar write out; they pipeline at parquet-scan speed on any
number of executors.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# stopword tables for the n-gram/stopword language-ID heuristic.
# Deterministic, tiny, and identical in the SQL oracle.
# ---------------------------------------------------------------------
LANG_STOPWORDS: Dict[str, Tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"),
}
LANG_ORDER: List[str] = ["en", "de", "fr", "es"]  # deterministic tie-break


def tokens_expr(col: Column) -> Column:
    """Lowercased whitespace tokens (shared by all text ops).
    Uses the analyzer module's explicit ASCII whitespace class so the
    JVM expression and the DuckDB oracle agree character-for-character."""
    from byzer_retrieval_spark.functions.analyzer import _WS_CLASS

    return F.filter(F.split(F.lower(col), _WS_CLASS + "+"), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    from byzer_retrieval_spark.functions.analyzer import _WS_CLASS

    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{_WS_CLASS}+'), "
        "x -> x <> '')"
    )


# ---- token counting -------------------------------------------------------
def token_count_expr(col: Column) -> Column:
    return F.size(tokens_expr(col))


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


def bpe_ish_token_count_expr(col: Column) -> Column:
    """BPE-ish subword proxy: word chars split into runs of letters /
    digits / punctuation (a cheap deterministic stand-in for a real BPE
    vocab, which isn't in this container)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))


def bpe_ish_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all(lower({expr}), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))"


# ---- quality scoring --------------------------------------------------------
def quality_features_exprs(col: Column) -> Dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio / mean-token-length —
    the standard cheap quality heuristics."""
    toks = tokens_expr(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0))
    sw = list(LANG_STOPWORDS["en"])
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in sw])))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            n_stop / F.greatest(n_tok, F.lit(1)).cast("double"), 6
        ),
        "mean_token_len": F.round(
            (F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
             / F.greatest(n_tok, F.lit(1))).cast("double"),
            6,
        ),
    }


def quality_features_sql(expr: str) -> Dict[str, str]:
    toks = tokens_sql(expr)
    sw = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return {
        "n_chars": f"length({expr})",
        "n_tokens": f"len({toks})",
        "punct_ratio": (
            f"round(len(regexp_extract_all({expr}, '[^\\w\\s]')) * 1.0 / "
            f"greatest(length({expr}), 1), 6)"
        ),
        "stopword_ratio": (
            f"round(len(list_intersect(list_distinct({toks}), [{sw}])) * 1.0 / "
            f"greatest(len({toks}), 1), 6)"
        ),
        "mean_token_len": (
            f"round(list_sum(list_transform({toks}, x -> length(x))) * 1.0 / "
            f"greatest(len({toks}), 1), 6)"
        ),
    }


# ---- language ID --------------------------------------------------------------
def lang_id_expr(col: Column) -> Column:
    """Stopword-hit-count heuristic over LANG_ORDER; 'und' (undetermined)
    when no language scores a hit. Distinct-token hits so repeated words
    don't dominate; ties break by LANG_ORDER."""
    toks = F.array_distinct(tokens_expr(col))
    hits = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]]))
        )
        for lang in LANG_ORDER
    }
    # fold from the last language so earlier languages win ties (>=)
    expr_lang = F.lit("und")
    expr_n = F.lit(0)
    for lang in reversed(LANG_ORDER):
        expr_lang = F.when(hits[lang] >= expr_n, F.lit(lang)).otherwise(expr_lang)
        expr_n = F.greatest(hits[lang], expr_n)
    return F.when(expr_n > 0, expr_lang).otherwise(F.lit("und"))


def lang_id_sql(expr: str) -> str:
    toks = f"list_distinct({tokens_sql(expr)})"
    parts = []
    for lang in LANG_ORDER:
        sw = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        parts.append(f"len(list_intersect({toks}, [{sw}]))")
    hits = dict(zip(LANG_ORDER, parts))
    # same fold as the Column version: reversed order, >= keeps earlier
    out = "'und'"
    n = "0"
    for lang in reversed(LANG_ORDER):
        out = f"(CASE WHEN {hits[lang]} >= {n} THEN '{lang}' ELSE {out} END)"
        n = f"greatest({hits[lang]}, {n})"
    return f"(CASE WHEN {n} > 0 THEN {out} ELSE 'und' END)"


# ---- fingerprinting --------------------------------------------------------------
def fingerprint_expr(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized
    (lowercased, whitespace-collapsed) token stream. Identical content
    modulo whitespace/case → identical fingerprint."""
    return F.md5(F.concat_ws(" ", tokens_expr(col)))


def fingerprint_sql(expr: str) -> str:
    return f"md5(array_to_string({tokens_sql(expr)}, ' '))"

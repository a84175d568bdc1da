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


# ---- PII detection / scrubbing -------------------------------------------
# Regex set chosen to be expressible IDENTICALLY in Java regex (Spark)
# and RE2 (DuckDB): plain character classes, bounded repeats, \b.
# Order matters for scrubbing: SSN before PHONE (both are digit-dash
# shapes), EMAIL before IP (an IP never contains '@' but an email's
# domain may contain digits and dots).
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def pii_counts_exprs(col: Column) -> Dict[str, Column]:
    """Per-type PII match counts (narrow, codegen'd regexp scans)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def pii_scrub_expr(col: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder —
    the redaction step of a training-data ingest pipeline."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts_sql(expr: str) -> Dict[str, str]:
    return {
        f"n_{name}": f"len(regexp_extract_all({expr}, '{pat}'))"
        for name, pat, _ in PII_PATTERNS
    }


def pii_scrub_sql(expr: str) -> str:
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


# ---- repetition signals (Gopher-style quality filters) -------------------
def repetition_exprs(col: Column) -> Dict[str, Column]:
    """Within-document repetition fractions — the classic crawl-quality
    gate (boilerplate/spam detection): duplicate-word fraction, most-
    frequent-word fraction, duplicate-2-gram fraction. Pure Catalyst:
    the top-word count is a run-length scan over the SORTED token array
    via F.aggregate (O(n log n)/doc, no Python, no shuffle)."""
    toks = tokens_expr(col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    dup_word = F.when(n > 0, 1.0 - nd.cast("double") / n).otherwise(F.lit(0.0))

    srt = F.array_sort(toks)
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top = F.aggregate(srt, zero, step, lambda acc: acc["best"])
    top_word = F.when(n > 0, top.cast("double") / n).otherwise(F.lit(0.0))

    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ng = F.size(grams)
    dup2 = F.when(
        ng > 0, 1.0 - F.size(F.array_distinct(grams)).cast("double") / ng
    ).otherwise(F.lit(0.0))

    return {
        "dup_word_frac": F.round(dup_word, 6),
        "top_word_frac": F.round(top_word, 6),
        "dup_2gram_frac": F.round(dup2, 6),
    }


def repetition_sql(expr: str) -> Dict[str, str]:
    toks = tokens_sql(expr)
    t = f"__t"
    return {
        "dup_word_frac": (
            f"round(CASE WHEN len({toks}) > 0 THEN 1.0 - "
            f"len(list_distinct({toks}))::DOUBLE / len({toks}) ELSE 0.0 END, 6)"
        ),
        "top_word_frac": (
            f"round(CASE WHEN len({toks}) > 0 THEN "
            f"list_max(map_values(list_histogram({toks})))::DOUBLE / len({toks}) "
            f"ELSE 0.0 END, 6)"
        ),
        "dup_2gram_frac": (
            f"round(CASE WHEN len({toks}) >= 2 THEN 1.0 - "
            f"len(list_distinct(list_transform(range(1, len({toks})), "
            f"i -> concat_ws(' ', {toks}[i], {toks}[i+1]))))::DOUBLE "
            f"/ (len({toks}) - 1) ELSE 0.0 END, 6)"
        ),
    }

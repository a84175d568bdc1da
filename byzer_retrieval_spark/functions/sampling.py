"""Deterministic stratified sampling — the data-mixing stage of a
training pipeline ("keep 100% of lang=en docs, 25% of lang=de, 1% of
everything else"), reproducible across runs, engines and cluster sizes.

Mechanism: a doc's sampling coordinate is the first 8 hex chars of
md5(id || seed) — uniform in [0, 16^8) — compared against the stratum's
threshold rendered as fixed-width lowercase hex. Lexicographic order of
fixed-width lowercase hex IS numeric order, so the comparison runs as a
plain string predicate: pure Catalyst, codegen'd, zero shuffle, and the
DuckDB twin is the identical expression (md5 agrees bit-for-bit between
engines — unlike xxhash64/rand(), which don't exist or don't match
across engines).

Scale: a narrow filter over the scan — predicate-pushdown friendly,
stable under repartitioning, and adding a new stratum later never
changes which already-kept rows are kept (per-row independence).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 1 << 32  # 16^8 coordinates


def _threshold_hex(frac: float) -> str:
    frac = min(max(float(frac), 0.0), 1.0)
    n = int(round(frac * _SPACE))
    if n >= _SPACE:
        # fraction 1.0 must keep EVERYTHING. format(2**32, '08x') is the
        # NINE-char '100000000', and lexicographically most 8-char hex
        # coordinates sort ABOVE it ('a…' > '1…'), which would silently
        # keep only the ~1/16 of rows starting with '0'. 'g' sorts after
        # every hex digit, so this 8-char sentinel is > all coordinates.
        return "gggggggg"
    return format(n, "08x")


def sample_coord_expr(id_col: Column, seed: str = "s42") -> Column:
    return F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(seed))), 1, 8)


def stratified_keep_expr(
    id_col: Column,
    strata_col: Column,
    fractions: Dict[str, float],
    default_frac: float = 0.0,
    seed: str = "s42",
) -> Column:
    """Boolean keep-predicate: row kept iff its md5 coordinate falls
    below its stratum's threshold."""
    coord = sample_coord_expr(id_col, seed)
    thr = F.lit(_threshold_hex(default_frac))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(strata_col == stratum, F.lit(_threshold_hex(frac))).otherwise(thr)
    return coord < thr


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Dict[str, float],
    default_frac: float = 0.0,
    seed: str = "s42",
) -> DataFrame:
    return df.filter(
        stratified_keep_expr(
            F.col(id_col), F.col(strata_col), fractions, default_frac, seed
        )
    )


def stratified_sample_sql(
    table: str,
    id_col: str,
    strata_col: str,
    fractions: Dict[str, float],
    default_frac: float = 0.0,
    seed: str = "s42",
) -> str:
    """DuckDB twin of stratified_sample (same md5 coordinates)."""
    coord = f"substr(md5({id_col}::VARCHAR || '{seed}'), 1, 8)"
    cases = " ".join(
        f"WHEN {strata_col} = '{s}' THEN '{_threshold_hex(fr)}'"
        for s, fr in sorted(fractions.items())
    )
    thr = f"(CASE {cases} ELSE '{_threshold_hex(default_frac)}' END)"
    return f"SELECT * FROM {table} WHERE {coord} < {thr}"

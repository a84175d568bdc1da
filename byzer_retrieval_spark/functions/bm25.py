"""BM25 scoring math — single source of truth for all three scorers.

The reference never configures a Lucene Similarity, so Lucene 9.8
defaults apply: BM25Similarity with k1=1.2, b=0.75 (SURVEY §1.3;
reference pom.xml:15). Lucene's BM25 (since 8.0) drops the classic
(k1+1) numerator factor — rank-equivalent, score-different — and we
reproduce Lucene's exact form:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d)  = sum over matching scoring clauses of idf * tfnorm

Lucene additionally quantizes dl to one byte (SmallFloat intToByte4 /
byte4ToInt); our default is exact dl, with the quantization available
behind ``quantize_dl`` for Lucene-faithful comparisons (SURVEY §7.4).
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf, dl, avgdl: float, k1: float = K1, b: float = B):
    return tf / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def idf_sql(df_expr: str, n_expr: str) -> str:
    """ANSI-SQL fragment of idf() for the DuckDB oracle."""
    return f"ln(1.0 + ({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"


def tf_norm_sql(tf_expr: str, dl_expr: str, avgdl_expr: str) -> str:
    return (
        f"({tf_expr} / ({tf_expr} + {K1} * "
        f"(1.0 - {B} + {B} * ({dl_expr} / {avgdl_expr}))))"
    )


# --- Lucene SmallFloat dl quantization (intToByte4 / byte4ToInt) -------
# Lucene's published lossy 1-byte norm encoding (SmallFloat): a 4-bit
# float with 3 mantissa bits; small values get a "free" exact range.

def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("negative length")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit leading 1
    return encoded | ((shift + 1) << 3)


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
_NUM_FREE_VALUES = 255 - _MAX_INT4  # = 24


def _int_to_byte4(i: int) -> int:
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def _byte4_to_int(b: int) -> int:
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + _int4_to_long(b - _NUM_FREE_VALUES)


def quantize_dl(dl: np.ndarray) -> np.ndarray:
    """Round-trip dl through Lucene's byte4 encoding (lossy, table-driven)."""
    # encode table covers dl < 2^20 via bucketed lookup; for the general
    # case we map scalars (quantization is opt-in / test-scale only).
    flat = np.ascontiguousarray(dl, dtype=np.int64).ravel()
    res = np.fromiter(
        (_byte4_to_int(_int_to_byte4(int(v))) for v in flat),
        dtype=np.int64,
        count=flat.size,
    )
    return res.reshape(np.asarray(dl).shape)


def representable_dls(max_dl: int = 2**31 - 1):
    """Sorted distinct values the byte4 code can represent (≤ 256)."""
    vals = sorted({_byte4_to_int(b) for b in range(256)})
    return [v for v in vals if v <= max_dl]


def quantize_dl_expr(col):
    """Catalyst expression of quantize_dl: the byte4 code rounds DOWN to
    the nearest representable value, so quantized(dl) = max{r in R :
    r <= dl} over the 256-value representable set — computed as a fold
    over a literal array (JVM-side, once per DOC row)."""
    from pyspark.sql import functions as F

    reps = representable_dls()
    arr = F.array(*[F.lit(int(v)) for v in reps])
    idx = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, x: acc + F.when(col >= x, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.element_at(arr, idx)


def score_terms(tfs: np.ndarray, dls: np.ndarray, dfs: np.ndarray,
                n_docs: float, avgdl: float) -> np.ndarray:
    """Vectorized per-(term,doc) partial scores: idf * tfnorm (float64)."""
    return idf(dfs.astype(np.float64), float(n_docs)) * tf_norm(
        tfs.astype(np.float64), dls.astype(np.float64), float(avgdl)
    )


def math_idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

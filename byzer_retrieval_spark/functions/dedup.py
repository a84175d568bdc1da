"""Deduplication operators for training-data pipelines.

Five families, each as a DataFrame transform over a
``(id, text)``-shaped table (the driver's ``documents`` table or the
code corpus), with the scalable plan spelled out:

- exact:        sha256(normalized text) → hash groupBy. One shuffle on
                the hash; at 100 TB this is the cheapest possible dedup.
- ngram-jaccard: exact pairwise Jaccard over token shingles via a
                shingle-equality self-join. Quadratic in bucket size —
                correct small-scale oracle, and the verifier for the
                approximate methods below.
- minhash-lsh:  k min-hashes over shingle hashes (vectorized numpy UDF),
                banded into b bands of r rows; docs sharing any band
                bucket are candidates (one groupBy on (band, signature)),
                then candidates are verified with exact Jaccard. This is
                THE 100 TB path: cost ~ O(N·k) + one shuffle on band keys.
- simhash:      64-bit weighted-hyperplane fingerprint; near-dup iff
                hamming distance ≤ t. Banded into 4 16-bit segments →
                candidates share a segment (pigeonhole: ham ≤ 3 ⇒ some
                segment equal), verified by popcount. One shuffle.
- embedding:    cosine ≥ τ near-dups; exact small-scale via self-join,
                scalable via random-hyperplane LSH buckets (see
                similarity.py).

All numeric hashing uses splitmix64/xxhash-style mixing with fixed
seeds — deterministic across runs and partitionings.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from byzer_retrieval_spark.functions.text import tokens_expr

# ---------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of exact duplicates (normalized: lowercase + collapsed
    whitespace): (fingerprint, n_dups, keep_id, dup_ids)."""
    fp = F.sha2(F.concat_ws(" ", tokens_expr(F.col(text_col))), 256)
    return (
        df.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id row per normalized-text group (one shuffle)."""
    fp = F.sha2(F.concat_ws(" ", tokens_expr(F.col(text_col))), 256)
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__fp", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


# ---------------------------------------------------------------------
# token shingles (shared by jaccard / minhash)
# ---------------------------------------------------------------------

def shingles_expr(text_col: str, n: int = 3):
    """Distinct n-gram token shingles as strings (JVM-side)."""
    toks = tokens_expr(F.col(text_col))
    if n == 1:
        return F.array_distinct(toks)
    # guard: sequence(0, negative) would generate a DESCENDING sequence
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact pairwise Jaccard ≥ threshold via shingle self-join.

    |A∩B| from a groupBy on (id_a, id_b) of the shingle-equality join;
    |A∪B| = |A|+|B|-|A∩B|. Output: (id_a, id_b, jaccard), id_a < id_b.
    Quadratic in the size of a shingle's posting — the small-scale
    oracle; use minhash_lsh_dup_pairs at scale.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles_expr(text_col, n)).alias("sh")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(k: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64,
    shingle_n: int = 3, seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — k min-hash values per doc, computed in a
    vectorized Arrow UDF (numpy: hash shingles once, then k affine
    permutations over the Mersenne prime)."""
    a, b = _perm_params(num_hashes, seed)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(shingles: pd.Series) -> pd.Series:
        out = []
        for arr in shingles:
            if arr is None or len(arr) == 0:
                out.append(np.full(num_hashes, np.iinfo(np.int64).max).tolist())
                continue
            h = np.array(
                [np.uint64(hash_str(s)) for s in arr], dtype=np.uint64
            )
            # k affine perms: (a*h + b) mod p, take min per perm
            vals = (h[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    def hash_str(s: str) -> int:
        # deterministic 64-bit string hash (FNV-1a then splitmix)
        h = np.uint64(0xCBF29CE484222325)
        for ch in s.encode("utf-8"):
            h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        return int(_splitmix64(np.array([h], dtype=np.uint64))[0])

    return df.select(
        F.col(id_col).alias("id"), shingles_expr(text_col, shingle_n).alias("__sh")
    ).select("id", sig_udf("__sh").alias("sig"))


def minhash_lsh_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64,
    bands: int = 16, shingle_n: int = 3, threshold: float = 0.8, seed: int = 42,
) -> DataFrame:
    """Banded-LSH candidate generation + exact-Jaccard verification.

    Scale path: signatures are one narrow pass; candidates come from ONE
    groupBy on (band_id, band_signature); only candidate pairs are
    verified. With k=64, b=16 (r=4) the S-curve crosses ~0.5 at
    j≈(1/16)^(1/4)≈0.5 — catches j≥0.8 with prob ≈1-(1-j^4)^16 > 0.999.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, seed)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            ":", *[F.col("sig")[i * r + j] for j in range(r)]
                        ).alias("bsig"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bsig")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # verify candidates with exact jaccard over shingles
    sh = df.select(
        F.col(id_col).alias("id"), shingles_expr(text_col, shingle_n).alias("sh")
    )
    out = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------

def simhash_udf(num_bits: int = 64):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def sim(toks: pd.Series) -> pd.Series:
        out = np.zeros(len(toks), dtype=np.int64)
        for i, arr in enumerate(toks):
            if arr is None or len(arr) == 0:
                out[i] = 0
                continue
            vals, counts = np.unique(np.asarray(arr, dtype=object), return_counts=True)
            hs = np.array(
                [_fnv1a64(str(v)) for v in vals], dtype=np.uint64
            )
            bits = ((hs[:, None] >> np.arange(num_bits, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.float64)
            w = counts.astype(np.float64)[:, None]
            acc = (w * (2.0 * bits - 1.0)).sum(axis=0)
            sig = np.uint64(0)
            for bpos in np.nonzero(acc > 0)[0]:
                sig |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return sim


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via 4-segment
    pigeonhole bucketing (one shuffle), verified by popcount."""
    sigs = df.select(
        F.col(id_col).alias("id"), tokens_expr(F.col(text_col)).alias("__t")
    ).select("id", simhash_udf()("__t").alias("sig"))
    segs = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg"),
                        F.shiftrightunsigned(F.col("sig"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("sval"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("s"),
    ).select("id", "sig", "s.seg", "s.sval")
    a = segs.alias("a")
    b = segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.sval") == F.col("b.sval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------

def embedding_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Exact cosine ≥ threshold pairs (self-join; small-scale oracle —
    the scalable path buckets by random-hyperplane LSH first, see
    similarity.random_hyperplane_buckets)."""
    dot = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(F.col(f"{side}.vec"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", F.round(dot / (norm("a") * norm("b")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine"
        )
    )

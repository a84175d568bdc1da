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
- minhash-lsh:  k min-hashes over xxhash64 shingle hashes, computed
                ENTIRELY JVM-side (k MIN aggregates with map-side
                partial aggregation — no Python in the path), banded
                into b bands of r rows; docs sharing any band bucket are
                candidates (one shuffle), then verified with exact
                Jaccard. This is THE 100 TB path: cost ~ O(N·k) + one
                shuffle on band keys, and verification makes the output
                a SUBSET of the exact-Jaccard pairs by construction.
- simhash:      60-bit weighted-sign fingerprint over md5-hashed tokens,
                pure Catalyst expressions with a value-identical DuckDB
                SQL twin; near-dup iff hamming ≤ t. Pigeonhole segment
                bucketing (4 × 15-bit) is EXACT for t ≤ 3: the output
                equals brute-force all-pairs popcount. One shuffle.
- embedding:    cosine ≥ τ near-dups; exact small-scale via self-join,
                scalable via random-hyperplane LSH buckets (see
                similarity.py).

All hashing is fix-seeded and deterministic across runs/partitionings.
"""

from __future__ import annotations

from typing import List

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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

# 31-bit Mersenne prime: with h, a, b < 2^31 the affine form a*h+b stays
# under 2^63, so the permutations run as plain Catalyst long arithmetic
# with no overflow (Spark 4 runs ANSI mode; wrapping multiply would
# throw). 2^31 hash space is ample for min-hash uniformity.
_MERSENNE = (1 << 31) - 1


def _perm_params(k: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64,
    shingle_n: int = 3, seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — k min-hash values per doc, computed
    ENTIRELY JVM-side: shingles hash with xxhash64 (whole-stage
    codegen), and each of the k affine permutations
    ``pmod(a_i*h + b_i, p)`` is a MIN aggregate over the exploded
    shingle rows (partial aggregation collapses per-task before the one
    shuffle on id). No Python in the path at all — this replaces a
    per-shingle-string Python FNV loop that dominated the old version.

    Docs with no shingles (fewer than n tokens) produce no row — they
    cannot be near-duplicates of anything by Jaccard ≥ t > 0.
    """
    a, b = _perm_params(num_hashes, seed)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_expr(text_col, shingle_n)).alias("__sh"),
    ).select(
        "id",
        # top 31 bits of xxhash64 → h in [0, 2^31)
        F.shiftrightunsigned(F.xxhash64("__sh"), 33).alias("__h"),
    )
    aggs = [
        F.min(
            F.pmod(
                F.col("__h") * F.lit(int(a[i])) + F.lit(int(b[i])),
                F.lit(_MERSENNE),
            )
        ).alias(f"__s{i}")
        for i in range(num_hashes)
    ]
    wide = sh.groupBy("id").agg(*aggs)
    return wide.select(
        "id", F.array(*[F.col(f"__s{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64,
    bands: int = 32, shingle_n: int = 3, threshold: float = 0.8, seed: int = 42,
) -> DataFrame:
    """Banded-LSH candidate generation + exact-Jaccard verification.

    Scale path: signatures are one narrow pass; candidates come from ONE
    groupBy on (band_id, band_signature); only candidate pairs are
    verified. Defaults k=64, b=32 (r=2): the S-curve catches j≥0.5 with
    prob 1-(1-j²)^32 ≥ 0.9999 (≈1-1e-13 at j=0.8) — empirically
    exhaustive on the driver's test tables, where the output equals the
    exact-Jaccard pair set (the DuckDB oracle). Verification makes
    false positives impossible, so output ⊆ exact pairs always.
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
# 60-bit fingerprint. Token hash = first 15 hex chars of md5(token)
# (md5 is the one hash Spark and DuckDB share byte-for-byte, and 60 bits
# keeps the value inside a signed int64 in both engines), so the WHOLE
# simhash — hashing, per-bit weighted sums, sign bits — is expressible
# identically as Catalyst expressions and as the DuckDB oracle SQL.

SIMHASH_BITS = 60
SIMHASH_SEGMENTS = 4  # 4 × 15-bit segments: hamming ≤ 3 ⇒ one segment equal


def simhash_expr_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sig) — pure-Catalyst simhash: explode tokens → per-(id,token)
    counts → 60 per-bit weighted-sign sums in ONE hash aggregate → sign
    bits packed into a long. No Python anywhere (the old version looped
    a Python FNV per token string inside a pandas UDF)."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens_expr(F.col(text_col))).alias("t")
    )
    cnt = tok.groupBy("id", "t").agg(F.count("*").alias("cnt"))
    hv = F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast("long")
    cnt = cnt.withColumn("hv", hv)
    bit_aggs = [
        F.sum(
            F.col("cnt")
            * (
                F.shiftright(F.col("hv"), k).bitwiseAND(F.lit(1)) * F.lit(2)
                - F.lit(1)
            )
        ).alias(f"__b{k}")
        for k in range(SIMHASH_BITS)
    ]
    acc = cnt.groupBy("id").agg(*bit_aggs)
    sig = None
    for k in range(SIMHASH_BITS):
        term = F.when(F.col(f"__b{k}") > 0, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return acc.select("id", sig.alias("sig"))


def simhash_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of simhash_expr_df — same md5-60-bit hash, same
    per-bit fold, so signatures agree value-for-value."""
    from byzer_retrieval_spark.functions.text import tokens_sql

    toks = tokens_sql(text_col)
    bit_sums = ", ".join(
        f"sum(cnt * (((hv >> {k}) & 1) * 2 - 1)) AS b{k}"
        for k in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN b{k} > 0 THEN {1 << k}::BIGINT ELSE 0 END)"
        for k in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (SELECT {id_col} AS id, unnest({toks}) AS t FROM {table}),
cnt AS (
  SELECT id, t, count(*)::BIGINT AS cnt,
         ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv
  FROM tok GROUP BY id, t
),
acc AS (SELECT id, {bit_sums} FROM cnt GROUP BY id)
SELECT id, ({sig}) AS sig FROM acc
"""


def simhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via pigeonhole
    segment bucketing (one shuffle), verified by popcount. With
    max_hamming ≤ SIMHASH_SEGMENTS-1 the output is EXACTLY the set of
    pairs at hamming ≤ max_hamming (pigeonhole: fewer differing bits
    than segments ⇒ some segment is untouched) — a real oracle, not an
    approximation."""
    seg_bits = SIMHASH_BITS // SIMHASH_SEGMENTS
    sigs = simhash_expr_df(df, id_col, text_col)
    segs = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg"),
                        F.shiftrightunsigned(F.col("sig"), i * seg_bits)
                        .bitwiseAND(F.lit((1 << seg_bits) - 1))
                        .alias("sval"),
                    )
                    for i in range(SIMHASH_SEGMENTS)
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
    """Exact cosine ≥ threshold pairs (all-pairs self-join; small-scale
    oracle ONLY — the scalable path is
    similarity.LshVectorIndex.dup_pairs, which joins on persisted
    (tbl, bucket) keys instead of all-pairs)."""
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


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Duplicate CLUSTERS (id, cluster) from minhash-LSH pairs via
    connected components — the transitive-closure step a keep-one-per-
    group dedup actually needs (A~B, B~C ⇒ {A,B,C} even though the
    detector never compared A with C). ``cluster`` is the min member id.
    Only documents that belong to some duplicate pair appear."""
    from byzer_retrieval_spark.functions.graph import connected_components

    pairs = minhash_lsh_dup_pairs(
        df, id_col, text_col, num_hashes=k, bands=bands, threshold=threshold
    )
    return connected_components(pairs, "id_a", "id_b")

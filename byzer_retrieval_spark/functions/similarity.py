"""Similarity search over embedding columns (array<float>).

Two tiers, matching how this runs at 100 TB:

- brute_force_cosine_topk: exact top-k by cosine — dot products as pure
  Catalyst expressions (zip_with + aggregate, JVM-side, codegen'd).
  O(N·d) scan, no shuffle except the final TakeOrderedAndProject. This
  is the baseline/oracle.
- LshVectorIndex: BUILD-TIME random-hyperplane bucketing, persisted as
  parquet partitioned by (tbl, bucket). This is the engine's analog of
  the reference's per-shard persisted ANN index (Lucene HNSW,
  XLucene95HnswVectorsFormat.java:119-149): the expensive structure is
  computed once at index time, and queries prune to the probe buckets
  via PARTITION filters — a query touches ``num_tables × |probe set|``
  bucket directories, never the full table. Recall is tunable via
  (num_planes, num_tables, probe_hamming); probe_hamming = num_planes
  degrades gracefully to an exact scan of one table replica.

Also random_hyperplane_buckets — the bucketing primitive (pure Catalyst
dot products, no Python in the scan).
"""

from __future__ import annotations

import itertools
import json
import os
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _rewrite_data_dir(
    spark: SparkSession,
    data_path: str,
    partition_cols: Sequence[str],
    transform=None,
) -> None:
    """Rewrite a partitioned ANN data dir down to one file set per
    partition, optionally transforming the rows first. Used for two
    maintenance paths: small-file compaction after many incremental
    ``append``s (each append writes a file set into every touched
    partition, degrading probe-time reads file-count-wise), and
    physically dropping dead rows after an index compact.

    Local-FS directory swap (write to ``.compact``, rename over); not
    safe against concurrent readers mid-swap — the engine calls it
    synchronously between queries on the write path."""
    import shutil

    df = spark.read.parquet(data_path)
    if transform is not None:
        df = transform(df)
    tmp = data_path + ".compact"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(tmp)
    )
    old = data_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(data_path, old)
    os.rename(tmp, data_path)
    shutil.rmtree(old, ignore_errors=True)


def _remove_docids(
    spark: SparkSession,
    data_path: str,
    partition_cols: Sequence[str],
    dead_ids: DataFrame,
) -> None:
    """Drop index rows whose ``__docid`` is in ``dead_ids``. Live
    docids survive an index compact UNCHANGED (compact only erases
    tombstoned rows), so after dropping the dead rows the ANN index is
    exactly current — no rebuild, no re-bucketing."""
    sample = spark.read.parquet(data_path)
    if "__docid" not in sample.columns:
        raise ValueError(
            "ANN index carries no __docid column — cannot drop dead rows"
        )
    dead = dead_ids.select("__docid").distinct()
    _rewrite_data_dir(
        spark,
        data_path,
        partition_cols,
        transform=lambda df: df.join(dead, "__docid", "left_anti"),
    )


class _AnnReaderMemo:
    """Shared by both index classes: memoize the partitioned-data
    DataFrame reader per SparkSession. Constructing it costs a
    driver-side listing + partition discovery over every bucket/cluster
    directory (measured 1.6-3.4 s on a 707-cluster index) and was paid
    on EVERY probe; the file set only changes when THIS instance writes
    (build/append/compact/remove), which drops the memo. Engine-level
    callers key cached instances by the ANN state, so a foreign writer
    (new snapshot) always lands on a fresh instance."""

    def _data(self, spark: SparkSession) -> DataFrame:
        cache = self.__dict__.setdefault("_data_memo", {})
        hit = cache.get(id(spark))
        if hit is None:
            hit = spark.read.parquet(self.data_path)
            cache[id(spark)] = hit
        return hit

    def _drop_data_memo(self) -> None:
        self.__dict__.pop("_data_memo", None)


def _qnorm(q: Sequence[float]) -> float:
    # sequential left-to-right accumulation — the SQL oracle embeds this
    # exact literal so both engines share it bit-for-bit
    acc = 0.0
    for x in q:
        acc += float(x) * float(x)
    import math

    return math.sqrt(acc)


def _cosine_expr(vec_col: str, q: Sequence[float]):
    qn = _qnorm(q)
    qarr = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qarr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col).cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return dot / (norm * F.lit(qn))


def _cosine_expr_col(vec_col: str, qvec_col: str, qnorm_col: str):
    """Cosine against a per-row QUERY COLUMN (the batched multi-query
    vector path joins each candidate with its query's vector). The
    arithmetic mirrors ``_cosine_expr`` operation-for-operation —
    zip_with dot, aggregate self-dot, divide by (norm · qnorm) — so a
    batched query scores bit-identically to the per-query literal path
    (the qnorm is precomputed driver-side with the same sequential
    accumulation)."""
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col(qvec_col),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col).cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return dot / (norm * F.col(qnorm_col))


def brute_force_cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query: Sequence[float], k: int = 10
) -> DataFrame:
    """Exact ANN baseline: (id, cosine) top-k, ties by id asc."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.round(_cosine_expr(vec_col, query), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def hyperplanes(dim: int, num_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def bucket_of(vec: Sequence[float], planes: np.ndarray) -> int:
    signs = (planes @ np.asarray(vec, dtype=np.float64)) > 0
    return int(sum(1 << i for i, s in enumerate(signs) if s))


def random_hyperplane_buckets(
    df: DataFrame, vec_col: str, planes: np.ndarray, out_col: str = "bucket"
) -> DataFrame:
    """Sign-bit LSH bucket id as a Column expression (JVM-side dot
    products — no Python in the scan)."""
    b = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        parr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), parr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        b = b + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out_col, b)


def probe_buckets(qb: int, num_planes: int, probe_hamming: int) -> List[int]:
    """All bucket ids within ``probe_hamming`` bits of ``qb``."""
    out = [qb]
    for r in range(1, min(probe_hamming, num_planes) + 1):
        for bits in itertools.combinations(range(num_planes), r):
            flip = 0
            for bpos in bits:
                flip |= 1 << bpos
            out.append(qb ^ flip)
    return out


class LshVectorIndex(_AnnReaderMemo):
    """Persisted random-hyperplane LSH index (the build-time ANN path).

    Layout: ``path/data/tbl=<t>/bucket=<b>/*.parquet`` storing
    (id, vec) — one replica per hash table — plus ``meta.json``. Both
    ``tbl`` and ``bucket`` are PARTITION columns, so the probe filter
    ``(tbl = t) AND bucket IN (...)`` prunes whole directories at plan
    time; at 10^12 vectors a query reads num_tables × |probes| buckets
    (~num_tables·Σ C(planes,i) directories), never the corpus.

    Reference capability matched: the per-shard HNSW graph Lucene builds
    at index time (SchemaUtils.java:104-110) — same contract (persisted
    ANN structure, approximate recall, build-once query-many), different
    algorithm because LSH bucketing maps onto columnar partition pruning
    while graph traversal does not.
    """

    def __init__(
        self,
        path: str,
        num_planes: int = 12,
        num_tables: int = 2,
        seed: int = 42,
    ):
        self.path = path
        self.num_planes = num_planes
        self.num_tables = num_tables
        self.seed = seed

    @property
    def data_path(self) -> str:
        return os.path.join(self.path, "data")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def exists(self) -> bool:
        return os.path.exists(self.meta_path)

    def build(
        self,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        dim: int,
        extra_cols: Sequence[str] = (),
    ) -> None:
        """Bucket every vector in every table (JVM dot products) and
        persist partitioned by (tbl, bucket). One narrow pass + one
        partitioned write; no shuffle beyond the write repartition.
        ``extra_cols`` ride along into the index rows (e.g. __docid so
        the engine can partition-prune the stored-field join).

        Rows with a NULL vector are skipped (a table where only some
        docs carry embeddings is legitimate input — the exact scan
        ranks such docs last, so the index simply never returns them).
        """
        reps = []
        base = df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<float>").alias("vec"),
            *[F.col(c) for c in extra_cols],
        )
        for t in range(self.num_tables):
            planes = hyperplanes(dim, self.num_planes, self.seed + t)
            reps.append(
                random_hyperplane_buckets(base, "vec", planes, out_col="bucket")
                .withColumn("tbl", F.lit(t))
            )
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        (
            out.repartition("tbl", "bucket")
            .write.partitionBy("tbl", "bucket")
            .mode("overwrite")
            .parquet(self.data_path)
        )
        os.makedirs(self.path, exist_ok=True)
        with open(self.meta_path, "w") as f:
            json.dump(
                {
                    "num_planes": self.num_planes,
                    "num_tables": self.num_tables,
                    "seed": self.seed,
                    "dim": dim,
                    "extra_cols": list(extra_cols),
                },
                f,
            )
        self._drop_data_memo()

    def _extra_cols(self) -> List[str]:
        try:
            with open(self.meta_path) as f:
                return list(json.load(f).get("extra_cols", []))
        except FileNotFoundError:
            return []

    def append(self, df: DataFrame, id_col: str, vec_col: str) -> None:
        """Incrementally add vectors (upsert maintenance): bucket ids
        are a pure function of the vector, so new rows append straight
        into their (tbl, bucket) partitions — no rebuild. Old versions
        of an upserted id stay in the index; the engine's probe-time
        tombstone anti-join (on __docid) drops them."""
        with open(self.meta_path) as f:
            meta = json.load(f)
        dim = int(meta["dim"])
        extra = list(meta.get("extra_cols", []))
        base = df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<float>").alias("vec"),
            *[F.col(c) for c in extra],
        )
        reps = []
        for t in range(self.num_tables):
            planes = hyperplanes(dim, self.num_planes, self.seed + t)
            reps.append(
                random_hyperplane_buckets(base, "vec", planes, out_col="bucket")
                .withColumn("tbl", F.lit(t))
            )
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        (
            out.repartition("tbl", "bucket")
            .write.partitionBy("tbl", "bucket")
            .mode("append")
            .parquet(self.data_path)
        )
        self._drop_data_memo()

    def compact(self, spark: SparkSession) -> None:
        """Fold append-generated small files back to one file set per
        (tbl, bucket) partition — see _rewrite_data_dir."""
        _rewrite_data_dir(spark, self.data_path, ["tbl", "bucket"])
        self._drop_data_memo()

    def remove_docids(self, spark: SparkSession, dead_ids: DataFrame) -> None:
        """Physically drop dead rows (post-compact maintenance)."""
        _remove_docids(spark, self.data_path, ["tbl", "bucket"], dead_ids)
        self._drop_data_memo()

    def probe_condition(self, query: Sequence[float], probe_hamming: int):
        """This query's probe set as a predicate on the index PARTITION
        columns (tbl, bucket). Factored out of ``candidates`` so the
        batched multi-query probe (round 5) can OR many queries'
        conditions into ONE partition-pruned scan."""
        dim = len(query)
        if probe_hamming >= self.num_planes:
            # exact mode: one full replica (still one num_tables-th of
            # the index) — used by the correctness oracle
            return F.col("tbl") == 0
        cond = F.lit(False)
        for t in range(self.num_tables):
            planes = hyperplanes(dim, self.num_planes, self.seed + t)
            qb = bucket_of(query, planes)
            probes = probe_buckets(qb, self.num_planes, probe_hamming)
            cond = cond | (
                (F.col("tbl") == t) & F.col("bucket").isin([int(x) for x in probes])
            )
        return cond

    # partition-key enumeration for the batched multi-query probe: the
    # O(1)-per-row broadcast-join tagging path (round 5)
    probe_key_cols = ("tbl", "bucket")
    # a row is stored once PER TABLE -> multi-table probes can return
    # the same id twice; batched probes must dedup (knn round 6)
    replicated = True

    def probe_keys(
        self, query: Sequence[float], probe_hamming: int
    ) -> Optional[List[tuple]]:
        """This query's probe set as explicit (tbl, bucket) partition
        keys, or None in exact mode (bucket set not enumerable without
        reading the index — the caller falls back to the predicate
        path)."""
        if probe_hamming >= self.num_planes:
            return None
        dim = len(query)
        keys = []
        for t in range(self.num_tables):
            planes = hyperplanes(dim, self.num_planes, self.seed + t)
            qb = bucket_of(query, planes)
            for b in probe_buckets(qb, self.num_planes, probe_hamming):
                keys.append((t, int(b)))
        return keys

    def candidates(
        self, spark: SparkSession, query: Sequence[float], probe_hamming: int
    ) -> DataFrame:
        """Distinct (id, vec, extras) whose bucket is within
        probe_hamming of the query's bucket in ANY table — via partition
        filters only. The dedup key includes the extra columns so an
        upserted id's OLD and NEW rows both survive to the caller's
        tombstone anti-join (dropping on id alone could keep only the
        dead version)."""
        cols = ["id", "vec"] + self._extra_cols()
        dedup_cols = ["id"] + self._extra_cols()
        data = self._data(spark)
        cond = self.probe_condition(query, probe_hamming)
        if probe_hamming >= self.num_planes:
            return data.filter(cond).select(*cols)
        return data.filter(cond).select(*cols).dropDuplicates(dedup_cols)

    def topk(
        self,
        spark: SparkSession,
        query: Sequence[float],
        k: int = 10,
        probe_hamming: int = 2,
    ) -> DataFrame:
        """Approximate cosine top-k over the probed buckets. Per-neighbor
        recall = 1-(1-p_table)^T (OR-amplification); probe_hamming >=
        num_planes makes it exact."""
        cand = self.candidates(spark, query, probe_hamming)
        return brute_force_cosine_topk(cand, "id", "vec", query, k)

    def dup_pairs(
        self, spark: SparkSession, threshold: float = 0.95
    ) -> DataFrame:
        """Near-duplicate pairs (cosine >= threshold): candidates share a
        bucket in ANY table (one shuffle join on the (tbl, bucket) key —
        never all-pairs), then verified with the exact cosine. The
        scalable replacement for dedup.embedding_dup_pairs' self-join."""
        data = self._data(spark).select("tbl", "bucket", "id", "vec")
        a, b_ = data.alias("a"), data.alias("b")
        cand = (
            a.join(
                b_,
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.vec").alias("vec_a"),
                F.col("b.vec").alias("vec_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        dot = F.aggregate(
            F.zip_with(
                F.col("vec_a").cast("array<double>"),
                F.col("vec_b").cast("array<double>"),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        norm = lambda c: F.sqrt(
            F.aggregate(
                F.col(c).cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        return (
            cand.withColumn("cosine", F.round(dot / (norm("vec_a") * norm("vec_b")), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )


class IvfVectorIndex(_AnnReaderMemo):
    """Persisted IVF (inverted-file) ANN index: spherical k-means.

    The second classic build-time ANN structure next to LSH bucketing
    (FAISS IVF-Flat shape): centroids are learned once with a
    distributed spherical k-means, every vector is assigned to its
    nearest centroid, and the table is persisted PARTITIONED BY the
    cluster id. A query ranks the (tiny, driver-side) centroid set,
    probes the ``nprobe`` nearest clusters via partition filters — at
    10^12 vectors it reads nprobe/num_clusters of the corpus — and
    scores candidates with the exact Catalyst cosine. ``nprobe >=
    num_clusters`` degrades to an exact scan (the correctness oracle).

    Scale shape (round 6): centroids are FIT on a bounded deterministic
    sample (FAISS-style train-on-sample: ≤ max(64·k, 4096) vectors,
    hash-selected so the sample is a pure function of the ids), with
    the k-means iterations running in numpy on the driver — zero Spark
    jobs per iteration — and the corpus then pays exactly ONE
    distributed assignment pass (Arrow-batched numpy matmul) feeding
    the partitioned write. Per build the driver holds sample_size × dim
    floats (a few MB), independent of corpus size; the previous shape
    (5 full-corpus passes + a posexplode shuffle of N × dim rows per
    iteration) is gone.

    Reference capability matched: persisted per-shard ANN index
    (Lucene HNSW, XLucene95HnswVectorsFormat.java:119-149) — same
    build-once/query-many contract, algorithm chosen for columnar
    partition pruning.
    """

    def __init__(
        self,
        path: str,
        num_clusters: int = 16,
        max_iters: int = 5,
        seed: int = 42,
    ):
        self.path = path
        self.num_clusters = num_clusters
        self.max_iters = max_iters
        self.seed = seed

    @property
    def data_path(self) -> str:
        return os.path.join(self.path, "data")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def exists(self) -> bool:
        return os.path.exists(self.meta_path)

    def _centroids(self) -> np.ndarray:
        # cached per instance: a 500-query batch probes 500× and the
        # centroid table (num_clusters × dim floats as JSON) is several
        # MB at sqrt(N) sizing — re-parsing it per probe was pure
        # driver-side overhead. build() resets the cache.
        c = getattr(self, "_cent_cache", None)
        if c is None:
            with open(self.meta_path) as f:
                c = np.asarray(json.load(f)["centroids"], dtype=np.float64)
            self._cent_cache = c
        return c

    @staticmethod
    def _assign_udf(centroids: np.ndarray):
        """argmax cosine(v, centroid) — Arrow-batched numpy matmul."""
        from pyspark.sql.functions import pandas_udf

        c = centroids  # (C, d), rows unit-norm

        @pandas_udf("int")
        def assign(vs: pd.Series) -> pd.Series:
            m = np.stack(vs.to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            return pd.Series(np.argmax(m @ c.T, axis=1).astype(np.int32))

        return assign

    def build(
        self,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        dim: int,
        extra_cols: Sequence[str] = (),
        n_vec: Optional[int] = None,
    ) -> None:
        # NULL vectors are skipped (same contract as LshVectorIndex.build:
        # partial-embedding tables must build, not crash in _assign_udf)
        base = df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<float>").alias("vec"),
            *[F.col(c) for c in extra_cols],
        )
        # ---- fit centroids on a bounded deterministic sample ------------
        # The training set is hash-selected (pure function of the ids, so
        # rebuilds reproduce) and bounded at max(64·k, 4096) vectors —
        # ample per FAISS train-on-sample guidance — then the k-means
        # loop runs entirely in numpy on the driver. Small tables (≤ the
        # bound) train on every vector, exactly the old full-data fit.
        if n_vec is None:
            n_vec = base.count()
        if n_vec == 0:
            raise ValueError(
                "IvfVectorIndex.build: no rows with a non-null vector"
            )
        self.num_clusters = min(self.num_clusters, n_vec)
        target = max(64 * self.num_clusters, 4096)
        modulus = max(1, n_vec // target)
        samp = base.select("id", "vec")
        if modulus > 1:
            samp = samp.filter(
                F.pmod(F.xxhash64(F.col("id")), F.lit(modulus)) == 0
            )
        sample_pd = samp.toPandas()
        if len(sample_pd) < self.num_clusters:
            # hash-sample underflow (pathological id distribution):
            # train on everything rather than degrade k
            sample_pd = base.select("id", "vec").toPandas()
        sample_pd = sample_pd.sort_values("id", kind="mergesort")
        vecs = np.stack(sample_pd["vec"].to_numpy()).astype(np.float64)
        unit = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
        )
        self.num_clusters = min(self.num_clusters, unit.shape[0])
        # deterministic init: first num_clusters sample vectors in id
        # order (id order, not data order, so re-builds are reproducible)
        cent = unit[: self.num_clusters].copy()
        for _ in range(self.max_iters):
            assign = np.argmax(unit @ cent.T, axis=1)
            acc = np.zeros((self.num_clusters, dim), dtype=np.float64)
            np.add.at(acc, assign, unit)
            seen = np.bincount(assign, minlength=self.num_clusters) > 0
            nz = np.linalg.norm(acc, axis=1)
            upd = seen & (nz > 1e-12)
            new_cent = cent.copy()
            new_cent[upd] = acc[upd] / nz[upd, None]
            if np.allclose(new_cent, cent, atol=1e-9):
                cent = new_cent
                break
            cent = new_cent

        # ---- ONE distributed pass: assign + partitioned write -----------
        final = base.withColumn("cluster", self._assign_udf(cent)(F.col("vec")))
        (
            final.repartition("cluster")
            .write.partitionBy("cluster")
            .mode("overwrite")
            .parquet(self.data_path)
        )
        os.makedirs(self.path, exist_ok=True)
        with open(self.meta_path, "w") as f:
            json.dump(
                {
                    "num_clusters": self.num_clusters,
                    "dim": dim,
                    "seed": self.seed,
                    "centroids": cent.tolist(),
                    "extra_cols": list(extra_cols),
                },
                f,
            )
        self._cent_cache = cent.astype(np.float64)
        self._drop_data_memo()

    def _extra_cols(self) -> List[str]:
        try:
            with open(self.meta_path) as f:
                return list(json.load(f).get("extra_cols", []))
        except FileNotFoundError:
            return []

    def append(self, df: DataFrame, id_col: str, vec_col: str) -> None:
        """Incrementally add vectors: assignment against the FROZEN
        centroids (a pure function of the vector) appends rows into
        their cluster partitions — no k-means re-run. The engine's
        probe-time tombstone anti-join drops superseded versions."""
        with open(self.meta_path) as f:
            meta = json.load(f)
        cent = np.asarray(meta["centroids"], dtype=np.float64)
        extra = list(meta.get("extra_cols", []))
        base = df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<float>").alias("vec"),
            *[F.col(c) for c in extra],
        )
        out = base.withColumn("cluster", self._assign_udf(cent)(F.col("vec")))
        (
            out.repartition("cluster")
            .write.partitionBy("cluster")
            .mode("append")
            .parquet(self.data_path)
        )
        self._drop_data_memo()

    def compact(self, spark: SparkSession) -> None:
        """Fold append-generated small files back to one file set per
        cluster partition — see _rewrite_data_dir."""
        _rewrite_data_dir(spark, self.data_path, ["cluster"])
        self._drop_data_memo()

    def remove_docids(self, spark: SparkSession, dead_ids: DataFrame) -> None:
        """Physically drop dead rows (post-compact maintenance)."""
        _remove_docids(spark, self.data_path, ["cluster"], dead_ids)
        self._drop_data_memo()

    def probe_condition(self, query: Sequence[float], nprobe: int):
        """The nprobe nearest clusters as a predicate on the index
        PARTITION column (round 5: batched multi-query probes OR these
        into one scan)."""
        if nprobe >= self.num_clusters:
            return F.lit(True)
        return F.col("cluster").isin(self.probe_clusters(query, nprobe))

    # partition-key enumeration for the batched multi-query probe
    probe_key_cols = ("cluster",)
    # every row lives in exactly one cluster partition -> batched
    # probes need no per-query dedup (knn round 6)
    replicated = False

    def probe_keys(
        self, query: Sequence[float], nprobe: int
    ) -> Optional[List[tuple]]:
        """The nprobe nearest clusters as explicit partition keys, or
        None when the probe degenerates to a full scan."""
        if nprobe >= self.num_clusters:
            return None
        return [(c,) for c in self.probe_clusters(query, nprobe)]

    def candidates(
        self, spark: SparkSession, query: Sequence[float], nprobe: int
    ) -> DataFrame:
        """(id, vec, extras) of the nprobe nearest clusters — partition
        filters only; nprobe >= num_clusters scans the whole index."""
        cols = ["id", "vec"] + self._extra_cols()
        data = self._data(spark)
        return data.filter(self.probe_condition(query, nprobe)).select(*cols)

    def probe_clusters(self, query: Sequence[float], nprobe: int) -> List[int]:
        cent = self._centroids()
        q = np.asarray(query, dtype=np.float64)
        q /= max(float(np.linalg.norm(q)), 1e-12)
        sims = cent @ q
        return [int(i) for i in np.argsort(-sims)[: min(nprobe, len(sims))]]

    def topk(
        self,
        spark: SparkSession,
        query: Sequence[float],
        k: int = 10,
        nprobe: int = 4,
    ) -> DataFrame:
        """Approximate cosine top-k over the nprobe nearest clusters
        (partition-filter pruned); nprobe >= num_clusters is exact."""
        return brute_force_cosine_topk(
            self.candidates(spark, query, nprobe), "id", "vec", query, k
        )


def cosine_sql_expr(vec_col: str, query: Sequence[float]) -> str:
    """DuckDB cosine expression mirroring _cosine_expr OPERATION-FOR-
    OPERATION (sequential dot products, shared literal query norm) so
    both engines agree to ≤1 ulp."""
    qlist = "[" + ", ".join(f"{float(x)!r}" for x in query) + "]::DOUBLE[]"
    qn = f"{_qnorm(query)!r}"
    v = f"{vec_col}::DOUBLE[]"
    return (
        f"(list_dot_product({v}, {qlist}) / (sqrt(list_dot_product({v}, {v})) * {qn}))"
    )


def cosine_topk_sql(
    table: str, id_col: str, vec_col: str, query: Sequence[float], k: int = 10
) -> str:
    """DuckDB oracle for brute_force_cosine_topk."""
    c = cosine_sql_expr(vec_col, query)
    return (
        f"SELECT {id_col} AS id, round({c}, 6) AS cosine "
        f"FROM {table} ORDER BY {c} DESC, {id_col} ASC LIMIT {k}"
    )

"""Inverted-index build: source table → docs / postings / stats tables.

Reference behavior being re-expressed: the write path
``createTable → build/buildFromLocal → commit`` (reference:
RetrievalWorker.java:65-94,176-270,382-393) where every row is routed to
a shard by ``_id`` (Utils.java:137-145), converted field-by-field per
the schema (SchemaUtils.toLuceneField), and fed to a Lucene IndexWriter
which builds sorted, delta+vint-compressed postings per segment.

Our pipeline is Spark-first (north_star): one declarative lineage,
shuffles only where the algorithm genuinely needs them —

    source (repo,path,commit,lang,content)
      → derive _id=sha256(repo|path|commit), content_sha256, shard_id   [narrow]
      → per-shard doc_id assignment (row_number over shard, _id-sorted) [shuffle 1: by shard]
      → tokenize (Catalyst expr or Arrow UDF), dl per analyzed field    [narrow]
      → explode → (shard,field,term,doc_id,dl) → tf                    [shuffle 2: partial+final hash agg]
      → salted hot-term split (doc-range splits keep blocks sorted)     [narrow]
      → posting blocks of 128: delta-gap + varbyte (numpy, applyInPandas)[shuffle 3: by (shard,field,term,split)]
      → write docs/postings partitioned by shard_id; stats from blocks  [shuffle 4: write repartition]

Scale notes (100 TB / 1000 executors):
- No driver-side data, no collect() of corpus-sized data. The only
  driver round-trips are tiny: per-shard fingerprints (num_shards rows)
  and the hot-term list (few hundred rows).
- Skew: hot code terms (``import``, ``return``) have df≈N. The
  applyInPandas group key includes ``split_id`` = doc-id range, so a hot
  term's postings build as many bounded tasks, not one straggler — and
  because splits are doc-RANGE based, blocks stay globally sorted by
  doc_id (merge order = first_doc), per SURVEY §7.4.
- Resume: each shard's input fingerprint (count + bit_xor of row
  hashes) is recorded in a per-shard manifest AFTER its data lands;
  re-running the build skips shards whose fingerprint matches —
  interrupted builds resume without recomputation (north_rule).
- Memory: posting-block groups are bounded by split_threshold rows;
  block blobs are ~2 bytes/posting.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from byzer_retrieval_spark.functions.analyzer import WHITESPACE, tokenize_expr, tokenize_udf
from byzer_retrieval_spark.functions.encoding import varbyte_encode
from byzer_retrieval_spark.sources.storage import IndexStore

# doc_id = shard_id << DOC_BITS | row_number-within-shard: doc ids are
# dense per shard and globally ordered by (shard, _id) — block splits by
# doc-id range therefore stay sorted, and 2^40 docs/shard is plenty.
DOC_BITS = 40

POSTING_BLOCK_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("field", StringType(), False),
        StructField("term", StringType(), False),
        StructField("first_doc", LongType(), False),
        StructField("last_doc", LongType(), False),
        StructField("df_block", IntegerType(), False),
        StructField("max_tf", IntegerType(), False),
        StructField("min_dl", IntegerType(), False),
        StructField("sum_tf", LongType(), False),
        StructField("doc_gaps", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("dls", BinaryType(), False),
    ]
)


@dataclass
class IndexConfig:
    num_shards: int = 8
    analyzer: str = WHITESPACE
    analyzed_fields: Tuple[str, ...] = ("content",)
    id_columns: Tuple[str, ...] = ("repo", "path", "commit")
    stored_fields: Optional[Tuple[str, ...]] = None  # None → all non-analyzed
    block_size: int = 128
    # a (shard, field, term) group larger than this splits by doc range
    # (salted repartitioning for hot terms, north_star)
    hot_term_split_threshold: int = 1 << 17
    use_arrow_udf_tokenizer: bool = False  # expr path is the JVM hot path
    k1: float = 1.2
    b: float = 0.75


def _derive_ids(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    """_id + content_sha256 + shard_id, all JVM-side expressions."""
    if "_id" not in df.columns:
        df = df.withColumn(
            "_id", F.sha2(F.concat_ws("|", *[F.col(c) for c in cfg.id_columns]), 256)
        )
    else:
        df = df.withColumn("_id", F.col("_id").cast("string"))
    for tf_field in cfg.analyzed_fields:
        df = df.withColumn(
            f"{tf_field}_sha256", F.sha2(F.coalesce(F.col(tf_field), F.lit("")), 256)
        )
    # internal sharding: any deterministic hash is semantically equivalent
    # to the reference's murmur3-seed-0 routing (SURVEY §1.2); xxhash64 is
    # JVM-side and free. functions/routing.py provides exact reference
    # routing where bit-compat is required.
    return df.withColumn(
        "shard_id",
        F.pmod(F.xxhash64(F.col("_id")), F.lit(cfg.num_shards)).cast("int"),
    )


def _assign_doc_ids(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("shard_id").orderBy("_id")
    return df.withColumn(
        "__docid",
        (F.col("shard_id").cast("long") * F.lit(1 << DOC_BITS).cast("long"))
        + F.row_number().over(w).cast("long"),
    )


def _tokenize(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    tok = (
        (lambda c: tokenize_udf(cfg.analyzer)(c))
        if cfg.use_arrow_udf_tokenizer
        else (lambda c: tokenize_expr(c, cfg.analyzer))
    )
    for f_name in cfg.analyzed_fields:
        df = df.withColumn(f"__toks_{f_name}", tok(F.coalesce(F.col(f_name), F.lit(""))))
        df = df.withColumn(f"dl_{f_name}", F.size(F.col(f"__toks_{f_name}")))
    return df


def _make_blocks_fn(block_size: int):
    def make_blocks(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id, fld, term = int(key[0]), key[1], key[2]
        pdf = pdf.sort_values("__docid")
        doc_ids = pdf["__docid"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        rows = []
        for s in range(0, len(doc_ids), block_size):
            e = min(s + block_size, len(doc_ids))
            ids = doc_ids[s:e]
            first = int(ids[0])
            gaps = np.empty(e - s, dtype=np.int64)
            gaps[0] = 0
            np.subtract(ids[1:], ids[:-1], out=gaps[1:])
            rows.append(
                (
                    shard_id, fld, term, first, int(ids[-1]), int(e - s),
                    int(tfs[s:e].max()), int(dls[s:e].min()), int(tfs[s:e].sum()),
                    varbyte_encode(gaps),
                    varbyte_encode(tfs[s:e].astype(np.uint64)),
                    varbyte_encode(dls[s:e].astype(np.uint64)),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[f.name for f in POSTING_BLOCK_SCHEMA.fields],
        )

    return make_blocks


def build_index(
    spark: SparkSession,
    source: DataFrame,
    store: IndexStore,
    cfg: Optional[IndexConfig] = None,
    resume: bool = True,
    source_desc: str = "",
) -> Dict:
    """Full (or resumed) index build. Returns build metrics."""
    cfg = cfg or IndexConfig()
    t0 = time.time()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    if not resume:
        store.truncate()
    elif store.exists():
        old = store.read_meta()
        if (
            old.get("num_shards") != cfg.num_shards
            or old.get("analyzer") != cfg.analyzer
            or old.get("analyzed_fields") != list(cfg.analyzed_fields)
        ):
            # layout-incompatible rebuild: stale shard partitions from a
            # different num_shards/analyzer must not survive a dynamic
            # partition overwrite
            store.truncate()

    base = _derive_ids(source, cfg)

    # ---- per-shard input fingerprints (tiny: num_shards rows) ----------
    sha_cols = [F.col(f"{f}_sha256") for f in cfg.analyzed_fields]
    fp_df = (
        base.groupBy("shard_id")
        .agg(
            F.count("*").alias("cnt"),
            F.expr(
                "bit_xor(xxhash64(_id, "
                + ", ".join(f"{f}_sha256" for f in cfg.analyzed_fields)
                + "))"
            ).alias("xor_hash"),
        )
    )
    fingerprints = {
        int(r.shard_id): {"count": int(r.cnt), "xor_hash": int(r.xor_hash)}
        for r in fp_df.collect()
    }

    existing = store.read_shard_manifests() if resume else {}
    pending = [
        s
        for s in fingerprints
        if not (
            s in existing
            and existing[s].get("fingerprint") == fingerprints[s]
            and existing[s].get("complete")
        )
    ]
    skipped = sorted(set(fingerprints) - set(pending))

    metrics = {
        "num_shards": cfg.num_shards,
        "shards_with_data": len(fingerprints),
        "shards_built": len(pending),
        "shards_skipped_by_resume": len(skipped),
    }

    if pending:
        pend = base.filter(F.col("shard_id").isin([int(s) for s in pending]))
        analyzed = _tokenize(_assign_doc_ids(pend), cfg)
        # one pass feeds both the docs write and the postings build; at
        # cluster scale DISK_ONLY persist on executor-local storage beats
        # re-tokenizing the corpus (SURVEY §7.2 M2).
        from pyspark import StorageLevel

        analyzed = analyzed.persist(StorageLevel.DISK_ONLY)

        # ---- docs table (stored fields only: analyze ⇒ Store.NO) -------
        stored = (
            list(cfg.stored_fields)
            if cfg.stored_fields is not None
            else [
                c
                for c in source.columns
                if c not in cfg.analyzed_fields and c != "_id"
            ]
        )
        doc_cols = (
            ["__docid", "_id", "shard_id"]
            + stored
            + [f"dl_{f}" for f in cfg.analyzed_fields]
            + [f"{f}_sha256" for f in cfg.analyzed_fields]
        )
        (
            analyzed.select(*doc_cols)
            .repartition("shard_id")
            .sortWithinPartitions("__docid")
            .write.partitionBy("shard_id")
            .mode("overwrite")
            .parquet(store.docs_path)
        )

        # ---- token frequencies ------------------------------------------
        tok_frames = [
            analyzed.select(
                "shard_id",
                "__docid",
                F.lit(f_name).alias("field"),
                F.col(f"dl_{f_name}").alias("dl"),
                F.explode(F.col(f"__toks_{f_name}")).alias("term"),
            )
            for f_name in cfg.analyzed_fields
        ]
        toks = tok_frames[0]
        for t in tok_frames[1:]:
            toks = toks.unionByName(t)
        tf_df = toks.groupBy("shard_id", "field", "term", "__docid", "dl").agg(
            F.count("*").cast("int").alias("tf")
        )

        # ---- salted hot-term splits -------------------------------------
        hot = (
            tf_df.groupBy("field", "term")
            .count()
            .filter(F.col("count") > cfg.hot_term_split_threshold)
            .select("field", "term")
            .collect()
        )
        hot_terms = [r.term for r in hot]
        metrics["hot_terms_split"] = len(hot_terms)
        local_doc = F.col("__docid") % F.lit(1 << DOC_BITS).cast("long")
        tf_df = tf_df.withColumn(
            "split_id",
            F.when(
                F.col("term").isin(hot_terms) if hot_terms else F.lit(False),
                (local_doc / F.lit(cfg.hot_term_split_threshold)).cast("int"),
            ).otherwise(F.lit(0)),
        )

        # ---- posting blocks (Arrow-vectorized encode) --------------------
        blocks = tf_df.groupBy("shard_id", "field", "term", "split_id").applyInPandas(
            _make_blocks_fn(cfg.block_size), schema=POSTING_BLOCK_SCHEMA
        )
        (
            blocks.repartition("shard_id")
            .sortWithinPartitions("field", "term", "first_doc")
            .write.partitionBy("shard_id")
            .mode("overwrite")
            .parquet(store.postings_path)
        )
        analyzed.unpersist()

    # ---- global stats from the FULL committed tables (resume-safe) ------
    docs_full = store.docs(spark)
    postings_full = store.postings(spark)
    stats_df = postings_full.groupBy("field", "term").agg(
        F.sum("df_block").alias("df"), F.sum("sum_tf").alias("cf")
    )
    (
        stats_df.repartitionByRange(F.col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(store.stats_path)
    )

    field_stats = {}
    for f_name in cfg.analyzed_fields:
        row = docs_full.filter(F.col(f"dl_{f_name}") > 0).agg(
            F.count("*").alias("n"), F.sum(f"dl_{f_name}").alias("sum_dl")
        ).collect()[0]
        n = int(row.n or 0)
        field_stats[f_name] = {
            "n_docs": n,
            "sum_dl": int(row.sum_dl or 0),
            "avgdl": (float(row.sum_dl) / n) if n else 0.0,
        }
    n_total = docs_full.count()

    # ---- per-shard manifests (lineage + metrics) -------------------------
    per_shard_docs = {
        int(r.shard_id): int(r["count"])
        for r in docs_full.groupBy("shard_id").count().collect()
    }
    per_shard_blocks = {
        int(r.shard_id): {"blocks": int(r.blocks), "postings": int(r.postings)}
        for r in postings_full.groupBy("shard_id")
        .agg(F.count("*").alias("blocks"), F.sum("df_block").alias("postings"))
        .collect()
    }
    for s in pending:
        store.write_shard_manifest(
            int(s),
            {
                "shard_id": int(s),
                "fingerprint": fingerprints[s],
                "complete": True,
                "lineage": {"source": source_desc, "built_at": time.time()},
                "metrics": {
                    "docs": per_shard_docs.get(int(s), 0),
                    **per_shard_blocks.get(int(s), {"blocks": 0, "postings": 0}),
                },
            },
        )

    meta = {
        "num_shards": cfg.num_shards,
        "analyzer": cfg.analyzer,
        "analyzed_fields": list(cfg.analyzed_fields),
        "id_columns": list(cfg.id_columns),
        "block_size": cfg.block_size,
        "k1": cfg.k1,
        "b": cfg.b,
        "doc_bits": DOC_BITS,
    }
    store.write_meta(meta)
    snapshot = {
        "n_docs": int(n_total),
        "field_stats": field_stats,
        "shards": {str(s): fingerprints[s] for s in fingerprints},
        "build_metrics": metrics,
    }
    sid = store.commit(snapshot)

    metrics.update(
        {
            "snapshot_id": sid,
            "n_docs": int(n_total),
            "build_sec": time.time() - t0,
            "field_stats": field_stats,
        }
    )
    return metrics

"""Mutations: upsert, delete-by-ids, delete-by-filter, truncate, compact.

Reference semantics being re-expressed (SURVEY §2.1 W1-W8):
- upsert is delete-then-insert by ``_id`` (Lucene ``updateDocument``,
  RetrievalWorker.java:232-238,262-267);
- deletes are logical until a merge — Lucene keeps deleted docs in
  segment statistics (df/avgdl) until segments merge, and so do we:
  deletes append ``doc_id`` tombstones (merge-on-read), scorers
  anti-filter them, and ``compact()`` is the segment merge that
  physically rewrites postings/docs and refreshes stats;
- deleteByFilter takes a ``{field: value, ...}`` conjunction; values on
  analyzed fields are parsed as queries (RetrievalWorker.java:103-124);
- truncate drops everything (indexWriter.deleteAll,
  RetrievalWorker.java:395-406).

Scale: an upsert touches only the shards its ``_id``s route to — new
docs append as a DELTA segment (doc_ids above the shard's high-water
mark, so delta blocks never overlap base blocks in doc-id space and the
scorers need no special casing). Compaction decodes → filters →
re-encodes posting blocks with the same vectorized codec used at build
time, only for shards that actually have tombstones.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterable, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byzer_retrieval_spark.functions.analyzer import tokenize_py
from byzer_retrieval_spark.operators.context import IndexContext
from byzer_retrieval_spark.operators.decode import decode_rows, flat_postings
from byzer_retrieval_spark.operators.indexer import (
    DOC_BITS,
    IndexConfig,
    POSTING_BLOCK_SCHEMA,
    _derive_ids,
    _sorted_block_builder,
    _tokenize,
)
from byzer_retrieval_spark.functions.encoding import varbyte_encode
from byzer_retrieval_spark.sources.storage import IndexStore


def _cfg_from_meta(meta: Dict[str, Any]) -> IndexConfig:
    return IndexConfig(
        num_shards=int(meta["num_shards"]),
        analyzer=meta["analyzer"],
        analyzed_fields=tuple(meta["analyzed_fields"]),
        id_columns=tuple(meta.get("id_columns", ())),
        block_size=int(meta.get("block_size", 128)),
        k1=float(meta.get("k1", 1.2)),
        b=float(meta.get("b", 0.75)),
        lucene_dl_quantization=bool(meta.get("lucene_dl_quantization", False)),
    )


def _refresh_stats_and_commit(
    spark: SparkSession, store: IndexStore, note: str
) -> int:
    meta = store.read_meta()
    postings = store.postings(spark)
    stats_df = postings.groupBy("field", "term").agg(
        F.sum("df_block").alias("df"), F.sum("sum_tf").alias("cf")
    )
    (
        stats_df.repartitionByRange(F.col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(store.stats_path)
    )
    docs = store.docs(spark)
    field_stats = {}
    for f_name in meta["analyzed_fields"]:
        row = docs.filter(F.col(f"dl_{f_name}") > 0).agg(
            F.count("*").alias("n"), F.sum(f"dl_{f_name}").alias("sum_dl")
        ).collect()[0]
        n = int(row.n or 0)
        field_stats[f_name] = {
            "n_docs": n,
            "sum_dl": int(row.sum_dl or 0),
            "avgdl": (float(row.sum_dl) / n) if n else 0.0,
        }
    snap = {
        "n_docs": int(docs.count()),
        "field_stats": field_stats,
        "note": note,
    }
    return store.commit(snap)


def _append_tombstones(
    spark: SparkSession, store: IndexStore, doc_ids_df: DataFrame
) -> int:
    rows = doc_ids_df.select("__docid").distinct()
    n = rows.count()
    if n:
        rows.write.mode("append").parquet(store.tombstones_path)
    return n


def delete_by_ids(
    spark: SparkSession, store: IndexStore, ids: Iterable[Any]
) -> int:
    """Tombstone docs whose ``_id`` is in ids (W3). Returns count."""
    ids = [str(i) for i in ids]
    docs = store.docs(spark)
    hit = docs.filter(F.col("_id").isin(ids)).select("__docid")
    n = _append_tombstones(spark, store, hit)
    _refresh_stats_and_commit(spark, store, f"delete_by_ids({len(ids)} ids)")
    return n


def delete_by_filter(
    spark: SparkSession, store: IndexStore, condition: Dict[str, Any]
) -> int:
    """Tombstone docs matching a {field: value} conjunction (W4).

    Values on analyzed fields are treated as analyzed queries (any token
    matches — SimpleQueryParser's implicit OR), mirroring
    SchemaUtils.java:170-173 + RetrievalWorker.java:103-124.
    """
    meta = store.read_meta()
    docs = store.docs(spark)
    analyzed = set(meta["analyzed_fields"])
    plain = {k: v for k, v in condition.items() if k not in analyzed}
    text = {k: v for k, v in condition.items() if k in analyzed}

    hit = docs
    for k, v in plain.items():
        hit = hit.filter(F.col(k) == F.lit(v))
    if text:
        postings = store.postings(spark)
        for fld, v in text.items():
            toks = tokenize_py(str(v), meta["analyzer"])
            match = flat_postings(
                postings.filter((F.col("field") == fld) & F.col("term").isin(toks))
            ).select("__docid").distinct()
            hit = hit.join(match, "__docid", "left_semi")
    n = _append_tombstones(spark, store, hit.select("__docid"))
    _refresh_stats_and_commit(spark, store, f"delete_by_filter({condition})")
    return n


def upsert(
    spark: SparkSession,
    store: IndexStore,
    new_rows: DataFrame,
    source_desc: str = "upsert",
) -> Dict[str, Any]:
    """Delete-then-insert by _id (W2): tombstone old versions, append the
    new docs as a delta segment in their shards."""
    meta = store.read_meta()
    cfg = _cfg_from_meta(meta)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # latest-wins within the incoming batch itself. The sequence column
    # is assigned on the INPUT DataFrame (before _derive_ids shuffles by
    # _id) so which duplicate wins reflects input row order — matching
    # the reference's sequential updateDocument (last row wins) — rather
    # than a nondeterministic post-shuffle evaluation order.
    from pyspark.sql import Window

    seq_rows = new_rows.withColumn("__seq", F.monotonically_increasing_id())
    base = _derive_ids(seq_rows, cfg)
    w = Window.partitionBy("_id").orderBy(F.col("__seq").desc())
    base = base.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn", "__seq")

    docs = store.docs(spark)
    old = docs.join(base.select("_id"), "_id", "left_semi").select("__docid")
    n_tomb = _append_tombstones(spark, store, old)

    # delta doc_ids start above each shard's high-water mark
    hwm = {
        int(r.shard_id): int(r.mx)
        for r in docs.groupBy("shard_id").agg(F.max("__docid").alias("mx")).collect()
    }
    hwm_df = spark.createDataFrame(
        [(s, m) for s, m in hwm.items()] or [(-1, 0)], "shard_id int, hwm long"
    )
    w2 = Window.partitionBy("shard_id").orderBy("_id")
    base = (
        base.join(F.broadcast(hwm_df), "shard_id", "left")
        .withColumn(
            "__docid",
            F.coalesce(
                F.col("hwm"),
                F.col("shard_id").cast("long") * F.lit(1 << DOC_BITS).cast("long"),
            )
            + F.row_number().over(w2).cast("long"),
        )
        .drop("hwm")
    )
    analyzed = _tokenize(base, cfg)

    stored = [
        c
        for c in new_rows.columns
        if c not in cfg.analyzed_fields and c != "_id"
    ]
    doc_cols = (
        ["__docid", "_id", "shard_id"]
        + stored
        + [f"dl_{f}" for f in cfg.analyzed_fields]
        + [f"{f}_sha256" for f in cfg.analyzed_fields]
    )
    analyzed.select(*doc_cols).write.partitionBy("shard_id").mode("append").parquet(
        store.docs_path
    )

    # delta postings go through the SAME token-level mapInArrow builder
    # as a full build (single shuffle, run-length tf, positions encoded)
    def _dl_col(f_name: str):
        c = F.col(f"dl_{f_name}")
        if cfg.lucene_dl_quantization:
            from byzer_retrieval_spark.functions.bm25 import quantize_dl_expr

            c = quantize_dl_expr(c)
        return c

    tok_frames = [
        analyzed.select(
            "shard_id",
            "__docid",
            F.lit(f_name).alias("field"),
            _dl_col(f_name).alias("dl"),
            F.posexplode(F.col(f"__toks_{f_name}")).alias("pos", "term"),
        )
        for f_name in cfg.analyzed_fields
    ]
    toks = tok_frames[0]
    for t in tok_frames[1:]:
        toks = toks.unionByName(t)
    tok_rows = toks.withColumn("split_id", F.lit(0))
    blocks = (
        tok_rows.repartition("shard_id", "field", "term", "split_id")
        .sortWithinPartitions(
            "shard_id", "field", "term", "split_id", "__docid", "pos"
        )
        .mapInArrow(_sorted_block_builder(cfg.block_size), schema=POSTING_BLOCK_SCHEMA)
    )
    blocks.write.partitionBy("shard_id").mode("append").parquet(store.postings_path)

    # affected shards diverge from any full-build fingerprint → clear
    # their resume manifests (a later full rebuild recomputes them)
    for s in [int(r.shard_id) for r in base.select("shard_id").distinct().collect()]:
        store.clear_shard_manifest(s)

    sid = _refresh_stats_and_commit(spark, store, source_desc)
    return {"tombstoned": n_tomb, "snapshot_id": sid}


def compact(spark: SparkSession, store: IndexStore) -> Dict[str, Any]:
    """Segment merge: physically drop tombstoned docs from postings and
    docs, then refresh stats (this is when df/avgdl 'forget' deleted
    docs — exactly Lucene's behavior on segment merge)."""
    tomb = store.tombstone_ids(spark)
    if not tomb:
        return {"compacted_shards": 0}
    tomb_arr = np.asarray(sorted(int(t) for t in tomb), dtype=np.int64)
    shards = sorted({int(t >> DOC_BITS) for t in tomb_arr})
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    postings = store.postings(spark).filter(F.col("shard_id").isin(shards))
    block_size = int(store.read_meta().get("block_size", 128))

    def rewrite(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from byzer_retrieval_spark.functions.encoding import (
            varbyte_decode,
            varbyte_encode_segments,
        )

        shard_id, fld, term = int(key[0]), key[1], key[2]
        pdf = pdf.sort_values("first_doc")
        docs, tfs, dls, _ = decode_rows(
            pdf["doc_gaps"], pdf["tfs"], pdf["dls"], pdf["first_doc"]
        )
        # position-delta segments are self-contained per POSTING (absolute
        # first value), so re-cutting blocks = re-slicing the token stream
        pos_deltas = np.concatenate(
            [varbyte_decode(b).astype(np.int64) for b in pdf["positions"]]
        ) if len(pdf) else np.empty(0, dtype=np.int64)
        keep = ~np.isin(docs, tomb_arr)
        tok_keep = np.repeat(keep, tfs)
        docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        pos_deltas = pos_deltas[tok_keep]
        rows = []
        tok_off = np.zeros(docs.size + 1, dtype=np.int64)
        np.cumsum(tfs, out=tok_off[1:])
        for s in range(0, docs.size, block_size):
            e = min(s + block_size, docs.size)
            ids = docs[s:e]
            gaps = np.empty(e - s, dtype=np.int64)
            gaps[0] = 0
            np.subtract(ids[1:], ids[:-1], out=gaps[1:])
            rows.append(
                (
                    shard_id, fld, term, int(ids[0]), int(ids[-1]), int(e - s),
                    int(tfs[s:e].max()), int(dls[s:e].min()), int(tfs[s:e].sum()),
                    varbyte_encode(gaps),
                    varbyte_encode(tfs[s:e].astype(np.uint64)),
                    varbyte_encode(dls[s:e].astype(np.uint64)),
                    varbyte_encode(
                        pos_deltas[tok_off[s]:tok_off[e]].astype(np.uint64)
                    ),
                )
            )
        return pd.DataFrame(
            rows, columns=[f.name for f in POSTING_BLOCK_SCHEMA.fields]
        )

    import os
    import shutil

    def swap_partitions(df: DataFrame, final_path: str, sort_cols: List[str]):
        # can't overwrite a path we're reading: stage, then swap only the
        # affected shard directories (cheap metadata moves)
        tmp = final_path + ".compact_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            df.repartition("shard_id")
            .sortWithinPartitions(*sort_cols)
            .write.partitionBy("shard_id")
            .mode("overwrite")
            .parquet(tmp)
        )
        for s in shards:
            src = os.path.join(tmp, f"shard_id={s}")
            dst = os.path.join(final_path, f"shard_id={s}")
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.exists(src):
                shutil.move(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)

    new_blocks = postings.groupBy("shard_id", "field", "term").applyInPandas(
        rewrite, schema=POSTING_BLOCK_SCHEMA
    )
    swap_partitions(new_blocks, store.postings_path, ["field", "term", "first_doc"])

    docs = store.docs(spark).filter(F.col("shard_id").isin(shards))
    tomb_df = store.tombstones(spark)
    live = docs.join(tomb_df.select("__docid").distinct(), "__docid", "left_anti")
    swap_partitions(live, store.docs_path, ["__docid"])

    shutil.rmtree(store.tombstones_path, ignore_errors=True)
    sid = _refresh_stats_and_commit(spark, store, "compact")
    return {"compacted_shards": len(shards), "snapshot_id": sid}

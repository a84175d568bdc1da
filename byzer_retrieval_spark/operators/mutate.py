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
    PARTIAL_POSTING_SCHEMA,
    POSTING_BLOCK_SCHEMA,
    _derive_ids,
    _merge_block_builder,
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
    spark: SparkSession,
    store: IndexStore,
    note: str,
    docid_id_order: "Optional[bool]" = None,
) -> int:
    """``docid_id_order``: None carries the current snapshot's value
    forward (deletes/compact never reorder doc ids); upsert passes
    False — delta docs get ids above the shard high-water mark, so
    __docid asc stops implying _id asc and scorers must keep
    boundary-score ties per shard (see indexer's snapshot note)."""
    meta = store.read_meta()
    postings = store.postings(spark)
    stats_df = postings.groupBy("field", "term").agg(
        F.sum("df_block").alias("df"), F.sum("sum_tf").alias("cf")
    )
    store.write_stats(stats_df)
    docs = store.docs(spark)
    # ONE per-shard aggregation job covers every field; the global
    # stats are its driver-side sums and the per-(field, shard) stats
    # (per_shard_stats scoring mode, reference numNodes>1 parity) fall
    # out for free — same discipline as the index builder.
    aggs = [F.count("*").alias("__n_total")]
    for f_name in meta["analyzed_fields"]:
        aggs.append(
            F.count_if(F.col(f"dl_{f_name}") > 0).alias(f"__n_{f_name}")
        )
        aggs.append(F.sum(f"dl_{f_name}").alias(f"__sum_{f_name}"))
    doc_rows = docs.groupBy("shard_id").agg(*aggs).collect()
    field_stats = {}
    shard_field_stats: dict = {f: {} for f in meta["analyzed_fields"]}
    for f_name in meta["analyzed_fields"]:
        for r in doc_rows:
            sn = int(r[f"__n_{f_name}"] or 0)
            ssum = int(r[f"__sum_{f_name}"] or 0)
            shard_field_stats[f_name][str(int(r.shard_id))] = {
                "n_docs": sn,
                "sum_dl": ssum,
                "avgdl": (float(ssum) / sn) if sn else 0.0,
            }
        n = sum(int(r[f"__n_{f_name}"] or 0) for r in doc_rows)
        sum_dl = sum(int(r[f"__sum_{f_name}"] or 0) for r in doc_rows)
        field_stats[f_name] = {
            "n_docs": n,
            "sum_dl": sum_dl,
            "avgdl": (float(sum_dl) / n) if n else 0.0,
        }
    if docid_id_order is None:
        cur = store.current_snapshot() or {}
        docid_id_order = bool(cur.get("docid_id_order", False))
    snap = {
        "n_docs": sum(int(r["__n_total"]) for r in doc_rows),
        "field_stats": field_stats,
        "shard_field_stats": shard_field_stats,
        "note": note,
        "docid_id_order": bool(docid_id_order),
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
    # delta postings reuse the build's hot-term doc-range salt (same rule
    # as indexer._partial_postings_builder) so a large upsert batch can't
    # funnel a hot term into one merge group
    hot_terms = list(meta.get("hot_terms", []))
    if hot_terms:
        thr = int(meta.get("hot_term_split_threshold", 1 << 17))
        local_mask = (1 << DOC_BITS) - 1
        split_col = F.when(
            F.col("term").isin(hot_terms),
            F.floor(
                F.col("__docid").bitwiseAND(F.lit(local_mask).cast("long"))
                / F.lit(thr)
            ).cast("int"),
        ).otherwise(F.lit(0))
    else:
        split_col = F.lit(0)
    tok_rows = toks.withColumn("split_id", split_col)
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

    sid = _refresh_stats_and_commit(
        spark, store, source_desc, docid_id_order=False
    )
    return {"tombstoned": n_tomb, "snapshot_id": sid}


def _reencode_pos_rows(hot_terms: Iterable[str], split_threshold: int):
    """Narrow mapInArrow: posting rows with ABSOLUTE positions
    (array<int>) → PARTIAL_POSTING rows with per-posting varbyte delta
    runs, ready for the build-time merge builder. One vectorized varbyte
    pass per batch, zero-copy BinaryArray construction.

    ``split_id`` is re-derived with the SAME doc-range rule the build
    uses for hot terms ((docid & mask) // threshold,
    indexer._partial_postings_builder) — compacting a shard that holds a
    salted hot term must not funnel its whole posting list into one
    (shard, field, term, 0) merge group and reintroduce the skew the
    salt exists to avoid."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from byzer_retrieval_spark.functions.encoding import varbyte_runs_arrow

    hot = frozenset(hot_terms)

    def gen(batches):
        pa.set_cpu_count(1)
        local_mask = np.int64((1 << DOC_BITS) - 1)
        for rb in batches:
            tbl = pa.Table.from_batches([rb]).combine_chunks()
            n = tbl.num_rows
            if n == 0:
                continue
            pos_list = tbl.column("positions").chunk(0)
            counts = pc.list_value_length(pos_list).to_numpy().astype(np.int64)
            flat = pc.list_flatten(pos_list).to_numpy().astype(np.int64)
            total = flat.size
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            deltas = np.empty(total, dtype=np.int64)
            if total:
                deltas[0] = flat[0]
                np.subtract(flat[1:], flat[:-1], out=deltas[1:])
                deltas[starts] = flat[starts]
            pos_arr = varbyte_runs_arrow(deltas, starts)
            if hot:
                dic = pc.dictionary_encode(tbl.column("term").chunk(0))
                hot_mask = np.fromiter(
                    (t in hot for t in dic.dictionary.to_pylist()),
                    dtype=bool,
                    count=len(dic.dictionary),
                )
                is_hot = hot_mask[dic.indices.to_numpy().astype(np.int64)]
                docid = tbl.column("__docid").to_numpy().astype(np.int64)
                split = np.where(
                    is_hot, (docid & local_mask) // split_threshold, 0
                ).astype(np.int32)
            else:
                split = np.zeros(n, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    tbl.column("shard_id").chunk(0),
                    tbl.column("field").chunk(0),
                    tbl.column("term").chunk(0),
                    pa.array(split, type=pa.int32()),
                    tbl.column("__docid").chunk(0),
                    tbl.column("dl").chunk(0),
                    tbl.column("tf").chunk(0),
                    pos_arr,
                ],
                names=[f.name for f in PARTIAL_POSTING_SCHEMA.fields],
            )

    return gen


def _docid_order_holds(spark: SparkSession, store: IndexStore) -> bool:
    """Whether EVERY shard's ``_id`` is monotone in ``__docid`` order —
    the invariant behind the scorers' exact constant-score tie-cut
    (docid_id_order). One lag() check per shard over the 3-column docs
    projection; cost ≈ one per-shard sort, same shape as compact's own
    rewrite sort."""
    from pyspark.sql import Window

    w_ord = Window.partitionBy("shard_id").orderBy("__docid")
    viol = (
        store.docs(spark)
        .select("shard_id", "__docid", "_id")
        .withColumn("__prev", F.lag("_id").over(w_ord))
        .filter(F.col("__prev") > F.col("_id"))
        .limit(1)
        .count()
    )
    return viol == 0


def compact(spark: SparkSession, store: IndexStore) -> Dict[str, Any]:
    """Segment merge: physically drop tombstoned docs from postings and
    docs, then refresh stats (this is when df/avgdl 'forget' deleted
    docs — exactly Lucene's behavior on segment merge).

    No driver-side tombstone data: the only collect is the ≤ num_shards
    affected-shard list (for partition-filtered rewrites). The rewrite
    itself is decode → distributed anti-join against the tombstone
    DataFrame → re-encode through the SAME streaming merge builder the
    full build uses, so compaction scales exactly like a build."""
    tomb_df = store.tombstones(spark)
    if tomb_df is None:
        # nothing to merge — but a pure-insert upsert clears
        # docid_id_order without leaving tombstones, so compact still
        # re-validates the invariant (round 5) and commits the flag
        # restore alone when it holds again
        cur = store.current_snapshot() or {}
        if not bool(cur.get("docid_id_order", False)) and _docid_order_holds(
            spark, store
        ):
            sid = _refresh_stats_and_commit(
                spark, store, "compact(order restore)", docid_id_order=True
            )
            return {"compacted_shards": 0, "snapshot_id": sid}
        return {"compacted_shards": 0}
    tomb_ids = tomb_df.select("__docid").distinct()
    shards = sorted(
        int(r.s)
        for r in tomb_ids.select(
            F.shiftright("__docid", DOC_BITS).alias("s")
        )
        .distinct()
        .collect()
    )
    if not shards:
        return {"compacted_shards": 0}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    postings = store.postings(spark).filter(F.col("shard_id").isin(shards))
    meta = store.read_meta()
    block_size = int(meta.get("block_size", 128))
    hot_terms = list(meta.get("hot_terms", []))
    split_threshold = int(meta.get("hot_term_split_threshold", 1 << 17))

    live_rows = flat_postings(postings, with_positions=True).join(
        tomb_ids, "__docid", "left_anti"
    )
    new_blocks = (
        live_rows.mapInArrow(
            _reencode_pos_rows(hot_terms, split_threshold),
            schema=PARTIAL_POSTING_SCHEMA,
        )
        .repartition("shard_id", "field", "term", "split_id")
        .sortWithinPartitions("shard_id", "field", "term", "split_id", "__docid")
        .mapInArrow(_merge_block_builder(block_size), schema=POSTING_BLOCK_SCHEMA)
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

    swap_partitions(new_blocks, store.postings_path, ["field", "term", "first_doc"])

    docs = store.docs(spark).filter(F.col("shard_id").isin(shards))
    live = docs.join(tomb_ids, "__docid", "left_anti")
    swap_partitions(live, store.docs_path, ["__docid"])

    shutil.rmtree(store.tombstones_path, ignore_errors=True)

    # round 5: upserts clear the docid_id_order flag (delta ids above
    # the shard high-water mark break __docid asc == _id asc), which
    # degrades the scorers' constant-score tie-cut to keep-boundary-ties
    # until a full rebuild. Compact already rewrites the affected
    # shards' docs, so re-validate the invariant here — one lag() check
    # per shard over the (shard_id, __docid, _id) projection — and
    # restore the flag when EVERY shard is _id-monotone in __docid
    # order again (e.g. the upserted docs were tombstoned, or the delta
    # happened to extend each shard in _id order). A snapshot already
    # carrying the flag keeps it (compact only removes rows — it can
    # never break an existing ordering).
    cur = store.current_snapshot() or {}
    order_flag = bool(cur.get("docid_id_order", False)) or _docid_order_holds(
        spark, store
    )
    sid = _refresh_stats_and_commit(
        spark, store, "compact", docid_id_order=order_flag
    )
    return {"compacted_shards": len(shards), "snapshot_id": sid}

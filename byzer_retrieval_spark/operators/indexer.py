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
      → per-shard doc_id assignment (row_number over shard, _id-sorted) [shuffle 1: by shard → staged parquet]
      → tokenize (Catalyst expr or Arrow UDF) → token ARRAYS            [narrow]
      → stage A: collapse to per-(term,doc) posting runs                [narrow, mapInArrow]
          (tf, dl, positions varbyte-encoded per posting;
           salted hot-term split ids — doc-range splits stay sorted)
      → stage B: cluster-by (shard,field,term,split) + sort → merge     [shuffle 2: postings, ~5x fewer rows than tokens]
          re-cut into 128-posting blocks: delta-gap + varbyte,
          per-block max_tf/min_dl (block-max WAND metadata)
      → write docs/postings partitioned by shard_id; stats from blocks  [shuffle 3: write repartition]

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

import os
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

from byzer_retrieval_spark.functions.analyzer import (
    WHITESPACE,
    token_count_expr,
    tokenize_expr,
    tokenize_udf,
)
from byzer_retrieval_spark.functions.encoding import varbyte_encode
from byzer_retrieval_spark.sources.storage import IndexStore

# doc_id = shard_id << DOC_BITS | row_number-within-shard: doc ids are
# dense per shard and globally ordered by (shard, _id) — block splits by
# doc-id range therefore stay sorted, and 2^40 docs/shard is plenty.
DOC_BITS = 40

# ``positions`` holds term positions for every posting in the block:
# per posting, tf varbyte values — the first is the absolute position of
# the term's first occurrence in the doc, the rest are deltas (>= 1).
# Segments reset at POSTING boundaries (not block boundaries), so blocks
# can be re-cut (compaction) by concatenating per-posting byte runs.
# Lucene's TextField always indexes positions
# (DOCS_AND_FREQS_AND_POSITIONS) — this matches the reference's storage
# and enables PhraseQuery parity (RetrievalWorker.java:339-341).
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
        StructField("positions", BinaryType(), False),
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
    # Lucene-faithful 1-byte dl norms (SmallFloat byte4): quantizes the
    # dl stored in posting blocks; avgdl stays exact. Default off = our
    # exact-dl semantics (strictly more precise, documented deviation).
    lucene_dl_quantization: bool = False
    # Reference numNodes>1 parity (round 5): score every shard with its
    # OWN df/N/avgdl — each reference worker is an independent Lucene
    # index whose local stats shape idf/tfnorm, and the master merges by
    # score (RetrievalFlightServer.java:456-460). Default off = global
    # stats (single-node-equivalent, self-consistent ranking). When on,
    # queries run on the declarative scorer (per-shard idf invalidates
    # the WAND path's driver-computed clause upper bounds).
    per_shard_stats: bool = False


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


def _arrow_blocks_from_arrays(
    shard: np.ndarray,
    field_codes: np.ndarray,
    term_codes: np.ndarray,
    split: np.ndarray,
    docs_tok: np.ndarray,
    dl_tok: np.ndarray,
    pos_tok: np.ndarray,
    field_arr,  # pa.Array (string)
    term_arr,  # pa.Array (string)
    block_size: int,
):
    """Core vectorized tf+block computation over token-occurrence arrays
    (sorted by group key then doc id). Returns a pyarrow RecordBatch of
    posting blocks. All hot-path ops are numpy/Arrow C kernels."""
    import pyarrow as pa

    from byzer_retrieval_spark.functions.encoding import varbyte_encode_segments

    n = docs_tok.size
    key_change_tok = np.empty(n, dtype=bool)
    key_change_tok[0] = True
    key_change_tok[1:] = (
        (term_codes[1:] != term_codes[:-1])
        | (field_codes[1:] != field_codes[:-1])
        | (shard[1:] != shard[:-1])
        | (split[1:] != split[:-1])
    )

    # collapse token occurrences → postings (run-length tf)
    doc_change = np.empty(n, dtype=bool)
    doc_change[0] = True
    np.not_equal(docs_tok[1:], docs_tok[:-1], out=doc_change[1:])
    posting_change = key_change_tok | doc_change
    posting_start = np.nonzero(posting_change)[0]
    np_post = posting_start.size
    posting_end = np.empty(np_post, dtype=np.int64)
    posting_end[:-1] = posting_start[1:]
    posting_end[-1] = n
    tfs = posting_end - posting_start
    docs = docs_tok[posting_start]
    dls = dl_tok[posting_start]
    key_change = key_change_tok[posting_start]

    # group/block boundaries over postings
    group_id = np.cumsum(key_change) - 1
    group_start = np.nonzero(key_change)[0]
    offset_in_group = np.arange(np_post, dtype=np.int64) - group_start[group_id]
    new_block = (offset_in_group % block_size) == 0
    block_start = np.nonzero(new_block)[0]
    nb = block_start.size
    block_end_excl = np.empty(nb, dtype=np.int64)
    block_end_excl[:-1] = block_start[1:]
    block_end_excl[-1] = np_post

    gaps = np.empty(np_post, dtype=np.int64)
    gaps[0] = 0
    np.subtract(docs[1:], docs[:-1], out=gaps[1:])
    gaps[block_start] = 0

    # per-token position deltas, reset to ABSOLUTE at each posting start
    # (input is sorted by (..., __docid, pos), so deltas are >= 1 within
    # a posting)
    pos_deltas = np.empty(n, dtype=np.int64)
    pos_deltas[0] = pos_tok[0]
    np.subtract(pos_tok[1:], pos_tok[:-1], out=pos_deltas[1:])
    pos_deltas[posting_start] = pos_tok[posting_start]

    tok_at_block = posting_start[block_start]
    take_idx = pa.array(tok_at_block, type=pa.int64())
    return pa.RecordBatch.from_arrays(
        [
            pa.array(shard[tok_at_block].astype(np.int32), type=pa.int32()),
            field_arr.take(take_idx),
            term_arr.take(take_idx),
            pa.array(docs[block_start], type=pa.int64()),
            pa.array(docs[block_end_excl - 1], type=pa.int64()),
            pa.array((block_end_excl - block_start).astype(np.int32), type=pa.int32()),
            pa.array(np.maximum.reduceat(tfs, block_start).astype(np.int32), type=pa.int32()),
            pa.array(np.minimum.reduceat(dls, block_start).astype(np.int32), type=pa.int32()),
            pa.array(np.add.reduceat(tfs, block_start), type=pa.int64()),
            pa.array(varbyte_encode_segments(gaps, block_start), type=pa.binary()),
            pa.array(varbyte_encode_segments(tfs, block_start), type=pa.binary()),
            pa.array(varbyte_encode_segments(dls, block_start), type=pa.binary()),
            pa.array(
                varbyte_encode_segments(pos_deltas, tok_at_block), type=pa.binary()
            ),
        ],
        names=[f.name for f in POSTING_BLOCK_SCHEMA.fields],
    )


def _sorted_block_builder(block_size: int):
    """mapInArrow generator over a sorted partition stream, carrying the
    (possibly incomplete) trailing key-group across Arrow batches.

    mapInArrow (not mapInPandas) on purpose: the input is one row per
    TOKEN, and converting tens of millions of term strings to Python
    objects per task is the single biggest cost of the naive version
    (measured ~100µs/row). Here strings stay in Arrow buffers; key-change
    detection runs on dictionary codes.
    """

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        # one Arrow thread per worker: Spark already runs one Python
        # worker per core, and pyarrow's default per-process thread pool
        # (ncores threads EACH) oversubscribes the box quadratically —
        # measured 4x slowdown at local[32] before this
        pa.set_cpu_count(1)

        carry = None  # pa.Table
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None and carry.num_rows:
                tbl = pa.concat_tables([carry, tbl])
            tbl = tbl.combine_chunks()
            n = tbl.num_rows
            if n == 0:
                carry = None
                continue
            shard = tbl.column("shard_id").to_numpy().astype(np.int64)
            split = tbl.column("split_id").to_numpy().astype(np.int64)
            term_arr = tbl.column("term").chunk(0)
            field_arr = tbl.column("field").chunk(0)
            term_codes = pc.dictionary_encode(term_arr).indices.to_numpy()
            field_codes = pc.dictionary_encode(field_arr).indices.to_numpy()

            # find the start of the trailing (possibly incomplete) group
            neq = (
                (term_codes != term_codes[-1])
                | (field_codes != field_codes[-1])
                | (shard != shard[-1])
                | (split != split[-1])
            )
            tail_start = int(np.nonzero(neq)[0][-1]) + 1 if neq.any() else 0
            carry = tbl.slice(tail_start)
            if tail_start == 0:
                continue
            yield _arrow_blocks_from_arrays(
                shard[:tail_start],
                field_codes[:tail_start],
                term_codes[:tail_start],
                split[:tail_start],
                tbl.column("__docid").to_numpy()[:tail_start].astype(np.int64),
                tbl.column("dl").to_numpy()[:tail_start].astype(np.int64),
                tbl.column("pos").to_numpy()[:tail_start].astype(np.int64),
                field_arr.slice(0, tail_start),
                term_arr.slice(0, tail_start),
                block_size,
            )
        if carry is not None and carry.num_rows:
            tbl = carry.combine_chunks()
            import pyarrow.compute as pc2

            term_arr = tbl.column("term").chunk(0)
            field_arr = tbl.column("field").chunk(0)
            yield _arrow_blocks_from_arrays(
                tbl.column("shard_id").to_numpy().astype(np.int64),
                pc2.dictionary_encode(field_arr).indices.to_numpy(),
                pc2.dictionary_encode(term_arr).indices.to_numpy(),
                tbl.column("split_id").to_numpy().astype(np.int64),
                tbl.column("__docid").to_numpy().astype(np.int64),
                tbl.column("dl").to_numpy().astype(np.int64),
                tbl.column("pos").to_numpy().astype(np.int64),
                field_arr,
                term_arr,
                block_size,
            )

    return gen


# ---------------------------------------------------------------------------
# Two-stage postings build (north_star shape: "per-partition posting-list
# building as sorted (term, docID, tf) runs, a shuffle-based segment
# merge"). Stage A collapses token occurrences into per-(term, doc)
# posting rows BEFORE the shuffle — measured 5.3x fewer shuffle rows on
# the source-code corpus (10.7M token rows → 2.0M postings at 50k files)
# with positions already varbyte-encoded per posting — and stage B is a
# streaming merge that re-cuts blocks by concatenating per-posting byte
# runs (position segments reset at POSTING boundaries precisely so this
# concat is valid; see POSTING_BLOCK_SCHEMA notes).
# ---------------------------------------------------------------------------

PARTIAL_POSTING_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("field", StringType(), False),
        StructField("term", StringType(), False),
        StructField("split_id", IntegerType(), False),
        StructField("__docid", LongType(), False),
        StructField("dl", IntegerType(), False),
        StructField("tf", IntegerType(), False),
        StructField("pos", BinaryType(), False),
    ]
)


def _binary_region(arr) -> Tuple[np.ndarray, np.ndarray]:
    """(offsets[int64, len+1], values[uint8]) view of a pa.BinaryArray,
    honoring a non-zero array offset (slices). Offsets index into the
    FULL values buffer, so callers slice values with them directly."""
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    off = off[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    val = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
    return off, val


def _partial_postings_builder(
    field_name: str,
    hot_terms: List[str],
    split_threshold: int,
    quantize: bool,
):
    """Stage A: mapInArrow over (shard_id, __docid, toks:array<string>).

    Narrow (no shuffle): tokens arrive as Arrow list arrays — the
    minimal transfer (flat string buffer + offsets), NOT one row per
    token — and are collapsed per batch into posting rows
    (term, doc, tf, dl, positions-varbyte) with numpy/Arrow C kernels:
    dictionary-encode → stable lexsort by (term, doc) → run-length tf →
    one vectorized varbyte pass sliced per posting (zero-copy
    BinaryArray construction, no per-posting Python).
    """
    hot = frozenset(hot_terms)

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from byzer_retrieval_spark.functions.bm25 import quantize_dl
        from byzer_retrieval_spark.functions.encoding import varbyte_runs_arrow

        pa.set_cpu_count(1)
        local_mask = np.int64((1 << DOC_BITS) - 1)
        for rb in batches:
            tbl = pa.Table.from_batches([rb]).combine_chunks()
            n_docs = tbl.num_rows
            if n_docs == 0:
                continue
            toks = tbl.column("toks").chunk(0)
            counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
            total = int(counts.sum())
            if total == 0:
                continue
            flat = pc.list_flatten(toks)
            dic = pc.dictionary_encode(flat)
            codes = dic.indices.to_numpy().astype(np.int64)
            uniq = dic.dictionary

            docids = tbl.column("__docid").to_numpy().astype(np.int64)
            shards = tbl.column("shard_id").to_numpy().astype(np.int64)
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)

            # stable sort: primary term code, secondary doc; equal pairs
            # keep batch order, so positions stay ascending per posting
            order = np.lexsort((doc_idx, codes))
            s_code = codes[order]
            s_doc = doc_idx[order]
            s_pos = pos[order]

            change = np.empty(total, dtype=bool)
            change[0] = True
            change[1:] = (s_code[1:] != s_code[:-1]) | (s_doc[1:] != s_doc[:-1])
            p_start = np.nonzero(change)[0]
            np_post = p_start.size
            p_end = np.empty(np_post, dtype=np.int64)
            p_end[:-1] = p_start[1:]
            p_end[-1] = total
            tf = (p_end - p_start).astype(np.int32)

            # per-posting position deltas (first absolute, rest >= 1),
            # encoded in ONE varbyte pass then sliced per posting
            pos_deltas = np.empty(total, dtype=np.int64)
            pos_deltas[0] = s_pos[0]
            np.subtract(s_pos[1:], s_pos[:-1], out=pos_deltas[1:])
            pos_deltas[p_start] = s_pos[p_start]
            pos_arr = varbyte_runs_arrow(pos_deltas, p_start)

            post_doc_idx = s_doc[p_start]
            post_docid = docids[post_doc_idx]
            dls = counts if not quantize else quantize_dl(counts)
            post_code = s_code[p_start]

            if hot:
                u = uniq.to_pylist()
                hot_mask = np.fromiter(
                    (t in hot for t in u), dtype=bool, count=len(u)
                )
                is_hot = hot_mask[post_code]
                split = np.where(
                    is_hot, (post_docid & local_mask) // split_threshold, 0
                ).astype(np.int32)
            else:
                split = np.zeros(np_post, dtype=np.int32)

            idx_arr = pa.array(post_code, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(shards[post_doc_idx].astype(np.int32), type=pa.int32()),
                    pa.DictionaryArray.from_arrays(
                        pa.array(np.zeros(np_post, dtype=np.int32)),
                        pa.array([field_name]),
                    ).cast(pa.string()),
                    uniq.take(idx_arr),
                    pa.array(split, type=pa.int32()),
                    pa.array(post_docid, type=pa.int64()),
                    pa.array(dls[post_doc_idx].astype(np.int32), type=pa.int32()),
                    pa.array(tf, type=pa.int32()),
                    pos_arr,
                ],
                names=[f.name for f in PARTIAL_POSTING_SCHEMA.fields],
            )

    return gen


# ---------------------------------------------------------------------------
# Segment-shuffle postings build (round 6, guide §8: shuffle lightweight
# proxies, not per-row payloads). Stage A packs each (shard, field, term,
# split) run it sees in a batch into ONE segment row — docs/tfs/dls as
# varbyte streams, positions as the concatenated per-posting runs plus a
# per-posting length stream — so the build shuffle and the stage-B
# JVM→Python Arrow boundary move ~20x fewer rows than the per-posting
# layout (measured 22M posting rows → ~1M segment rows on the 500k-file
# bench corpus; term strings ship once per segment, doc ids ship as
# ~2-byte gaps instead of 8-byte longs). Stage B decodes, merge-sorts
# each group's postings by doc id, and re-cuts the IDENTICAL 128-posting
# blocks the per-posting pipeline produced. The per-posting builders
# below stay for the incremental paths (mutate.upsert/compact operate on
# small batches where row-count overhead doesn't matter).
# ---------------------------------------------------------------------------

POSTING_SEGMENT_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("field", StringType(), False),
        StructField("term", StringType(), False),
        StructField("split_id", IntegerType(), False),
        StructField("n", IntegerType(), False),
        StructField("doc_gaps", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("dls", BinaryType(), False),
        StructField("pos_lens", BinaryType(), False),
        StructField("positions", BinaryType(), False),
    ]
)


def _segment_postings_builder(
    field_name: str,
    hot_terms: List[str],
    split_threshold: int,
    quantize: bool,
    split_in_arrow: bool = False,
):
    """Stage A (segment form): mapInArrow emitting one row per (shard,
    term, split) run in the batch. Tokens are lexsorted by (term, doc
    id) — doc id, not batch row, so each segment's doc stream is
    ascending and gap-encodes — then collapsed to postings exactly like
    the per-posting stage A; the per-segment binary columns are
    zero-copy slices of one flat varbyte pass each.

    ``split_in_arrow`` (round 6): input is (shard_id, __docid, content)
    and the whitespace tokenizer runs INSIDE the batch via RE2
    (pc.split_pattern_regex on the analyzer's explicit class, empties
    dropped) — the Arrow boundary then ships one string per DOC instead
    of one per TOKEN, removing the ~4 bytes/token offset stream and the
    JVM regex pass (measured 12.2s → 6s for the stage at 500k files).
    Token-for-token identical to tokenize_expr (same explicit class,
    same empty-drop); only the WHITESPACE analyzer takes this path."""
    hot = frozenset(hot_terms)

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from byzer_retrieval_spark.functions.bm25 import quantize_dl
        from byzer_retrieval_spark.functions.encoding import varbyte_runs_arrow

        pa.set_cpu_count(1)
        local_mask = np.int64((1 << DOC_BITS) - 1)
        for rb in batches:
            tbl = pa.Table.from_batches([rb]).combine_chunks()
            n_docs = tbl.num_rows
            if n_docs == 0:
                continue
            if split_in_arrow:
                # ascii_split_whitespace splits on C isspace = exactly
                # the analyzer's explicit [ \t\n\x0b\f\r] class, and
                # runs ~5x faster than the RE2 pattern (round 6;
                # token-identity with tokenize_expr pinned by tests —
                # empties from consecutive separators drop below either
                # way)
                toks = pc.ascii_split_whitespace(
                    tbl.column("content").chunk(0)
                )
            else:
                toks = tbl.column("toks").chunk(0)
            counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
            total = int(counts.sum())
            if total == 0:
                continue
            flat = pc.list_flatten(toks)
            dic = pc.dictionary_encode(flat)
            codes = dic.indices.to_numpy().astype(np.int64)
            uniq = dic.dictionary
            if split_in_arrow:
                # RE2 split keeps leading/trailing empty strings where
                # tokenize_expr filters them — drop them here and
                # recompute per-doc counts so dl and positions see only
                # real tokens
                empty_code = pc.index(uniq, "").as_py()
                if empty_code >= 0:
                    keep = codes != empty_code
                    ends = np.cumsum(counts)
                    kcum = np.zeros(total + 1, dtype=np.int64)
                    np.cumsum(keep, out=kcum[1:])
                    counts = kcum[ends] - kcum[ends - counts]
                    codes = codes[keep]
                    total = int(counts.sum())
                    if total == 0:
                        continue

            docids = tbl.column("__docid").to_numpy().astype(np.int64)
            shards = tbl.column("shard_id").to_numpy().astype(np.int64)
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)

            # stable sort by (term, DOC ID): ascending docs per term make
            # the segment gap-encodable; ties (same term+doc) keep batch
            # order so positions stay ascending per posting
            tok_docid = docids[doc_idx]
            order = np.lexsort((tok_docid, codes))
            s_code = codes[order]
            s_docid = tok_docid[order]
            s_doc = doc_idx[order]
            s_pos = pos[order]

            change = np.empty(total, dtype=bool)
            change[0] = True
            change[1:] = (s_code[1:] != s_code[:-1]) | (s_docid[1:] != s_docid[:-1])
            p_start = np.nonzero(change)[0]
            np_post = p_start.size
            p_end = np.empty(np_post, dtype=np.int64)
            p_end[:-1] = p_start[1:]
            p_end[-1] = total
            tf = (p_end - p_start).astype(np.int64)

            # per-posting position deltas (first absolute, rest >= 1),
            # one varbyte pass sliced per posting
            pos_deltas = np.empty(total, dtype=np.int64)
            pos_deltas[0] = s_pos[0]
            np.subtract(s_pos[1:], s_pos[:-1], out=pos_deltas[1:])
            pos_deltas[p_start] = s_pos[p_start]
            pos_arr = varbyte_runs_arrow(pos_deltas, p_start)
            pos_off = np.frombuffer(pos_arr.buffers()[1], dtype=np.int32).astype(
                np.int64
            )
            pos_run_lens = pos_off[1:] - pos_off[:-1]

            post_doc_idx = s_doc[p_start]
            post_docid = s_docid[p_start]
            dl_doc = counts if not quantize else quantize_dl(counts)
            post_dls = dl_doc[post_doc_idx]
            post_code = s_code[p_start]
            post_shard = shards[post_doc_idx]

            if hot:
                u = uniq.to_pylist()
                hot_mask = np.fromiter(
                    (t in hot for t in u), dtype=bool, count=len(u)
                )
                is_hot = hot_mask[post_code]
                split = np.where(
                    is_hot, (post_docid & local_mask) // split_threshold, 0
                ).astype(np.int64)
            else:
                split = np.zeros(np_post, dtype=np.int64)

            # segment boundaries: term/split/shard change (docs ascending
            # within a term means shard — the docid high bits — and the
            # doc-range split are both monotone runs)
            seg_change = np.empty(np_post, dtype=bool)
            seg_change[0] = True
            seg_change[1:] = (
                (post_code[1:] != post_code[:-1])
                | (split[1:] != split[:-1])
                | (post_shard[1:] != post_shard[:-1])
            )
            seg_starts = np.nonzero(seg_change)[0]
            n_seg = seg_starts.size
            seg_ends = np.empty(n_seg, dtype=np.int64)
            seg_ends[:-1] = seg_starts[1:]
            seg_ends[-1] = np_post

            # doc gaps: first posting of a segment absolute, rest deltas
            gaps = np.empty(np_post, dtype=np.int64)
            gaps[0] = post_docid[0]
            np.subtract(post_docid[1:], post_docid[:-1], out=gaps[1:])
            gaps[seg_starts] = post_docid[seg_starts]

            # per-segment positions: one zero-copy slice of the flat
            # encoded buffer at segment boundaries
            seg_pos_off = pos_off[np.append(seg_starts, np_post)].astype(np.int32)
            seg_positions = pa.BinaryArray.from_buffers(
                pa.binary(),
                n_seg,
                [None, pa.py_buffer(seg_pos_off.tobytes()), pos_arr.buffers()[2]],
            )

            take_idx = pa.array(post_code[seg_starts], type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        post_shard[seg_starts].astype(np.int32), type=pa.int32()
                    ),
                    pa.DictionaryArray.from_arrays(
                        pa.array(np.zeros(n_seg, dtype=np.int32)),
                        pa.array([field_name]),
                    ).cast(pa.string()),
                    uniq.take(take_idx),
                    pa.array(split[seg_starts].astype(np.int32), type=pa.int32()),
                    pa.array(
                        (seg_ends - seg_starts).astype(np.int32), type=pa.int32()
                    ),
                    varbyte_runs_arrow(gaps, seg_starts),
                    varbyte_runs_arrow(tf, seg_starts),
                    varbyte_runs_arrow(post_dls.astype(np.int64), seg_starts),
                    varbyte_runs_arrow(pos_run_lens, seg_starts),
                    seg_positions,
                ],
                names=[f.name for f in POSTING_SEGMENT_SCHEMA.fields],
            )

    return gen


def _decode_binary_stream(arr) -> np.ndarray:
    """varbyte-decode the concatenation of every value in a BinaryArray
    (segment streams are self-delimiting, so the concatenated buffer
    decodes as the concatenated values)."""
    from byzer_retrieval_spark.functions.encoding import varbyte_decode

    off, val = _binary_region(arr)
    return varbyte_decode(val[off[0] : off[-1]].tobytes())


def _segment_merge_builder(block_size: int):
    """Stage B (segment form): mapInArrow over the shuffled segment
    stream, sorted by (shard, field, term, split). Decodes each batch's
    segments in four flat varbyte passes, merge-sorts every group's
    postings by doc id (segments from different map tasks interleave
    arbitrarily), gathers the per-posting position runs into sorted
    order with one vectorized byte gather, and re-cuts 128-posting
    blocks — identical bytes to the per-posting pipeline. Carries the
    trailing (possibly incomplete) group's segment rows across Arrow
    batches."""

    def keys(tbl, pc):
        shard = tbl.column("shard_id").to_numpy().astype(np.int64)
        split = tbl.column("split_id").to_numpy().astype(np.int64)
        term_arr = tbl.column("term").chunk(0)
        field_arr = tbl.column("field").chunk(0)
        term_codes = pc.dictionary_encode(term_arr).indices.to_numpy()
        field_codes = pc.dictionary_encode(field_arr).indices.to_numpy()
        return shard, split, term_arr, field_arr, term_codes, field_codes

    def emit(tbl, pc):
        import pyarrow as pa

        from byzer_retrieval_spark.functions.encoding import (
            varbyte_encode_segments,
        )

        shard, split, term_arr, field_arr, term_codes, field_codes = keys(tbl, pc)
        n_seg = tbl.num_rows
        counts = tbl.column("n").to_numpy().astype(np.int64)
        p_total = int(counts.sum())
        if p_total == 0:
            return None

        seg_change = np.empty(n_seg, dtype=bool)
        seg_change[0] = True
        seg_change[1:] = (
            (term_codes[1:] != term_codes[:-1])
            | (field_codes[1:] != field_codes[:-1])
            | (shard[1:] != shard[:-1])
            | (split[1:] != split[:-1])
        )
        seg_first = np.nonzero(seg_change)[0]
        group_of_seg = np.cumsum(seg_change) - 1
        seg_starts = np.zeros(n_seg, dtype=np.int64)
        np.cumsum(counts[:-1], out=seg_starts[1:])

        # ---- decode the four flat streams -----------------------------
        gaps = _decode_binary_stream(tbl.column("doc_gaps").chunk(0)).astype(
            np.int64
        )
        tfs = _decode_binary_stream(tbl.column("tfs").chunk(0)).astype(np.int64)
        dls = _decode_binary_stream(tbl.column("dls").chunk(0)).astype(np.int64)
        pos_lens = _decode_binary_stream(
            tbl.column("pos_lens").chunk(0)
        ).astype(np.int64)

        # absolute doc ids: per-segment cumsum (first value absolute)
        c = np.cumsum(gaps)
        docs = c - np.repeat((c - gaps)[seg_starts], counts)

        # per-posting byte offsets into the batch's positions buffer
        pos_arr = tbl.column("positions").chunk(0)
        p_off, p_val = _binary_region(pos_arr)
        cl = np.cumsum(pos_lens)
        within = (cl - pos_lens) - np.repeat((cl - pos_lens)[seg_starts], counts)
        orig_start = np.repeat(p_off[:-1], counts) + within

        # ---- merge-sort each group's postings by doc id ---------------
        group_of_post = np.repeat(group_of_seg, counts)
        order = np.lexsort((docs, group_of_post))
        docs_s = docs[order]
        tfs_s = tfs[order]
        dls_s = dls[order]
        g_s = group_of_post[order]
        lens_s = pos_lens[order]
        starts_s = orig_start[order]

        # gather position runs into sorted order (one vectorized pass)
        out_off = np.zeros(p_total + 1, dtype=np.int64)
        np.cumsum(lens_s, out=out_off[1:])
        total_b = int(out_off[-1])
        ranges = (
            np.arange(total_b, dtype=np.int64)
            - np.repeat(out_off[:-1], lens_s)
            + np.repeat(starts_s, lens_s)
        )
        pos_buf = np.ascontiguousarray(p_val[ranges])

        # ---- re-cut 128-posting blocks --------------------------------
        key_change = np.empty(p_total, dtype=bool)
        key_change[0] = True
        key_change[1:] = g_s[1:] != g_s[:-1]
        group_start = np.nonzero(key_change)[0]
        group_id = np.cumsum(key_change) - 1
        offset_in_group = np.arange(p_total, dtype=np.int64) - group_start[group_id]
        new_block = (offset_in_group % block_size) == 0
        block_start = np.nonzero(new_block)[0]
        nblk = block_start.size
        block_end = np.empty(nblk, dtype=np.int64)
        block_end[:-1] = block_start[1:]
        block_end[-1] = p_total

        bgaps = np.empty(p_total, dtype=np.int64)
        bgaps[0] = 0
        np.subtract(docs_s[1:], docs_s[:-1], out=bgaps[1:])
        bgaps[block_start] = 0

        blk_off = out_off[np.append(block_start, p_total)].astype(np.int32)
        positions = pa.BinaryArray.from_buffers(
            pa.binary(),
            nblk,
            [None, pa.py_buffer(blk_off.tobytes()), pa.py_buffer(pos_buf)],
        )

        take_idx = pa.array(seg_first[g_s[block_start]], type=pa.int64())
        return pa.RecordBatch.from_arrays(
            [
                pa.array(
                    shard[seg_first[g_s[block_start]]].astype(np.int32),
                    type=pa.int32(),
                ),
                field_arr.take(take_idx),
                term_arr.take(take_idx),
                pa.array(docs_s[block_start], type=pa.int64()),
                pa.array(docs_s[block_end - 1], type=pa.int64()),
                pa.array(
                    (block_end - block_start).astype(np.int32), type=pa.int32()
                ),
                pa.array(
                    np.maximum.reduceat(tfs_s, block_start).astype(np.int32),
                    type=pa.int32(),
                ),
                pa.array(
                    np.minimum.reduceat(dls_s, block_start).astype(np.int32),
                    type=pa.int32(),
                ),
                pa.array(np.add.reduceat(tfs_s, block_start), type=pa.int64()),
                pa.array(
                    varbyte_encode_segments(bgaps, block_start), type=pa.binary()
                ),
                pa.array(
                    varbyte_encode_segments(tfs_s, block_start), type=pa.binary()
                ),
                pa.array(
                    varbyte_encode_segments(dls_s, block_start), type=pa.binary()
                ),
                positions,
            ],
            names=[f.name for f in POSTING_BLOCK_SCHEMA.fields],
        )

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        pa.set_cpu_count(1)
        carry = None
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None and carry.num_rows:
                tbl = pa.concat_tables([carry, tbl])
            tbl = tbl.combine_chunks()
            if tbl.num_rows == 0:
                carry = None
                continue
            shard, split, term_arr, field_arr, term_codes, field_codes = keys(
                tbl, pc
            )
            neq = (
                (term_codes != term_codes[-1])
                | (field_codes != field_codes[-1])
                | (shard != shard[-1])
                | (split != split[-1])
            )
            tail_start = int(np.nonzero(neq)[0][-1]) + 1 if neq.any() else 0
            carry = tbl.slice(tail_start)
            if tail_start == 0:
                continue
            out = emit(tbl.slice(0, tail_start).combine_chunks(), pc)
            if out is not None:
                yield out
        if carry is not None and carry.num_rows:
            out = emit(carry.combine_chunks(), pc)
            if out is not None:
                yield out

    return gen


def _blocks_from_postings(
    shard: np.ndarray,
    field_codes: np.ndarray,
    term_codes: np.ndarray,
    split: np.ndarray,
    docs: np.ndarray,
    dls: np.ndarray,
    tfs: np.ndarray,
    pos_arr,  # pa.BinaryArray (per-posting position runs)
    field_arr,  # pa.Array (string)
    term_arr,  # pa.Array (string)
    block_size: int,
):
    """Stage B kernel: posting rows (sorted by group key then doc) →
    posting blocks. Positions per block are ONE slice of the input
    binary values buffer (per-posting runs are consecutive), so the
    re-cut is O(1) per block, no decode."""
    import pyarrow as pa

    from byzer_retrieval_spark.functions.encoding import varbyte_encode_segments

    n = docs.size
    key_change = np.empty(n, dtype=bool)
    key_change[0] = True
    key_change[1:] = (
        (term_codes[1:] != term_codes[:-1])
        | (field_codes[1:] != field_codes[:-1])
        | (shard[1:] != shard[:-1])
        | (split[1:] != split[:-1])
    )
    group_id = np.cumsum(key_change) - 1
    group_start = np.nonzero(key_change)[0]
    offset_in_group = np.arange(n, dtype=np.int64) - group_start[group_id]
    new_block = (offset_in_group % block_size) == 0
    block_start = np.nonzero(new_block)[0]
    nblk = block_start.size
    block_end = np.empty(nblk, dtype=np.int64)
    block_end[:-1] = block_start[1:]
    block_end[-1] = n

    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = 0
    np.subtract(docs[1:], docs[:-1], out=gaps[1:])
    gaps[block_start] = 0

    p_off, p_val = _binary_region(pos_arr)
    blk_off = (p_off[np.append(block_start, n)] - p_off[0]).astype(np.int32)
    blk_val = np.ascontiguousarray(p_val[p_off[0] : p_off[-1]])
    positions = pa.BinaryArray.from_buffers(
        pa.binary(),
        nblk,
        [None, pa.py_buffer(blk_off.tobytes()), pa.py_buffer(blk_val)],
    )

    take_idx = pa.array(block_start, type=pa.int64())
    tfs64 = tfs.astype(np.int64)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(shard[block_start].astype(np.int32), type=pa.int32()),
            field_arr.take(take_idx),
            term_arr.take(take_idx),
            pa.array(docs[block_start], type=pa.int64()),
            pa.array(docs[block_end - 1], type=pa.int64()),
            pa.array((block_end - block_start).astype(np.int32), type=pa.int32()),
            pa.array(np.maximum.reduceat(tfs, block_start).astype(np.int32), type=pa.int32()),
            pa.array(np.minimum.reduceat(dls, block_start).astype(np.int32), type=pa.int32()),
            pa.array(np.add.reduceat(tfs64, block_start), type=pa.int64()),
            pa.array(varbyte_encode_segments(gaps, block_start), type=pa.binary()),
            pa.array(varbyte_encode_segments(tfs64, block_start), type=pa.binary()),
            pa.array(varbyte_encode_segments(dls.astype(np.int64), block_start), type=pa.binary()),
            positions,
        ],
        names=[f.name for f in POSTING_BLOCK_SCHEMA.fields],
    )


def _merge_block_builder(block_size: int):
    """Stage B: mapInArrow over the shuffled, sorted posting-row stream,
    carrying the trailing (possibly incomplete) key group across Arrow
    batches — same streaming-merge discipline as _sorted_block_builder
    but over postings (block_size× fewer rows than tokens)."""

    def emit(tbl, pc):
        n = tbl.num_rows
        shard = tbl.column("shard_id").to_numpy().astype(np.int64)
        split = tbl.column("split_id").to_numpy().astype(np.int64)
        term_arr = tbl.column("term").chunk(0)
        field_arr = tbl.column("field").chunk(0)
        term_codes = pc.dictionary_encode(term_arr).indices.to_numpy()
        field_codes = pc.dictionary_encode(field_arr).indices.to_numpy()
        return shard, split, term_arr, field_arr, term_codes, field_codes, n

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        pa.set_cpu_count(1)
        carry = None
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None and carry.num_rows:
                tbl = pa.concat_tables([carry, tbl])
            tbl = tbl.combine_chunks()
            if tbl.num_rows == 0:
                carry = None
                continue
            shard, split, term_arr, field_arr, term_codes, field_codes, n = emit(tbl, pc)
            neq = (
                (term_codes != term_codes[-1])
                | (field_codes != field_codes[-1])
                | (shard != shard[-1])
                | (split != split[-1])
            )
            tail_start = int(np.nonzero(neq)[0][-1]) + 1 if neq.any() else 0
            carry = tbl.slice(tail_start)
            if tail_start == 0:
                continue
            yield _blocks_from_postings(
                shard[:tail_start],
                field_codes[:tail_start],
                term_codes[:tail_start],
                split[:tail_start],
                tbl.column("__docid").to_numpy()[:tail_start].astype(np.int64),
                tbl.column("dl").to_numpy()[:tail_start].astype(np.int64),
                tbl.column("tf").to_numpy()[:tail_start].astype(np.int32),
                tbl.column("pos").chunk(0).slice(0, tail_start),
                field_arr.slice(0, tail_start),
                term_arr.slice(0, tail_start),
                block_size,
            )
        if carry is not None and carry.num_rows:
            tbl = carry.combine_chunks()
            shard, split, term_arr, field_arr, term_codes, field_codes, n = emit(tbl, pc)
            yield _blocks_from_postings(
                shard,
                field_codes,
                term_codes,
                split,
                tbl.column("__docid").to_numpy().astype(np.int64),
                tbl.column("dl").to_numpy().astype(np.int64),
                tbl.column("tf").to_numpy().astype(np.int32),
                tbl.column("pos").chunk(0),
                field_arr,
                term_arr,
                block_size,
            )

    return gen


def _detect_hot_terms(df: DataFrame, cfg: "IndexConfig", phase_t: Dict) -> List[str]:
    """Pass 2: hot-term detection (map-side-combined count).

    Detection is a skew-balancing heuristic, not a correctness
    decision, so it runs on a 10% doc sample (map-side-combined count,
    ~|vocab| keys before the shuffle). A term whose sampled estimate
    straddles the threshold merely gets a slightly larger (or a
    needlessly split) build group. Needs no doc ids, so the build runs
    it concurrently with doc-id staging."""
    _pt = time.time()
    sample_frac = float(os.environ.get("BYZER_HOT_SAMPLE", "0.1"))
    sampled = df.sample(fraction=sample_frac, seed=42)
    hot_frames = []
    for f_name in cfg.analyzed_fields:
        toks_col = (
            tokenize_udf(cfg.analyzer)(F.coalesce(F.col(f_name), F.lit("")))
            if cfg.use_arrow_udf_tokenizer
            else tokenize_expr(F.coalesce(F.col(f_name), F.lit("")), cfg.analyzer)
        )
        hot_frames.append(
            sampled.select(F.lit(f_name).alias("field"), F.explode(toks_col).alias("term"))
        )
    hot_u = hot_frames[0]
    for t in hot_frames[1:]:
        hot_u = hot_u.unionByName(t)
    hot = (
        hot_u.groupBy("field", "term")
        .count()
        .filter(F.col("count") > cfg.hot_term_split_threshold * sample_frac)
        .select("field", "term")
        .collect()
    )
    phase_t["hot_term_detect"] = round(time.time() - _pt, 2)
    return [r.term for r in hot]


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
            or bool(old.get("lucene_dl_quantization", False))
            != cfg.lucene_dl_quantization
        ):
            # layout-incompatible rebuild: stale shard partitions from a
            # different num_shards/analyzer must not survive a dynamic
            # partition overwrite
            store.truncate()

    base = _derive_ids(source, cfg)

    # ---- per-shard input fingerprints (tiny: num_shards rows) ----------
    # Hash EVERY source column (not just analyzed ones): a rebuild that
    # changes only stored fields (lang, mtime, ...) must invalidate the
    # shard's resume manifest, or resume=True would silently serve stale
    # stored values. xxhash64 hashes nulls deterministically.
    #
    # The fingerprint PRE-scan of the source only pays for itself when
    # prior manifests exist (it lets resume skip whole shards before any
    # work). On a fresh build (resume=False or no manifests) we defer it:
    # fingerprints are computed from the staged parquet, which already
    # carries _id — one fewer full source pass.
    fp_cols = ["_id"] + [f"`{c}`" for c in source.columns if c != "_id"]
    fp_agg = [
        F.count("*").alias("cnt"),
        F.expr("bit_xor(xxhash64(" + ", ".join(fp_cols) + "))").alias("xor_hash"),
    ]

    def _collect_fps(df) -> Dict[int, Dict[str, int]]:
        # staged frames carry the per-row hash (__rowhash = the SAME
        # xxhash64 expression, materialized in the staging scan) — the
        # agg then reads two slim columns instead of re-hashing every
        # source column (round 6; content is the fat one)
        aggs = (
            [
                F.count("*").alias("cnt"),
                F.expr("bit_xor(__rowhash)").alias("xor_hash"),
            ]
            if "__rowhash" in df.columns
            else fp_agg
        )
        return {
            int(r.shard_id): {"count": int(r.cnt), "xor_hash": int(r.xor_hash)}
            for r in df.groupBy("shard_id").agg(*aggs).collect()
        }

    phase_t = {}
    # per-shard docs aggregates (N / sum_dl per field — the snapshot's
    # stats inputs); computed on the docs-pass thread right after its
    # write so the job overlaps the postings tail (round 6). The stats
    # section falls back to running it itself on resume-skip builds.
    doc_aggs = [F.count("*").alias("__n_total")]
    for f_name in cfg.analyzed_fields:
        doc_aggs.append(
            F.count_if(F.col(f"dl_{f_name}") > 0).alias(f"__n_{f_name}")
        )
        doc_aggs.append(F.sum(f"dl_{f_name}").alias(f"__sum_{f_name}"))
    pre_doc_rows = None
    existing = store.read_shard_manifests() if resume else {}
    fingerprints: Optional[Dict[int, Dict[str, int]]] = None
    if existing:
        _pt = time.time()
        fingerprints = _collect_fps(base)
        phase_t["fingerprint_scan"] = round(time.time() - _pt, 2)
    if fingerprints is not None:
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
    else:
        pending, skipped = None, []  # fresh build: every shard, resolved below

    hot_terms: List[str] = []
    if pending or pending is None:
        import shutil
        from concurrent.futures import ThreadPoolExecutor

        pend = (
            base
            if pending is None
            else base.filter(F.col("shard_id").isin([int(s) for s in pending]))
        )

        # ---- stage 0: assign doc ids, stage to columnar scratch ---------
        # The doc-id window (shuffle by shard) runs ONCE; the staged
        # parquet (ids + source columns, snappy columnar) then feeds the
        # three downstream passes with column pruning. Staging to files
        # instead of an RDD cache is deliberate: caching exploded token
        # arrays java-serializes tens of GB at scale and collapses under
        # memory pressure (measured super-linear at 200k files), while
        # re-tokenizing from compressed columnar storage is a cheap,
        # linear, whole-stage-codegen'd regex pass.
        # hot-term detection needs no doc ids — launch it over the
        # pre-staged pending rows on a scheduler thread so it overlaps
        # the stage write (it's off the critical path entirely when the
        # write is slower)
        _hot_ex = ThreadPoolExecutor(max_workers=1)
        _ex = ThreadPoolExecutor(max_workers=2)
        staged_path = os.path.join(store.base, "_staged")
        old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        # everything below mutates shared session state (the split-size
        # conf) and holds scratch (thread pools, the staged dir): the
        # finally restores/releases ALL of it on any exit, success or
        # failure — a failed build must not leave the session planning
        # every later job with a 1MB split size
        try:
            _fut_hot = _hot_ex.submit(_detect_hot_terms, pend, cfg, phase_t)

            # dl + per-row fingerprint hash materialize IN the staging
            # scan (round 6, guide §2.3 "don't compute things twice"):
            # the docs pass previously re-tokenized every content cell
            # (a second full regex pass over the corpus) and the fresh-
            # build fingerprint agg re-hashed every column including
            # content (a third full content scan) — both now read tiny
            # staged columns instead, freeing cores while the postings
            # chain (the critical path) runs concurrently.
            to_stage = _assign_doc_ids(pend)
            for f_name in cfg.analyzed_fields:
                to_stage = to_stage.withColumn(
                    f"dl_{f_name}",
                    F.size(
                        tokenize_udf(cfg.analyzer)(
                            F.coalesce(F.col(f_name), F.lit(""))
                        )
                    )
                    if cfg.use_arrow_udf_tokenizer
                    # count-only regex: no token-array materialization
                    # (functions/analyzer.token_count_expr, round 6)
                    else token_count_expr(
                        F.coalesce(F.col(f_name), F.lit("")), cfg.analyzer
                    ),
                )
            to_stage = to_stage.withColumn(
                "__rowhash", F.expr("xxhash64(" + ", ".join(fp_cols) + ")")
            )
            _pt = time.time()
            to_stage.write.mode("overwrite").parquet(staged_path)
            phase_t["stage_docids"] = round(time.time() - _pt, 2)

            # resolve the hot-term job BEFORE lowering the split-size
            # conf: its full-source sample scan must plan under the
            # session default (an unsynchronized conf change could
            # otherwise explode its task count). It overlapped the
            # stage write, so this wait is normally zero.
            hot_terms = _fut_hot.result()

            # size input splits so the narrow postings stage parallelizes
            # even when the staged parquet is small (local bench: 64 x ~1MB
            # files would otherwise pack into ONE default-128MB partition
            # and serialize tokenization); clamps back to the default at
            # real scale where files exceed it anyway
            jpath = spark._jvm.org.apache.hadoop.fs.Path(staged_path)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            staged_bytes = int(fs.getContentSummary(jpath).getLength())
            par = spark.sparkContext.defaultParallelism
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes",
                str(min(128 << 20, max(1 << 20, staged_bytes // (3 * par) + 1))),
            )
            staged = spark.read.parquet(staged_path)

            if fingerprints is None and staged.isEmpty():
                # fresh build over an empty source: nothing to write
                # (the finally still restores conf / drops scratch)
                fingerprints, pending = {}, []
            else:
                # ---- pass 1: docs table (stored fields only) -----------
                stored = (
                    list(cfg.stored_fields)
                    if cfg.stored_fields is not None
                    else [
                        c
                        for c in source.columns
                        if c not in cfg.analyzed_fields and c != "_id"
                    ]
                )

                def _docs_pass():
                    _pt = time.time()
                    # sha256, dl and __rowhash are all materialized in the
                    # staged parquet (computed once in the staging scan) —
                    # this pass is now a pure column-pruned read that never
                    # touches the analyzed content (round 6)
                    docs_out = staged
                    doc_cols = (
                        ["__docid", "_id", "shard_id"]
                        + stored
                        + [f"dl_{f}" for f in cfg.analyzed_fields]
                        + [f"{f}_sha256" for f in cfg.analyzed_fields]
                    )
                    (
                        docs_out.select(*doc_cols)
                        .repartition("shard_id")
                        .sortWithinPartitions("__docid")
                        .write.partitionBy("shard_id")
                        .mode("overwrite")
                        .parquet(store.docs_path)
                    )
                    # chain the per-shard docs aggregate (N/sum_dl per
                    # field — the snapshot's stats inputs) right here so
                    # it overlaps the postings tail instead of queueing
                    # into the stats phase (round 6)
                    rows = (
                        store.docs(spark).groupBy("shard_id").agg(*doc_aggs)
                        .collect()
                    )
                    phase_t["docs_write"] = round(time.time() - _pt, 2)
                    return rows

                # The docs write, the fresh-build fingerprint agg, and the
                # postings pipeline are INDEPENDENT jobs over the staged
                # table — run them on scheduler threads so their latencies
                # overlap (serial chain → max, not sum; the cluster
                # pipelines stages of concurrent jobs).
                _fut_fp = (
                    _ex.submit(_collect_fps, staged)
                    if fingerprints is None
                    else None
                )
                _fut_docs = _ex.submit(_docs_pass)

                # ---- pass 3: two-stage postings build (north_star shape)
                # Stage A (NARROW): tokenize JVM-side, ship token ARRAYS
                # (flat string buffer + offsets, not exploded rows) into a
                # mapInArrow that packs them into per-(term, split)
                # SEGMENT rows (round 6, guide §8) — docs/tfs/dls as
                # varbyte streams, positions pre-encoded — so the shuffle
                # moves ~20x fewer rows than per-posting layout (term
                # strings once per segment, doc ids as gaps, ~100x fewer
                # rows than token occurrences).
                # Stage B: cluster-by (shard, field, term, split) +
                # in-partition sort over the segment rows, then a
                # streaming merge decodes, doc-sorts and re-cuts
                # 128-posting blocks (identical bytes to the per-posting
                # pipeline).
                partial_frames = []
                for f_name in cfg.analyzed_fields:
                    # WHITESPACE + expr mode tokenizes INSIDE the Arrow
                    # batch (RE2): ship one string per doc across the
                    # Python boundary, not one per token (guide §4.1 —
                    # pass the minimal columns/bytes). Other analyzers
                    # keep the JVM/UDF tokenizer and ship token arrays.
                    in_arrow = (
                        cfg.analyzer == WHITESPACE
                        and not cfg.use_arrow_udf_tokenizer
                    )
                    if in_arrow:
                        sel = staged.select(
                            "shard_id",
                            "__docid",
                            F.coalesce(F.col(f_name), F.lit("")).alias("content"),
                        )
                    else:
                        toks_col = (
                            tokenize_udf(cfg.analyzer)(F.coalesce(F.col(f_name), F.lit("")))
                            if cfg.use_arrow_udf_tokenizer
                            else tokenize_expr(F.coalesce(F.col(f_name), F.lit("")), cfg.analyzer)
                        )
                        sel = staged.select(
                            "shard_id", "__docid", toks_col.alias("toks")
                        )
                    partial_frames.append(
                        sel.mapInArrow(
                            _segment_postings_builder(
                                f_name,
                                hot_terms,
                                cfg.hot_term_split_threshold,
                                # blocks carry the byte4-rounded dl when
                                # Lucene quantization is on; docs table /
                                # avgdl stay EXACT — exactly Lucene
                                # (SURVEY §1.3)
                                cfg.lucene_dl_quantization,
                                split_in_arrow=in_arrow,
                            ),
                            schema=POSTING_SEGMENT_SCHEMA,
                        )
                    )
                posting_rows = partial_frames[0]
                for t in partial_frames[1:]:
                    posting_rows = posting_rows.unionByName(t)
                blocks = (
                    posting_rows.repartition("shard_id", "field", "term", "split_id")
                    .sortWithinPartitions(
                        "shard_id", "field", "term", "split_id"
                    )
                    .mapInArrow(
                        _segment_merge_builder(cfg.block_size),
                        schema=POSTING_BLOCK_SCHEMA,
                    )
                )
                _pt = time.time()
                (
                    blocks.repartition("shard_id")
                    .sortWithinPartitions("field", "term", "first_doc")
                    .write.partitionBy("shard_id")
                    .mode("overwrite")
                    .parquet(store.postings_path)
                )
                phase_t["postings_write"] = round(time.time() - _pt, 2)
                pre_doc_rows = _fut_docs.result()
                if _fut_fp is not None:
                    fingerprints = _fut_fp.result()
                    pending = sorted(fingerprints)
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
            _hot_ex.shutdown(wait=False)
            _ex.shutdown(wait=False)
            shutil.rmtree(staged_path, ignore_errors=True)

    metrics = {
        "num_shards": cfg.num_shards,
        "shards_with_data": len(fingerprints or {}),
        "shards_built": len(pending),
        "shards_skipped_by_resume": len(skipped),
        "hot_terms_split": len(hot_terms),
    }

    # ---- global stats from the FULL committed tables (resume-safe) ------
    # Three independent jobs (stats-table write, per-shard postings agg,
    # per-shard docs agg) run concurrently on scheduler threads; the
    # global field stats (N, sum_dl, avgdl) are the driver-side sum of
    # the per-shard docs aggregates, so the old separate global agg job
    # is gone entirely.
    from concurrent.futures import ThreadPoolExecutor

    _pt = time.time()
    docs_full = store.docs(spark)
    postings_full = store.postings(spark)
    stats_df = postings_full.groupBy("field", "term").agg(
        F.sum("df_block").alias("df"), F.sum("sum_tf").alias("cf")
    )

    def _write_stats() -> None:
        store.write_stats(stats_df)

    with ThreadPoolExecutor(max_workers=2) as _sx:
        _fut_stats = _sx.submit(_write_stats)
        _fut_blocks = _sx.submit(
            lambda: postings_full.groupBy("shard_id")
            .agg(F.count("*").alias("blocks"), F.sum("df_block").alias("postings"))
            .collect()
        )
        doc_rows = (
            pre_doc_rows
            if pre_doc_rows is not None
            else docs_full.groupBy("shard_id").agg(*doc_aggs).collect()
        )
        blocks_rows = _fut_blocks.result()
        _fut_stats.result()

    per_shard_docs = {int(r.shard_id): int(r["__n_total"]) for r in doc_rows}
    n_total = sum(per_shard_docs.values())
    field_stats = {}
    # per-(field, shard) stats ride the SAME per-shard aggregates the
    # global numbers are summed from — free at build, and the
    # per_shard_stats scoring mode (reference numNodes>1 parity) reads
    # them from the snapshot
    shard_field_stats: dict = {f: {} for f in cfg.analyzed_fields}
    for f_name in cfg.analyzed_fields:
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
    phase_t["stats_refresh"] = round(time.time() - _pt, 2)
    _pt = time.time()

    # ---- per-shard manifests (lineage + metrics) -------------------------
    per_shard_blocks = {
        int(r.shard_id): {"blocks": int(r.blocks), "postings": int(r.postings)}
        for r in blocks_rows
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

    phase_t["shard_metrics"] = round(time.time() - _pt, 2)
    metrics["phase_timings"] = phase_t
    meta = store.read_meta() if store.exists() else {}
    meta.update(
        {
            "num_shards": cfg.num_shards,
            "analyzer": cfg.analyzer,
            "analyzed_fields": list(cfg.analyzed_fields),
            "id_columns": list(cfg.id_columns),
            "block_size": cfg.block_size,
            "k1": cfg.k1,
            "b": cfg.b,
            "doc_bits": DOC_BITS,
            "lucene_dl_quantization": cfg.lucene_dl_quantization,
            "hot_term_split_threshold": cfg.hot_term_split_threshold,
            "per_shard_stats": cfg.per_shard_stats,
        }
    )
    if pending:
        # persist the hot-term salt list so compact() can re-derive
        # split ids (a resumed no-op build keeps the previous list)
        meta["hot_terms"] = sorted(set(hot_terms) | set(meta.get("hot_terms", [])))
    store.write_meta(meta)
    snapshot = {
        "n_docs": int(n_total),
        "field_stats": field_stats,
        "shard_field_stats": shard_field_stats,
        "shards": {str(s): fingerprints[s] for s in fingerprints},
        "build_metrics": metrics,
        # fresh builds assign __docid = row_number over (shard, _id), so
        # within every shard __docid asc == _id asc; scorers exploit
        # this to cut per-shard top-k EXACTLY (no boundary-tie keep —
        # constant-score clauses would otherwise return every tied doc
        # per shard). Upserts append above the high-water mark and
        # clear the flag (operators/mutate._refresh_stats_and_commit).
        "docid_id_order": True,
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

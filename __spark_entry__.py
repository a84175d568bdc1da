"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: build the inverted index over the sf0.001
``documents`` table and run a BM25 top-10 query through the block-max
WAND fast path.

`queries()` / `oracle_sql()` — one entry per implemented operator from
SURVEY.md §2 (+ the training-data pipeline ops), each verified against
an equivalent DuckDB SQL oracle at sf0.01. BM25 scores are rounded to 5
decimals on BOTH sides; most scored queries return ALL matching rows
(no top-k boundary) so order-insensitive value-hash comparison is
immune to float tie-breaking at the k-th score.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.functions.bm25 import B, K1
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.plans.query import SearchQuery

# versioned cache root: bump FORMAT_VERSION whenever the on-disk index
# layout changes so stale caches from earlier rounds never get reused
FORMAT_VERSION = 3  # v3: posting blocks carry a positions column
IDX_ROOT = f"/tmp/byzer_retrieval_spark_entry_idx_v{FORMAT_VERSION}"


# ---------------------------------------------------------------------
# index bootstrap (once per sf_dir per process lifetime; the parquet
# test tables are immutable, so an existing committed snapshot is valid)
# ---------------------------------------------------------------------

def _engine_for(spark: SparkSession, sf_dir: str) -> RetrievalEngine:
    tag = os.path.basename(os.path.normpath(sf_dir))
    eng = RetrievalEngine(spark, os.path.join(IDX_ROOT, tag))
    store = eng.store("db", "documents")
    if store.current_snapshot() is None:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        src = docs.withColumn("_id", F.col("doc_id").cast("string"))
        eng.build(
            src,
            database="db",
            table="documents",
            cfg=IndexConfig(
                num_shards=4,
                analyzed_fields=("text",),
                id_columns=(),
            ),
            resume=True,
            source_desc=f"{sf_dir}/documents.parquet",
        )
    return eng


def _engine_hybrid_for(spark: SparkSession, sf_dir: str) -> RetrievalEngine:
    """Index over documents ⋈ embeddings (text + stored vector column) —
    exercises the SearchQuery vector path (Q3) and the keyword+vector
    RRF hybrid dispatch (Q4/M2) end-to-end through api.search."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    eng = RetrievalEngine(spark, os.path.join(IDX_ROOT, tag))
    store = eng.store("db", "hybrid")
    if store.current_snapshot() is None:
        docs = _documents(spark, sf_dir)
        emb = _embeddings(spark, sf_dir)
        src = docs.join(emb, docs.doc_id == emb.vec_id).select(
            F.col("doc_id").cast("string").alias("_id"),
            "doc_id",
            "text",
            "lang",
            "embedding",
        )
        eng.build(
            src,
            database="db",
            table="hybrid",
            cfg=IndexConfig(num_shards=4, analyzed_fields=("text",), id_columns=()),
            resume=True,
            source_desc=f"{sf_dir} documents+embeddings",
        )
    return eng


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# ---------------------------------------------------------------------
# BM25 scored-set helper: ALL matching docs with rounded scores
# ---------------------------------------------------------------------

def _bm25_all(spark: SparkSession, sf_dir: str, keyword: str) -> DataFrame:
    eng = _engine_for(spark, sf_dir)
    n = _documents(spark, sf_dir).count()
    q = SearchQuery(keyword=keyword, fields=["text"], limit=n)
    out = eng.search(q, "db", "documents")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 5).alias("score"),
    )


# DuckDB-side BM25 over the same whitespace tokenization (the explicit
# ASCII class shared with the engine's analyzers — see analyzer._WS_CLASS)
from byzer_retrieval_spark.functions.analyzer import _WS_CLASS

_TOKS = f"list_filter(regexp_split_to_array(text, '{_WS_CLASS}+'), x -> x <> '')"


def _bm25_sql(
    terms: list[str],
    must: list[str] | None = None,
    must_not: list[str] | None = None,
    limit: int | None = None,
    doc_filter: str | None = None,
    must_any: list[str] | None = None,
) -> str:
    must = must or []
    must_not = must_not or []
    scoring = list(dict.fromkeys(must + terms + (must_any or [])))
    in_list = ", ".join(f"'{t}'" for t in scoring + must_not) or "''"
    sc_list = ", ".join(f"'{t}'" for t in scoring) or "''"
    gates = []
    for t in must:
        gates.append(
            f"sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) > 0"
        )
    if must_any:
        ga = ", ".join(f"'{t}'" for t in must_any)
        gates.append(f"sum(CASE WHEN term IN ({ga}) THEN 1 ELSE 0 END) > 0")
    gates.append(
        "sum(CASE WHEN term IN ("
        + (", ".join(f"'{t}'" for t in must_not) or "''")
        + ") THEN 1 ELSE 0 END) = 0"
    )
    gates.append(
        f"sum(CASE WHEN term IN ({sc_list}) THEN 1 ELSE 0 END) > 0"
    )
    having = " AND ".join(gates)
    order = "ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC"
    lim = f"LIMIT {limit}" if limit else ""
    # filters are NON-SCORING (Occur.FILTER) and stats stay corpus-global,
    # so a filtered query restricts the result set without changing scores
    filt = (
        f"JOIN documents d USING (doc_id) WHERE {doc_filter}" if doc_filter else ""
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
dfreq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         sum(CASE WHEN tf.term IN ({sc_list}) THEN
             ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
             ELSE 0.0 END) AS raw_score
  FROM tf
  JOIN dfreq d USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  WHERE tf.term IN ({in_list})
  GROUP BY tf.doc_id
  HAVING {having}
)
SELECT doc_id, round(raw_score, 5) AS score FROM scored {filt} {order} {lim}
"""


def _bm25_phrase_sql(phrase: list[str], terms: list[str], slop: int = 0) -> str:
    """BM25 over (should terms) + (should phrase): phrase tf from a
    position self-join, idf = Σ member idfs — mirrors the engine's
    PhraseQuery semantics (operators/wand._phrase_match). ``slop`` > 0
    is the NEAR variant (round 5, Lucene sloppyFreq): an anchor matches
    when SOME length-L window (L <= slop) of offset-adjusted positions
    covers it and one position of every member, and contributes
    1/(Lmin+1) with Lmin its minimal such window length — phrase_tf is
    the per-doc SUM of anchor weights."""
    from collections import Counter

    sc_list = ", ".join(f"'{t}'" for t in terms) or "''"
    pos_ctes = ",\n".join(
        f"p{j} AS (SELECT doc_id, i FROM tp WHERE toks[i+1] = '{t}')"
        for j, t in enumerate(phrase)
    )
    if slop == 0:
        joins = " ".join(
            f"JOIN p{j} ON p{j}.doc_id = p0.doc_id AND p{j}.i = p0.i + {j}"
            for j in range(1, len(phrase))
        )
        ptf_cte = (
            f"ptf AS (SELECT p0.doc_id, count(*)::DOUBLE AS ptf "
            f"FROM p0 {joins} GROUP BY p0.doc_id)"
        )
    else:
        # every (window length L, start w) pair covering the anchor
        # over ADJUSTED positions; each member's i - j must land in
        # [w, w + L]; per anchor the minimal satisfied L → 1/(L+1)
        wl_vals = ", ".join(
            f"({L}, {d})" for L in range(slop + 1) for d in range(L + 1)
        )
        pos_ctes += (
            f",\np0w AS (SELECT doc_id, i, L, i - d AS w FROM p0,"
            f" (VALUES {wl_vals}) AS wl(L, d))"
        )
        joins = " ".join(
            f"JOIN p{j} ON p{j}.doc_id = p0.doc_id "
            f"AND p{j}.i - {j} BETWEEN p0.w AND p0.w + p0.L"
            for j in range(1, len(phrase))
        )
        ptf_cte = f"""ptf AS (
  SELECT doc_id, sum(1.0 / (minL + 1))::DOUBLE AS ptf FROM (
    SELECT p0.doc_id AS doc_id, p0.i, min(p0.L) AS minL
    FROM p0w p0 {joins} GROUP BY p0.doc_id, p0.i
  ) GROUP BY doc_id
)"""
    mult_vals = ", ".join(
        f"('{t}', {c})" for t, c in Counter(phrase).items()
    )
    return f"""
WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
toks AS (SELECT doc_id, unnest(toks) AS term FROM base),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
tscore AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))) AS sc
  FROM tf JOIN dfreq d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN ({sc_list}) GROUP BY tf.doc_id
),
tp AS (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM base),
{pos_ctes},
{ptf_cte},
idfsum AS (
  SELECT sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * m.mult) AS idf_sum
  FROM (VALUES {mult_vals}) AS m(term, mult)
  JOIN dfreq d USING (term) CROSS JOIN stats s
),
pscore AS (
  SELECT ptf.doc_id,
         i.idf_sum * ptf.ptf / (ptf.ptf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl)) AS sc
  FROM ptf JOIN dl USING (doc_id) CROSS JOIN stats s CROSS JOIN idfsum i
),
u AS (SELECT doc_id, sc FROM tscore UNION ALL SELECT doc_id, sc FROM pscore)
SELECT doc_id, round(sum(sc), 5) AS score FROM u GROUP BY doc_id
"""


def _bm25_prefix_sql(stem: str, terms: list[str]) -> str:
    """BM25 over (should terms) + a ``stem*`` prefix clause scored with
    Lucene's CONSTANT_SCORE rewrite (1.0 per matching doc per clause) —
    mirrors the engine's prefix handling in both scorer paths."""
    return _bm25_constscore_sql(f"term LIKE '{stem}%'", terms)


def _bm25_constscore_sql(term_pred: str, terms: list[str]) -> str:
    """BM25 over (should terms) + one multi-term clause selected by
    ``term_pred`` and scored CONSTANT 1.0 per matching doc (Lucene's
    constant-score rewrite for PrefixQuery / FuzzyQuery)."""
    sc_list = ", ".join(f"'{t}'" for t in terms) or "''"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id
),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
tscore AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))) AS sc
  FROM tf JOIN dfreq d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN ({sc_list}) GROUP BY tf.doc_id
),
px AS (
  SELECT DISTINCT doc_id FROM toks WHERE {term_pred}
),
u AS (
  SELECT doc_id, sc FROM tscore
  UNION ALL SELECT doc_id, 1.0 AS sc FROM px
)
SELECT doc_id, round(sum(sc), 5) AS score FROM u GROUP BY doc_id
"""


def _hybrid_rrf_sql(terms: list[str], k: int, doc_filter: str | None = None) -> str:
    """Oracle for the keyword+vector RRF hybrid: two top-k recalls
    ranked by RAW (unrounded) scores with (score desc, doc_id-as-string
    asc) tie-break — exactly api.search's dispatch → rrf_fuse.
    ``doc_filter`` (a bare predicate like "lang = 'en'") gates BOTH
    recalls BEFORE their top-k cuts (Occur.FILTER is non-scoring, so
    keyword stats stay corpus-global) — the engine's filtered-hybrid
    semantics."""
    from byzer_retrieval_spark.functions.similarity import cosine_sql_expr

    sc_list = ", ".join(f"'{t}'" for t in terms)
    c = cosine_sql_expr("v.embedding", _query_vec())
    kw_gate = (
        f"JOIN documents dd ON dd.doc_id = tf.doc_id AND (dd.{doc_filter})"
        if doc_filter
        else ""
    )
    vec_gate = f"WHERE d.{doc_filter}" if doc_filter else ""
    return f"""
WITH corpus AS (
  -- the hybrid index is built over documents ⋈ embeddings, so ALL
  -- keyword stats (N, df, avgdl) are relative to the joined corpus
  SELECT d.doc_id, d.text FROM documents d
  JOIN embeddings v ON v.vec_id = d.doc_id
),
toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM corpus
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
dfreq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
kw AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))) AS s
  FROM tf JOIN dfreq d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  {kw_gate}
  WHERE tf.term IN ({sc_list}) GROUP BY tf.doc_id
  ORDER BY s DESC, CAST(tf.doc_id AS VARCHAR) ASC LIMIT {k}
),
vec AS (
  SELECT d.doc_id, {c} AS s
  FROM documents d JOIN embeddings v ON v.vec_id = d.doc_id
  {vec_gate}
  ORDER BY {c} DESC, CAST(d.doc_id AS VARCHAR) ASC LIMIT {k}
),
rk AS (
  SELECT doc_id, row_number() OVER (
    ORDER BY s DESC, CAST(doc_id AS VARCHAR) ASC) - 1 AS r FROM kw
),
rv AS (
  SELECT doc_id, row_number() OVER (
    ORDER BY s DESC, CAST(doc_id AS VARCHAR) ASC) - 1 AS r FROM vec
),
u AS (
  SELECT doc_id, 1.0 / (r + 60) AS cb FROM rk
  UNION ALL SELECT doc_id, 1.0 / (r + 60) FROM rv
),
fz AS (SELECT doc_id, sum(cb) AS s FROM u GROUP BY doc_id)
SELECT doc_id, round(s, 6) AS score FROM fz
ORDER BY s DESC, CAST(doc_id AS VARCHAR) ASC LIMIT {k}
"""


def _vec_filtered_sql(k: int, doc_filter: str) -> str:
    """Filtered exact cosine top-k (the vector member's oracle — with
    an exhaustive-probe LSH the engine's gated ANN equals this)."""
    from byzer_retrieval_spark.functions.similarity import cosine_sql_expr

    c = cosine_sql_expr("v.embedding", _query_vec())
    return f"""
SELECT d.doc_id, round({c}, 6) AS score
FROM documents d JOIN embeddings v ON v.vec_id = d.doc_id
WHERE d.{doc_filter}
ORDER BY {c} DESC, CAST(d.doc_id AS VARCHAR) ASC LIMIT {k}
"""


# ---------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index sf0.001 documents, BM25 top-10 via WAND."""
    sf_dir = "/root/testdata/sf0.001"
    eng = _engine_for(spark, sf_dir)
    q = SearchQuery(keyword="data spark merge", fields=["text"], limit=10)
    out = eng.search(q, "db", "documents")
    return out.select("doc_id", "lang", "source", F.round("_score", 5).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- full-text scoring (SURVEY §2.1 Q1/Q2/A1/M4) ---------------
        "bm25_single_term": lambda spark, sf: _bm25_all(spark, sf, "merge"),
        "bm25_multi_or": lambda spark, sf: _bm25_all(spark, sf, "spark window"),
        "bm25_must_not": lambda spark, sf: _bm25_all(spark, sf, "+data -spark batch"),
        "bm25_topk": _q_bm25_topk,
        "bm25_filtered_topk": _q_bm25_filtered,
        "bm25_phrase": lambda spark, sf: _bm25_all(
            spark, sf, 'merge "part filter"'
        ),
        "bm25_phrase_slop": lambda spark, sf: _bm25_all(
            spark, sf, 'merge "part filter"~2'
        ),
        "bm25_prefix": lambda spark, sf: _bm25_all(spark, sf, "mer* vector"),
        "bm25_fuzzy": lambda spark, sf: _bm25_all(spark, sf, "merg~1 vector"),
        "bm25_group": lambda spark, sf: _bm25_all(
            spark, sf, "+(merge vector) table"
        ),
        # round 4: group-local +/- (nested BooleanQuery — the last
        # SimpleQueryParser gap): the group matches iff merge AND NOT
        # vector; its score joins ONLY for matching docs
        "bm25_group_signed": lambda spark, sf: _bm25_all(
            spark, sf, "(+merge -vector) table"
        ),
        "bm25_batch_fanout": _q_batch_fanout,
        "bm25_batch_mixed": _q_batch_mixed,
        "term_stats": _q_term_stats,
        # --- filters / match-all / sorts (F1-F5, L1-L4, M5) -------------
        "match_all_filter": _q_match_all_filter,
        "nested_bool_filter": _q_nested_bool_filter,
        "range_filter": _q_range_filter,
        "one_sided_range_quirk": _q_one_sided_quirk,
        "multi_sort_limit": _q_multi_sort_limit,
        "multi_filter_fanout": _q_multi_filter_fanout,
        # --- point lookup (G1) ------------------------------------------
        "get_by_ids": _q_get_by_ids,
        # --- fusion (M2/M3) ----------------------------------------------
        "fusion_score_sum": _q_fusion_score_sum,
        "fusion_rrf": _q_fusion_rrf,
        # --- mutations (W2/W3) -------------------------------------------
        "delete_by_ids_requery": _q_delete_requery,
        "upsert_wins": _q_upsert_wins,
        # --- training-data pipeline ops -----------------------------------
        "text_fingerprint": _q_fingerprint,
        "text_pii_scrub": _q_pii,
        "text_repetition": _q_repetition,
        "doc_chunking": _q_chunking,
        "stratified_sample": _q_stratified,
        "text_lang_id": _q_lang_id,
        "text_quality": _q_quality,
        "text_token_counts": _q_token_counts,
        "dedup_exact_groups": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_ngram_jaccard,
        "dedup_minhash_lsh": _q_minhash_lsh,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_simhash": _q_simhash,
        "embedding_cosine_topk": _q_cosine_topk,
        "embedding_near_dup_pairs": _q_embedding_pairs,
        "embedding_lsh_topk": _q_lsh_topk,
        "embedding_ivf_topk": _q_ivf_topk,
        "embedding_lsh_dup_pairs": _q_lsh_dup_pairs,
        # --- SearchQuery vector + hybrid dispatch (Q3/Q4/M2) -------------
        "vector_search_filtered": _q_vector_search,
        "hybrid_keyword_vector_rrf": _q_hybrid_rrf,
        # round 5: filtered hybrid + filtered vector + plain hybrid in
        # ONE batch (gated shared probe, keyed tagged fusion)
        "hybrid_filtered_batch_rrf": _q_hybrid_filtered_batch,
        # --- multimodal binary plumbing (decode stubbed: no media libs
        #     in this container; the Arrow binary transfer, batch shape,
        #     and frame-sampling plan are the real production path) -----
        "multimodal_decode_meta": _q_multimodal_meta,
        # round 5: REAL WAV decode (stdlib wave) vs pinned goldens
        "multimodal_audio_features": _q_audio_features,
        # round 5: REAL Y4M video decode + frame sampling (pure numpy)
        "multimodal_video_features": _q_video_features,
        # round 5: per-shard-stats scoring mode (full oracle — the
        # xxhash64 shard map is reproduced by pure-python XXH64 and
        # embedded in the SQL as a VALUES table)
        "bm25_per_shard_stats": _q_per_shard_stats,
        # --- event-time windows (Structured-Streaming-native shapes;
        #     same functions run batch and under readStream) ------------
        "events_tumbling_agg": _q_events_tumbling,
        "events_sessionization": _q_events_sessions,
        "events_occurrence_rank": _q_events_occ_rank,
        # --- relational breadth (Spark-side bonus; not in the reference,
        #     see SURVEY §2.2) ------------------------------------------
        "rel_agg_lineitem": _q_rel_agg,
        "rel_join_topk": _q_rel_join,
    }


def oracle_sql() -> dict[str, str]:
    sqls = {
        "bm25_single_term": _bm25_sql(["merge"]),
        "bm25_multi_or": _bm25_sql(["spark", "window"]),
        "bm25_must_not": _bm25_sql(["batch"], must=["data"], must_not=["spark"]),
        "bm25_topk": _bm25_sql(["vector", "hash"], limit=10),
        "bm25_filtered_topk": _bm25_sql(
            ["merge", "vector"], doc_filter="d.lang = 'en'"
        ),
        "bm25_phrase": _bm25_phrase_sql(["part", "filter"], ["merge"]),
        "bm25_phrase_slop": _bm25_phrase_sql(
            ["part", "filter"], ["merge"], slop=2
        ),
        "bm25_prefix": _bm25_prefix_sql("mer", ["vector"]),
        "bm25_fuzzy": _bm25_constscore_sql(
            # round 4: Damerau parity (Lucene transpositions=true) —
            # engine computes OSA, equal to DuckDB's DL on this vocab
            "damerau_levenshtein(term, 'merg') <= 1", ["vector"]
        ),
        "bm25_group": _bm25_sql(["table"], must_any=["merge", "vector"]),
        "bm25_group_signed": f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
parts AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
         * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl)) AS sc
  FROM tf JOIN dfreq d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term IN ('merge', 'vector', 'table')
),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN term = 'table' THEN sc ELSE 0 END) AS s_top,
         max(CASE WHEN term = 'table' THEN 1 ELSE 0 END) AS h_top,
         sum(CASE WHEN term = 'merge' THEN sc ELSE 0 END) AS s_grp,
         max(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS h_must,
         max(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) AS h_not
  FROM parts GROUP BY doc_id
)
SELECT doc_id,
       round(s_top + CASE WHEN h_must = 1 AND h_not = 0
                     THEN s_grp ELSE 0 END, 5) AS score
FROM agg
WHERE h_top = 1 OR (h_must = 1 AND h_not = 0)
""",
        "bm25_batch_fanout": (
            f"SELECT 0 AS query_id, doc_id, score FROM ({_bm25_sql(['merge'])})"
            " UNION ALL "
            f"SELECT 1, doc_id, score FROM ({_bm25_sql(['vector', 'hash'])})"
            " UNION ALL "
            f"SELECT 2, doc_id, score FROM ("
            f"{_bm25_sql(['batch'], must=['data'], must_not=['spark'])})"
        ),
        "bm25_batch_mixed": (
            f"SELECT 0 AS query_id, doc_id, score FROM ("
            + _bm25_sql(["merge", "vector"], doc_filter="d.lang = 'en'")
            + ")"
            " UNION ALL "
            f"SELECT 1, doc_id, score FROM ({_bm25_prefix_sql('mer', ['vector'])})"
            " UNION ALL "
            f"SELECT 2, doc_id, score FROM ("
            f"{_bm25_phrase_sql(['part', 'filter'], ['merge'])})"
            " UNION ALL "
            "SELECT 3, doc_id, 1.0 AS score FROM documents"
            " WHERE source = 'src1'"
        ),
        "term_stats": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS term FROM documents
            )
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM toks WHERE term IN ('spark', 'merge', 'vector', 'the')
            GROUP BY term ORDER BY term
        """,
        "match_all_filter": """
            SELECT doc_id, lang, 1.0 AS score FROM documents
            WHERE lang = 'en' ORDER BY CAST(doc_id AS VARCHAR)
        """,
        "nested_bool_filter": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE lang = 'en' AND (source = 'src1' OR source = 'src2')
            ORDER BY CAST(doc_id AS VARCHAR)
        """,
        "range_filter": """
            SELECT doc_id, n_chars FROM documents
            WHERE n_chars BETWEEN 100 AND 300
            ORDER BY CAST(doc_id AS VARCHAR)
        """,
        "one_sided_range_quirk": """
            SELECT doc_id, n_chars FROM documents WHERE n_chars = 128
            ORDER BY CAST(doc_id AS VARCHAR)
        """,
        "multi_sort_limit": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE source = 'src3'
            ORDER BY lang ASC, n_chars DESC, CAST(doc_id AS VARCHAR) ASC
            LIMIT 10
        """,
        "get_by_ids": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE doc_id IN (1, 5, 7) ORDER BY CAST(doc_id AS VARCHAR)
        """,
        "multi_filter_fanout": """
            SELECT * FROM (
              SELECT 0 AS query_id,
                     row_number() OVER (
                       ORDER BY n_chars DESC, CAST(doc_id AS VARCHAR) ASC
                     )::INT AS rank,
                     doc_id, lang, n_chars
              FROM documents WHERE lang = 'en'
              ORDER BY rank LIMIT 25
            )
            UNION ALL
            SELECT * FROM (
              SELECT 1 AS query_id,
                     row_number() OVER (
                       ORDER BY source ASC, CAST(doc_id AS VARCHAR) ASC
                     )::INT AS rank,
                     doc_id, lang, n_chars
              FROM documents WHERE n_chars BETWEEN 100 AND 300
              ORDER BY rank LIMIT 25
            )
        """,
        "fusion_score_sum": f"""
            WITH a AS ({_bm25_sql(['merge'])}), b AS ({_bm25_sql(['vector'])}),
            u AS (
              SELECT doc_id, score FROM a UNION ALL SELECT doc_id, score FROM b
            )
            SELECT doc_id, round(sum(score), 5) AS score FROM u GROUP BY doc_id
        """,
        "fusion_rrf": f"""
            WITH a AS ({_bm25_sql(['merge'])}), b AS ({_bm25_sql(['vector'])}),
            ra AS (
              SELECT doc_id, row_number() OVER (
                ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1 AS rnk
              FROM a
            ),
            rb AS (
              SELECT doc_id, row_number() OVER (
                ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1 AS rnk
              FROM b
            ),
            u AS (
              SELECT doc_id, 1.0 / (rnk + 60) AS c FROM ra
              UNION ALL SELECT doc_id, 1.0 / (rnk + 60) AS c FROM rb
            )
            SELECT doc_id, round(sum(c), 6) AS score FROM u GROUP BY doc_id
        """,
        "delete_by_ids_requery": f"""
            WITH base AS ({_bm25_sql(['merge'])})
            SELECT doc_id, score FROM base WHERE doc_id NOT IN (0, 1, 2, 3, 4)
        """,
        "upsert_wins": """
            SELECT count(*)::BIGINT AS n_hits FROM documents
            WHERE doc_id = 3  -- the upserted doc is the only match
        """,
        "text_fingerprint": f"""
            SELECT doc_id,
                   md5(array_to_string({_TOKS_LOWER}, ' ')) AS fp
            FROM documents ORDER BY doc_id
        """,
        "text_token_counts": f"""
            SELECT doc_id,
                   len({_TOKS_LOWER})::INT AS n_tokens,
                   len(regexp_extract_all(lower(text),
                       '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::INT AS n_bpe_ish
            FROM documents ORDER BY doc_id
        """,
        "dedup_exact_groups": f"""
            WITH base AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000, text FROM (
                SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 5
              )
            ),
            fp AS (
              SELECT doc_id,
                     md5(array_to_string({_TOKS_LOWER}, ' ')) AS fingerprint
              FROM base
            )
            SELECT fingerprint, count(*)::BIGINT AS n_dups,
                   min(doc_id)::BIGINT AS keep_id
            FROM fp GROUP BY fingerprint HAVING count(*) > 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH t AS (
              SELECT doc_id, {_TOKS_LOWER} AS toks FROM documents
            ),
            sh AS (
              SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
              )) AS s
              FROM t WHERE len(toks) >= 3
            ),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::DOUBLE AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   round(ni / (sa.sz + sb.sz - ni), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE ni / (sa.sz + sb.sz - ni) >= 0.5
        """,
        # minhash-LSH verifies candidates with EXACT Jaccard, so its
        # output is the exact-Jaccard pair set whenever banding recall
        # is exhaustive — with k=64/b=32 (S-curve ≥ 0.9999 at j=0.5)
        # it equals the brute-force pair SQL at every test SF.
        "dedup_minhash_lsh": "WITH " + _MINHASH_PAIR_CTES + """
            SELECT id_a, id_b, jaccard FROM mh_pairs
        """,
        # transitive closure of the SAME pair set: min-label reachability
        # via a recursive CTE — the SQL twin of graph.connected_components
        "dedup_clusters": "WITH RECURSIVE " + _MINHASH_PAIR_CTES + """,
            e AS (
              SELECT id_a AS a, id_b AS b FROM mh_pairs
              UNION
              SELECT id_b, id_a FROM mh_pairs
            ),
            reach(a, b) AS (
              SELECT a, b FROM e
              UNION
              SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
            )
            SELECT a AS id, least(a, min(b)) AS cluster
            FROM reach GROUP BY a
        """,
        "rel_agg_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*)::BIGINT AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "rel_join_topk": """
            SELECT c.c_custkey AS custkey, c.c_name AS name,
                   round(sum(o.o_totalprice), 2) AS total_spent,
                   count(*)::BIGINT AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_name
            ORDER BY total_spent DESC, custkey ASC LIMIT 20
        """,
    }
    # simhash: the engine's pigeonhole bucketing is EXACT for
    # max_hamming < segments, and the signature itself (md5-60bit, pure
    # Catalyst) has a value-identical DuckDB twin — so the oracle is the
    # brute-force all-pairs popcount over the same signatures.
    from byzer_retrieval_spark.functions.dedup import simhash_sql

    sqls["dedup_simhash"] = f"""
        WITH s AS ({simhash_sql("documents", "doc_id", "text")})
        SELECT a.id AS id_a, b.id AS id_b,
               bit_count(xor(a.sig, b.sig))::INT AS hamming
        FROM s a JOIN s b ON a.id < b.id
        WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """
    # multimodal: the synthetic media table is reconstructable in pure
    # SQL (payload = sha256 digest repeated 4+i%5 times → 32*(4+i%5)
    # bytes; videos sample a frame every 500 ms of duration 1000+i)
    sqls["multimodal_decode_meta"] = """
        SELECT i AS media_id,
               CASE (i % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               (32 * (4 + (i % 5)))::BIGINT AS n_bytes,
               CASE WHEN (i % 3) = 2 THEN ((1000 + i) // 500)::INT
                    ELSE -1 END AS n_frames
        FROM range(64) t(i) ORDER BY media_id
    """
    # real WAV decode: inputs are synthesized (sf-invariant), so the
    # oracle is the pinned golden table — a full regression pin over
    # the stdlib-wave decode + feature path.
    sqls["multimodal_audio_features"] = _audio_features_sql()
    sqls["multimodal_video_features"] = _video_features_sql()
    # per-shard-stats BM25 (round 5): upgraded from rows-only to a full
    # oracle — the engine's pmod(xxhash64(_id), 4) shard assignment is
    # bit-exactly reproduced by routing.xxhash64 (pure-python XXH64)
    # and shipped inside the SQL as a doc_id→shard VALUES map
    sqls["bm25_per_shard_stats"] = _per_shard_stats_sql(["merge", "spark"])
    # event-time window twins live next to the operators
    from byzer_retrieval_spark.streaming.windows import sessions_sql, tumbling_sql

    sqls["events_tumbling_agg"] = tumbling_sql("events")
    sqls["events_sessionization"] = sessions_sql("events")
    from byzer_retrieval_spark.streaming.stateful import occurrence_rank_sql

    sqls["events_occurrence_rank"] = occurrence_rank_sql("events")
    # text_lang_id / text_quality / embedding ops get their SQL from the
    # function library so Spark expr and oracle can never drift
    from byzer_retrieval_spark.functions.text import (
        lang_id_sql,
        quality_features_sql,
    )

    sqls["text_lang_id"] = (
        f"SELECT doc_id, {lang_id_sql('text')} AS pred_lang "
        "FROM documents ORDER BY doc_id"
    )
    from byzer_retrieval_spark.functions.text import (
        pii_counts_sql,
        pii_scrub_sql,
        repetition_sql,
    )

    planted = (
        "(text || ' contact user' || doc_id::VARCHAR || '@example.com at 10.0.'"
        " || (doc_id % 200)::VARCHAR || '.7 ssn 123-45-678' || (doc_id % 10)::VARCHAR)"
    )
    pc = pii_counts_sql(planted)
    sqls["text_pii_scrub"] = (
        "SELECT doc_id, "
        + ", ".join(f"{sql}::INT AS {n}" for n, sql in pc.items())
        + f", md5({pii_scrub_sql(planted)}) AS scrubbed_md5 "
        "FROM documents ORDER BY doc_id"
    )
    rep = repetition_sql("text")
    sqls["text_repetition"] = (
        "SELECT doc_id, "
        + ", ".join(f"{sql} AS {n}" for n, sql in rep.items())
        + " FROM documents ORDER BY doc_id"
    )
    from byzer_retrieval_spark.functions.chunking import chunk_documents_sql
    from byzer_retrieval_spark.functions.sampling import stratified_sample_sql

    sqls["doc_chunking"] = chunk_documents_sql("documents", "doc_id", "text", 32, 24)
    sqls["stratified_sample"] = (
        "SELECT doc_id, lang FROM ("
        + stratified_sample_sql(
            "documents", "doc_id", "lang", {"en": 1.0, "de": 0.3}, 0.05
        )
        + ") ORDER BY doc_id"
    )
    qf = quality_features_sql("text")
    sqls["text_quality"] = (
        "SELECT doc_id, "
        f"{qf['n_chars']}::BIGINT AS n_chars, "
        f"{qf['n_tokens']}::INT AS n_tokens, "
        f"{qf['punct_ratio']} AS punct_ratio, "
        f"{qf['stopword_ratio']} AS stopword_ratio, "
        f"{qf['mean_token_len']} AS mean_token_len "
        "FROM documents ORDER BY doc_id"
    )
    # cosine oracles mirror the Spark expressions operation-for-operation
    # (sequential dot products; the query's norm is a shared literal) so
    # both engines agree to <=1 ulp — see similarity.cosine_sql_expr.
    from byzer_retrieval_spark.functions.similarity import cosine_sql_expr

    c = cosine_sql_expr("embedding", _query_vec())
    sqls["embedding_cosine_topk"] = (
        f"SELECT vec_id AS id, round({c}, 6) AS cosine FROM embeddings "
        f"ORDER BY {c} DESC, vec_id ASC LIMIT 10"
    )
    # exact-mode LSH (probe = num_planes) returns exact top-k, but its
    # cosine runs over float-cast-then-double vectors via the generic
    # pairwise expression — same brute-force oracle as above
    sqls["embedding_lsh_topk"] = sqls["embedding_cosine_topk"]
    # exact-mode IVF (nprobe = num_clusters) likewise scans one full
    # replica of the table through the same cosine expression
    sqls["embedding_ivf_topk"] = sqls["embedding_cosine_topk"]
    sqls["embedding_lsh_dup_pairs"] = """
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.e, b.e) /
                     (sqrt(list_dot_product(a.e, a.e)) *
                      sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.e, b.e) /
              (sqrt(list_dot_product(a.e, a.e)) *
               sqrt(list_dot_product(b.e, b.e))) >= 0.5
    """
    c2 = cosine_sql_expr("v.embedding", _query_vec())
    sqls["vector_search_filtered"] = (
        f"SELECT d.doc_id, round({c2}, 6) AS cosine "
        "FROM documents d JOIN embeddings v ON v.vec_id = d.doc_id "
        "WHERE d.lang = 'en' "
        f"ORDER BY {c2} DESC, CAST(d.doc_id AS VARCHAR) ASC LIMIT 10"
    )
    sqls["hybrid_keyword_vector_rrf"] = _hybrid_rrf_sql(["merge", "vector"], 10)
    sqls["hybrid_filtered_batch_rrf"] = (
        "SELECT 0 AS query_id, doc_id, score FROM ("
        + _hybrid_rrf_sql(["merge", "vector"], 10, doc_filter="lang = 'en'")
        + ") UNION ALL SELECT 1, doc_id, score FROM ("
        + _vec_filtered_sql(10, "lang = 'en'")
        + ") UNION ALL SELECT 2, doc_id, score FROM ("
        + _hybrid_rrf_sql(["merge", "vector"], 10)
        + ")"
    )
    sqls["embedding_near_dup_pairs"] = """
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.e, b.e) /
                     (sqrt(list_dot_product(a.e, a.e)) *
                      sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.e, b.e) /
              (sqrt(list_dot_product(a.e, a.e)) *
               sqrt(list_dot_product(b.e, b.e))) >= 0.5
    """
    return sqls


_TOKS_LOWER = (
    f"list_filter(regexp_split_to_array(lower(text), '{_WS_CLASS}+'), x -> x <> '')"
)

# shared CTE chain ending in mh_pairs(id_a, id_b, jaccard): the exact-
# Jaccard >= 0.5 pair set (see the dedup_minhash_lsh oracle comment for
# why this equals the banded-LSH output); reused by dedup_clusters
_MINHASH_PAIR_CTES = f"""
            t AS (
              SELECT doc_id, {_TOKS_LOWER} AS toks FROM documents
            ),
            sh AS (
              SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
              )) AS s
              FROM t WHERE len(toks) >= 3
            ),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::DOUBLE AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            ),
            mh_pairs AS (
              SELECT id_a, id_b,
                     round(ni / (sa.sz + sb.sz - ni), 6) AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE ni / (sa.sz + sb.sz - ni) >= 0.5
            )
"""


# ---------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------

def _q_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine_for(spark, sf)
    q = SearchQuery(keyword="vector hash", fields=["text"], limit=10)
    out = eng.search(q, "db", "documents")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 5).alias("score"),
    )


def _q_bm25_filtered(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered keyword search — runs the WAND fast path WITH the filter
    executed inside the shard scorer (operators/filtering.gate_frame),
    certifying SURVEY §2.1 F1+Q2 combined (Occur.FILTER semantics:
    non-scoring, stats corpus-global)."""
    eng = _engine_for(spark, sf)
    n = _documents(spark, sf).count()
    q = SearchQuery(
        keyword="merge vector",
        fields=["text"],
        filters={"and": [{"field": "lang", "value": "en"}]},
        limit=n,
    )
    out = eng.search(q, "db", "documents")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 5).alias("score"),
    )


def _q_batch_fanout(spark: SparkSession, sf: str) -> DataFrame:
    """Three keyword queries executed in ONE Spark job
    (operators/batch.py — the 100 TB query-throughput path: the
    per-job scheduling floor is paid once per batch). All-rows per
    query so the oracle is a UNION of per-query BM25 SQL."""
    eng = _engine_for(spark, sf)
    n = _documents(spark, sf).count()
    qs = [
        SearchQuery(keyword=kw, fields=["text"], limit=n)
        for kw in ("merge", "vector hash", "+data -spark batch")
    ]
    out = eng.batch_search(qs, "db", "documents")
    return out.select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 5).alias("score"),
    )


def _q_batch_mixed(spark: SparkSession, sf: str) -> DataFrame:
    """A FILTERED query, a PREFIX query, a PHRASE query and (round 5) a
    MATCH-ALL query in the SAME batch collect (operators/batch.py
    batches any non-match-all/non-vector SearchQuery — per-query filter
    allow-sets ride the shard cogroup tagged by query_id, phrase
    positions ride the shared postings scan, and match-all members
    share batch_filter's ONE docs scan; reference filter() parity,
    RetrievalMaster.java:201-250)."""
    eng = _engine_for(spark, sf)
    n = _documents(spark, sf).count()
    qs = [
        SearchQuery(
            keyword="merge vector",
            fields=["text"],
            filters={"and": [{"field": "lang", "value": "en"}]},
            limit=n,
        ),
        SearchQuery(keyword="mer* vector", fields=["text"], limit=n),
        SearchQuery(keyword='"part filter" merge', fields=["text"], limit=n),
        SearchQuery(
            keyword="*",
            filters={"and": [{"field": "source", "value": "src1"}]},
            limit=n,
        ),
    ]
    out = eng.batch_search(qs, "db", "documents")
    return out.select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 5).alias("score"),
    )


def _q_term_stats(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine_for(spark, sf)
    ctx = eng.ctx("db", "documents")
    return (
        ctx.stats()
        .filter(
            (F.col("field") == "text")
            & F.col("term").isin(["spark", "merge", "vector", "the"])
        )
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy("term")
    )


def _q_match_all_filter(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine_for(spark, sf)
    n = _documents(spark, sf).count()
    q = SearchQuery(
        keyword="*",
        filters={"and": [{"field": "lang", "value": "en"}]},
        limit=n,
    )
    out = eng.search(q, "db", "documents")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.col("_score").alias("score"),
    )


def _q_nested_bool_filter(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine_for(spark, sf)
    q = SearchQuery(
        filters={
            "and": [
                {"field": "lang", "value": "en"},
                {
                    "or": [
                        {"field": "source", "value": "src1"},
                        {"field": "source", "value": "src2"},
                    ]
                },
            ]
        },
        limit=0,  # no limit: full filtered set
    )
    out = eng.filter(q, "db", "documents")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source", "n_chars"
    )


def _q_range_filter(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine_for(spark, sf)
    q = SearchQuery(
        filters={"and": [{"field": "n_chars", "min": 100, "max": 300}]}, limit=0
    )
    return eng.filter(q, "db", "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "n_chars"
    )


def _q_one_sided_quirk(spark: SparkSession, sf: str) -> DataFrame:
    # reference quirk: {"min": x} ⇒ exact == x (SchemaUtils.java:177-181)
    eng = _engine_for(spark, sf)
    q = SearchQuery(filters={"and": [{"field": "n_chars", "min": 128}]}, limit=0)
    return eng.filter(q, "db", "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "n_chars"
    )


def _q_multi_sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine_for(spark, sf)
    q = SearchQuery(
        filters={"and": [{"field": "source", "value": "src3"}]},
        sorts=[{"lang": "asc"}, {"n_chars": "desc"}],
        limit=10,
    )
    return eng.filter(q, "db", "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "n_chars"
    )


def _q_multi_filter_fanout(spark: SparkSession, sf: str) -> DataFrame:
    """Reference filter() LIST parity (L1): two filter-mode queries in
    ONE collected DataFrame, each with its own filter tree + sort order
    (api.batch_filter, r3)."""
    eng = _engine_for(spark, sf)
    qs = [
        SearchQuery(
            filters={"and": [{"field": "lang", "value": "en"}]},
            sorts=[{"n_chars": "desc"}],
            limit=25,
        ),
        SearchQuery(
            filters={"and": [{"field": "n_chars", "min": 100, "max": 300}]},
            sorts=[{"source": "asc"}],
            limit=25,
        ),
    ]
    return eng.batch_filter(qs, "db", "documents").select(
        "query_id",
        F.col("__rank").cast("int").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "n_chars",
    )


def _q_get_by_ids(spark: SparkSession, sf: str) -> DataFrame:
    eng = _engine_for(spark, sf)
    return eng.get_by_ids(["1", "5", "7"], "db", "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source", "n_chars"
    )


def _rounded_recall(spark, sf, keyword) -> DataFrame:
    return _bm25_all(spark, sf, keyword).withColumnRenamed("doc_id", "_id")


def _q_fusion_score_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Routes through operators/fusion.score_sum_fuse so the oracle gate
    certifies the SHIPPED operator (M3), not an inline reimplementation."""
    from byzer_retrieval_spark.operators.fusion import score_sum_fuse

    n = _documents(spark, sf).count()
    a = _rounded_recall(spark, sf, "merge").withColumnRenamed("score", "_score")
    b = _rounded_recall(spark, sf, "vector").withColumnRenamed("score", "_score")
    fused = score_sum_fuse([a, b], limit=n)
    return fused.select(
        F.col("_id").cast("long").alias("doc_id"),
        F.round("_score", 5).alias("score"),
    )


def _q_fusion_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Routes through operators/fusion.rrf_fuse (M2). The recalls carry
    5dp-rounded scores and _id as a STRING (the engine's tie-break key),
    matching the oracle's rank windows exactly."""
    from byzer_retrieval_spark.operators.fusion import rrf_fuse

    n = _documents(spark, sf).count()
    recalls = [
        _bm25_all(spark, sf, kw)
        .select(F.col("doc_id").cast("string").alias("_id"),
                F.col("score").alias("_score"))
        for kw in ("merge", "vector")
    ]
    fused = rrf_fuse(recalls, limit=n)
    return fused.select(
        F.col("_id").cast("long").alias("doc_id"),
        F.round("_score", 6).alias("score"),
    )


def _q_delete_requery(spark: SparkSession, sf: str) -> DataFrame:
    """Tombstone semantics without mutating the shared cached index: a
    copy-on-write index in a scratch root, delete ids 0-4, re-query.

    NOTE stats stay Lucene-faithful (deleted docs keep counting toward
    df/avgdl until compaction), so scores equal the pre-delete scores —
    exactly what the SQL oracle expresses (filter on the base scores)."""
    import shutil

    eng = _engine_for(spark, sf)
    scratch_root = os.path.join(IDX_ROOT, "scratch_delete")
    shutil.rmtree(scratch_root, ignore_errors=True)
    shutil.copytree(
        os.path.join(eng.root, "db", "documents"),
        os.path.join(scratch_root, "db", "documents"),
    )
    eng2 = RetrievalEngine(spark, scratch_root)
    from byzer_retrieval_spark.operators import mutate

    mutate.delete_by_ids(spark, eng2.store("db", "documents"), ["0", "1", "2", "3", "4"])
    n = _documents(spark, sf).count()
    out = eng2.search(
        SearchQuery(keyword="merge", fields=["text"], limit=n), "db", "documents"
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 5).alias("score"),
    )


def _q_upsert_wins(spark: SparkSession, sf: str) -> DataFrame:
    """Upsert doc 3 with sentinel content in a scratch copy; the sentinel
    query returns exactly that one doc (delete-then-insert semantics)."""
    import shutil

    eng = _engine_for(spark, sf)
    scratch_root = os.path.join(IDX_ROOT, "scratch_upsert")
    shutil.rmtree(scratch_root, ignore_errors=True)
    shutil.copytree(
        os.path.join(eng.root, "db", "documents"),
        os.path.join(scratch_root, "db", "documents"),
    )
    eng2 = RetrievalEngine(spark, scratch_root)
    new = spark.createDataFrame(
        [{"_id": "3", "doc_id": 3, "text": "upserted sentinel tokenxyz",
          "lang": "en", "source": "src0", "n_chars": 26}]
    )
    eng2.upsert(new, "db", "documents")
    out = eng2.search(
        SearchQuery(keyword="tokenxyz", fields=["text"], limit=10), "db", "documents"
    )
    return out.agg(F.count("*").cast("long").alias("n_hits"))


def _q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.text import fingerprint_expr

    return (
        _documents(spark, sf)
        .select("doc_id", fingerprint_expr(F.col("text")).alias("fp"))
        .orderBy("doc_id")
    )


def _q_pii(spark: SparkSession, sf: str) -> DataFrame:
    """PII detect + scrub. The synthetic docs contain no natural PII,
    so the entry plants a deterministic doc_id-derived email/IP/SSN
    suffix — IDENTICALLY in the SQL oracle — then counts matches and
    fingerprints the scrubbed text (proving the scrub output matches
    byte-for-byte without shipping 500 full texts through the gate)."""
    from byzer_retrieval_spark.functions.text import (
        pii_counts_exprs,
        pii_scrub_expr,
    )

    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".7 ssn 123-45-678"),
        (F.col("doc_id") % 10).cast("string"),
    )
    cols = [c.alias(n) for n, c in pii_counts_exprs(planted).items()]
    return (
        _documents(spark, sf)
        .select(
            "doc_id",
            *cols,
            F.md5(pii_scrub_expr(planted)).alias("scrubbed_md5"),
        )
        .orderBy("doc_id")
    )


def _q_repetition(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.text import repetition_exprs

    cols = [c.alias(n) for n, c in repetition_exprs(F.col("text")).items()]
    return _documents(spark, sf).select("doc_id", *cols).orderBy("doc_id")


def _q_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window chunking (window 32, stride 24): one row per
    chunk with the md5 of the joined chunk text."""
    from byzer_retrieval_spark.functions.chunking import chunk_documents

    return chunk_documents(_documents(spark, sf), "doc_id", "text", 32, 24)


def _q_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash-threshold stratified sampling (training-data
    mixing): keep all en, 30% de, 5% of everything else."""
    from byzer_retrieval_spark.functions.sampling import stratified_sample

    out = stratified_sample(
        _documents(spark, sf), "doc_id", "lang", {"en": 1.0, "de": 0.3}, 0.05
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


def _q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.text import lang_id_expr

    return (
        _documents(spark, sf)
        .select("doc_id", lang_id_expr(F.col("text")).alias("pred_lang"))
        .orderBy("doc_id")
    )


def _q_quality(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.text import quality_features_exprs

    feats = quality_features_exprs(F.col("text"))
    return (
        _documents(spark, sf)
        .select(
            "doc_id",
            feats["n_chars"].cast("long").alias("n_chars"),
            feats["n_tokens"].cast("int").alias("n_tokens"),
            feats["punct_ratio"].alias("punct_ratio"),
            feats["stopword_ratio"].alias("stopword_ratio"),
            feats["mean_token_len"].alias("mean_token_len"),
        )
        .orderBy("doc_id")
    )


def _q_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.text import (
        bpe_ish_token_count_expr,
        token_count_expr,
    )

    return (
        _documents(spark, sf)
        .select(
            "doc_id",
            token_count_expr(F.lower(F.col("text"))).cast("int").alias("n_tokens"),
            bpe_ish_token_count_expr(F.col("text")).cast("int").alias("n_bpe_ish"),
        )
        .orderBy("doc_id")
    )


def _q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup with PLANTED duplicates: the synthetic corpus has no
    exact dups, so the 5 lowest doc_ids are re-added under new ids
    (mirrored in the oracle) — the gate certifies NON-EMPTY duplicate
    groups, not a vacuous 0 = 0 (round-2 verdict nit)."""
    from byzer_retrieval_spark.functions.text import fingerprint_expr

    docs = _documents(spark, sf).select("doc_id", "text")
    planted = docs.orderBy("doc_id").limit(5).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    return (
        docs.unionByName(planted)
        .select("doc_id", fingerprint_expr(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def _q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _documents(spark, sf), "doc_id", "text", n=3, threshold=0.5
    )


def _q_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.dedup import minhash_lsh_dup_pairs

    out = minhash_lsh_dup_pairs(
        _documents(spark, sf), "doc_id", "text", threshold=0.5
    )
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard"
    )


def _q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive-closure dedup clustering: minhash-LSH pairs →
    connected components (iterative min-label joins). The DuckDB oracle
    computes the same closure with a recursive CTE over the identical
    pair set."""
    from byzer_retrieval_spark.functions.dedup import dedup_clusters

    out = dedup_clusters(_documents(spark, sf), "doc_id", "text", threshold=0.5)
    return out.select(F.col("id").cast("long"), F.col("cluster").cast("long"))


def _q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.dedup import simhash_dup_pairs

    out = simhash_dup_pairs(_documents(spark, sf), "doc_id", "text", max_hamming=3)
    return out.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("hamming").cast("int"),
    )


def _query_vec() -> list[float]:
    """Fixed seeded 64-dim query vector — a shared literal on both the
    Spark and DuckDB side (embeddings differ between SF dirs, so the
    query must not be derived from the table)."""
    import numpy as np

    rng = np.random.default_rng(7)
    v = rng.standard_normal(64)
    return [float(x) for x in (v / np.linalg.norm(v))]


def _q_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.similarity import brute_force_cosine_topk

    emb = _embeddings(spark, sf)
    out = brute_force_cosine_topk(emb, "vec_id", "embedding", _query_vec(), k=10)
    # the op already rounds once to 6dp; never re-round (double rounding)
    return out.select(F.col("id").cast("long"), "cosine")


def _q_embedding_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.functions.dedup import embedding_dup_pairs

    out = embedding_dup_pairs(_embeddings(spark, sf), "vec_id", "embedding", 0.5)
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "cosine"
    )


def _lsh_index_for(
    spark: SparkSession, sf: str, name: str, num_planes: int, num_tables: int
):
    """Build-once persisted LSH index over the sf dir's embeddings."""
    from byzer_retrieval_spark.functions.similarity import LshVectorIndex

    tag = os.path.basename(os.path.normpath(sf))
    idx = LshVectorIndex(
        os.path.join(IDX_ROOT, tag, name),
        num_planes=num_planes,
        num_tables=num_tables,
    )
    if not idx.exists():
        emb = _embeddings(spark, sf)
        dim = len(emb.select("embedding").first()["embedding"])
        idx.build(emb, "vec_id", "embedding", dim=dim)
    return idx


def _ivf_index_for(spark: SparkSession, sf: str, num_clusters: int):
    """Build-once persisted IVF index over the sf dir's embeddings."""
    from byzer_retrieval_spark.functions.similarity import IvfVectorIndex

    tag = os.path.basename(os.path.normpath(sf))
    idx = IvfVectorIndex(
        os.path.join(IDX_ROOT, tag, f"ivf{num_clusters}"),
        num_clusters=num_clusters,
    )
    if not idx.exists():
        emb = _embeddings(spark, sf)
        dim = len(emb.select("embedding").first()["embedding"])
        idx.build(emb, "vec_id", "embedding", dim=dim)
    return idx


def _q_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted-IVF ANN (spherical k-means partitions): nprobe =
    num_clusters → exact top-k, so the brute-force cosine SQL is a true
    oracle (the pruned-probe recall + partition-pruning plan are pinned
    by pytest)."""
    idx = _ivf_index_for(spark, sf, num_clusters=16)
    out = idx.topk(spark, _query_vec(), k=10, nprobe=16)
    return out.select(F.col("id").cast("long"), "cosine")


def _q_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted-LSH ANN: probe_hamming = num_planes → exact top-k, so
    the brute-force cosine SQL is a true oracle (the pruned-probe recall
    + partition-pruning plan are pinned by pytest)."""
    idx = _lsh_index_for(spark, sf, "lsh12x2", num_planes=12, num_tables=2)
    out = idx.topk(spark, _query_vec(), k=10, probe_hamming=12)
    return out.select(F.col("id").cast("long"), "cosine")


def _q_lsh_dup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Bucketed near-dup pairs (the scale path for embedding dedup):
    candidates share an LSH bucket in any of 16 two-plane tables
    (miss prob ≤ (1-p²)^16 with p = 1-θ/π; ≈ 8e-5 even at cosine 0.5),
    verified by exact cosine — empirically equal to the all-pairs oracle
    on every test SF."""
    idx = _lsh_index_for(spark, sf, "lsh2x16", num_planes=2, num_tables=16)
    out = idx.dup_pairs(spark, threshold=0.5)
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "cosine"
    )


def _q_vector_search(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered exact KNN through the SearchQuery path (Q3): cosine over
    the stored embedding column with a non-scoring lang filter,
    reproducing Lucene's filtered KnnFloatVectorQuery semantics
    (RetrievalWorker.java:346-366)."""
    eng = _engine_hybrid_for(spark, sf)
    q = SearchQuery(
        vector=_query_vec(),
        vector_field="embedding",
        filters={"and": [{"field": "lang", "value": "en"}]},
        limit=10,
    )
    out = eng.search(q, "db", "hybrid")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 6).alias("cosine"),
    )


def _q_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Keyword+vector hybrid through api.search: two recalls fused with
    RRF (isRRF = keyword && vectorField, LocalRetrievalMaster.java:185)."""
    eng = _engine_hybrid_for(spark, sf)
    q = SearchQuery(
        keyword="merge vector",
        fields=["text"],
        vector=_query_vec(),
        vector_field="embedding",
        limit=10,
    )
    out = eng.search(q, "db", "hybrid")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 6).alias("score"),
    )


def _q_hybrid_filtered_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Round 5 batch-matrix closure under the driver gate: a FILTERED
    hybrid, a FILTERED vector query and a plain hybrid in ONE
    batch_search — exercises the gated shared probe (can-fill-k), the
    filter-as-allow-set keyword side and the keyed tagged fusion. The
    LSH index is exhaustive-probe (probe_hamming = num_planes ⇒ the
    candidate set is the full replica), so the ANN path EQUALS the
    exact scan and the DuckDB oracle stays deterministic."""
    eng = _engine_hybrid_for(spark, sf)
    store = eng.store("db", "hybrid")
    if eng._current_ann(store, "embedding") is None:
        eng.build_vector_ann(
            "embedding", database="db", table="hybrid", kind="lsh",
            num_planes=4, num_tables=1, probe={"probe_hamming": 4},
        )
    en = {"and": [{"field": "lang", "value": "en"}]}
    qs = [
        SearchQuery(
            keyword="merge vector", fields=["text"], vector=_query_vec(),
            vector_field="embedding", filters=en, limit=10,
        ),
        SearchQuery(
            vector=_query_vec(), vector_field="embedding",
            filters=en, limit=10,
        ),
        SearchQuery(
            keyword="merge vector", fields=["text"], vector=_query_vec(),
            vector_field="embedding", limit=10,
        ),
    ]
    out = eng.batch_search(qs, "db", "hybrid")
    return out.select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 6).alias("score"),
    )


def _q_multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary media plumbing end-to-end: the deterministic media table's
    payload bytes cross into the mapInPandas decoder over Arrow
    (n_bytes measured from the ACTUAL received bytes — corruption or
    truncation in the binary transfer would mismatch the SQL-computed
    expectation), joined with the JVM-side frame-sampling plan."""
    from byzer_retrieval_spark.functions.multimodal import (
        decode_image_features,
        frame_sample_plan,
        synth_media_df,
    )

    media = synth_media_df(spark, 64)
    feats = decode_image_features(media, fake=True)
    frames = frame_sample_plan(media).select(
        "media_id", F.size("frame_ts_ms").alias("n_frames")
    )
    return (
        feats.join(frames, "media_id", "left")
        .select(
            "media_id",
            "kind",
            F.col("n_bytes").cast("long"),
            F.coalesce(F.col("n_frames"), F.lit(-1)).cast("int").alias("n_frames"),
        )
        .orderBy("media_id")
    )


def _q_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio decode (round 5 — stdlib ``wave``, no external
    dependency): 12 deterministic PCM-WAV payloads decode inside
    mapInPandas to 16 amplitude-histogram bins + 16 spectral-band
    energies. The oracle is a pinned literal table (the input is
    synthesized independent of sf_dir, so the expected rows are
    sf-invariant): byte counts, per-half argmax bins, and two rounded
    feature values — a regression pin over the whole decode path."""
    from byzer_retrieval_spark.functions.multimodal import (
        FEATURE_DIM,
        decode_image_features,
        synth_wav_media_df,
    )

    half = FEATURE_DIM // 2
    feats = decode_image_features(synth_wav_media_df(spark, 12))
    amp = F.slice("features", 1, half)
    spec = F.slice("features", half + 1, half)
    return feats.select(
        "media_id",
        F.col("n_bytes").cast("long"),
        (F.array_position(amp, F.array_max(amp)) - 1)
        .cast("int")
        .alias("amp_peak_bin"),
        (F.array_position(spec, F.array_max(spec)) - 1)
        .cast("int")
        .alias("spec_peak_bin"),
        F.round(F.element_at("features", 1).cast("double"), 5).alias("f0"),
        F.round(F.element_at("features", half + 1).cast("double"), 5).alias(
            "fmid"
        ),
    ).orderBy("media_id")


_AUDIO_GOLDEN = [
    (0, 4044, 5, 0, 0.0, 0.79999),
    (1, 4044, 5, 0, 0.008, 0.78893),
    (2, 4044, 10, 1, 0.0075, 0.01766),
    (3, 4044, 10, 1, 0.007, 0.00347),
    (4, 4044, 10, 1, 0.0075, 0.00011),
    (5, 4044, 5, 1, 0.008, 0.00127),
    (6, 4044, 5, 1, 0.007, 0.00304),
    (7, 4044, 5, 1, 0.0065, 0.00084),
    (8, 4044, 5, 1, 0.007, 0.0),
    (9, 4044, 5, 2, 0.007, 0.00024),
    (10, 4044, 10, 2, 0.0075, 0.0012),
    (11, 4044, 5, 2, 0.007, 0.00051),
]


def _audio_features_sql() -> str:
    vals = ", ".join(
        f"({i}, {nb}, {ab}, {sb}, {f0}, {fm})"
        for i, nb, ab, sb, f0, fm in _AUDIO_GOLDEN
    )
    return f"""
SELECT media_id::BIGINT AS media_id, n_bytes::BIGINT AS n_bytes,
       amp_peak_bin::INT AS amp_peak_bin, spec_peak_bin::INT AS spec_peak_bin,
       f0::DOUBLE AS f0, fmid::DOUBLE AS fmid
FROM (VALUES {vals})
  AS t(media_id, n_bytes, amp_peak_bin, spec_peak_bin, f0, fmid)
"""


def _q_video_features(spark: SparkSession, sf: str) -> DataFrame:
    """REAL video decode (round 5 — uncompressed YUV4MPEG2, pure numpy,
    no codec library): 8 deterministic Y4M payloads decode inside
    mapInPandas to a pooled luma histogram + temporal mean-luma profile,
    AND the real per-frame sampler extracts frames 0/2/4/6 at 500 ms
    ticks. Both UDF paths meet in one broadcast-joined result; the
    oracle is a pinned literal table (inputs are sf-invariant)."""
    from byzer_retrieval_spark.functions.multimodal import (
        FEATURE_DIM,
        decode_image_features,
        sample_video_frames,
        synth_y4m_media_df,
    )

    half = FEATURE_DIM // 2
    media = synth_y4m_media_df(spark, 8)
    hist = F.slice("features", 1, half)
    feats = decode_image_features(media).select(
        "media_id",
        F.col("n_bytes").cast("long"),
        (F.array_position(hist, F.array_max(hist)) - 1)
        .cast("int")
        .alias("hist_peak_bin"),
        F.round(F.element_at("features", half + 1).cast("double"), 5).alias(
            "prof_first"
        ),
        F.round(F.element_at("features", FEATURE_DIM).cast("double"), 5).alias(
            "prof_last"
        ),
    )
    samp = (
        sample_video_frames(media, every_ms=500)
        .groupBy("media_id")
        .agg(
            F.count("*").cast("int").alias("n_sampled"),
            F.round(F.min("luma_mean").cast("double"), 4).alias("luma_first"),
            F.round(F.max("luma_mean").cast("double"), 4).alias("luma_last"),
        )
    )
    return feats.join(F.broadcast(samp), "media_id").orderBy("media_id")


_VIDEO_GOLDEN = [
    (0, 2392, 4, 0.05098, 0.5451, 4, 13.0, 121.0),
    (1, 2392, 2, 0.10196, 0.59608, 4, 26.0, 134.0),
    (2, 2392, 3, 0.15294, 0.64706, 4, 39.0, 147.0),
    (3, 2392, 3, 0.20392, 0.69804, 4, 52.0, 160.0),
    (4, 2392, 5, 0.2549, 0.74902, 4, 65.0, 173.0),
    (5, 2392, 2, 0.07059, 0.56471, 4, 18.0, 126.0),
    (6, 2392, 4, 0.12157, 0.61569, 4, 31.0, 139.0),
    (7, 2392, 7, 0.17255, 0.66667, 4, 44.0, 152.0),
]


def _video_features_sql() -> str:
    vals = ", ".join(
        f"({i}, {nb}, {hb}, {pf}, {pl}, {ns}, {lf}, {ll})"
        for i, nb, hb, pf, pl, ns, lf, ll in _VIDEO_GOLDEN
    )
    return f"""
SELECT media_id::BIGINT AS media_id, n_bytes::BIGINT AS n_bytes,
       hist_peak_bin::INT AS hist_peak_bin,
       prof_first::DOUBLE AS prof_first, prof_last::DOUBLE AS prof_last,
       n_sampled::INT AS n_sampled,
       luma_first::DOUBLE AS luma_first, luma_last::DOUBLE AS luma_last
FROM (VALUES {vals})
  AS t(media_id, n_bytes, hist_peak_bin, prof_first, prof_last,
       n_sampled, luma_first, luma_last)
"""


def _per_shard_stats_sql(
    terms: list[str], num_shards: int = 4, limit: int = 10,
    max_docs: int = 5000,
) -> str:
    """Full DuckDB oracle for per_shard_stats mode: df/N/avgdl grouped
    by shard. The shard assignment is Spark's xxhash64 (seed 42) —
    inexpressible in DuckDB SQL, but PREDICTABLE: routing.xxhash64 is a
    bit-exact pure-python XXH64 (JVM-validated in test_pure_units), so
    the doc_id→shard map is embedded as a VALUES table for doc_id
    0..max_docs-1 (testdata doc_ids are dense from 0; surplus rows
    drop out of the join)."""
    from byzer_retrieval_spark.functions.routing import engine_shard

    shard_vals = ", ".join(
        f"({i}, {engine_shard(str(i), num_shards)})" for i in range(max_docs)
    )
    sc_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH shards AS (
  SELECT * FROM (VALUES {shard_vals}) AS s(doc_id, shard)
),
toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id
),
sstats AS (
  SELECT s.shard, count(*)::DOUBLE AS n, avg(dl.dl) AS avgdl
  FROM dl JOIN shards s USING (doc_id) GROUP BY s.shard
),
sdf AS (
  SELECT s.shard, tf.term, count(*)::DOUBLE AS df
  FROM tf JOIN shards s USING (doc_id)
  WHERE tf.term IN ({sc_list})
  GROUP BY s.shard, tf.term
),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (st.n - d.df + 0.5) / (d.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / st.avgdl))
         ) AS raw_score
  FROM tf
  JOIN shards s USING (doc_id)
  JOIN sdf d ON d.shard = s.shard AND d.term = tf.term
  JOIN dl USING (doc_id)
  JOIN sstats st ON st.shard = s.shard
  WHERE tf.term IN ({sc_list})
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 5) AS score FROM scored
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC LIMIT {limit}
"""


def _q_per_shard_stats(spark: SparkSession, sf: str) -> DataFrame:
    """per_shard_stats scoring mode (round 5 — reference numNodes>1
    parity): every shard scores with its OWN df/N/avgdl and the merge
    is by score. Served by the WAND fast path and the one-job batch
    too (per-shard df rides the stats join keyed on shard_id; every
    WAND bound is already shard-local). Full DuckDB oracle as of r5:
    the engine's xxhash64 shard assignment is reproduced driver-side
    by routing.xxhash64 (bit-exact pure-python XXH64) and embedded in
    the SQL as a doc_id→shard VALUES map (_per_shard_stats_sql); exact
    score parity vs merged per-shard python oracles (both scorer
    paths) is additionally pinned in tests/test_per_shard_stats.py."""
    tag = os.path.basename(os.path.normpath(sf))
    eng = RetrievalEngine(spark, os.path.join(IDX_ROOT, tag))
    store = eng.store("db", "documents_pss")
    if store.current_snapshot() is None:
        docs = _documents(spark, sf)
        src = docs.withColumn("_id", F.col("doc_id").cast("string"))
        eng.build(
            src,
            database="db",
            table="documents_pss",
            cfg=IndexConfig(
                num_shards=4,
                analyzed_fields=("text",),
                id_columns=(),
                per_shard_stats=True,
            ),
            resume=True,
            source_desc=f"{sf}/documents.parquet (per_shard_stats)",
        )
    q = SearchQuery(
        keyword="merge spark", fields=["text"], limit=10,
        database="db", table="documents_pss",
    )
    return eng.search(q, database="db", table="documents_pss").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("_score", 5).alias("score"),
    )


def _q_events_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.streaming.windows import tumbling_event_counts

    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    return tumbling_event_counts(ev)


def _q_events_sessions(spark: SparkSession, sf: str) -> DataFrame:
    from byzer_retrieval_spark.streaming.windows import session_windows

    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    return session_windows(ev)


def _q_events_occ_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful-operator surface (applyInPandasWithState twin): per-key
    occurrence ranks + first-seen; the batch path here IS the stream's
    single-trigger output multiset (pinned by test_stateful_stream)."""
    from byzer_retrieval_spark.streaming.stateful import occurrence_rank

    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    return occurrence_rank(ev)


def _q_rel_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_rel_join(spark: SparkSession, sf: str) -> DataFrame:
    o = spark.read.parquet(os.path.join(sf, "orders.parquet"))
    c = spark.read.parquet(os.path.join(sf, "customer.parquet"))
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("custkey").asc())
        .limit(20)
    )

"""Batch query fan-out: MANY keyword queries in ONE Spark job.

The reference's filter()/search() accept a LIST of SearchQuery
(L1 multi-query fan-out, RetrievalMaster.java:201-250) but execute them
per-query; a Spark job has a ~0.5-1 s scheduling floor, so per-query
execution caps throughput at ~1 query/sec regardless of cluster size.
This operator amortizes the floor: the postings scan is filtered ONCE to
the union of all queries' terms, shards cogroup once, and the per-shard
scorer decodes each term's postings ONCE and then scores every query
against the in-memory arrays (numpy gather + bincount per query —
microseconds each). Output: per-query global top-k.

Scale: the scan cost is the union of the batch's term postings (shared
terms decode once); per-shard memory is bounded by those postings; the
shuffle moves ≤ Σ_q k_q rows per shard. At 10^12 docs this is the only
way to serve thousands of queries: throughput scales with executors
while the scheduling floor is paid once per BATCH, not per query.

Scope: term clauses (implicit OR, +MUST, -MUST_NOT) — the dominant
query shape; phrase/prefix/fuzzy queries fall back to single execution
via api.search (documented).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from byzer_retrieval_spark.operators.context import IndexContext
from byzer_retrieval_spark.operators.decode import decode_rows
from byzer_retrieval_spark.plans.query import SearchQuery, parse_keyword

_OUT_SCHEMA = "query_id int, shard_id int, __docid long, score double"


def _make_batch_scorer(
    field_stats: Dict[str, Tuple[float, float]],
    specs: List[dict],  # per query: {qid, fields, scoring, must, must_not, k}
    k1: float,
    b: float,
):
    def score_shard(pdf: pd.DataFrame, deny: np.ndarray) -> pd.DataFrame:
        shard_id = int(pdf["shard_id"].iloc[0])
        # ---- decode every (field, term) ONCE --------------------------
        # keyed per FIELD so each query scores/gates only ITS fields
        by_term: Dict[str, List[Tuple[str, np.ndarray, np.ndarray]]] = {}
        for (fld, term), g in pdf.groupby(["field", "term"], sort=False):
            g = g.sort_values("first_doc")
            n_docs, avgdl = field_stats[fld]
            df = float(g["df"].iloc[0])
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            docs, tfs, dls, _ = decode_rows(
                g["doc_gaps"], g["tfs"], g["dls"], g["first_doc"]
            )
            part = idf * (tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl)))
            by_term.setdefault(term, []).append((fld, docs, part))

        out_q, out_d, out_s = [], [], []
        for spec in specs:
            q_fields = spec["fields"]
            doc_arrs, part_arrs = [], []
            must_doc_sets = []
            for t in spec["scoring"]:
                for fld, docs, part in by_term.get(t, ()):
                    if fld in q_fields:
                        doc_arrs.append(docs)
                        part_arrs.append(part)
            for t in spec["must"]:
                hits = [
                    docs
                    for fld, docs, _ in by_term.get(t, ())
                    if fld in q_fields
                ]
                must_doc_sets.append(
                    np.unique(np.concatenate(hits))
                    if hits
                    else np.empty(0, dtype=np.int64)
                )
            if not doc_arrs:
                continue
            all_docs = np.concatenate(doc_arrs)
            all_parts = np.concatenate(part_arrs)
            uniq, inv = np.unique(all_docs, return_inverse=True)
            scores = np.bincount(inv, weights=all_parts, minlength=uniq.size)
            mask = np.ones(uniq.size, dtype=bool)
            for hits in must_doc_sets:
                mask &= np.isin(uniq, hits)
            for t in spec["must_not"]:
                ex = [
                    docs
                    for fld, docs, _ in by_term.get(t, ())
                    if fld in q_fields
                ]
                if ex:
                    mask &= ~np.isin(uniq, np.unique(np.concatenate(ex)))
            if deny.size:
                # tombstone deny gate BEFORE the top-k cut — a deleted
                # doc must not displace a live one from the shard top-k
                mask &= ~np.isin(uniq, deny)
            docs_f, scores_f = uniq[mask], scores[mask]
            k = spec["k"]
            if docs_f.size > k:
                sel = np.argpartition(-scores_f, k - 1)[:k]
                kth = scores_f[sel].min()
                keep = scores_f >= kth  # keep boundary ties for global sort
                docs_f, scores_f = docs_f[keep], scores_f[keep]
            out_q.append(np.full(docs_f.size, spec["qid"], dtype=np.int32))
            out_d.append(docs_f)
            out_s.append(scores_f)
        if not out_q:
            return pd.DataFrame(
                {"query_id": [], "shard_id": [], "__docid": [], "score": []}
            ).astype(
                {"query_id": np.int32, "shard_id": np.int32,
                 "__docid": np.int64, "score": np.float64}
            )
        qv = np.concatenate(out_q)
        return pd.DataFrame(
            {
                "query_id": qv,
                "shard_id": np.full(qv.size, shard_id, dtype=np.int32),
                "__docid": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    _EMPTY = np.empty(0, dtype=np.int64)

    def grouped(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return score_shard(pdf, _EMPTY)

    def cogrouped(key, pdf: pd.DataFrame, deny_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(
                {"query_id": [], "shard_id": [], "__docid": [], "score": []}
            ).astype(
                {"query_id": np.int32, "shard_id": np.int32,
                 "__docid": np.int64, "score": np.float64}
            )
        deny = (
            deny_pdf["__docid"].to_numpy(np.int64) if len(deny_pdf) else _EMPTY
        )
        return score_shard(pdf, deny)

    return grouped, cogrouped


def batch_search(
    ctx: IndexContext, queries: List[SearchQuery]
) -> DataFrame:
    """Execute a batch of term-clause keyword queries in ONE job.

    Returns (query_id, _score, stored fields...) — per query the global
    top-k ordered (score desc, _id asc), query_id = position in
    ``queries``. Raises ValueError for queries outside the batchable
    shape (filters, phrases, prefixes, fuzzies, match-all) — run those
    through api.search.
    """
    specs = []
    all_terms: List[str] = []
    fields_used: List[str] = []
    for qid, q in enumerate(queries):
        parsed = parse_keyword(q.keyword, ctx.analyzer)
        if (
            parsed.match_all
            or parsed.empty
            or q.filters
            or parsed.all_phrases
            or parsed.all_prefixes
            or parsed.all_fuzzies
            or parsed.must_any_groups
            or not parsed.scoring_terms
        ):
            raise ValueError(
                f"query {qid} is not batchable (term clauses only); "
                "use api.search for it"
            )
        flds = [
            f for f in (q.fields or ctx.analyzed_fields) if f in ctx.analyzed_fields
        ]
        fields_used.extend(flds)
        specs.append(
            {
                "qid": qid,
                "fields": frozenset(flds),
                "scoring": tuple(parsed.scoring_terms),
                "must": tuple(set(parsed.must)),
                "must_not": tuple(set(parsed.must_not)),
                "k": q.limit,
            }
        )
        all_terms.extend(parsed.scoring_terms + parsed.must_not)
    all_terms = list(dict.fromkeys(all_terms))
    fields = list(dict.fromkeys(fields_used))

    stats = (
        ctx.stats()
        .filter(F.col("field").isin(fields) & F.col("term").isin(all_terms))
        .select("field", "term", "df")
    )
    blocks = (
        ctx.postings()
        .filter(F.col("field").isin(fields) & F.col("term").isin(all_terms))
        .select(
            "shard_id", "field", "term", "first_doc",
            "doc_gaps", "tfs", "dls",
        )
        .join(F.broadcast(stats), ["field", "term"])
    )
    field_stats = {f: (float(ctx.n_docs(f)), float(ctx.avgdl(f))) for f in fields}
    grouped, cogrouped = _make_batch_scorer(field_stats, specs, ctx.k1, ctx.b)
    # tombstones are a deny gate INSIDE the scorer (cogrouped per shard,
    # applied before the per-shard top-k cut) — a deleted doc must not
    # displace a live one; same discipline as wand.search_wand
    tomb = ctx.tombstones_df()
    if tomb is None:
        per_shard = blocks.groupBy("shard_id").applyInPandas(
            grouped, schema=_OUT_SCHEMA
        )
    else:
        deny = tomb.select(
            F.shiftright("__docid", ctx.doc_bits).cast("int").alias("shard_id"),
            "__docid",
        )
        per_shard = (
            blocks.groupby("shard_id")
            .cogroup(deny.groupby("shard_id"))
            .applyInPandas(cogrouped, schema=_OUT_SCHEMA)
        )

    docs = ctx.docs()
    # per-query global top-k with the engine's (score desc, _id asc)
    # tie-break; then one DPP-pruned stored-field materialization
    ranked = (
        per_shard.join(docs.select("__docid", "_id"), "__docid")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("score").desc(), F.col("_id").asc()
                )
            ),
        )
    )
    limits = {s["qid"]: s["k"] for s in specs}
    lim_col = None
    for qid, k in limits.items():
        c = F.when(F.col("query_id") == qid, F.lit(k))
        lim_col = c if lim_col is None else lim_col.when(
            F.col("query_id") == qid, F.lit(k)
        )
    topk = ranked.filter(F.col("__rn") <= lim_col).select(
        "query_id", "shard_id", "__docid", F.col("score").alias("_score")
    )
    out = docs.join(F.broadcast(topk), ["shard_id", "__docid"])
    stored = ctx.stored_columns()
    return (
        out.orderBy("query_id", F.col("_score").desc(), F.col("_id").asc())
        .select("query_id", "_score", *stored)
    )

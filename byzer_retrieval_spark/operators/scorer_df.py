"""BM25 scorer, declarative DataFrame path (the oracle-grade slow path).

Everything after the block decode is Catalyst-optimizable: the term
stats are a broadcast join, the per-doc sum is a partial+final hash
aggregate, filters are Column predicates pushed at the docs scan, and
the global top-k is TakeOrderedAndProject. This path defines the
engine's exact semantics; the WAND fast path must stay rank-identical
to it (and both to the brute-force pytest oracle).

Semantics reproduced from the reference:
- multi-term disjunction scored as sum over matching SHOULD/MUST
  clauses (BooleanQuery built at RetrievalWorker.java:325-343);
- ``+term`` MUST / ``-term`` MUST_NOT / ``*`` match-all
  (RetrievalWorker.java:336-338);
- filters are non-scoring (Occur.FILTER, Utils.java:303);
- per-field uniform weight 1.0 over ``query.fields``
  (RetrievalWorker.java:341);
- deterministic tie-break: score desc, then ``_id`` asc.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from byzer_retrieval_spark.operators.context import IndexContext
from byzer_retrieval_spark.operators.decode import flat_postings
from byzer_retrieval_spark.plans.query import SearchQuery, parse_keyword


def _repeated_sloppy_ptf(pos_flat: DataFrame, terms, slop: int) -> DataFrame:
    """phrase_tf for a REPEATED-TERM sloppy phrase — the shape the
    window-join chain cannot express (it would let one physical
    position serve two slots of the repeated term; Lucene
    SloppyPhraseMatcher requires distinct positions per slot,
    advanceRepeats). Collects each candidate doc's per-term position
    arrays (rows already bounded by the term filter — one row per
    (field, doc, term)) and counts valid anchors with the engine's
    injective greedy checker in one Arrow-batched pandas UDF. Returns
    DataFrame(field, __docid, dl, __ptf > 0)."""
    uniq = list(dict.fromkeys(terms))
    terms_t, slop_c = tuple(terms), int(slop)

    @F.pandas_udf("double")
    def _ptf_rep(tp: pd.Series) -> pd.Series:
        from byzer_retrieval_spark.operators.wand import _sloppy_anchor_ok

        out = []
        for entries in tp:
            pbt = {
                e["term"]: sorted(int(p) for p in e["positions"])
                for e in entries
            }
            # each anchor weighs 1/(L+1) with L its minimal window
            # length (round 5 — Lucene sloppyFreq, injective per L)
            total = 0.0
            for p0 in pbt.get(terms_t[0], ()):
                for L in range(slop_c + 1):
                    if _sloppy_anchor_ok(terms_t, pbt, p0, L):
                        total += 1.0 / (L + 1)
                        break
            out.append(total)
        return pd.Series(out, dtype="float64")

    return (
        pos_flat.filter(F.col("term").isin(uniq))
        .groupBy("field", "__docid", "dl")
        .agg(F.collect_list(F.struct("term", "positions")).alias("__tp"))
        .filter(F.size("__tp") == F.lit(len(uniq)))
        .select("field", "__docid", "dl", _ptf_rep("__tp").alias("__ptf"))
        .filter(F.col("__ptf") > 0)
    )


def _candidate_docs(ctx: IndexContext, query: SearchQuery) -> Optional[DataFrame]:
    """docs restricted by the (non-scoring) filter tree; None = no filter.
    Analyzed-field leaves resolve through postings membership
    (operators/filtering.filtered_docs)."""
    from byzer_retrieval_spark.operators.filtering import filtered_docs

    return filtered_docs(ctx, query.filters)


def search_df(ctx: IndexContext, query: SearchQuery) -> DataFrame:
    """Top-k search → DataFrame(_score, _id, stored fields...), ordered."""
    parsed = parse_keyword(query.keyword, ctx.analyzer)
    fields = [f for f in (query.fields or ctx.analyzed_fields) if f in ctx.analyzed_fields]
    k = query.limit

    docs = ctx.docs()
    stored = ctx.stored_columns()

    if parsed.match_all:
        cand = _candidate_docs(ctx, query)
        base = cand if cand is not None else docs
        base = ctx.exclude_tombstones(base)
        out = base.withColumn("_score", F.lit(1.0))
        return (
            out.orderBy(F.col("_score").desc(), F.col("_id").asc())
            .limit(k)
            .select("_score", *stored)
        )

    if parsed.empty or (
        not parsed.scoring_terms
        and not parsed.scoring_phrases
        and not parsed.scoring_prefixes
        and not parsed.scoring_fuzzies
        and not parsed.scoring_nears
        and not parsed.scoring_bool_groups
    ):
        # no scoring clauses (incl. pure-negative queries): Lucene's
        # BooleanQuery with only prohibited clauses matches nothing
        return (
            docs.select(F.lit(0.0).alias("_score"), *stored).limit(0)
        )

    all_terms = list(
        dict.fromkeys(parsed.scoring_terms + parsed.must_not + parsed.phrase_terms)
    )
    scoring = set(parsed.scoring_terms)
    must = set(parsed.must)
    must_not = set(parsed.must_not)
    phrase_specs = (
        [(f"__pm{i}", p, "must", 0) for i, p in enumerate(dict.fromkeys(parsed.must_phrases))]
        + [(f"__ps{i}", p, "should", 0) for i, p in enumerate(parsed.dedup_should_phrases)]
        + [(f"__pn{i}", p, "not", 0) for i, p in enumerate(dict.fromkeys(parsed.not_phrases))]
        + [(f"__nm{i}", p, "must", s) for i, (p, s) in enumerate(dict.fromkeys(parsed.must_near_phrases))]
        + [(f"__ns{i}", p, "should", s) for i, (p, s) in enumerate(parsed.dedup_should_nears)]
        + [(f"__nn{i}", p, "not", s) for i, (p, s) in enumerate(dict.fromkeys(parsed.not_near_phrases))]
    )
    prefix_specs = (
        [(f"__xm{i}", p, "must") for i, p in enumerate(dict.fromkeys(parsed.must_prefixes))]
        + [(f"__xs{i}", p, "should") for i, p in enumerate(parsed.dedup_should_prefixes)]
        + [(f"__xn{i}", p, "not") for i, p in enumerate(dict.fromkeys(parsed.not_prefixes))]
    )
    # fuzzy clauses expand against the term dictionary first (Lucene's
    # FuzzyQuery automaton walk ≙ a scan of the tiny stats table), then
    # behave as constant-score term-set clauses
    from byzer_retrieval_spark.operators.filtering import expand_fuzzy

    fuzzy_items = (
        [(f"__zm{i}", p, "must") for i, p in enumerate(dict.fromkeys(parsed.must_fuzzies))]
        + [(f"__zs{i}", p, "should") for i, p in enumerate(parsed.dedup_should_fuzzies)]
        + [(f"__zn{i}", p, "not") for i, p in enumerate(dict.fromkeys(parsed.not_fuzzies))]
    )
    fuzzy_specs = [
        (key, expand_fuzzy(ctx, fields, w, n), kind)
        for key, (w, n), kind in fuzzy_items
    ]

    # ---- nested boolean groups (round 4): group-local +/- members ----
    # Each member becomes a contrib clause (terms keep their own key;
    # phrase/prefix/fuzzy members get per-group pseudo-keys with kind
    # "group" so they are NOT added to the top-level scoring/must/not
    # sets); the group's match + conditional score are evaluated as
    # per-group aggregates over the same contrib frame — one groupBy,
    # no extra shuffle.
    bg_phrase_terms: List[str] = []
    bg_term_members: List[str] = []
    bg_key_lists = []  # (kind, should_keys, must_keys, not_keys)
    for gi, (gkind, g_sh, g_mu, g_no) in enumerate(parsed.bool_groups):
        key_lists = {"should": [], "must": [], "not": []}
        for role, g_members in (("should", g_sh), ("must", g_mu), ("not", g_no)):
            for mj, m in enumerate(g_members):
                if m[0] == "term":
                    key_lists[role].append(m[1])
                    bg_term_members.append(m[1])
                elif m[0] == "phrase":
                    key = f"__bg{gi}{role[0]}p{mj}"
                    phrase_specs.append((key, m[1], "group", m[2]))
                    bg_phrase_terms.extend(m[1])
                    key_lists[role].append(key)
                elif m[0] == "prefix":
                    key = f"__bg{gi}{role[0]}x{mj}"
                    prefix_specs.append((key, m[1], "group"))
                    key_lists[role].append(key)
                else:
                    key = f"__bg{gi}{role[0]}z{mj}"
                    fuzzy_specs.append(
                        (key, expand_fuzzy(ctx, fields, m[1], m[2]), "group")
                    )
                    key_lists[role].append(key)
        bg_key_lists.append(
            (gkind, key_lists["should"], key_lists["must"], key_lists["not"])
        )
    if bg_term_members or bg_phrase_terms:
        all_terms = list(
            dict.fromkeys(all_terms + bg_term_members + bg_phrase_terms)
        )

    # member-descriptor → clause key (for +(...) group gates whose
    # members are phrases/prefixes/fuzzies: the gate references the
    # member CLAUSE's pseudo-term key in the contrib frame)
    key_of = {}
    for kkey, p, kind, s in phrase_specs:
        key_of.setdefault(("phrase", p, s), kkey)
    for kkey, st, kind in prefix_specs:
        key_of.setdefault(("prefix", st), kkey)
    for kkey, (w, n_), kind in fuzzy_items:
        key_of.setdefault(("fuzzy", w, n_), kkey)
    group_lists = [
        [m[1] if m[0] == "term" else key_of[m] for m in g]
        for g in parsed.any_groups_ext
    ]
    for pkey, kind in (
        [(k_, kd) for k_, _, kd, _ in phrase_specs]
        + [(k_, kd) for k_, _, kd in prefix_specs + fuzzy_specs]
    ):
        if kind in ("should", "must"):
            scoring.add(pkey)
        if kind == "must":
            must.add(pkey)
        if kind == "not":
            must_not.add(pkey)

    blocks = ctx.postings().filter(
        F.col("field").isin(fields) & F.col("term").isin(all_terms)
    )
    flat = flat_postings(blocks)

    # tiny per-(field,term) stats → broadcast join. per_shard_stats
    # mode (reference numNodes>1 parity): df comes from the SAME
    # term-pruned blocks scan aggregated per shard, N/avgdl from the
    # snapshot's per-shard entries, and every stats join keys on
    # shard_id too — each shard scores like an independent index.
    per_shard = ctx.per_shard_stats
    if per_shard:
        stats = blocks.groupBy("field", "term", "shard_id").agg(
            F.sum("df_block").alias("df")
        )
        fs_rows = [
            (f, int(s), int(st["n_docs"]), float(st["avgdl"]))
            for f in fields
            for s, st in ctx.shard_field_stats(f).items()
        ]
        fstats = ctx.spark.createDataFrame(
            fs_rows, "field string, shard_id int, n_docs long, avgdl double"
        )
        stats = stats.join(fstats, ["field", "shard_id"])
        stat_keys = ["field", "term", "shard_id"]
    else:
        stats = ctx.stats().filter(
            F.col("field").isin(fields) & F.col("term").isin(all_terms)
        )
        fs_rows = [
            (f, ctx.n_docs(f), ctx.avgdl(f)) for f in fields
        ]
        fstats = ctx.spark.createDataFrame(
            fs_rows, "field string, n_docs long, avgdl double"
        )
        stats = stats.join(fstats, "field")
        stat_keys = ["field", "term"]

    k1, b = ctx.k1, ctx.b
    scored = flat.join(F.broadcast(stats), stat_keys).withColumn(
        "idf",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ),
    )
    scored = scored.withColumn(
        "part_score",
        F.col("idf")
        * (
            F.col("tf")
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            )
        ),
    )

    contrib = scored.select("__docid", "term", "part_score")

    # ---- phrase clauses: position-join verification ----------------------
    # Lucene PhraseQuery parity: phrase_tf = count of exact slop-0
    # occurrences (positions of member j shifted by -j, equi-joined);
    # idf = Σ idf(member) with multiplicity (BM25Similarity.idfExplain
    # over the phrase's TermStatistics array); tfnorm as for terms.
    if phrase_specs:
        from collections import Counter

        pos_flat = flat_postings(
            ctx.postings().filter(
                F.col("field").isin(fields)
                & F.col("term").isin(
                    list(dict.fromkeys(list(parsed.phrase_terms) + bg_phrase_terms))
                )
            ),
            with_positions=True,
        )
        for pkey, terms, kind, slop in phrase_specs:
            # repeated-term sloppy phrase (round 4): exists-joins cannot
            # express the injective (distinct-position) assignment
            # Lucene requires — see wand._sloppy_anchor_ok — so that
            # shape verifies per-doc position arrays in ONE
            # Arrow-batched pandas UDF instead of the window-join chain.
            rep = slop > 0 and len(set(terms)) < len(terms)
            if rep:
                ptf = _repeated_sloppy_ptf(pos_flat, terms, slop)
            joined = None
            for j, t in [] if rep else list(enumerate(terms)):
                pj = pos_flat.filter(F.col("term") == t).select(
                    "field",
                    "__docid",
                    *(["dl"] if j == 0 else []),
                    F.explode("positions").alias("__p"),
                )
                if j == 0:
                    pj = pj.withColumn("__p0", F.col("__p") - F.lit(j)).drop("__p")
                    if slop > 0:
                        # NEAR (round 5, Lucene sloppyFreq): a match is
                        # a WINDOW [w, w+L] (L <= slop) of offset-
                        # adjusted positions covering the anchor and
                        # one position of every member; the anchor's
                        # weight is 1/(Lmin+1) — enumerate every
                        # (L, window start) pair that covers the anchor
                        pj = pj.withColumn(
                            "__L",
                            F.explode(F.sequence(F.lit(0), F.lit(slop))),
                        ).withColumn(
                            "__w",
                            F.explode(
                                F.sequence(
                                    F.col("__p0") - F.col("__L"), F.col("__p0")
                                )
                            ),
                        )
                    joined = pj
                elif slop == 0:
                    # exact path: member j's start candidate is __p - j
                    pj = pj.withColumn("__p0", F.col("__p") - F.lit(j)).drop("__p")
                    joined = joined.join(pj, ["field", "__docid", "__p0"])
                else:
                    # member j's adjusted position must land in the
                    # window; distinct after EACH join keeps rows
                    # bounded (exists-semantics, no fanout)
                    pj = pj.withColumnRenamed("__p", "__pj")
                    joined = (
                        joined.join(pj, ["field", "__docid"])
                        .filter(
                            (F.col("__pj") - F.lit(j)).between(
                                F.col("__w"), F.col("__w") + F.col("__L")
                            )
                        )
                        .select("field", "__docid", "dl", "__p0", "__L", "__w")
                        .distinct()
                    )
            if not rep:
                if slop > 0:
                    # per anchor: minimal satisfied window length →
                    # weight 1/(Lmin+1); phrase_tf = Σ anchor weights
                    anchors = joined.groupBy(
                        "field", "__docid", "dl", "__p0"
                    ).agg(F.min("__L").alias("__Lmin"))
                    ptf = anchors.groupBy("field", "__docid", "dl").agg(
                        F.sum(
                            F.lit(1.0) / (F.col("__Lmin") + F.lit(1.0))
                        ).alias("__ptf")
                    )
                else:
                    ptf = joined.groupBy("field", "__docid", "dl").agg(
                        F.count("*").alias("__ptf")
                    )
            mult = ctx.spark.createDataFrame(
                [(t, c) for t, c in Counter(terms).items()],
                "term string, __mult int",
            )
            idf_p = (
                stats.join(F.broadcast(mult), "term")
                .withColumn(
                    "__idf",
                    F.log(
                        F.lit(1.0)
                        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                        / (F.col("df") + F.lit(0.5))
                    ),
                )
                .groupBy(
                    *(["field", "shard_id", "avgdl"] if per_shard
                      else ["field", "avgdl"])
                )
                .agg(F.sum(F.col("__idf") * F.col("__mult")).alias("__idf_sum"))
            )
            if per_shard:
                # ptf frames carry only (field, __docid, dl): derive the
                # doc's shard from the docid's top bits for the
                # shard-keyed idf join
                ptf = ptf.withColumn(
                    "shard_id",
                    F.shiftright(F.col("__docid"), ctx.doc_bits).cast("int"),
                )
            pc = ptf.join(
                F.broadcast(idf_p),
                ["field", "shard_id"] if per_shard else ["field"],
            ).select(
                "__docid",
                F.lit(pkey).alias("term"),
                (
                    F.col("__idf_sum")
                    * (
                        F.col("__ptf")
                        / (
                            F.col("__ptf")
                            + F.lit(k1)
                            * (
                                F.lit(1.0 - b)
                                + F.lit(b) * F.col("dl") / F.col("avgdl")
                            )
                        )
                    )
                ).alias("part_score"),
            )
            contrib = contrib.unionByName(pc)

    # ---- prefix clauses: CONSTANT_SCORE multi-term expansion -------------
    # Lucene's SimpleQueryParser builds one PrefixQuery per field; with
    # the default constant-score rewrite a matching doc contributes
    # boost=1.0 per field-clause (not BM25 of the expanded terms). The
    # startswith predicate pushes to the postings scan (StringStartsWith
    # → parquet row-group pruning on term-sorted blocks).
    const_score_preds = [
        (pkey, F.col("term").startswith(stem)) for pkey, stem, kind in prefix_specs
    ] + [
        (pkey, F.col("term").isin(list(terms)) if terms else F.lit(False))
        for pkey, terms, kind in fuzzy_specs
    ]
    for pkey, pred in const_score_preds:
        match = (
            flat_postings(
                ctx.postings().filter(F.col("field").isin(fields) & pred)
            )
            .select("field", "__docid")
            .distinct()
        )
        pc = match.select(
            "__docid", F.lit(pkey).alias("term"), F.lit(1.0).alias("part_score")
        )
        contrib = contrib.unionByName(pc)

    group_aggs = [
        F.max(
            F.when(F.col("term").isin(list(g)), F.lit(1)).otherwise(F.lit(0))
        ).alias(f"__anyg{i}")
        for i, g in enumerate(group_lists)
    ]
    # nested-boolean-group aggregates: per group, the conditional score
    # (sum over must+should member clauses), the distinct-must count,
    # the any-not flag and the any-scoring-member flag — all over the
    # SAME contrib rows, so a member that is also a top-level clause
    # scores in both places (exactly Lucene's two separate clauses)
    bool_aggs = []
    for gi, (gkind, sh_k, mu_k, no_k) in enumerate(bg_key_lists):
        sc_k = list(dict.fromkeys(mu_k + sh_k))
        bool_aggs += [
            F.sum(
                F.when(F.col("term").isin(sc_k), F.col("part_score")).otherwise(
                    F.lit(0.0)
                )
            ).alias(f"__bg{gi}_score"),
            F.count_distinct(
                F.when(F.col("term").isin(list(set(mu_k))), F.col("term"))
            ).alias(f"__bg{gi}_must"),
            F.max(
                F.when(F.col("term").isin(list(set(no_k))), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias(f"__bg{gi}_not"),
            F.max(
                F.when(F.col("term").isin(sc_k), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__bg{gi}_has"),
        ]
    agg = contrib.groupBy("__docid").agg(
        F.sum(
            F.when(F.col("term").isin(list(scoring)), F.col("part_score")).otherwise(
                F.lit(0.0)
            )
        ).alias("_score"),
        F.count_distinct(
            F.when(F.col("term").isin(list(must)), F.col("term"))
        ).alias("__must_cnt"),
        F.max(
            F.when(F.col("term").isin(list(must_not)), F.lit(1)).otherwise(F.lit(0))
        ).alias("__has_not"),
        F.max(
            F.when(F.col("term").isin(list(scoring)), F.lit(1)).otherwise(F.lit(0))
        ).alias("__has_match"),
        *group_aggs,
        *bool_aggs,
    )
    # per-bool-group match predicate: all musts, no nots, and (when no
    # musts) at least one scoring member (Lucene nested BooleanQuery)
    bg_matched = []
    for gi, (gkind, sh_k, mu_k, no_k) in enumerate(bg_key_lists):
        n_mu = len(set(mu_k))
        m = (F.col(f"__bg{gi}_must") == F.lit(n_mu)) & (
            F.col(f"__bg{gi}_not") == F.lit(0)
        )
        if n_mu == 0:
            m = m & (F.col(f"__bg{gi}_has") == F.lit(1))
        bg_matched.append((gkind, m))
    has_match = F.col("__has_match") == F.lit(1)
    for gkind, m in bg_matched:
        if gkind in ("should", "must"):
            # a doc matching only a nested group matches the query
            has_match = has_match | m
    gate = (
        (F.col("__must_cnt") == F.lit(len(must)))
        & (F.col("__has_not") == F.lit(0))
        & has_match
    )
    for i in range(len(group_lists)):
        # +(a b) gate: at least one group member matched (must-ANY) —
        # members may be terms or phrase/prefix/fuzzy clause keys
        gate = gate & (F.col(f"__anyg{i}") == F.lit(1))
    for gkind, m in bg_matched:
        if gkind == "must":
            gate = gate & m
        elif gkind == "not":
            gate = gate & ~m
    # the group's score joins the sum ONLY when the group matches
    score_col = F.col("_score")
    for gi, (gkind, m) in enumerate(bg_matched):
        if gkind in ("should", "must"):
            score_col = score_col + F.when(
                m, F.col(f"__bg{gi}_score")
            ).otherwise(F.lit(0.0))
    if bg_matched:
        agg = agg.withColumn("_score", score_col)
    agg = agg.filter(gate)
    agg = ctx.exclude_tombstones(agg)

    cand = _candidate_docs(ctx, query)
    if cand is not None:
        agg = agg.join(cand.select("__docid"), "__docid", "left_semi")

    # exact tie-break needs _id: join the 2-column (doc_id,_id) projection
    # (columnar prune at the docs scan), take global top-k, THEN
    # broadcast-join the k winners back for stored-field materialization.
    # The join carries shard_id (= docid high bits, the docs PARTITION
    # column) so dynamic partition pruning scans only winner shards.
    topk = (
        agg.select("__docid", "_score")
        .join(docs.select("__docid", "_id"), "__docid")
        .orderBy(F.col("_score").desc(), F.col("_id").asc())
        .limit(k)
        .select(
            F.shiftright(F.col("__docid"), ctx.doc_bits).cast("int").alias("shard_id"),
            "__docid",
            "_score",
        )
    )
    out = docs.join(F.broadcast(topk), ["shard_id", "__docid"])
    return (
        out.orderBy(F.col("_score").desc(), F.col("_id").asc())
        .select("_score", *stored)
    )


def filter_query(
    ctx: IndexContext, query: SearchQuery, per_shard_limit: bool = False
) -> DataFrame:
    """Filter-mode query: no scoring, boolean tree + multi-sort + limit
    (reference: LocalRetrievalMaster.filter / RetrievalWorker.java:273-307).

    Deviation noted in SURVEY §2.1 L4: the reference applies ``limit``
    PER SHARD and concatenates (up to shards×limit rows,
    RetrievalWorker.java:291-294 with no master re-limit). Our default
    is one global limit — the semantically-useful behavior.
    ``per_shard_limit=True`` reproduces the reference exactly: top
    ``limit`` rows per shard by the sort order, concatenated, globally
    re-sorted (the master's comparator re-sort, RetrievalMaster.java:
    225-247) but NOT re-limited.
    """
    from byzer_retrieval_spark.operators.filtering import filtered_docs
    from byzer_retrieval_spark.plans.query import sorts_to_columns

    docs = ctx.docs()
    cand = filtered_docs(ctx, query.filters)
    out = cand if cand is not None else docs
    out = ctx.exclude_tombstones(out)
    sort_cols = sorts_to_columns(query.sorts)
    if per_shard_limit and query.limit:
        from pyspark.sql import Window

        w = Window.partitionBy("shard_id").orderBy(
            *(sort_cols + [F.col("_id").asc()])
        )
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= query.limit)
            .drop("__rn")
        )
        return out.orderBy(*(sort_cols + [F.col("_id").asc()])).select(
            *ctx.stored_columns()
        )
    # always end with _id asc for determinism
    out = out.orderBy(*(sort_cols + [F.col("_id").asc()]))
    if query.limit:
        out = out.limit(query.limit)
    return out.select(*ctx.stored_columns())

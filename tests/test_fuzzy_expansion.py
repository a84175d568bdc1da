"""Fuzzy dictionary expansion: the Lucene FuzzyQuery 50-term cap and
the length-band pre-filter (operators/filtering.expand_fuzzy)."""

import pytest
from pyspark.sql import functions as F

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.filtering import expand_fuzzy
from byzer_retrieval_spark.operators.indexer import IndexConfig


@pytest.fixture(scope="module")
def fuzz_engine(spark, tmp_path_factory):
    terms = [f"zw{i:02d}" for i in range(1, 100)]  # zw01..zw99
    rows = [
        {"_id": str(i), "content": t} for i, t in enumerate(terms)
    ] + [{"_id": "x", "content": "unrelated_longword_far_away"}]
    eng = RetrievalEngine(spark, str(tmp_path_factory.mktemp("fz")))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    return eng


def test_cap_keeps_the_closest_terms(fuzz_engine):
    ctx = fuzz_engine.ctx()
    got = expand_fuzzy(ctx, ["content"], "zw00", 2)
    assert len(got) == 50  # Lucene FuzzyQuery maxExpansions default
    # every distance-1 term survives the cap (closest first)
    d1 = {f"zw0{i}" for i in range(1, 10)} | {f"zw{i}0" for i in range(1, 10)}
    assert d1 <= set(got)
    # the distance-2 fill is the lexicographically smallest remainder
    d2_kept = sorted(set(got) - d1)
    all_terms = [f"zw{i:02d}" for i in range(1, 100)]
    d2_expected = sorted(set(all_terms) - d1)[: 50 - len(d1)]
    assert d2_kept == d2_expected


def test_uncapped_and_band(fuzz_engine):
    ctx = fuzz_engine.ctx()
    got = expand_fuzzy(ctx, ["content"], "zw00", 2, max_expansions=1000)
    assert len(got) == 99  # every zwXY; the long word is band-pruned
    assert "unrelated_longword_far_away" not in got
    # distance 1 only
    got1 = expand_fuzzy(ctx, ["content"], "zw00", 1, max_expansions=1000)
    assert set(got1) == (
        {f"zw0{i}" for i in range(1, 10)} | {f"zw{i}0" for i in range(1, 10)}
    )


def test_transposition_is_one_edit(spark, tmp_path):
    """Damerau parity (round 4, Lucene transpositions=true): 'form' is
    ONE edit from 'from' (classic Levenshtein says two), so form~1 must
    match docs containing 'from' — and the search path must agree with
    both the expansion and the python oracle."""
    from byzer_retrieval_spark.functions.editdist import osa_distance
    from byzer_retrieval_spark.plans.query import SearchQuery

    assert osa_distance("form", "from") == 1
    assert osa_distance("abcd", "abcd") == 0
    assert osa_distance("ca", "abc") == 3  # OSA (restricted) semantics

    rows = [
        {"_id": "1", "content": "from x import y"},
        {"_id": "2", "content": "form submitted"},
        {"_id": "3", "content": "wholly unrelated words"},
    ]
    eng = RetrievalEngine(spark, str(tmp_path / "dlx"))
    eng.build(
        spark.createDataFrame(rows),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    got = expand_fuzzy(eng.ctx(), ["content"], "form", 1)
    assert "from" in got and "form" in got
    hits = [
        r["_id"]
        for r in eng.search(
            SearchQuery(keyword="form~1", fields=["content"], limit=10)
        ).collect()
    ]
    assert set(hits) == {"1", "2"}


def test_expand_many_matches_single(fuzz_engine):
    """expand_fuzzy_many (round 5 — ONE job for a whole batch's fuzzy
    specs) must return exactly what per-spec expand_fuzzy returns,
    including the closest-50 deterministic cap."""
    from byzer_retrieval_spark.operators.filtering import expand_fuzzy_many

    ctx = fuzz_engine.ctx()
    items = [
        (("content",), "zw00", 2),
        (("content",), "zw00", 1),
        (("content",), "zw55", 1),
        (("content",), "nomatchxx", 1),
    ]
    many = expand_fuzzy_many(ctx, items)
    assert set(many) == set(items)
    for flds, w, n in items:
        assert many[(flds, w, n)] == expand_fuzzy(ctx, list(flds), w, n), (w, n)


def test_batch_fuzzy_expansion_is_one_job(fuzz_engine):
    """A batch with many DISTINCT fuzzies must not pay one expansion job
    per spec: the pre-pass runs expand_fuzzy_many once. Evidence: spark
    job count during batch_search plan build stays constant-ish (2
    jobs: expansion + gate-free scan deferral) instead of ~N."""
    from byzer_retrieval_spark.operators.batch import batch_search
    from byzer_retrieval_spark.plans.query import SearchQuery

    ctx = fuzz_engine.ctx()
    sc = ctx.spark.sparkContext
    tracker = sc.statusTracker()
    words = [f"zw{i:02d}" for i in range(10, 30)]  # 20 distinct fuzzies
    qs = [
        SearchQuery(keyword=f"{w}~1", fields=["content"], limit=5)
        for w in words
    ]
    sc.setJobGroup("fz-build", "batch plan build")
    try:
        df = batch_search(ctx, qs)  # plan build (expansion happens here)
    finally:
        sc.setJobGroup(None, None)
    jobs_during_build = len(tracker.getJobIdsForGroup("fz-build") or [])
    # ONE expand_fuzzy_many collect plus its broadcast-exchange side
    # jobs — constant in the number of specs; the per-spec path
    # scheduled >= 20 (one per distinct fuzzy)
    assert jobs_during_build <= 8, jobs_during_build
    rows = df.collect()
    assert {r["query_id"] for r in rows} == set(range(len(qs)))

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

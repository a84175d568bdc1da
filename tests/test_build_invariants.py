"""Index-build invariants (SURVEY §5.3) + content-sha256 end-to-end
equality (BASELINE.json input_hint per-row invariant)."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from byzer_retrieval_spark.operators.decode import flat_postings


def test_content_sha256_end_to_end(corpus_engine, corpus_rows):
    ctx = corpus_engine.ctx()
    got = {
        r["_id"]: r["content_sha256"]
        for r in ctx.docs().select("_id", "content_sha256").collect()
    }
    assert len(got) == len(corpus_rows)
    for row in corpus_rows:
        exp = hashlib.sha256(row["content"].encode()).hexdigest()
        assert got[row["_id"]] == exp


def test_posting_lists_strictly_increasing(corpus_engine):
    ctx = corpus_engine.ctx()
    flat = flat_postings(ctx.postings()).select("field", "term", "__docid")
    pdf = flat.toPandas()
    for (_, _), g in pdf.groupby(["field", "term"]):
        ids = g["__docid"].to_numpy()
        ids.sort()
        assert (np.diff(ids) > 0).all(), "duplicate doc in a posting list"


def test_df_consistency(corpus_engine):
    # sum(stats.df) == count(distinct (field, term, doc))
    ctx = corpus_engine.ctx()
    stats_sum = ctx.stats().agg(F.sum("df")).collect()[0][0]
    distinct = (
        flat_postings(ctx.postings())
        .select("field", "term", "__docid")
        .distinct()
        .count()
    )
    assert stats_sum == distinct


def test_dl_matches_tokenization(corpus_engine, corpus_rows):
    from byzer_retrieval_spark.functions.analyzer import tokenize_py

    ctx = corpus_engine.ctx()
    got = {
        r["_id"]: r["dl_content"]
        for r in ctx.docs().select("_id", "dl_content").collect()
    }
    for row in corpus_rows:
        assert got[row["_id"]] == len(tokenize_py(row["content"]))


def test_block_metadata_bounds(corpus_engine):
    """(max_tf, min_dl) block stats must bound the block's postings —
    the WAND upper bound depends on this."""
    ctx = corpus_engine.ctx()
    pdf = ctx.postings().limit(500).toPandas()
    from byzer_retrieval_spark.operators.decode import decode_rows

    docs, tfs, dls, lens = decode_rows(
        pdf["doc_gaps"], pdf["tfs"], pdf["dls"], pdf["first_doc"]
    )
    off = 0
    for i, n in enumerate(lens):
        seg_tf = tfs[off : off + n]
        seg_dl = dls[off : off + n]
        seg_doc = docs[off : off + n]
        assert seg_tf.max() == pdf["max_tf"].iloc[i]
        assert seg_dl.min() == pdf["min_dl"].iloc[i]
        assert seg_doc[0] == pdf["first_doc"].iloc[i]
        assert seg_doc[-1] == pdf["last_doc"].iloc[i]
        assert len(seg_doc) == pdf["df_block"].iloc[i]
        off += n


def test_hot_terms_were_split(corpus_engine):
    """Salted per-term posting splits (north_star): 'import' (df≈N=200,
    threshold 64) must occupy multiple non-overlapping doc-range groups
    per shard — visible as multiple blocks whose ranges don't interleave
    incorrectly (sorted by first_doc, last_doc[i] < first_doc[i+1])."""
    ctx = corpus_engine.ctx()
    pdf = (
        ctx.postings()
        .filter((F.col("term") == "import") & (F.col("field") == "content"))
        .select("shard_id", "first_doc", "last_doc")
        .toPandas()
    )
    assert len(pdf) >= 2
    for _, g in pdf.groupby("shard_id"):
        g = g.sort_values("first_doc")
        lasts = g["last_doc"].to_numpy()[:-1]
        firsts = g["first_doc"].to_numpy()[1:]
        assert (lasts < firsts).all(), "blocks overlap in doc-id space"


def test_shard_manifests_lineage(corpus_engine):
    store = corpus_engine.store()
    manifests = store.read_shard_manifests()
    assert len(manifests) == 4
    for m in manifests.values():
        assert m["complete"]
        assert m["fingerprint"]["count"] > 0
        assert m["metrics"]["docs"] > 0
        assert m["metrics"]["postings"] > 0
    snap = store.current_snapshot()
    assert snap["n_docs"] == 200
    assert "avgdl" in snap["field_stats"]["content"]


def test_python_xxhash64_matches_jvm(spark):
    """routing.xxhash64 is bit-exact vs Spark's F.xxhash64 over random
    strings (lengths straddle the 32-byte stripe + 8/4/1-byte tails,
    plus multi-byte UTF-8) — this is what lets DuckDB oracles predict
    the engine's pmod(xxhash64(_id), n) shard assignment driver-side."""
    import random
    import string

    from byzer_retrieval_spark.functions.routing import engine_shard, xxhash64

    rng = random.Random(11)
    strs = [
        "".join(rng.choices(string.printable[:94], k=L))
        for L in [0, 1, 3, 4, 7, 8, 9, 15, 16, 31, 32, 33, 40, 64, 65, 200]
    ] + [str(i) for i in range(8)] + ["naïve ☃ 日本語", "a b"]
    got = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s",
        F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(7)).alias("m"),
    ).collect()
    for r in got:
        assert xxhash64(r["s"].encode("utf-8")) == r["h"], repr(r["s"])
        assert engine_shard(r["s"], 7) == r["m"], repr(r["s"])

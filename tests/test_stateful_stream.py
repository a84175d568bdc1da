"""applyInPandasWithState occurrence ranking: stream == batch on a
single trigger; ranks continue from state across triggers."""

import shutil
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path_factory.mktemp("events_state")
    shutil.copy(src, d / "part-0.parquet")
    return str(d)


def test_stream_rank_equals_batch(spark, events_path):
    from byzer_retrieval_spark.streaming.stateful import occurrence_rank

    batch_ev = spark.read.parquet(events_path)
    batch = sorted(
        (r["user_id"], r["event_type"], r["ts"], r["occ_rank"], r["first_seen"])
        for r in occurrence_rank(batch_ev).collect()
    )
    stream_ev = spark.readStream.schema(batch_ev.schema).parquet(events_path)
    q = (
        occurrence_rank(stream_ev)
        .writeStream.format("memory")
        .queryName("occ_rank_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["user_id"], r["event_type"], r["ts"], r["occ_rank"], r["first_seen"])
            for r in spark.sql("SELECT * FROM occ_rank_test").collect()
        )
    finally:
        q.stop()
    assert len(got) == len(batch) > 0
    assert got == batch


def test_state_continues_across_triggers(spark, tmp_path):
    """Feeding a second file for the same key must CONTINUE ranks from
    state (the thing a stateless window recomputation cannot do)."""
    from byzer_retrieval_spark.streaming.stateful import occurrence_rank

    d = tmp_path / "inc"
    d.mkdir()
    rows1 = [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:05:00")]
    rows2 = [(1, "2024-01-01 10:10:00"), (1, "2024-01-01 10:12:00")]

    def write(rows, name):
        (
            spark.createDataFrame(rows, ["user_id", "ts_s"])
            .select(
                "user_id",
                F.col("ts_s").cast("timestamp").alias("ts"),
                F.lit("click").alias("event_type"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(str(d))
        )

    write(rows1, "a")
    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    q = (
        occurrence_rank(stream)
        .writeStream.format("memory")
        .queryName("occ_cont_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        write(rows2, "b")
        q.processAllAvailable()
        got = sorted(
            (r["ts"], r["occ_rank"], r["first_seen"])
            for r in spark.sql("SELECT * FROM occ_cont_test").collect()
        )
    finally:
        q.stop()
    assert [g[1] for g in got] == [1, 2, 3, 4]
    assert {g[2] for g in got} == {"2024-01-01 10:00:00"}


def test_incremental_stream_restart_exactly_once(spark, tmp_path):
    """Kill the NRT ingestion stream and restart it from the SAME
    checkpoint: already-ingested files must not re-upsert (offsets are
    checkpointed), new files must, and every doc appears exactly once."""
    import hashlib

    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.plans.query import SearchQuery
    from byzer_retrieval_spark.sources.corpus import gen_rows
    from byzer_retrieval_spark.streaming.incremental import incremental_index_stream

    rows = gen_rows(60)
    for r in rows:
        r["_id"] = hashlib.sha256(
            f"{r['repo']}|{r['path']}|{r['commit']}".encode()
        ).hexdigest()
    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    # base index from the first 20 docs
    eng.build(
        spark.createDataFrame(rows[:20]),
        cfg=IndexConfig(num_shards=2, hot_term_split_threshold=64, id_columns=()),
        resume=False,
    )
    store = eng.store()
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = spark.createDataFrame(rows[:1]).schema

    def run_stream():
        stream = spark.readStream.schema(schema).parquet(str(src_dir))
        q = incremental_index_stream(stream, store, ckpt, trigger_available_now=True)
        q.awaitTermination(120)

    spark.createDataFrame(rows[20:40]).coalesce(1).write.mode("append").parquet(
        str(src_dir)
    )
    run_stream()  # drains file 1, then stops (availableNow)
    mid = eng.search(SearchQuery(keyword="*", fields=["content"], limit=100)).count()
    assert mid == 40

    spark.createDataFrame(rows[40:]).coalesce(1).write.mode("append").parquet(
        str(src_dir)
    )
    run_stream()  # restart from checkpoint: only the new file processes
    final = eng.search(SearchQuery(keyword="*", fields=["content"], limit=100))
    got = [r["_id"] for r in final.collect()]
    assert len(got) == 60 and len(set(got)) == 60


def test_streaming_upsert_keeps_ann_current(spark, tmp_path):
    """engine-aware streaming: batches route through engine.upsert, so
    a persisted ANN index stays CURRENT across micro-batches (appended
    vectors searchable via the ANN path, no exact fallback)."""
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.plans.query import SearchQuery
    from byzer_retrieval_spark.streaming.incremental import incremental_index_stream

    def vec(i):
        v = [0.0] * 8
        v[i % 8] = 1.0
        return v

    rows = [
        {"_id": str(i), "doc_id": i, "text": f"doc number {i}", "embedding": vec(i)}
        for i in range(24)
    ]
    schema = "_id string, doc_id long, text string, embedding array<float>"
    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    eng.build(
        spark.createDataFrame(rows[:12], schema),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("text",), id_columns=()),
        resume=False,
    )
    eng.build_vector_ann(
        "embedding", kind="lsh", num_planes=4, num_tables=2,
        probe={"probe_hamming": 4},  # exhaustive probe = exact results
    )
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ck")
    spark.createDataFrame(rows[12:], schema).coalesce(1).write.mode("append").parquet(str(src))
    q = incremental_index_stream(
        spark.readStream.schema(schema).parquet(str(src)),
        eng.store(),
        ckpt,
        trigger_available_now=True,
        engine=eng,
    )
    q.awaitTermination(120)
    # index still CURRENT after the streamed batch
    assert eng._current_ann(eng.store(), "embedding") is not None
    # a streamed doc is findable through the ANN path with cosine 1.0
    got = eng.search(
        SearchQuery(vector=vec(20), vector_field="embedding", limit=3)
    ).collect()
    assert "20" in {r["_id"] for r in got}
    assert got[0]["_score"] == pytest.approx(1.0, abs=1e-6)

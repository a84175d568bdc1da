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

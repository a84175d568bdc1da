"""Incremental index maintenance via Structured Streaming.

The reference keeps writes visible within ≤1 s without commit through a
``ControlledRealTimeReopenThread`` (reference: RetrievalWorker.java:84-89,
SURVEY §2.1 W8). Spark's analog is a micro-batched stream: each batch of
new/changed documents is upserted as a delta segment (same machinery as
``mutate.upsert`` — tombstone old versions, append postings above the
shard high-water mark), and a snapshot commit makes it visible. Readers
always see the last committed snapshot — Iceberg-style read isolation
instead of Lucene's NRT searcher handoff.

Scale: each micro-batch touches only the shards its _ids route to; the
streaming query checkpoints its own progress (exactly-once per source
offsets) independent of our per-shard build manifests.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from byzer_retrieval_spark.operators import mutate
from byzer_retrieval_spark.sources.storage import IndexStore


def incremental_index_stream(
    stream_df: DataFrame,
    store: IndexStore,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    processing_time: Optional[str] = None,
    engine=None,
) -> StreamingQuery:
    """readStream source of documents → foreachBatch upsert.

    ``trigger_available_now=True`` drains what's available and stops
    (test/batch-catchup mode); pass ``processing_time='1 second'`` for
    the reference-like continuous ≤1s-visibility mode.

    Pass the owning ``RetrievalEngine`` as ``engine`` to route batches
    through ``engine.upsert`` so persisted ANN indexes stay CURRENT
    (vectors append into their buckets/clusters per batch). Without it,
    batches go straight to ``mutate.upsert`` and any ANN index goes
    stale — vector searches then fall back to the exact scan (correct,
    slower) until build_vector_ann re-runs.
    """
    spark = stream_df.sparkSession

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if engine is not None:
            engine.upsert(batch_df, store.database, store.table)
            return
        mutate.upsert(
            spark, store, batch_df, source_desc=f"stream batch {batch_id}"
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()

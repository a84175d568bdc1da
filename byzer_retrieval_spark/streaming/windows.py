"""Event-time window operators (Structured-Streaming-native shapes).

The reference has no streaming surface (SURVEY §2.2) — its only
near-real-time feature is the 1 s searcher-reopen thread
(RetrievalWorker.java:84-89), covered by streaming/incremental.py. These
operators add the event-stream shapes a large-scale training-data /
analytics pipeline needs, written so the SAME function runs in batch
(the driver's correctness oracle) and under ``readStream`` (watermark
attached only when the input is streaming):

- tumbling_event_counts: fixed event-time windows (groupBy F.window —
  partial+final hash aggregate; on streams this is incremental state).
- session_windows: gap-based sessions per key (F.session_window; the
  batch SQL twin is the classic gaps-and-islands form).

Scale: both are single-shuffle aggregations keyed by (window, key);
event-time windows bound state by the watermark on real streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Attach the watermark on streaming inputs. Watermarks require
    TIMESTAMP (not NTZ); under the engine's UTC session the cast is
    wall-clock-preserving, so batch (NTZ) and stream agree."""
    if not events.isStreaming:
        return events
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return src.withWatermark(ts_col, watermark)


def tumbling_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (tumbling window, key): event count + value sum/avg.

    Output: (window_start, <key>, n_events, sum_value, avg_value),
    window_start as 'yyyy-MM-dd HH:mm:ss' (timezone-stable for the
    cross-engine oracle compare).
    """
    src = _with_event_time(events, ts_col, watermark)
    out = (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
    )
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col(key_col),
        "n_events",
        "sum_value",
        "avg_value",
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions per key (session closes after ``gap`` of
    inactivity). Output: (key, session_start, n_events).

    Batch-equivalent SQL (the oracle) is the gaps-and-islands form:
    a new session starts where ts - lag(ts) > gap.
    """
    src = _with_event_time(events, ts_col, watermark)
    out = (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_events"))
    )
    return out.select(
        F.col(key_col),
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    )


def tumbling_sql(table: str, window_minutes: int = 60) -> str:
    """DuckDB twin of tumbling_event_counts (epoch-aligned buckets,
    exactly Spark's F.window alignment)."""
    secs = window_minutes * 60
    # epoch_ms is an integer — epoch(ts)::BIGINT would ROUND fractional
    # seconds and push boundary events into the wrong bucket
    bucket = f"to_timestamp((epoch_ms(ts) // {secs * 1000}) * {secs})"
    return f"""
SELECT strftime({bucket}, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS sum_value,
       round(avg(value), 6) AS avg_value
FROM {table}
GROUP BY 1, 2
"""


def sessions_sql(table: str, gap_minutes: int = 30) -> str:
    """DuckDB twin of session_windows (gaps-and-islands)."""
    return f"""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {gap_minutes} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM {table}
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, sid
"""

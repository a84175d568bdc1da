"""Custom stateful streaming operator: per-key occurrence ranking via
``applyInPandasWithState`` (the arbitrary-stateful-processing slot the
built-in windowed aggregations can't express).

``occurrence_rank`` annotates every event with its occurrence number
within a key (1st, 2nd, ... time this (user, event_type) appeared) plus
the key's first-seen event time. Downstream uses: streaming exact-dedup
(keep occ_rank == 1), burst/abuse detection (rank vs time), training-
data stream dedup with provenance. ``dropDuplicates`` can only KEEP or
DROP — it cannot number occurrences or carry first-seen metadata, and
``session_window`` aggregates rather than annotates; this needs real
per-key state.

The SAME function runs in batch (window functions — the driver's SQL
oracle form) and on a stream (applyInPandasWithState, one state row per
key: (first_seen_ms, occurrences)); a stream processing the input in a
single trigger emits exactly the batch multiset, and across triggers
ranks CONTINUE from state (pytest pins both).

Scale/state story: state is two longs per distinct key, partitioned by
the groupBy hash — 10^9 keys ≈ tens of GB across the cluster's state
stores. EventTimeTimeout evicts a key ``retention`` past its LAST seen
event time once the watermark passes (late events for an evicted key
restart at rank 1 — the standard watermark contract, same tradeoff as
``dropDuplicates`` within watermark).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_FMT = "%Y-%m-%d %H:%M:%S"

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("ts", StringType(), True),
        StructField("occ_rank", IntegerType(), False),
        StructField("first_seen", StringType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("first_seen_ms", LongType(), False),
        StructField("occurrences", LongType(), False),
    ]
)


_UNIT_SECS = {
    "second": 1, "seconds": 1, "sec": 1, "secs": 1,
    "minute": 60, "minutes": 60, "min": 60, "mins": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _ms(interval_str: str) -> int:
    """'<n> <unit>' → milliseconds, accepting the same unit spellings a
    Spark interval/watermark string does (seconds through days)."""
    n, unit = interval_str.strip().split()
    try:
        return int(n) * _UNIT_SECS[unit.lower()] * 1000
    except KeyError:
        raise ValueError(
            f"unsupported retention interval {interval_str!r}; "
            f"use '<n> {'|'.join(sorted(set(_UNIT_SECS)))}'"
        ) from None


def occurrence_rank(
    events: DataFrame,
    ts_col: str = "ts",
    retention: str = "2 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """(user_id, event_type, ts, occ_rank, first_seen) for every event,
    ranked by event time within the (user_id, event_type) key.

    Batch input → window functions; streaming input → the stateful
    pandas operator. Output multisets agree (equal-ts events within a
    key may swap ranks between engines — the rows are otherwise
    identical, so the SET of output rows is deterministic)."""
    if not events.isStreaming:
        wk = Window.partitionBy("user_id", "event_type")
        w = wk.orderBy(F.col(ts_col))
        return events.select(
            "user_id",
            "event_type",
            F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.row_number().over(w).cast("int").alias("occ_rank"),
            F.date_format(F.min(ts_col).over(wk), "yyyy-MM-dd HH:mm:ss").alias(
                "first_seen"
            ),
        )

    retention_ms = _ms(retention)

    def rank_fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(ts_col, kind="stable", ignore_index=True)
        ts_ms = rows[ts_col].astype("int64") // 1_000_000  # ns → ms
        if state.exists:
            first_ms, cnt = state.get
        else:
            first_ms, cnt = int(ts_ms.iloc[0]), 0
        first_ms = min(first_ms, int(ts_ms.iloc[0]))
        ranks = (np.arange(len(rows), dtype=np.int64) + cnt + 1).astype(np.int32)
        cnt += len(rows)
        state.update((int(first_ms), int(cnt)))
        # evict the key `retention` past its LAST event once the
        # watermark passes it
        state.setTimeoutTimestamp(int(ts_ms.iloc[-1]) + retention_ms)
        yield pd.DataFrame(
            {
                "user_id": np.full(len(rows), key[0], dtype=np.int64),
                "event_type": [key[1]] * len(rows),
                "ts": rows[ts_col].dt.strftime(_FMT),
                "occ_rank": ranks,
                "first_seen": pd.Timestamp(first_ms, unit="ms").strftime(_FMT),
            }
        )

    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    )
    return src.groupBy("user_id", "event_type").applyInPandasWithState(
        rank_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


def occurrence_rank_sql(table: str) -> str:
    """DuckDB twin of the batch path (also the stream's single-trigger
    output multiset)."""
    return f"""
SELECT user_id, event_type,
       strftime(ts, '{_FMT}') AS ts,
       row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts)::INT
           AS occ_rank,
       strftime(min(ts) OVER (PARTITION BY user_id, event_type), '{_FMT}')
           AS first_seen
FROM {table}
"""

"""Watermarked event-time analytics over a telemetry/event stream.

The batch registry already proves these semantics against a DuckDB
oracle (events_tumbling_window / events_sessionize); here the same
aggregations run as Structured Streaming with watermarks, which is what
a live 100 TB/day feed needs:
- tumbling window: groupBy(window(ts, size)) with a late-data watermark
  -> incremental state, emitted on watermark advance;
- session window: the built-in `session_window` (gap-based), replacing
  the batch LAG-cumulative-sum sessionization with Spark's native
  stateful operator.

Both are pure built-ins — no applyInPandasWithState needed for these
shapes; custom state would only be required for cross-session logic
Spark cannot express (none in scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window event counts + distinct-ish user count (approx at
    stream time is exact per window here since the key is grouped)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_size).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct(key_col).alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "approx_users",
        )
    )


def stream_session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions per key via the native session_window operator."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("s"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )

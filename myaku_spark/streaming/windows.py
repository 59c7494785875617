"""Watermarked tumbling-window aggregation over an event stream.

The streaming twin of the batch ``events_windowed`` driver query:
``withWatermark`` bounds how long window state is retained and defines
the late-data cutoff — an event older than (max seen ts - watermark) is
DROPPED rather than reopening a finalized window, which is what makes
the operator's state size O(open windows) instead of O(history) at
100 TB/day event volumes. Append output emits each window exactly once,
when the watermark passes its end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """events (user_id, event_id, ts[, value]) stream → per-window,
    per-... window counts. Use output mode 'append' (windows finalize
    at watermark passage)."""
    cols = events_stream.columns
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    if "value" in cols:
        aggs.append(F.round(F.sum("value"), 3).alias("sum_value"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(*aggs)
        .select(F.col("win.start").alias("win_start"), *[
            F.col(a) for a in (["n_events"] + (["sum_value"] if "value" in cols else []))
        ])
    )

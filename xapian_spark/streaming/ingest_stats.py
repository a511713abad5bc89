"""Watermarked ingest statistics — late-data-tolerant windowed counts.

A 100 TB ingest pipeline needs per-window arrival accounting (docs and
bytes per source per time window) that tolerates late events without
keeping unbounded state: the watermark bounds how late a document may
arrive before its window is finalized and its state evicted.  This is
the Structured Streaming windowed-aggregation-with-watermark pattern
over the corpus schema; the reference has no streaming engine, so like
`dedup_stream` this is an engine extension, not a parity item.

State size is O(open windows x sources) — constant in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_stats(
    stream_docs: DataFrame,
    time_col: str = "event_time",
    source_col: str = "source",
    text_col: str = "text",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming (window, source) -> (n_docs, n_chars) counts.

    Events later than `watermark` behind the max seen event time are
    dropped (their window already finalized — the bounded-state
    contract); in `append` output mode a window emits exactly once,
    when the watermark passes its end."""
    return (
        stream_docs.withWatermark(time_col, watermark)
        .groupBy(
            F.window(F.col(time_col), window).alias("win"),
            F.col(source_col).alias("source"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(text_col)).alias("n_chars"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "source", "n_docs", "n_chars",
        )
    )


def windowed_event_stats(
    stream_events: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "6 hours",
) -> DataFrame:
    """Streaming tumbling-window stats keyed by (window, key): event count
    + value sum.  Output key is the epoch-aligned window ordinal
    (`unix_timestamp(window.start) / window_sec`) so a SQL twin can replay
    it as `floor(epoch(ts) / window_sec)` — tumbling windows align to the
    epoch, and TimestampType's internal micros are timezone-free."""
    win_sec = {"6 hours": 21600, "1 hour": 3600, "10 minutes": 600}[window]
    return (
        stream_events.groupBy(
            F.window(F.col(time_col), window).alias("win"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("double")).alias("sum_value"),
        )
        .select(
            (F.unix_timestamp("win.start") / win_sec)
            .cast("long")
            .alias("window_id"),
            "key", "n_events", "sum_value",
        )
    )


def run_bounded_to_table(agg: DataFrame, name: str) -> None:
    """Drive a streaming aggregation over a BOUNDED source to completion:
    trigger(availableNow) processes everything currently in the source and
    stops; complete output mode leaves the full aggregate state in the
    in-memory sink table `name`.  The unbounded/watermarked variants above
    are the production shapes; this one exists so a bounded run's final
    state can be compared against the equivalent batch GROUP BY."""
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


__all__ = ["ingest_stats", "windowed_event_stats", "run_bounded_to_table"]

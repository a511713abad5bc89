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


__all__ = ["ingest_stats"]

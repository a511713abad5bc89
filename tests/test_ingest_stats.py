"""Watermarked windowed ingest stats: windows finalize once the
watermark passes, late-but-tolerated events count, and events later
than the watermark are dropped with their window already emitted."""

from __future__ import annotations

import os
from datetime import datetime

from xapian_spark.streaming.ingest_stats import ingest_stats


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema(
        "event_time timestamp, source string, text string"
    ).parquet(src)
    q = (
        ingest_stats(stream, window="10 minutes", watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r["window_start"].minute, r["source"]): r["n_docs"]
        for r in spark.read.parquet(out).collect()
    }


def test_watermarked_windows(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    os.makedirs(src)
    t = lambda m: datetime(2026, 1, 1, 12, m)  # noqa: E731

    # batch 1: two docs in the 12:00 window, one at 12:35 (advances the
    # max event time to 12:35 -> watermark 12:25 -> 12:00-12:10 final)
    spark.createDataFrame(
        [(t(1), "s1", "aa"), (t(2), "s1", "bbb"), (t(35), "s2", "c")],
        "event_time timestamp, source string, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    got1 = _run(spark, src, ckpt, out)
    # append mode emits only finalized windows: the 12:00 window
    assert got1 == {(0, "s1"): 2}

    # batch 2: a drop-late event at 12:03 (before the 12:25 watermark —
    # its window already emitted) and an on-time one at 12:41; then an
    # event at 13:00 pushes the watermark past 12:50, finalizing the
    # 12:30 and 12:40 windows
    spark.createDataFrame(
        [(t(3), "s1", "dd"), (t(41), "s2", "ee"), (t(59), "s2", "zz")],
        "event_time timestamp, source string, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(datetime(2026, 1, 1, 13, 5), "s3", "y")],
        "event_time timestamp, source string, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = _run(spark, src, ckpt, out)
    # the late 12:03 doc did NOT reopen the finalized 12:00 window
    assert got2[(0, "s1")] == 2
    # on-time windows finalized with their counts; the 12:50 window is
    # still open (watermark 12:55 has not passed its 13:00 end)
    assert got2[(30, "s2")] == 1 and got2[(40, "s2")] == 1
    assert (50, "s2") not in got2


def test_bounded_stream_equals_batch_groupby(spark):
    """The complete-mode final state of a bounded availableNow run must
    equal the batch GROUP BY over the same data — the exact contract the
    stream_window_stats driver entry's SQL oracle relies on."""
    from pyspark.sql import functions as F

    from xapian_spark.streaming.ingest_stats import (
        run_bounded_to_table,
        windowed_event_stats,
    )

    sf = "/root/testdata/sf0.001"
    static = spark.read.parquet(f"{sf}/events.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    run_bounded_to_table(windowed_event_stats(stream), "bounded_eq_sink")
    got = {
        (r["window_id"], r["key"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.table("bounded_eq_sink").collect()
    }
    want = {
        (r["window_id"], r["key"]): (r["n_events"], round(r["sum_value"], 6))
        for r in (
            static.groupBy(
                (F.unix_timestamp("ts") / 21600).cast("long").alias("window_id"),
                F.col("event_type").alias("key"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("double")).alias("sum_value"),
            )
        ).collect()
    }
    assert got == want and len(got) > 50

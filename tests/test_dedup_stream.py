"""Stateful streaming dedup (applyInPandasWithState): first-seen rows
survive, duplicates are suppressed within a batch, across micro-batches,
and across query RESTARTS (state lives in the checkpoint)."""

from __future__ import annotations

import os

from xapian_spark.streaming.dedup_stream import dedup_stream


def _run_batch(spark, src_dir, ckpt, out_dir):
    stream = (
        spark.readStream.schema("id long, text string")
        .parquet(src_dir)
    )
    q = (
        dedup_stream(stream, id_col="id", text_col="text")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        r["id"]: r["n_duplicates"]
        for r in spark.read.parquet(out_dir).collect()
    }


def test_dedup_stream_across_batches_and_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    # batch 1: doc 3 is an in-batch duplicate of doc 1
    spark.createDataFrame(
        [(1, "alpha text"), (2, "bravo text"), (3, "alpha text")],
        "id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    got1 = _run_batch(spark, src, ckpt, out)
    assert set(got1) == {1, 2}
    assert got1[1] == 1  # absorbed doc 3 immediately

    # batch 2 (a RESTARTED query on the same checkpoint): doc 4 repeats
    # doc 1's content and must be suppressed by persisted state; doc 5
    # is new and survives
    spark.createDataFrame(
        [(4, "alpha text"), (5, "charlie text")],
        "id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = _run_batch(spark, src, ckpt, out)
    assert set(got2) == {1, 2, 5}, got2  # cumulative sink; 4 suppressed
    assert got2[5] == 0

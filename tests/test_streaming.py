"""Structured Streaming incremental indexing: micro-batch appends ==
WritableDatabase commits; compact() == xapian-compact; delta-aware query
== multi-shard search (SURVEY §2.7 streaming row)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from xapian_spark.index import merge
from xapian_spark.query import ast
from xapian_spark.query.planner import Planner
from xapian_spark.streaming import incremental


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn("docid", (F.col("doc_id") + 1).cast("long"))
    )


def test_stream_then_compact_equals_batch(spark, corpus, tmp_path):
    src = str(tmp_path / "src")
    wh_stream = str(tmp_path / "wh_stream")
    wh_batch = str(tmp_path / "wh_batch")
    cp = str(tmp_path / "cp")

    # write the corpus as 3 files -> 1 file per micro-batch
    corpus.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental.index_stream(
        stream, wh_stream, cp, content_col="text", docid_col="docid"
    )
    q.awaitTermination(120)
    assert os.path.exists(os.path.join(wh_stream, "delta"))

    # delta-aware query BEFORE compaction sees every doc
    n_delta = (
        incremental.query_with_delta(spark, wh_stream)
        .select("docid").distinct().count()
        if os.path.exists(os.path.join(wh_stream, "runs"))
        else None
    )

    incremental.compact(spark, wh_stream, n_ranges=4, block_size=64)
    assert merge.warehouse_complete(wh_stream)
    assert not os.path.exists(os.path.join(wh_stream, "delta"))

    merge.build_warehouse(
        spark, corpus, wh_batch, content_col="text", docid_col="docid",
        n_ranges=4, block_size=64,
    )
    # identical query results streaming-then-compact vs batch
    for wh in (wh_stream, wh_batch):
        assert merge.warehouse_complete(wh)
    i1 = merge.read_warehouse(spark, wh_stream)
    i2 = merge.read_warehouse(spark, wh_batch)
    assert i1.stats == i2.stats
    node = ast.Or((ast.Term("dup"), ast.Term("vector")))
    r1 = Planner(i1).search(node, k=10).collect()
    r2 = Planner(i2).search(node, k=10).collect()
    assert [(r["docid"], round(r["score"], 9)) for r in r1] == [
        (r["docid"], round(r["score"], 9)) for r in r2
    ]
    assert n_delta is None  # no base runs existed pre-compact in this test


def test_incremental_append_and_replace(spark, corpus, tmp_path):
    """Base warehouse + streamed delta: query_with_delta sees new docs and
    replacement docs without recompaction; compact folds them in."""
    wh = str(tmp_path / "wh_inc")
    cp = str(tmp_path / "cp_inc")
    base = corpus.where(F.col("docid") <= 400)
    merge.build_warehouse(
        spark, base, wh, content_col="text", docid_col="docid",
        n_ranges=4, block_size=64,
    )
    # delta: docs 401.. plus a REPLACEMENT of doc 1
    extra = corpus.where(F.col("docid") > 400)
    replacement = corpus.where(F.col("docid") == 1).withColumn(
        "text", F.lit("zzzunique replacement text")
    )
    src = str(tmp_path / "src_inc")
    extra.unionByName(replacement).write.parquet(src)
    stream = (
        spark.readStream.schema(corpus.schema).parquet(src)
    )
    q = incremental.index_stream(
        stream, wh, cp, content_col="text", docid_col="docid"
    )
    q.awaitTermination(120)

    view = incremental.query_with_delta(spark, wh)
    assert view.select("docid").distinct().count() == 500
    # replaced doc 1: old terms gone, new term present
    d1 = view.where(F.col("docid") == 1)
    terms = {r["term"] for r in d1.collect()}
    assert "zzzunique" in terms and "replacement" in terms

    incremental.compact(spark, wh, n_ranges=4, block_size=64)
    idx = merge.read_warehouse(spark, wh)
    assert idx.stats.doccount == 500
    t = idx.collect_term_stats(["zzzunique"])["zzzunique"]
    assert t.tf == 1

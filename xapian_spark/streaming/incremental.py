"""Incremental (streaming) index maintenance.

The reference has no streaming engine; its incremental story is
`WritableDatabase::add_document` + periodic `commit()` (Inverter flush,
glass_inverter.h:43-170) and offline `xapian-compact` merges
(glass_compact.cc:80-340).  The Structured Streaming re-expression:

  micro-batch (readStream -> foreachBatch)  ==  a WritableDatabase commit:
      tokenize+map-side-invert the batch and APPEND its termlists to
      {path}/delta/ (cheap, no global shuffle, no index rewrite)
  compact(path)                             ==  xapian-compact:
      fold {path}/delta/ into {path}/termlists and rebuild the term-major
      runs + blocked ranges + stats through the SAME checkpointed stages
      as the batch build (merge._stages_1_to_3)

Queries between compactions can read base + delta (query_with_delta) the
way the reference searches multiple shards together (unshard,
postlisttree.h:129-131).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xapian_spark.index import merge as m
from xapian_spark.index.builder import invert_arrow


def _batch_termlists(
    batch: DataFrame,
    content_col: str,
    docid_col: str,
    mode: str,
) -> DataFrame:
    src = batch.withColumn(
        "docid", F.col(docid_col).cast("long")
    ).withColumn(
        "content_sha256", F.sha2(F.col(content_col).cast("binary"), 256)
    )
    return invert_arrow(
        src.select("docid", "content_sha256", content_col),
        content_col,
        keep_cols=["docid", "content_sha256"],
        mode=mode,
    ).select("docid", "content_sha256", "doclen", "plist")


def index_stream(
    stream_docs: DataFrame,
    path: str,
    checkpoint_dir: str,
    content_col: str = "content",
    docid_col: str = "docid",
    mode: str = "xapian",
    available_now: bool = True,
):
    """Start a streaming query appending per-batch termlist deltas.

    Returns the StreamingQuery; caller awaits termination then compact()s.
    """

    # _batch_id shares one ordering domain with WritableDatabase's
    # tombstone/delta generations — offset the streaming micro-batch ids
    # past whatever the overlay already holds, so a delete committed
    # BEFORE the stream starts can never outrank (and suppress) a row
    # this stream appends later
    spark = stream_docs.sparkSession
    base_bid = 0
    for name in ("delta", "tombstones"):
        d = os.path.join(path, name)
        if os.path.exists(d):
            df = spark.read.parquet(d)
            if "_batch_id" in df.columns:
                row = df.agg(F.max("_batch_id").alias("m")).collect()[0]
                base_bid = max(base_bid, int(row["m"] or 0))

    def handle(batch: DataFrame, batch_id: int) -> None:
        out = _batch_termlists(batch, content_col, docid_col, mode)
        (
            out.withColumn("_batch_id", F.lit(base_bid + 1 + batch_id))
            .write.mode("append")
            .parquet(os.path.join(path, "delta"))
        )

    writer = (
        stream_docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact(
    spark: SparkSession,
    path: str,
    mode: str = "xapian",
    n_ranges: int = 8,
    block_size: int = 512,
) -> None:
    """Fold deltas into the warehouse and rebuild derived tables.

    Late duplicates: a delta row for an existing docid REPLACES the base
    row (last-writer-wins by max _batch_id, then the delta side), matching
    WritableDatabase::replace_document semantics.
    """
    delta_dir = os.path.join(path, "delta")
    tomb_dir = os.path.join(path, "tombstones")
    base_dir = os.path.join(path, "termlists")
    if not os.path.exists(delta_dir) and not os.path.exists(tomb_dir):
        return
    # last-writer-wins per docid, with rows older than a newer tombstone
    # suppressed (shared resolution with read_warehouse)
    delta = m._delta_rows(spark, path)
    if os.path.exists(base_dir) and m._done(path, "termlists"):
        merged = spark.read.parquet(base_dir)
        if os.path.exists(tomb_dir):
            # fold tombstones: physically drop deleted docs' termlists
            # (WritableDatabase::delete_document; the glass analogue is the
            # in-place B-tree removal, ours happens at compaction like a
            # Lucene segment merge)
            dead = spark.read.parquet(tomb_dir).select("docid").distinct()
            # dead/replaced docid sets are small between compactions:
            # broadcast the anti-joins, never shuffle the base termlists
            merged = merged.join(F.broadcast(dead), "docid", "left_anti")
        if delta is not None:
            merged = merged.join(
                F.broadcast(delta.select("docid")), "docid", "left_anti"
            ).unionByName(delta)
    else:
        if delta is None:
            return
        merged = delta
    tmp = base_dir + ".compact"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(base_dir):
        shutil.rmtree(base_dir)
    os.replace(tmp, base_dir)
    n = spark.read.parquet(base_dir).count()
    # database identity survives compaction: the uuid is per-database and
    # the revision counts committed generations (glass_version.h semantics
    # — a compact is one more revision of the SAME database)
    ident: dict = {}
    if m._done(path, "stats"):
        old = m._read_meta(path, "stats")
        ident = {
            "uuid": old.get("uuid", ""),
            "revision": int(old.get("revision", 1)) + 1,
        }
    # invalidate downstream stage checkpoints, then rebuild
    meta_dir = os.path.join(path, "_meta")
    if os.path.exists(meta_dir):
        for name in os.listdir(meta_dir):
            if not name.startswith("termlists"):
                os.remove(os.path.join(meta_dir, name))
    for sub in ("runs", "blocked", "doclens", "term_stats"):
        d = os.path.join(path, sub)
        if os.path.exists(d):
            shutil.rmtree(d)
    m._commit(path, "termlists", {"stage": 0, "rows": n,
                                  "tokenizer_mode": mode,
                                  "compacted": True})
    if os.path.exists(delta_dir):
        shutil.rmtree(delta_dir)
    if os.path.exists(tomb_dir):
        shutil.rmtree(tomb_dir)
    m._stages_1_to_3(
        spark, path, mode=mode, n_ranges=n_ranges, block_size=block_size
    )
    if ident:
        stats = m._read_meta(path, "stats")
        stats.update(ident)
        m._commit(path, "stats", stats)


def query_with_delta(spark: SparkSession, path: str) -> DataFrame:
    """Postings view spanning base runs + uncompacted deltas (multi-shard
    search analogue).  Delta rows override base rows for the same docid;
    tombstoned docids are excluded."""
    runs = spark.read.parquet(os.path.join(path, "runs")).select(
        "term", "docid", "wdf", "doclen", "positions"
    )
    tomb_dir = os.path.join(path, "tombstones")
    if os.path.exists(tomb_dir):
        runs = runs.join(
            F.broadcast(
                spark.read.parquet(tomb_dir).select("docid").distinct()
            ),
            "docid", "left_anti",
        )
    delta = m._delta_rows(spark, path)
    if delta is None:
        return runs
    dpost = delta.select(
        "docid", "doclen", F.explode("plist").alias("e")
    ).select(
        F.col("e.term").alias("term"),
        "docid",
        F.col("e.wdf").alias("wdf"),
        "doclen",
        F.col("e.positions").alias("positions"),
    )
    base = runs.join(
        F.broadcast(delta.select("docid")), "docid", "left_anti"
    )
    return base.unionByName(dpost)

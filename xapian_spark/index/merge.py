"""Checkpointed, resumable warehouse build (the xapian-compact analogue).

The reference's compaction is a k-way priority-queue merge of per-database
sorted postlist runs into one table (`glass_compact.cc:80-340`).  The Spark
re-expression runs in checkpointed stages, each idempotent and individually
resumable, with per-partition lineage + metrics JSON — the north-rule
requirements for a 10^12-file build where stage reruns must never redo
finished work:

  stage 0  termlists: tokenize + map-side invert (builder.inverter_udf),
           content sha256 invariant column, written once.
  stage 1a ranges: term-mass boundaries computed from the termlists
           (distributed two-phase prefix sum) BEFORE any posting shuffle,
           so the one shuffle below can be range-aligned.
  stage 1b runs: term-major postings repartitionByRange(term, docid),
           sorted within partitions, written partitionBy(range_id) ->
           the "sorted runs" on disk, laid out one directory per term
           range.  This ONE shuffle IS the merge: identical term ranges
           from every input partition land in one range (what the
           reference's pq merge achieves file-at-a-time).
  stage 2  blocked: per term-RANGE, pack that range's run files into
           delta+VByte blocks (blocks.pack_blocks_arrow) with NO second
           shuffle — the files are already range-partitioned and sorted;
           packing is a partition-local sort + narrow Arrow pass.  (The
           previous design re-shuffled the full posting table a second
           time here; at 10^12-file scale that doubles the dominant I/O.)
           One job per range bucket, committed with a
           _meta/range_<i>.json recording lineage (term bounds, counts,
           wall time); a rerun skips every committed range.
  stage 3  stats: doclens, term_stats, global stats manifest.

Skew note: ranges are computed from the term distribution (approx
quantiles over the postings), so stopword-class hot terms get ranges to
themselves while long-tail terms pack densely — explicit range placement
instead of hash-and-pray.  Within a range, hot terms additionally split
across docid subranges (stage 1b's repartitionByRange(term, docid) cuts
can land mid-term, so a stopword's postings spread over several files,
each a contiguous docid span).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xapian_spark.index.blocks import (
    DEFAULT_BLOCK,
    block_schema,
    pack_blocks_arrow,
)
from xapian_spark.index.builder import InvertedIndex, _right_size, invert_arrow
from xapian_spark.ranking.weights import GlobalStats, TermStats


def _meta_path(path: str, name: str) -> str:
    return os.path.join(path, "_meta", f"{name}.json")


def _done(path: str, name: str) -> bool:
    return os.path.exists(_meta_path(path, name))


def _commit(path: str, name: str, meta: dict) -> None:
    os.makedirs(os.path.join(path, "_meta"), exist_ok=True)
    tmp = _meta_path(path, name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, _meta_path(path, name))


def _read_meta(path: str, name: str) -> dict:
    with open(_meta_path(path, name)) as f:
        return json.load(f)


def build_warehouse(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    content_col: str = "content",
    docid_col: str = "docid",
    mode: str = "xapian",
    prefix_fields: dict[str, str] | None = None,
    n_ranges: int = 8,
    block_size: int = DEFAULT_BLOCK,
    stop_after_range: int | None = None,
    concurrent_ranges: int | None = None,
    docdata: str = "copy",
    docdata_source: str | None = None,
    docdata_source_docid_col: str | None = None,
    payload_v: int | None = None,
) -> None:
    """Build (or RESUME building) the on-disk index warehouse at `path`.

    docdata: "copy" (default) rewrites the source rows into `{path}/docs`
    — the glass docdata table mirrored in-db.  "reference" skips the
    rewrite and records `docdata_source` (a parquet path) + the docid
    derivation in the commit marker instead; readers resolve document
    data lazily from the source.  At the 10^12-file posture the corpus
    already sits immutable in the lake — copying 100 TB of it into the
    index doubles storage and build IO for nothing, so "reference" is
    the cluster-scale setting ("copy" keeps the self-contained single
    -artifact behavior the reference's glass databases have).

    stop_after_range: test hook — abort after committing that many stage-2
    ranges, simulating a mid-build failure for resumability tests.
    payload_v: blocked payload format — 1 packs doclen into every
    block; 2 omits the doclen stream (doclens live once in the warehouse
    doclens table and scoring joins them back candidate-scoped,
    blocks.py module docstring), cutting pack/decode/storage bytes on
    the bandwidth-bound stage-2 pack.  None (default) means "whatever a
    resumed build committed, else 1"; an EXPLICIT version that conflicts
    with a resumed build's committed one raises instead of silently
    emitting the other format.  Readers auto-detect the version from the
    blocked table's payload_v column.
    concurrent_ranges: how many independent range-merge jobs to keep in
    flight (see the stage-2 comment in _stages_1_to_3).  None (default)
    scales with the cluster — cores/4, floored at 4 — because a fixed
    depth under-fills a wider cluster: each range job has only a handful
    of tasks, so the in-flight set must grow with the executor count for
    the task pool to stay saturated through each range's write/commit tail.
    """
    os.makedirs(path, exist_ok=True)

    # -- stage 0: termlists + sha256 invariant ------------------------------
    if not _done(path, "termlists"):
        t0 = time.perf_counter()
        pf_cols = list(prefix_fields.keys()) if prefix_fields else []
        src = docs.withColumn(
            "docid", F.col(docid_col).cast("long")
        ).withColumn(
            "content_sha256",
            F.sha2(F.col(content_col).cast("binary"), 256),
        )
        tl = invert_arrow(
            # same degenerate-layout guard as build_index: per-task Arrow
            # round-trip overhead dominates many-tiny-partitions inputs
            _right_size(
                src.select("docid", "content_sha256", *pf_cols, content_col)
            ),
            content_col,
            keep_cols=["docid", "content_sha256", *pf_cols],
            mode=mode,
        )
        if prefix_fields:
            bool_entries = F.array_distinct(F.filter(
                F.array(
                    *[
                        F.struct(
                            F.concat(
                                F.lit(p), F.lower(F.col(c))
                            ).alias("term"),
                            F.lit(0).cast("int").alias("wdf"),
                            F.lit(None).cast("array<int>").alias(
                                "positions"
                            ),
                        )
                        for c, p in prefix_fields.items()
                    ]
                ),
                # NULL field values / duplicate identical terms: see
                # builder.py bool_entries
                lambda e: e["term"].isNotNull(),
            ))
            tl = tl.withColumn("plist", F.concat("plist", bool_entries))
        tl = tl.select("docid", "content_sha256", "doclen", "plist")
        tl.write.mode("overwrite").parquet(os.path.join(path, "termlists"))
        n = spark.read.parquet(os.path.join(path, "termlists")).count()
        _commit(path, "termlists", {
            "stage": 0, "rows": n, "tokenizer_mode": mode,
            "elapsed_sec": round(time.perf_counter() - t0, 3),
        })

    # -- stage 0b: docdata (original rows + docid; value slots live here as
    # typed columns — glass `docdata` table + value slots, SURVEY §1.2) ----
    if not _done(path, "docdata"):
        t0 = time.perf_counter()
        if docdata == "reference":
            if docdata_source is not None and not os.path.exists(
                docdata_source
            ):
                raise ValueError(
                    f"docdata_source does not exist: {docdata_source}"
                )
            _commit(path, "docdata", {
                "stage": 0, "mode": "reference",
                "source": docdata_source,
                # the SOURCE table's id column (may differ from the
                # build-side docid_col when the caller renamed it)
                "docid_col": docdata_source_docid_col or docid_col,
                "columns": docs.columns,
                "elapsed_sec": round(time.perf_counter() - t0, 3),
            })
        else:
            dd = docs.withColumn("docid", F.col(docid_col).cast("long"))
            dd.write.mode("overwrite").parquet(os.path.join(path, "docs"))
            _commit(path, "docdata", {
                "stage": 0, "mode": "copy", "columns": dd.columns,
                "elapsed_sec": round(time.perf_counter() - t0, 3),
            })

    _stages_1_to_3(
        spark, path, mode=mode, n_ranges=n_ranges, block_size=block_size,
        stop_after_range=stop_after_range,
        concurrent_ranges=concurrent_ranges,
        payload_v=payload_v,
    )


def _mass_boundaries(runs: DataFrame, n_ranges: int) -> list[str]:
    """Boundary terms splitting the dictionary into n_ranges buckets of
    ~equal cumulative posting mass, computed with a distributed two-phase
    prefix sum (see the stage-2 comment in _stages_1_to_3).

    Returns the sorted list of bucket-opening terms (bucket 0's opener
    omitted), semantically identical to the old unpartitioned
    Window cumsum: bucket(term) = min(floor(cum_inclusive * n / total),
    n - 1), boundaries = first term of each bucket > 0.
    """
    import pyarrow as pa

    spark = runs.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32") or "32")
    dict_df = (
        runs.groupBy("term").agg(F.count(F.lit(1)).alias("mass"))
        .repartitionByRange(nparts, "term")
        .sortWithinPartitions("term")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    psums = {
        r["_pid"]: r["m"]
        for r in dict_df.groupBy("_pid").agg(F.sum("mass").alias("m")).collect()
    }
    total = sum(psums.values()) or 1
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(psums, default=-1) + 1):
        offsets[pid] = acc
        acc += psums.get(pid, 0)

    def emit_boundaries(batches):
        cum = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if cum is None:
                cum = offsets[batch.column("_pid")[0].as_py()]
            terms = batch.column("term").to_pylist()
            masses = batch.column("mass").to_pylist()
            out = []
            for t, m in zip(terms, masses):
                b_prev = min(cum * n_ranges // total, n_ranges - 1)
                cum += m
                b_now = min(cum * n_ranges // total, n_ranges - 1)
                # term t opens every bucket in (b_prev, b_now] — emit once.
                # cum > m excludes the global first term (cum_before == 0),
                # matching the old logic's marks_rows[1:] drop: the first
                # term can never be a boundary or range 0 would be empty.
                if b_now > b_prev and cum > m:
                    out.append(t)
            if out:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out, pa.string())], names=["term"]
                )

    marks_df = dict_df.mapInArrow(emit_boundaries, "term string")
    marks = sorted({r["term"] for r in marks_df.collect()})
    dict_df.unpersist()
    return marks[: n_ranges - 1]


def _range_id_col(marks: list[str], lo: int = 0, hi: int | None = None):
    """range_id = number of boundary terms <= term (marks are the sorted
    bucket-opening terms, so this is exactly the bucket index).  Built as
    a balanced WHEN tree — a binary search evaluating log2(n) string
    compares per posting row (this runs once per posting in the stage-1b
    shuffle, so a linear scan over the boundaries would cost n compares
    times the full posting count)."""
    if hi is None:
        hi = len(marks)
    if lo == hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(
        F.col("term") < F.lit(marks[mid]), _range_id_col(marks, lo, mid)
    ).otherwise(_range_id_col(marks, mid + 1, hi))


def _stages_1_to_3(
    spark: SparkSession,
    path: str,
    mode: str = "xapian",
    n_ranges: int = 8,
    block_size: int = DEFAULT_BLOCK,
    stop_after_range: int | None = None,
    concurrent_ranges: int | None = None,
    payload_v: int | None = None,
) -> None:
    """Stages 1-3 over an existing {path}/termlists table (used by the
    batch build and by streaming compaction, streaming/incremental.py)."""
    if concurrent_ranges is None:
        concurrent_ranges = max(4, spark.sparkContext.defaultParallelism // 4)
    termlists = spark.read.parquet(os.path.join(path, "termlists"))
    postings = termlists.select(
        "docid", "doclen", F.explode("plist").alias("e")
    ).select(
        F.col("e.term").alias("term"),
        "docid",
        F.col("e.wdf").alias("wdf"),
        "doclen",
        F.col("e.positions").alias("positions"),
    )

    # -- stage 1a: range plan (BEFORE the posting shuffle) -------------------
    if not _done(path, "ranges"):
        # Term-distribution-aware range boundaries (skew-aware placement):
        # split the dictionary at equal cumulative POSTING mass, not equal
        # term counts, so stopword-class hot terms get ranges to themselves
        # while the long tail packs densely.
        #
        # Distributed two-phase cumulative sum — NO unpartitioned window
        # (a global Window.orderBy would drag the whole dictionary through
        # one task; at 10^9 terms that is the merge's death):
        #   1. dictionary range-sorted by term across P partitions,
        #   2. per-partition posting-mass sums -> driver prefix offsets
        #      (P integers),
        #   3. narrow Arrow pass walks each sorted partition with its
        #      starting offset and emits ONLY the <= n_ranges boundary
        #      terms where floor(cum * n / total) steps up.
        marks = _mass_boundaries(postings.select("term"), n_ranges)
        _commit(path, "ranges", {
            "stage": 1, "boundaries": marks, "n_ranges": len(marks) + 1,
            "payload_v": payload_v if payload_v is not None else 1,
        })

    _rmeta = _read_meta(path, "ranges")
    marks = _rmeta["boundaries"]
    n_eff = len(marks) + 1
    # a RESUMED build must pack with the version the first run committed —
    # mixing formats across ranges would corrupt reads (decoders detect
    # the version per table, not per range).  None defers to the
    # committed version; an explicit conflicting version is an error, not
    # a silent substitution.
    committed_v = _rmeta.get("payload_v", 1)
    if payload_v is not None and payload_v != committed_v:
        raise ValueError(
            f"resume payload_v mismatch: this warehouse committed "
            f"payload_v={committed_v} but the caller asked for "
            f"{payload_v}; resume with payload_v=None/{committed_v} or "
            f"build into a fresh path"
        )
    payload_v = committed_v

    # -- stage 1b: sorted term-major runs, range-aligned layout --------------
    # The ONLY shuffle of the full posting table.  partitionBy(range_id)
    # writes each task's (term, docid) interval into its range directory
    # (at most two directories per task, since repartitionByRange intervals
    # are contiguous and range_id is monotone in term), so stage 2 can pack
    # each range from its own files with no second shuffle.
    if not _done(path, "runs"):
        t0 = time.perf_counter()
        parts = max(
            n_ranges * 4,
            2 * int(spark.conf.get("spark.sql.shuffle.partitions", "32")
                    or "32"),
        )
        (
            postings.withColumn("range_id", _range_id_col(marks))
            .repartitionByRange(parts, "term", "docid")
            # range_id leads the sort so the partitioned-file writer's
            # required ordering (by partition columns) is ALREADY satisfied
            # — otherwise FileFormatWriter inserts a second external sort of
            # the full posting table.  range_id is monotone in term, so
            # (range_id, term, docid) order IS (term, docid) order.
            .sortWithinPartitions("range_id", "term", "docid")
            .write.mode("overwrite")
            .partitionBy("range_id")
            .parquet(os.path.join(path, "runs"))
        )
        n = spark.read.parquet(os.path.join(path, "runs")).count()
        _commit(path, "runs", {
            "stage": 1, "rows": n, "partitions": parts,
            "elapsed_sec": round(time.perf_counter() - t0, 3),
        })

    runs = spark.read.parquet(os.path.join(path, "runs"))

    # -- stage 2: per-range blocked packing (shuffle-free) -------------------
    pending = [
        i for i in range(n_eff) if not _done(path, f"blocked_range_{i}")
    ]
    # ranges are INDEPENDENT (disjoint term intervals, disjoint output
    # dirs, one commit marker each), so pack several concurrently from a
    # thread pool: Spark interleaves the jobs' task sets at task
    # granularity, which (a) removes most of the n_ranges sequential job
    # barriers that dominate small-corpus builds (measured: the barrier
    # fixed cost was ~2/3 of a 1M-doc warehouse wall) and (b) on a big
    # cluster keeps executors busy through each range's stats/commit tail
    # instead of idling between jobs.  Resumability is unchanged — a
    # killed build re-enters with the committed ranges skipped.
    concurrency = max(1, min(concurrent_ranges, len(pending) or 1))

    def _pack_range(i: int) -> None:
        from pyspark.sql import Observation

        t0 = time.perf_counter()
        # partition pruning on range_id reads ONLY this range's files;
        # they are already (term, docid)-sorted from stage 1b.  The
        # sortWithinPartitions is a partition-LOCAL sort (no exchange) —
        # insurance against Spark's size-ordered file bin-packing
        # concatenating two sorted files out of term order.
        # v2 payloads never encode doclen: prune it from the range scan
        # (8 fewer bytes/posting read + no Arrow conversion on the exact
        # stage the DRAM ceiling pins)
        pack_cols = ["term", "docid", "wdf"] + (
            ["doclen"] if payload_v == 1 else []
        )
        part = runs.where(F.col("range_id") == i).select(*pack_cols)
        # range stats ride the WRITE job as an Observation instead of a
        # second full read of the blocked output — per range that halves
        # the blocked-parquet I/O and removes a whole job barrier (the
        # commit-tail latency the concurrency pool exists to hide)
        obs = Observation(f"range_{i}_stats")
        blocked = (
            part.sortWithinPartitions("term", "docid")
            .mapInArrow(
                pack_blocks_arrow(block_size, payload_v),
                block_schema(payload_v),
            )
            .observe(
                obs,
                F.count(F.lit(1)).alias("blocks"),
                F.sum("n").alias("postings"),
                F.min("term").alias("min_term"),
                F.max("term").alias("max_term"),
            )
        )
        out_dir = os.path.join(path, "blocked", f"range={i}")
        blocked.write.mode("overwrite").parquet(out_dir)
        stats_row = obs.get
        _commit(path, f"blocked_range_{i}", {
            "stage": 2, "range": i,
            "bounds": [marks[i - 1] if i > 0 else None,
                       marks[i] if i < len(marks) else None],
            "blocks": stats_row["blocks"], "postings": stats_row["postings"],
            "min_term": stats_row["min_term"],
            "max_term": stats_row["max_term"],
            "elapsed_sec": round(time.perf_counter() - t0, 3),
        })

    if stop_after_range is not None:
        # kill/resume test hook: deterministic commit ORDER requires the
        # sequential path ("abort after N commits" is ill-defined when
        # several ranges are in flight)
        done_ranges = n_eff - len(pending)
        for i in pending:
            if done_ranges >= stop_after_range:
                return
            _pack_range(i)
            done_ranges += 1
    elif pending:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrency) as ex:
            for f in [ex.submit(_pack_range, i) for i in pending]:
                f.result()

    # -- stage 3: stats tables ----------------------------------------------
    if not _done(path, "stats"):
        t0 = time.perf_counter()
        doclens = termlists.select(
            "docid", "doclen", F.size("plist").cast("long").alias("uniqterms")
        )
        doclens.write.mode("overwrite").parquet(os.path.join(path, "doclens"))
        term_stats = (
            runs.groupBy("term").agg(
                F.count(F.lit(1)).cast("long").alias("tf"),
                F.sum("wdf").cast("long").alias("cf"),
                F.max("wdf").cast("int").alias("wdf_max"),
            )
        )
        term_stats.write.mode("overwrite").parquet(
            os.path.join(path, "term_stats")
        )
        g = spark.read.parquet(os.path.join(path, "doclens")).agg(
            F.count(F.lit(1)).alias("doccount"),
            F.coalesce(F.sum("doclen"), F.lit(0)).alias("total_doclen"),
            F.coalesce(F.min("doclen"), F.lit(0)).alias("doclen_lb"),
            F.coalesce(F.max("doclen"), F.lit(0)).alias("doclen_ub"),
        ).collect()[0]
        # database uuid (glass_version.h: each database revision carries a
        # uuid; Database::get_uuid) — minted once at stats commit, stable
        # across reopens and resumes
        import uuid as _uuid

        _commit(path, "stats", {
            "stage": 3,
            "uuid": str(_uuid.uuid4()),
            "revision": 1,
            "doccount": g["doccount"],
            "total_doclen": g["total_doclen"],
            "doclen_lower_bound": g["doclen_lb"],
            "doclen_upper_bound": g["doclen_ub"],
            "tokenizer_mode": mode,
            "elapsed_sec": round(time.perf_counter() - t0, 3),
        })


def warehouse_complete(path: str) -> bool:
    if not _done(path, "stats") or not _done(path, "ranges"):
        return False
    n = _read_meta(path, "ranges")["n_ranges"]
    return all(_done(path, f"blocked_range_{i}") for i in range(n))


def _tombstone_max(spark: SparkSession, path: str) -> DataFrame | None:
    """(docid, _tomb_bid): newest tombstone generation per dead docid."""
    tomb_dir = os.path.join(path, "tombstones")
    if not os.path.exists(tomb_dir):
        return None
    t = spark.read.parquet(tomb_dir)
    if "_batch_id" not in t.columns:  # pre-ordering tombstones
        t = t.withColumn("_batch_id", F.lit(0))
    return t.groupBy("docid").agg(F.max("_batch_id").alias("_tomb_bid"))


def _delta_rows(spark: SparkSession, path: str,
                keep_batch: bool = False) -> DataFrame | None:
    """Uncompacted delta termlists, last-writer-wins per docid, with rows
    older than a NEWER tombstone for the same docid suppressed (a later
    delete must not be resurrected by an earlier replacement) — the
    resolution read_warehouse, query_with_delta and compact() all apply."""
    delta_dir = os.path.join(path, "delta")
    if not os.path.exists(delta_dir):
        return None
    from pyspark.sql import Window

    d = (
        spark.read.parquet(delta_dir)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("docid").orderBy(F.desc("_batch_id"))
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    tomb = _tombstone_max(spark, path)
    if tomb is not None:
        d = (
            d.join(F.broadcast(tomb), "docid", "left")
            .where(
                F.col("_tomb_bid").isNull()
                | (F.col("_batch_id") > F.col("_tomb_bid"))
            )
            .drop("_tomb_bid")
        )
    return d if keep_batch else d.drop("_batch_id")


def _delta_docs_rows(spark: SparkSession, path: str) -> DataFrame | None:
    """Replacement docdata rows (delta_docs), last-writer-wins per docid
    with tombstone-newer suppression — the docdata twin of _delta_rows."""
    dd_dir = os.path.join(path, "delta_docs")
    if not os.path.exists(dd_dir):
        return None
    from pyspark.sql import Window

    d = (
        spark.read.parquet(dd_dir)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("docid").orderBy(F.desc("_batch_id"))
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    tomb = _tombstone_max(spark, path)
    if tomb is not None:
        d = (
            d.join(F.broadcast(tomb), "docid", "left")
            .where(
                F.col("_tomb_bid").isNull()
                | (F.col("_batch_id") > F.col("_tomb_bid"))
            )
            .drop("_tomb_bid")
        )
    return d.drop("_batch_id")


def live_termlists(spark: SparkSession, path: str) -> DataFrame:
    """The LIVE termlist view of a warehouse: base termlists minus
    tombstoned/replaced docids, plus surviving delta rows — what a
    multi-source compaction must consume so deleted docs stay deleted
    and replacements win (xapian-compact merges the live postings of
    each source, never a stale snapshot)."""
    tl = spark.read.parquet(os.path.join(path, "termlists"))
    delta = _delta_rows(spark, path)
    tomb = _tombstone_max(spark, path)
    dead: DataFrame | None = None
    if tomb is not None:
        dead = tomb.select("docid")
    if delta is not None:
        repl = delta.select("docid")
        dead = repl if dead is None else dead.unionByName(repl).distinct()
    if dead is not None:
        tl = tl.join(F.broadcast(dead), "docid", "left_anti")
    if delta is not None:
        tl = tl.unionByName(
            delta.select("docid", "content_sha256", "doclen", "plist")
        )
    return tl


def _base_docs(spark: SparkSession, path: str) -> DataFrame | None:
    """The warehouse's base docdata: the in-db `docs` table ("copy" mode),
    or the recorded source table resolved lazily ("reference" mode — the
    lake, not the index, owns the bytes).  None when neither exists."""
    docs_dir = os.path.join(path, "docs")
    if os.path.exists(docs_dir):
        return spark.read.parquet(docs_dir)
    if _done(path, "docdata"):
        m = _read_meta(path, "docdata")
        src = m.get("source")
        if m.get("mode") == "reference" and src and os.path.exists(src):
            dc = m.get("docid_col") or "docid"
            return spark.read.parquet(src).withColumn(
                "docid", F.col(dc).cast("long")
            )
    return None


def live_docs(spark: SparkSession, path: str) -> DataFrame | None:
    """The LIVE docdata view (base docs minus dead, plus replacement
    rows) — the docdata twin of live_termlists; None when the warehouse
    stores no docs table."""
    base = _base_docs(spark, path)
    drows = _delta_docs_rows(spark, path)
    delta = _delta_rows(spark, path)
    if base is None:
        if drows is None and delta is None:
            return None
        # no base docs table: the overlay IS the docdata (replacement
        # rows, plus sha-invariant rows for delta docids without one)
        docs = drows
        if delta is not None:
            sha_rows = delta.select("docid", "content_sha256")
            if docs is not None:
                sha_rows = sha_rows.join(
                    docs.select("docid"), "docid", "left_anti"
                )
                docs = docs.unionByName(
                    sha_rows, allowMissingColumns=True
                )
            else:
                docs = sha_rows
        return docs
    docs = base
    tomb = _tombstone_max(spark, path)
    dead: DataFrame | None = None
    if tomb is not None:
        dead = tomb.select("docid")
    if delta is not None:
        repl = delta.select("docid")
        dead = repl if dead is None else dead.unionByName(repl).distinct()
    if dead is not None:
        docs = docs.join(F.broadcast(dead), "docid", "left_anti")
    if drows is not None:
        docs = docs.unionByName(drows, allowMissingColumns=True)
    if delta is not None:
        # delta termlist docids with no delta_docs row (streaming adds /
        # replaces): keep at least the sha-invariant docdata, mirroring
        # read_warehouse — dropping them would erase live docs' rows
        sha_rows = delta.select("docid", "content_sha256")
        if drows is not None:
            sha_rows = sha_rows.join(
                drows.select("docid"), "docid", "left_anti"
            )
        docs = docs.unionByName(sha_rows, allowMissingColumns=True)
    return docs


def read_warehouse(spark: SparkSession, path: str) -> InvertedIndex:
    """Open a warehouse as an InvertedIndex (postings = the sorted runs,
    blocked = the compressed block table).

    LSM overlay (the Lucene-segment re-expression of glass's in-place
    B-tree update, and what lets a 10^12-file index absorb deletes and
    replaces without rewriting posting lists): if `{path}/tombstones`
    (deleted docids) or `{path}/delta` (replacement/added termlists)
    exist, the returned view composes base-minus-dead plus delta rows.
    compact() folds both in physically.  Until then:

      - matching and doclens are EXACT (dead docids anti-joined out,
        delta postings unioned in);
      - global stats (doccount, total_doclen) are recomputed exactly
        with one small agg job at open;
      - per-term tf/cf may slightly overcount replaced docs' old
        postings (delta stats are added, old rows can't be cheaply
        subtracted) — the same staleness Lucene accepts for docFreq
        until segment merge; wdf_max stays a valid upper bound;
      - the blocked (WAND) table is dropped from the view — its packed
        payloads can't be row-filtered — so serving falls back to row
        postings until compact() rebuilds blocks.
    """
    m = _read_meta(path, "stats")
    # project away the range_id partition column: serving joins and the
    # delta-overlay unionByName expect the canonical postings schema
    postings = spark.read.parquet(os.path.join(path, "runs")).select(
        "term", "docid", "wdf", "doclen", "positions"
    )
    doclens = spark.read.parquet(os.path.join(path, "doclens"))
    term_stats = spark.read.parquet(os.path.join(path, "term_stats"))
    docs = _base_docs(spark, path)
    if docs is None:
        docs = spark.read.parquet(os.path.join(path, "termlists")).select(
            "docid", "content_sha256"
        )
    blocked: DataFrame | None = spark.read.parquet(
        os.path.join(path, "blocked")
    )
    stats = GlobalStats(
        doccount=m["doccount"],
        total_doclen=m["total_doclen"],
        doclen_lower_bound=m["doclen_lower_bound"],
        doclen_upper_bound=m["doclen_upper_bound"],
    )

    tomb_dir = os.path.join(path, "tombstones")
    delta = _delta_rows(spark, path)
    dead: DataFrame | None = None
    if os.path.exists(tomb_dir):
        dead = spark.read.parquet(tomb_dir).select("docid").distinct()
    if delta is not None:
        repl = delta.select("docid")
        dead = repl if dead is None else dead.unionByName(repl).distinct()
    if dead is not None:
        # the dead set is bounded by uncompacted delete/replace volume —
        # small between compactions (the Lucene live-docs assumption) —
        # so broadcast the anti-joins instead of shuffling the full
        # postings table; compact() when the overlay grows large
        dead = F.broadcast(dead)
        postings = postings.join(dead, "docid", "left_anti")
        doclens = doclens.join(dead, "docid", "left_anti")
        docs = docs.join(dead, "docid", "left_anti")
        if delta is not None:
            dpost = delta.select(
                "docid", "doclen", F.explode("plist").alias("e")
            ).select(
                F.col("e.term").alias("term"),
                "docid",
                F.col("e.wdf").alias("wdf"),
                "doclen",
                F.col("e.positions").alias("positions"),
            )
            postings = postings.unionByName(dpost)
            doclens = doclens.unionByName(delta.select(
                "docid", "doclen",
                F.size("plist").cast("int").alias("uniqterms"),
            ))
            # docdata overlay: full replacement rows when the writer kept
            # them (WritableDatabase.replace_document writes delta_docs),
            # else just the sha invariant from the delta termlists
            drows = _delta_docs_rows(spark, path)
            if drows is not None:
                docs = docs.unionByName(
                    drows, allowMissingColumns=True
                ).unionByName(
                    # delta docids with no delta_docs row (streaming adds)
                    delta.select("docid", "content_sha256").join(
                        drows.select("docid"), "docid", "left_anti"
                    ),
                    allowMissingColumns=True,
                )
            else:
                docs = docs.unionByName(
                    delta.select("docid", "content_sha256"),
                    allowMissingColumns=True,
                )
            dstats = dpost.groupBy("term").agg(
                F.count(F.lit(1)).alias("tf"),
                F.sum("wdf").alias("cf"),
                F.max("wdf").alias("wdf_max"),
            )
            term_stats = (
                term_stats.unionByName(dstats)
                .groupBy("term")
                .agg(
                    F.sum("tf").alias("tf"),
                    F.sum("cf").alias("cf"),
                    F.max("wdf_max").alias("wdf_max"),
                )
            )
        blocked = None
        g = doclens.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("doclen"), F.lit(0)).alias("total"),
            F.coalesce(F.min("doclen"), F.lit(0)).alias("lb"),
            F.coalesce(F.max("doclen"), F.lit(0)).alias("ub"),
        ).collect()[0]
        stats = GlobalStats(
            doccount=g["n"], total_doclen=g["total"],
            doclen_lower_bound=g["lb"], doclen_upper_bound=g["ub"],
        )

    idx = InvertedIndex(
        spark=spark,
        postings=postings,
        doclens=doclens,
        term_stats=term_stats,
        _stats=stats,
        docs=docs,
        tokenizer_mode=m.get("tokenizer_mode", "xapian"),
        blocked=blocked,
        synonyms=(
            spark.read.parquet(os.path.join(path, "synonyms"))
            if os.path.exists(os.path.join(path, "synonyms"))
            else None
        ),
    )
    return idx


def verify_invariants(spark: SparkSession, path: str,
                      docs: DataFrame | None = None,
                      content_col: str = "content",
                      docid_col: str = "docid") -> dict:
    """xapian-check-style structural invariants (bin/xapian-check.cc):

    - content sha256 row invariant vs the source table (when `docs` is
      given — Database::check has no source either, so it's optional)
    - per-term tf == count of postings, cf == sum(wdf) (runs vs term_stats)
    - doclen == sum(wdf) per doc
    - blocked postings == runs postings (modulo positions)
    """
    out: dict[str, int] = {}
    tl = spark.read.parquet(os.path.join(path, "termlists"))
    if docs is not None:
        src = docs.select(
            F.col(docid_col).cast("long").alias("docid"),
            F.sha2(F.col(content_col).cast("binary"), 256).alias("sha_src"),
        )
        bad_sha = (
            tl.select("docid", "content_sha256")
            .join(src, "docid")
            .where(F.col("content_sha256") != F.col("sha_src"))
            .count()
        )
        out["sha256_mismatches"] = bad_sha

    runs = spark.read.parquet(os.path.join(path, "runs"))
    ts = spark.read.parquet(os.path.join(path, "term_stats"))
    recomputed = runs.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf2"), F.sum("wdf").alias("cf2")
    )
    out["term_stats_mismatches"] = (
        ts.join(recomputed, "term", "full")
        .where(
            (F.col("tf") != F.col("tf2")) | (F.col("cf") != F.col("cf2"))
        )
        .count()
    )
    dl = runs.where(F.col("wdf") > 0).groupBy("docid").agg(
        F.sum("wdf").alias("dl2")
    )
    out["doclen_mismatches"] = (
        tl.select("docid", "doclen").join(dl, "docid")
        .where(F.col("doclen") != F.col("dl2"))
        .count()
    )
    from xapian_spark.index.blocks import unpack_blocks

    blocked = spark.read.parquet(os.path.join(path, "blocked"))
    bp = unpack_blocks(blocked).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("wdf").alias("w")
    ).collect()[0]
    rp = runs.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("wdf").alias("w")
    ).collect()[0]
    out["blocked_vs_runs_posting_diff"] = abs(bp["n"] - rp["n"])
    out["blocked_vs_runs_wdf_diff"] = abs((bp["w"] or 0) - (rp["w"] or 0))
    return out

"""Decompose the index-build wall time into its phases at one core level.

Used to attack the Amdahl fixed cost F in T(c) = F + W/c (BASELINE.md):
times each piece of the build separately on the scaling_run input so F can
be attributed (Arrow round-trip floor vs invert compute vs explode+stats
vs cache materialization) instead of guessed.

Run pinned, one level at a time, nothing else on the machine:
    SPARK_GRAFT_AMPLIFY=200 SPARK_DRIVER_MEM=48g \
        taskset -c 0-31 python tools/profile_build.py 32
    SPARK_GRAFT_AMPLIFY=200 SPARK_DRIVER_MEM=12g \
        taskset -c 0-7  python tools/profile_build.py 8
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xapian_spark.index import builder
from xapian_spark.session import get_spark

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
sys.argv = [sys.argv[0]] + sys.argv[2:]  # scaling_run reads argv[1] as sf_dir
from tools.scaling_run import AMPLIFY, SF_DIR, amplified_docs  # noqa: E402


def main(cores: int) -> None:
    spark = get_spark(
        f"profile-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
    )
    docs = amplified_docs(spark, cores).repartition(cores * 8).persist()
    n = docs.count()
    out = {"cores": cores, "n_docs": n, "amplify": AMPLIFY, "sf_dir": SF_DIR}

    def timed(name, fn, trials=3):
        secs = []
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            secs.append(round(time.perf_counter() - t0, 2))
        out[name] = {"min": min(secs), "all": secs}

    # 0. full build first (cleanest memory state), the scaling_run metric
    def full():
        idx = builder.build_index(spark, docs, content_col="text",
                                  docid_col="docid")
        builder.persist_index(idx)
        idx.term_stats.count()
        full.idx = idx

    def full_clean():
        full()
        for df in (full.idx.postings, full.idx.doclens, full.idx.term_stats,
                   full.idx.termlists):
            if df is not None:
                df.unpersist(blocking=True)

    timed("full_build", full_clean)

    # 1. Arrow round-trip floor: a noop mapInArrow over the same rows —
    #    pure Python-worker + IPC cost, no tokenize work
    sel = docs.select("docid", "text")

    def _noop(batches):
        for b in batches:
            yield b

    timed("noop_mapinarrow", lambda: sel.mapInArrow(_noop, sel.schema).count())

    # 2. invert only, no cache write: tokenizer work + Arrow round-trip
    tl = builder.invert_arrow(sel, "text", keep_cols=["docid"])
    timed("invert_nocache", lambda: tl.count())

    # 3. the build's job 1: invert + persist + doclens agg (stats collect)
    def job1():
        t = builder.invert_arrow(sel, "text", keep_cols=["docid"]).withColumn(
            "uniqterms", F.coalesce(F.size("plist"), F.lit(0)).cast("long")
        ).persist()
        t.agg(
            F.count(F.lit(1)), F.sum("doclen"), F.min("doclen"), F.max("doclen")
        ).collect()
        job1.cached = t

    def job1_clean():
        if getattr(job1, "cached", None) is not None:
            job1.cached.unpersist(blocking=True)
            job1.cached = None
        job1()

    timed("job1_invert_cache_agg", job1_clean)

    # 4. the build's job 2 from a warm cache: explode + term stats shuffle
    t = job1.cached
    post = t.select("docid", F.explode("plist").alias("e")).select(
        F.col("e.term").alias("term"), F.col("e.wdf").alias("wdf")
    )
    stats = post.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"), F.sum("wdf").alias("cf"),
        F.max("wdf").alias("wdf_max"),
    )
    timed("job2_explode_stats_warm", lambda: stats.count())

    print(json.dumps(out))


if __name__ == "__main__":
    main(CORES)

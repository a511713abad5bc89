"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

Sandbox stand-in: the SAME job at local[8] (N) and local[32] (4N) on the
SAME deterministic input.  The input is documents.parquet amplified x20
(seeded arithmetic on doc_id; no external data) so each configuration has
real work: ~100k docs, ~8M postings at sf0.1.

Output: one JSON line with per-level build/query throughput and the
efficiency ratio  eff = (T_N / T_4N) / 4  (1.0 = perfect linear).

Run:  python tools/scaling_run.py [sf_dir] > scaling.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xapian_spark.index.builder import build_index, persist_index
from xapian_spark.query.planner import Planner
from xapian_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR") or (
    sys.argv[1]
    if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
    else "/root/testdata/sf0.1"
)
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "20"))
N_QUERIES = int(os.environ.get("SPARK_GRAFT_NQ", "500"))


def amplified_docs(spark, cores: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = base.count()
    # spread the base rows BEFORE the explode: documents.parquet is a
    # single split, and Generate preserves partitioning — without this the
    # whole amplified corpus is produced (and first consumed) by ONE task
    return (
        base.repartition(max(cores * 8, 64))
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(AMPLIFY - 1))))
        .withColumn("docid", (F.col("doc_id") + 1 + F.col("rep") * n).cast("long"))
        # vary content deterministically so replicas aren't byte-identical:
        # prepend a replica marker token
        .withColumn(
            "text",
            F.concat(F.lit("rep"), F.col("rep").cast("string"), F.lit(" "), F.col("text")),
        )
        .drop("rep")
    )


BUILD_TRIALS = int(os.environ.get("SPARK_GRAFT_BUILD_TRIALS", "3"))
QUERY_TRIALS = int(os.environ.get("SPARK_GRAFT_QUERY_TRIALS", "5"))


def one_level(cores: int) -> dict:
    """min over N trials — the machine is a shared VM, so min is the
    least-noise estimator of achievable wall time.

    Build and query trials run in SEPARATE phases (all builds, then all
    queries).  Interleaving them contaminated both measurements: a query
    job leaves the heap full of broadcast/aggregation garbage that the
    next build trial pays for in GC, and the query's whole-stage-codegen
    paths only reach C2-compiled steady state after a few executions —
    measured on identical cached postings, interleaved min-of-3 reported
    72 s for a batch whose steady state is ~30 s.  The first query trial
    is a JIT warm-up and is reported but excluded from the min."""
    spark = get_spark(
        f"scaling-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
    )
    docs = amplified_docs(spark, cores).repartition(cores * 8).persist()
    n_docs = docs.count()

    build_secs, query_secs = [], []
    idx = None
    for _ in range(BUILD_TRIALS):
        if idx is not None:
            for df in (idx.postings, idx.doclens, idx.term_stats,
                       idx.termlists):
                if df is not None:
                    df.unpersist()
        t0 = time.perf_counter()
        idx = build_index(spark, docs, content_col="text", docid_col="docid")
        persist_index(idx)
        # one action materializes postings cache AND term stats (the cache
        # populates as a side effect of computing its dependents); the
        # global-stats agg is lazy since the fixed-cost shave — touch it
        # inside the measured region to stay comparable with prior rounds
        idx.term_stats.count()
        _ = idx.stats.average_length
        build_secs.append(time.perf_counter() - t0)

    import random

    vocab = [
        r["term"] for r in idx.term_stats.orderBy("term").collect()[:64]
    ]
    rnd = random.Random(42)
    qs = {
        f"q{i}": rnd.sample(vocab, rnd.randint(1, 4))
        for i in range(N_QUERIES)
    }
    pl = Planner(idx)
    for _ in range(QUERY_TRIALS):
        t0 = time.perf_counter()
        pl.search_batch_or(qs, k=10).count()
        query_secs.append(time.perf_counter() - t0)

    build_sec = min(build_secs)
    # trial 0 is the codegen/JIT warm-up pass
    query_sec = min(query_secs[1:]) if len(query_secs) > 1 else query_secs[0]
    out = {
        "cores": cores,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 2),
        "build_secs_all": [round(x, 2) for x in build_secs],
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "batch_queries": N_QUERIES,
        "query_sec": round(query_sec, 2),
        "query_secs_all": [round(x, 2) for x in query_secs],
        "query_qps": round(N_QUERIES / query_sec, 1),
    }
    spark.stop()
    return out


def main():
    # Single-level mode (used by the orchestrator below): run the job with
    # the process tree PINNED to that many physical cores via taskset, the
    # honest sandbox stand-in for an N-core cluster — local[N] alone caps
    # only JVM task slots, while Python UDF workers / GC / IO threads would
    # still use every core.
    if len(sys.argv) > 2 and sys.argv[1] == "--level":
        print(json.dumps(one_level(int(sys.argv[2]))))
        return

    import subprocess

    here = os.path.abspath(__file__)
    levels = []
    for cores in (8, 32):
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            sys.executable, here, "--level", str(cores),
        ]
        # heap scales with cores: a 4N-core level runs 4x the concurrent
        # tasks and allocation rate, so a fixed heap GC-starves it — the
        # single-JVM analogue of giving each executor its own memory on a
        # real cluster (measured: same heap at 8 vs 32 cores capped the
        # tokenize stage at 2.2x instead of ~4x)
        env = dict(os.environ, SPARK_GRAFT_AMPLIFY=str(AMPLIFY),
                   SPARK_DRIVER_MEM=os.environ.get(
                       "SPARK_DRIVER_MEM", f"{max(12, int(cores * 1.5))}g"))
        out = subprocess.run(
            cmd, capture_output=True, text=True, env=env
        )
        if out.returncode != 0:
            sys.stderr.write(
                f"level {cores} failed (exit {out.returncode}); "
                f"stderr tail:\n{out.stderr[-4000:]}\n"
            )
            sys.exit(1)
        levels.append(json.loads(out.stdout.strip().splitlines()[-1]))
    lo, hi = levels
    result = {
        "workload": (
            f"{SF_DIR} x{AMPLIFY} documents, build + {N_QUERIES}-query batch; "
            "taskset-pinned 8 vs 32 cores"
        ),
        "levels": levels,
        "build_scaling_efficiency": round(
            (lo["build_sec"] / hi["build_sec"]) / 4.0, 3
        ),
        "query_scaling_efficiency": round(
            (lo["query_sec"] / hi["query_sec"]) / 4.0, 3
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

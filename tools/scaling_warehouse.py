"""N vs 4N scaling on the REAL build pipeline: corpus -> tokenize ->
postings runs -> k-way range merge -> delta+VByte blocks -> parquet
warehouse (merge.build_warehouse, what scripts/build_index.py runs).

scaling_run.py measures the in-memory serving posture (build + persist
three caches + stats), which at 8M docs exceeds a 12 GB "8-core node"'s
cache headroom — a harness artifact, not a pipeline property: the actual
build-to-warehouse path keeps nothing in executor memory beyond the
running stage, so it is the honest N->4N BUILD measurement at corpus
sizes where the cache-everything harness hits its documented capacity
cliff (SCALING.json notes_8M / capacity_16M).

Per trial the output directory is fresh (build_warehouse is resumable,
and a resumed build would skip committed stages and measure nothing).

Run:  SPARK_GRAFT_AMPLIFY=800 python tools/scaling_warehouse.py
Env:  SPARK_GRAFT_WH_TRIALS (default 2), SPARK_GRAFT_NRANGES (default 16),
      SPARK_GRAFT_WH_DIR (scratch root, default /tmp/xs_whscale),
      SPARK_GRAFT_PAYLOAD_V (default 2: blocked payload v2 — no doclen
      stream, ~1/3 fewer pack/decode bytes on the bandwidth-pinned
      stage-2 range packs; set 1 to measure the legacy layout)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIALS = int(os.environ.get("SPARK_GRAFT_WH_TRIALS", "2"))
N_RANGES = int(os.environ.get("SPARK_GRAFT_NRANGES", "16"))
SCRATCH = os.environ.get("SPARK_GRAFT_WH_DIR", "/tmp/xs_whscale")
PAYLOAD_V = int(os.environ.get("SPARK_GRAFT_PAYLOAD_V", "2"))


def corpus_path() -> str:
    from tools.scaling_run import AMPLIFY

    return os.path.join(SCRATCH, f"corpus_x{AMPLIFY}")


def prepare_corpus() -> str:
    """Materialize the amplified corpus ONCE (unpinned, full machine) to a
    healthy multi-file parquet layout, so each pinned level READS its input
    the way a real warehouse build reads a real table.  The old in-process
    explode inherited documents.parquet's single split, which capped the
    stage-0 tokenize at ONE task regardless of core count — the 8-vs-32-core
    warehouse pair was measuring a serial build twice."""
    path = corpus_path()
    marker = os.path.join(path, "_PREPARED")
    if os.path.exists(marker):
        return path
    from xapian_spark.session import get_spark
    from tools.scaling_run import amplified_docs

    spark = get_spark(
        "whscale-prep", master="local[32]", shuffle_partitions=64
    )
    docs = amplified_docs(spark, 32).withColumnRenamed("text", "content")
    shutil.rmtree(path, ignore_errors=True)
    docs.write.mode("overwrite").parquet(path)
    spark.stop()
    open(marker, "w").close()
    return path


def one_level(cores: int) -> dict:
    from xapian_spark.index import merge
    from xapian_spark.session import get_spark

    prepare_corpus()  # no-op when main() already wrote the marker
    spark = get_spark(
        f"whscale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
        # the materialized corpus files are small (~4-16 MB); default
        # 128 MB bin-packing would fold them back into ~a dozen read
        # partitions and re-cap the narrow level's parallelism
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 << 20)},
    )
    docs = spark.read.parquet(corpus_path())
    n_docs = docs.count()  # warm the input listing; corpus itself NOT cached

    secs = []
    stage_secs = []
    for t in range(TRIALS):
        out = os.path.join(SCRATCH, f"wh_{cores}_{t}")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        merge.build_warehouse(
            spark, docs, out, content_col="content", docid_col="docid",
            n_ranges=N_RANGES, payload_v=PAYLOAD_V,
        )
        secs.append(round(time.perf_counter() - t0, 2))
        # per-stage decomposition from the commit markers (which stage
        # is the one NOT scaling with cores?) before the dir goes away
        stages = {}
        meta_dir = os.path.join(out, "_meta")
        for f in sorted(os.listdir(meta_dir)):
            with open(os.path.join(meta_dir, f)) as fh:
                m = json.load(fh)
            if "elapsed_sec" in m:
                stages[f.removesuffix(".json")] = m["elapsed_sec"]
        stage_secs.append(stages)
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    best = min(secs)
    return {
        "cores": cores,
        "n_docs": n_docs,
        "n_ranges": N_RANGES,
        "payload_v": PAYLOAD_V,
        "build_wh_sec": best,
        "build_wh_secs_all": secs,
        "docs_per_sec": round(n_docs / best, 1),
        "stage_secs_all": stage_secs,
    }


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--level":
        print(json.dumps(one_level(int(sys.argv[2]))))
        return

    import subprocess

    prepare_corpus()
    here = os.path.abspath(__file__)
    levels = []
    for cores in (8, 32):
        env = dict(
            os.environ,
            SPARK_DRIVER_MEM=os.environ.get(
                "SPARK_DRIVER_MEM", f"{max(12, int(cores * 1.5))}g"
            ),
        )
        out = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable, here,
             "--level", str(cores)],
            capture_output=True, text=True, env=env,
        )
        if out.returncode != 0:
            sys.stderr.write(
                f"level {cores} failed: {out.stderr[-3000:]}\n"
            )
            sys.exit(1)
        levels.append(json.loads(out.stdout.strip().splitlines()[-1]))
    lo, hi = levels
    print(json.dumps({
        "workload": (
            f"build_warehouse (tokenize->runs->range merge->blocks->parquet), "
            f"fresh output dir per trial; taskset-pinned 8 vs 32 cores"
        ),
        "levels": levels,
        "build_scaling_efficiency": round(
            (lo["build_wh_sec"] / hi["build_wh_sec"]) / 4.0, 3
        ),
    }))


if __name__ == "__main__":
    main()

"""N vs 4N warehouse-build scaling through the REAL launch path:

    spark-submit --master local[N] --py-files xapian_spark.zip \
        scripts/build_index.py --input <corpus> --output <wh> ...

This is the north rule's literal posture ("launched via spark-submit
--py-files on N and 4N executors").  scaling_warehouse.py measures the
same pipeline in-process; this tool proves the DEPLOYED artifact does it:

- the package is the deterministic ``xapian_spark.zip``
  (scripts/make_pyfiles.py) — the repo tree is NOT importable from the
  submitted job (the job script is staged into the scratch dir, cwd is
  scratch, PYTHONPATH is scrubbed), so every import resolves from the
  zip exactly as it would on a 1000-executor cluster;
- the corpus is the input_hint's Iceberg table shape
  (repo, path, commit, lang, content) materialized deterministically
  from the sf documents table (seeded arithmetic, no external data),
  plus the content_sha256 row invariant column;
- each level is taskset-pinned to its core count (local[N] alone caps
  only JVM task slots; Python workers/GC/IO threads would still use
  every core) — the sandbox stand-in for an N-executor cluster.

Run:  SPARK_GRAFT_AMPLIFY=200 python tools/scaling_submit.py
Env:  SPARK_GRAFT_SUBMIT_TRIALS (default 2),
      SPARK_GRAFT_NRANGES (default 16),
      SPARK_GRAFT_SUBMIT_DIR (scratch root, default /tmp/xs_submit),
      SPARK_GRAFT_SUBMIT_LEVELS (default "8,32"),
      SPARK_GRAFT_SUBMIT_SERVE (default 1: after the build trials each
      level also runs scripts/serve_batch.py — the scaling_run.py query
      phase through the same deployed-artifact launch — against the last
      build's warehouse; SPARK_GRAFT_SUBMIT_NQ / _QTRIALS control it).
Prints one JSON line with per-level build+query throughput and the
N->4N efficiency for both phases.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRIALS = int(os.environ.get("SPARK_GRAFT_SUBMIT_TRIALS", "2"))
N_RANGES = int(os.environ.get("SPARK_GRAFT_NRANGES", "16"))
SERVE = os.environ.get("SPARK_GRAFT_SUBMIT_SERVE", "1") != "0"
NQ = int(os.environ.get("SPARK_GRAFT_SUBMIT_NQ", "500"))
QUERY_TRIALS = int(os.environ.get("SPARK_GRAFT_SUBMIT_QTRIALS", "5"))
SCRATCH = os.environ.get("SPARK_GRAFT_SUBMIT_DIR", "/tmp/xs_submit")
LEVELS = tuple(
    int(c) for c in os.environ.get("SPARK_GRAFT_SUBMIT_LEVELS", "8,32").split(",")
)


def prepare_corpus() -> tuple[str, int]:
    """Materialize the input_hint-shaped corpus table once, full machine.

    Columns (repo, path, commit, lang, content) + content_sha256 + docid,
    all derived deterministically from the sf documents table (same seeded
    amplification as tools/scaling_run.py; no external data).  Multi-file
    parquet layout so a pinned narrow level still reads in parallel.
    """
    from pyspark.sql import functions as F

    from tools.scaling_run import AMPLIFY, amplified_docs
    from xapian_spark.io.sources import with_content_hash
    from xapian_spark.session import get_spark

    path = os.path.join(SCRATCH, f"corpus_hint_x{AMPLIFY}")
    marker = os.path.join(path, "_PREPARED")
    if not os.path.exists(marker):
        spark = get_spark(
            "submit-prep", master="local[32]", shuffle_partitions=64
        )
        docs = amplified_docs(spark, 32)
        langs = ("c", "cc", "py", "rs", "go", "java", "js", "sql")
        corpus = (
            docs.withColumnRenamed("text", "content")
            .withColumn(
                "repo",
                F.concat(F.lit("org/repo-"), (F.col("docid") % 97).cast("string")),
            )
            .withColumn(
                "lang",
                F.element_at(
                    F.array(*[F.lit(l) for l in langs]),
                    (F.col("docid") % len(langs) + 1).cast("int"),
                ),
            )
            .withColumn(
                "path",
                F.concat(
                    F.lit("src/"), (F.col("docid") % 1000).cast("string"),
                    F.lit("/file_"), F.col("docid").cast("string"),
                    F.lit("."), F.col("lang"),
                ),
            )
            .withColumn("commit", F.sha2(F.col("docid").cast("string"), 256))
        )
        corpus = with_content_hash(corpus)
        shutil.rmtree(path, ignore_errors=True)
        corpus.write.mode("overwrite").parquet(path)
        spark.stop()
        open(marker, "w").close()
    # count rows without a session: parquet footers via pyarrow
    import pyarrow.parquet as pq

    n = pq.ParquetDataset(path).read(columns=[]).num_rows
    return path, n


def stage_artifacts() -> tuple[str, str, str, dict]:
    """Build the zip and stage the job scripts OUTSIDE the repo tree."""
    from scripts.make_pyfiles import build_zip

    os.makedirs(SCRATCH, exist_ok=True)
    zip_path = os.path.join(SCRATCH, "xapian_spark.zip")
    zip_info = build_zip(zip_path)
    staged = os.path.join(SCRATCH, "build_index.py")
    shutil.copyfile(os.path.join(REPO, "scripts", "build_index.py"), staged)
    staged_serve = os.path.join(SCRATCH, "serve_batch.py")
    shutil.copyfile(
        os.path.join(REPO, "scripts", "serve_batch.py"), staged_serve
    )
    return zip_path, staged, staged_serve, zip_info


def submit_cmd(cores: int, zip_path: str, script: str,
               script_args: list[str]) -> list[str]:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
    )
    mem = os.environ.get("SPARK_DRIVER_MEM", f"{max(12, int(cores * 1.5))}g")
    return [
        "taskset", "-c", f"0-{cores - 1}",
        spark_submit,
        "--master", f"local[{cores}]",
        "--driver-memory", mem,
        "--conf", f"spark.sql.shuffle.partitions={max(cores * 2, 8)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        # the materialized corpus/warehouse files are small; default
        # 128 MB bin-packing would cap the narrow level's read parallelism
        "--conf", f"spark.sql.files.maxPartitionBytes={16 << 20}",
        "--py-files", zip_path,
        script,
        *script_args,
    ]


def _run_submit(cmd: list[str], env: dict) -> tuple[dict, float]:
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=SCRATCH
    )
    wall = round(time.perf_counter() - t0, 2)
    if proc.returncode != 0:
        sys.stderr.write(
            f"spark-submit failed (exit {proc.returncode}); stderr tail:\n"
            f"{proc.stderr[-4000:]}\n"
        )
        sys.exit(1)
    report = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            report = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    assert report and report.get("complete"), (
        f"no complete report in stdout: {proc.stdout[-2000:]}"
    )
    return report, wall


def one_level(cores: int, zip_path: str, staged: str, staged_serve: str,
              corpus: str) -> dict:
    # scrub PYTHONPATH so the repo tree cannot leak into the job; imports
    # must resolve from the zip alone (the --py-files condition)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    reports, wall = [], []
    out_dir = ""
    for t in range(TRIALS):
        out_dir = os.path.join(SCRATCH, f"wh_submit_{cores}_{t}")
        shutil.rmtree(out_dir, ignore_errors=True)
        cmd = submit_cmd(cores, zip_path, staged, [
            "--input", corpus,
            "--output", out_dir,
            "--content-col", "content",
            "--id-col", "docid",
            "--n-ranges", str(N_RANGES),
        ])
        report, w = _run_submit(cmd, env)
        wall.append(w)
        # per-stage decomposition from the warehouse commit markers (same
        # attribution scaling_warehouse.py records) before the dir goes away
        stages = {}
        meta_dir = os.path.join(out_dir, "_meta")
        if os.path.isdir(meta_dir):
            for f in sorted(os.listdir(meta_dir)):
                with open(os.path.join(meta_dir, f)) as fh:
                    m = json.load(fh)
                if "elapsed_sec" in m:
                    stages[f.removesuffix(".json")] = m["elapsed_sec"]
        report["stage_secs"] = stages
        reports.append(report)
        if t < TRIALS - 1:
            shutil.rmtree(out_dir, ignore_errors=True)
    best = min(r["elapsed_sec"] for r in reports)
    level = {
        "cores": cores,
        "n_docs": reports[0]["docs"],
        "build_sec": best,
        "build_secs_all": [r["elapsed_sec"] for r in reports],
        "submit_wall_secs_all": wall,  # includes JVM start + zip distribution
        "docs_per_sec": round(reports[0]["docs"] / best, 1),
        "stage_secs_all": [r["stage_secs"] for r in reports],
    }
    if SERVE:
        # serving phase through the same deployed-artifact launch: ONE
        # spark-submit whose job runs all query trials in a long-lived JVM
        # (scripts/serve_batch.py excludes the codegen-warm-up trial 0
        # from its min, the scaling_run.py methodology) over the LAST
        # build trial's warehouse
        cmd = submit_cmd(cores, zip_path, staged_serve, [
            "--index", out_dir,
            "--nq", str(NQ),
            "--trials", str(QUERY_TRIALS),
        ])
        qreport, qwall = _run_submit(cmd, env)
        level.update({
            "batch_queries": qreport["nq"],
            "query_sec": qreport["query_sec"],
            "query_secs_all": qreport["query_secs_all"],
            "query_qps": qreport["qps"],
            "serve_submit_wall_sec": qwall,
        })
    shutil.rmtree(out_dir, ignore_errors=True)
    return level


def main() -> None:
    corpus, n_docs = prepare_corpus()
    zip_path, staged, staged_serve, zip_info = stage_artifacts()
    levels = [
        one_level(c, zip_path, staged, staged_serve, corpus) for c in LEVELS
    ]
    lo, hi = levels[0], levels[-1]
    scale = hi["cores"] / lo["cores"]
    out = {
        "workload": (
            f"spark-submit --py-files xapian_spark.zip scripts/build_index.py "
            f"over the (repo,path,commit,lang,content) corpus, {n_docs} docs, "
            f"n_ranges={N_RANGES}"
            + (f"; + {NQ}-query serve_batch.py phase" if SERVE else "")
            + "; taskset-pinned "
            + " vs ".join(f"local[{c}]" for c in LEVELS)
        ),
        "zip": zip_info,
        "levels": levels,
        "build_scaling_efficiency": round(
            (lo["build_sec"] / hi["build_sec"]) / scale, 3
        ),
    }
    if SERVE:
        out["query_scaling_efficiency"] = round(
            (lo["query_sec"] / hi["query_sec"]) / scale, 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

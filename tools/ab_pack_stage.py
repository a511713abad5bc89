"""Interleaved A/B of the block-pack STAGE: the round-3 per-term
mapInPandas packer (copied verbatim below) vs the vectorized mapInArrow
packer now in blocks.py — same Spark session, same sorted parquet input,
alternating arms, min-of-N.  Diagnoses whether the 8M warehouse slowdown
observed after the packer swap is the code or the host window.

Run:  taskset -c 0-7 python tools/ab_pack_stage.py       (8-core shape)
Env:  AB_PACK_CORES (default 8), AB_PACK_AMPLIFY (default 40),
      AB_PACK_ROUNDS (default 4), AB_PACK_PARTS (default 8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xapian_spark.index.blocks import (  # noqa: E402
    BLOCK_SCHEMA,
    DEFAULT_BLOCK,
    _pack_group,
    pack_blocks_arrow,
)

CORES = int(os.environ.get("AB_PACK_CORES", "8"))
AMPLIFY = int(os.environ.get("AB_PACK_AMPLIFY", "40"))
ROUNDS = int(os.environ.get("AB_PACK_ROUNDS", "4"))
PARTS = int(os.environ.get("AB_PACK_PARTS", "8"))
SCRATCH = "/tmp/xs_ab_pack"


def pack_blocks_udf_old(block_size: int = DEFAULT_BLOCK):
    """The round-3 packer, verbatim (git show f2dde53~2:.../blocks.py)."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pend_term: str | None = None
        pend: list[pd.DataFrame] | None = None

        def flush() -> pd.DataFrame | None:
            nonlocal pend_term, pend
            if pend_term is None:
                return None
            g = pd.concat(pend, ignore_index=True) if len(pend) > 1 else pend[0]
            rows = _pack_group(
                pend_term,
                g["docid"].to_numpy(np.int64),
                g["wdf"].to_numpy(np.int64),
                g["doclen"].to_numpy(np.int64),
                block_size,
            )
            pend_term, pend = None, None
            return pd.DataFrame(
                rows,
                columns=[
                    "term", "first_docid", "last_docid", "n", "wdf_max",
                    "payload",
                ],
            )

        for batch in batches:
            if batch.empty:
                continue
            terms = batch["term"].to_numpy()
            change = np.nonzero(terms[1:] != terms[:-1])[0] + 1
            bounds = np.concatenate(([0], change, [len(terms)]))
            outs = []
            for i in range(len(bounds) - 1):
                seg = batch.iloc[bounds[i] : bounds[i + 1]]
                t = terms[bounds[i]]
                if pend_term is not None and t != pend_term:
                    f = flush()
                    if f is not None:
                        outs.append(f)
                if pend_term is None:
                    pend_term, pend = t, [seg]
                else:
                    pend.append(seg)
                if i < len(bounds) - 2:
                    f = flush()
                    if f is not None:
                        outs.append(f)
            if outs:
                yield pd.concat(outs, ignore_index=True)
        f = flush()
        if f is not None:
            yield f

    return pack


def prepare_postings(spark) -> str:
    """Materialize a range-partitioned sorted posting table once."""
    path = os.path.join(SCRATCH, f"postings_x{AMPLIFY}_p{PARTS}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    os.environ["SPARK_GRAFT_AMPLIFY"] = str(AMPLIFY)
    from pyspark.sql import functions as F

    from tools.scaling_run import amplified_docs
    from xapian_spark.index.builder import invert_arrow

    docs = amplified_docs(spark, CORES)
    termlists = invert_arrow(docs, "text", ["docid"])
    postings = termlists.select(
        "docid", "doclen", F.explode("plist").alias("e")
    ).select(
        F.col("e.term").alias("term"), "docid",
        F.col("e.wdf").alias("wdf"), "doclen",
    )
    (
        postings
        .repartitionByRange(PARTS, "term", "docid")
        .sortWithinPartitions("term", "docid")
        .write.mode("overwrite").parquet(path)
    )
    return path


def one_arm(spark, src: str, arm: str) -> float:
    out = os.path.join(SCRATCH, f"out_{arm}")
    shutil.rmtree(out, ignore_errors=True)
    df = spark.read.parquet(src).sortWithinPartitions("term", "docid")
    t0 = time.perf_counter()
    if arm == "old":
        blocked = df.mapInPandas(pack_blocks_udf_old(), BLOCK_SCHEMA)
    else:
        blocked = df.mapInArrow(pack_blocks_arrow(), BLOCK_SCHEMA)
    blocked.write.mode("overwrite").parquet(out)
    return time.perf_counter() - t0


def main() -> None:
    from xapian_spark.session import get_spark

    os.makedirs(SCRATCH, exist_ok=True)
    spark = get_spark(
        "ab-pack", master=f"local[{CORES}]", shuffle_partitions=PARTS
    )
    src = prepare_postings(spark)
    n_post = spark.read.parquet(src).count()
    res = {"cores": CORES, "amplify": AMPLIFY, "parts": PARTS,
           "n_postings": n_post, "old_sec": [], "new_sec": []}
    one_arm(spark, src, "new")  # JIT/codegen warm-up, discarded
    for _ in range(ROUNDS):
        res["old_sec"].append(round(one_arm(spark, src, "old"), 2))
        res["new_sec"].append(round(one_arm(spark, src, "new"), 2))
    o, n = min(res["old_sec"]), min(res["new_sec"])
    res["speedup_min_over_min"] = round(o / n, 3)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()

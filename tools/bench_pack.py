"""Single-core microbenchmark: scalar per-term packer (_pack_group loop,
the round-3 shape) vs the vectorized region packer (_pack_stream, what the
build now runs).  Interleaved arms in one process — the only drift-robust
A/B on this host (see BASELINE.md host-noise section).

Run:  taskset -c 0 python tools/bench_pack.py
Env:  PACK_BENCH_TERMS (default 200000), PACK_BENCH_TRIALS (default 4)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xapian_spark.index.blocks import _pack_group, _pack_stream  # noqa: E402

N_TERMS = int(os.environ.get("PACK_BENCH_TERMS", "200000"))
TRIALS = int(os.environ.get("PACK_BENCH_TRIALS", "4"))


def make_corpus(n_terms: int, seed: int = 7):
    """Zipf-ish long-tail dictionary: most terms have 1-4 postings, a few
    have thousands — the shape a real vocabulary feeds the packer."""
    rng = np.random.default_rng(seed)
    # postings per term ~ Zipf(2.0) clamped (finite mean ~1.6/term)
    npost = np.minimum(rng.zipf(2.0, n_terms), 20000)
    total = int(npost.sum())
    terms = np.repeat(
        np.array([f"t{i:08d}" for i in range(n_terms)], dtype=object), npost
    )
    # docids: strictly increasing per term (vectorized segmented cumsum:
    # subtract each segment's running-total base from the global cumsum)
    gaps = rng.integers(1, 50, size=total).astype(np.int64)
    c = np.cumsum(gaps)
    starts = np.concatenate(([0], np.cumsum(npost)))[:-1]
    seg_base = np.where(starts > 0, c[starts - 1], 0)
    docids = c - np.repeat(seg_base, npost) + 1
    wdfs = rng.integers(1, 9, size=total).astype(np.int64)
    doclens = rng.integers(20, 200, size=total).astype(np.int64)
    return terms, docids, wdfs, doclens, total


def scalar_arm(terms, docids, wdfs, doclens, block_size=512) -> int:
    """Round-3 shape: pandas groupby slicing + per-term _pack_group."""
    df = pd.DataFrame(
        {"term": terms, "docid": docids, "wdf": wdfs, "doclen": doclens}
    )
    n = 0
    for term, g in df.groupby("term", sort=False):
        rows = _pack_group(
            term,
            g["docid"].to_numpy(np.int64),
            g["wdf"].to_numpy(np.int64),
            g["doclen"].to_numpy(np.int64),
            block_size,
        )
        n += len(rows)
    return n


def vector_arm(terms, docids, wdfs, doclens, block_size=512) -> int:
    n = 0
    batches = iter([(terms, docids, wdfs, doclens)])
    for tpb, *_ in _pack_stream(batches, block_size):
        n += len(tpb)
    return n


def main() -> None:
    terms, docids, wdfs, doclens, total = make_corpus(N_TERMS)
    res = {"n_terms": N_TERMS, "n_postings": total, "trials": TRIALS,
           "scalar_sec": [], "vector_sec": []}
    blocks_scalar = blocks_vector = None
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        blocks_scalar = scalar_arm(terms, docids, wdfs, doclens)
        res["scalar_sec"].append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        blocks_vector = vector_arm(terms, docids, wdfs, doclens)
        res["vector_sec"].append(round(time.perf_counter() - t0, 3))
    assert blocks_scalar == blocks_vector, (blocks_scalar, blocks_vector)
    res["blocks"] = blocks_vector
    s, v = min(res["scalar_sec"]), min(res["vector_sec"])
    res["speedup_min_over_min"] = round(s / v, 2)
    res["scalar_postings_per_sec"] = int(total / s)
    res["vector_postings_per_sec"] = int(total / v)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Hardware-ceiling companion to scaling_run.py.

On one shared-memory box, 8 -> 32 cores cannot speed up memory-bound work
4x: the memory bus is shared.  This tool measures that ceiling directly —
the SAME 8-core job run (a) solo and (b) as 4 CONCURRENT instances pinned
to disjoint 8-core sets (0-7, 8-15, 16-23, 24-31).  The concurrent runs
have perfect parallelism by construction (independent processes, no shared
state), so

    ceiling = T_solo / T_concurrent   (per-instance; <= 1)

is the best per-8-core throughput retention ANY engine could achieve when
going from 1/4 of the box to the whole box.  Engine scaling efficiency
from scaling_run.py should be compared against this number, not against
a perfect 1.0.

Output: one JSON line {solo, concurrent: [...], ceiling_build, ceiling_query}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SCALING = os.path.join(HERE, "scaling_run.py")


def run_level(cpu_range: str, env: dict) -> subprocess.Popen:
    return subprocess.Popen(
        ["taskset", "-c", cpu_range, sys.executable, SCALING, "--level", "8"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )


def read_result(p: subprocess.Popen, label: str) -> dict:
    out, err = p.communicate()
    lines = out.strip().splitlines() if out else []
    if p.returncode != 0 or not lines:
        raise RuntimeError(
            f"scaling_run level '{label}' failed "
            f"(rc={p.returncode}): {err[-800:] if err else 'no stderr'}"
        )
    return json.loads(lines[-1])


def main():
    env = dict(
        os.environ,
        SPARK_GRAFT_AMPLIFY=os.environ.get("SPARK_GRAFT_AMPLIFY", "100"),
        SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "8g"),
    )
    # solo 8-core reference
    solo = read_result(run_level("0-7", env), "solo 0-7")

    # 4 concurrent instances on disjoint core sets
    ranges = ["0-7", "8-15", "16-23", "24-31"]
    procs = [run_level(r, env) for r in ranges]
    conc = [read_result(pr, r) for pr, r in zip(procs, ranges)]
    import statistics

    conc_build = statistics.median(c["build_sec"] for c in conc)
    conc_query = statistics.median(c["query_sec"] for c in conc)
    out = {
        "amplify": env["SPARK_GRAFT_AMPLIFY"],
        "solo": solo,
        "concurrent": conc,
        "ceiling_build": round(solo["build_sec"] / conc_build, 3),
        "ceiling_query": round(solo["query_sec"] / conc_query, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

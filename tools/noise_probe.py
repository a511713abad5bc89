"""30-second host-contention probe: is a wide pinned core set actually
getting its cores?  Runs the same NumPy workload single-process on core 0,
then 32 concurrent pinned single-core processes, and reports the aggregate
speedup.  On an idle host the ratio approaches 32x (minus DRAM sharing);
well under ~20x means the VM's wide sets are being host-throttled and any
32-core engine measurement taken now is noise — skip the scaling run.

Usage: python tools/noise_probe.py   -> one JSON line
"""
import json
import os
import subprocess
import sys
import time

WORK = """
import time, numpy as np
a = np.random.default_rng(0).random((600, 600))
t0 = time.perf_counter(); n = 0
while time.perf_counter() - t0 < 6.0:
    (a @ a).sum(); n += 1
print(n)
"""


def run_pinned(core: int):
    env = dict(os.environ, OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1")
    return subprocess.Popen(
        ["taskset", "-c", str(core), sys.executable, "-c", WORK],
        stdout=subprocess.PIPE, text=True, env=env,
    )


def main():
    solo = run_pinned(0)
    solo_n = int(solo.communicate()[0].strip())
    procs = [run_pinned(c) for c in range(32)]
    total = sum(int(p.communicate()[0].strip()) for p in procs)
    ratio = total / solo_n if solo_n else 0.0
    print(json.dumps({
        "solo_iters_6s": solo_n,
        "aggregate_32way_iters_6s": total,
        "speedup_32way": round(ratio, 1),
        "window": "clean" if ratio >= 20 else "contaminated",
    }))


if __name__ == "__main__":
    main()

"""Host-contention probe: is a wide pinned core set actually getting its
cores?  Two 30-second modes, because an oversubscribed hypervisor hurts
two different ways:

- **compute mode** (default): the same NumPy matmul single-process on
  core 0, then 32 concurrent pinned single-core processes; aggregate
  speedup near 32x means the pCPUs are present.  A ratio well under ~20x
  means wide sets are bandwidth/CPU-throttled and any 32-core engine
  measurement taken now is noise.
- **sched mode** (``--sched``): the same comparison but with a
  yield-heavy workload (compute bursts separated by 1 ms sleeps, the
  shape of a JVM scheduling thousands of short tasks + GC threads).  A
  spinning workload never yields its pCPU, so the compute probe can read
  clean while every wake-up of a yieldy workload re-queues behind
  neighbor VMs — measured on this box: compute probe 25-28x in the same
  minutes that 32-core Spark builds ran 3-6x slow with /proc/stat steal
  accruing ONLY during the JVM runs.  The sched ratio plus the steal
  delta it reports is the honest gate for build-phase measurements.

Usage: python tools/noise_probe.py [--sched]   -> one JSON line
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

# compute bursts ~2 ms separated by 1 ms sleeps: every sleep yields the
# pCPU; on an oversubscribed host each wake-up waits in the run queue
SCHED_WORK = """
import time, numpy as np
a = np.random.default_rng(0).random((120, 120))
t0 = time.perf_counter(); n = 0
while time.perf_counter() - t0 < 6.0:
    for _ in range(4):
        (a @ a).sum(); n += 1
    time.sleep(0.001)
print(n)
"""


def run_pinned(core: int, work: str):
    env = dict(os.environ, OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1")
    return subprocess.Popen(
        ["taskset", "-c", str(core), sys.executable, "-c", work],
        stdout=subprocess.PIPE, text=True, env=env,
    )


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main():
    sched = "--sched" in sys.argv
    work = SCHED_WORK if sched else WORK
    solo = run_pinned(0, work)
    solo_n = int(solo.communicate()[0].strip())
    s0 = _steal_jiffies()
    t0 = time.perf_counter()
    procs = [run_pinned(c, work) for c in range(32)]
    total = sum(int(p.communicate()[0].strip()) for p in procs)
    wall = time.perf_counter() - t0
    steal_cpu_s = (_steal_jiffies() - s0) / 100.0
    ratio = total / solo_n if solo_n else 0.0
    # the sched workload sleeps ~1/3 of the time, so even a perfect host
    # tops out lower; thresholds calibrated on this box's idle windows
    threshold = 16 if sched else 20
    print(json.dumps({
        "mode": "sched" if sched else "compute",
        "solo_iters_6s": solo_n,
        "aggregate_32way_iters_6s": total,
        "speedup_32way": round(ratio, 1),
        "steal_cpu_s_during_32way": round(steal_cpu_s, 2),
        "steal_pct_of_capacity": round(100.0 * steal_cpu_s / (32 * wall), 2),
        "window": "clean" if ratio >= threshold else "contaminated",
    }))


if __name__ == "__main__":
    main()

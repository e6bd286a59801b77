"""Effective-CPU probe: size pools from MEASURED sustained parallelism.

Shared-tenancy hosts advertise N vCPUs but can deliver a fraction of that
under load (hypervisor throttling, noisy neighbours).  Sizing actor pools
and shuffle width to the NOMINAL count then oversubscribes the host: every
stage's tasks contend for timeslices, context-switch thrash grows, and wall
time on identical code regresses 2×+ (observed on this host mid-round-2:
nominal 32, ~12-18 sustained).  The fix is the same one a multi-node
deployment needs: calibrate at startup with a short burst of CPU-bound Ray
tasks at full nominal width and derive

    effective ≈ Σ per-task busy seconds / wall seconds

which is exactly the sustained parallelism the scheduler can actually
extract.  Costs < ~2 s; call once per session (``bench.py`` does).
"""

from __future__ import annotations

import time


def _spin(seconds: float) -> float:
    """Busy-loop for ``seconds`` of wall time doing numpy work (mirrors the
    vectorized kernels real stages run); returns busy seconds observed."""
    import numpy as np

    a = np.full((192, 192), 1.0000001)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        a = np.clip(a @ a, 0.5, 1.5)
    return time.perf_counter() - t0


def measure_effective_cpus(
    nominal: int | None = None,
    task_secs: float = 0.4,
    rounds: int = 2,
) -> float:
    """Measured sustained parallelism of the current Ray session.

    Launches ``nominal`` single-CPU tasks per round, each spinning for
    ``task_secs``; effective cores = total busy time / round wall time.  A
    warm-up round absorbs worker cold-start so it is not attributed to
    throttling; the best of ``rounds`` measured rounds is returned (one-off
    GC or scheduling hiccups only ever bias the estimate DOWN).  Result is
    clamped to [1, nominal].
    """
    import ray

    if not ray.is_initialized():
        raise RuntimeError("measure_effective_cpus needs an active Ray session")
    if nominal is None:
        nominal = int(ray.cluster_resources().get("CPU", 8))
    nominal = max(1, int(nominal))
    spin = ray.remote(num_cpus=1)(_spin)
    ray.get([spin.remote(0.05) for _ in range(nominal)])  # warm-up
    # Dispatch-overhead calibration: a single task's wall minus its busy time
    # is pure submit/fetch latency.  Without subtracting it, busy/wall
    # UNDERESTIMATES a healthy host by 10-25% (more at higher widths), and a
    # pool sized from that starves the cluster it meant to protect — measured
    # as a 16-CPU bench leg sized to ~13 and a 0.53 scaling ratio vs 0.89.
    t0 = time.perf_counter()
    ray.get(spin.remote(task_secs))
    overhead = max(0.0, (time.perf_counter() - t0) - task_secs)
    best = 1.0
    for _ in range(max(1, rounds)):
        t0 = time.perf_counter()
        busy = sum(ray.get([spin.remote(task_secs) for _ in range(nominal)]))
        wall = max(task_secs, time.perf_counter() - t0 - overhead)
        best = max(best, min(float(nominal), busy / wall))
    return best

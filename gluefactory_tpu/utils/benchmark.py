"""Model latency benchmarking (role of reference `utils/benchmark.py:7-33`).

The CUDA-event timing of the reference becomes a `block_until_ready` loop;
on relayed TPU backends where block_until_ready is unreliable, a value fetch
of one output leaf forces completion (`sync="fetch"`).
"""

from __future__ import annotations

import time

import numpy as np


def benchmark(fn, inputs, warmup: int = 10, reps: int = 100, sync: str = "fetch"):
    """Time `fn(*inputs)`; returns dict(mean ms, std ms, reps)."""
    import jax

    def run_once():
        out = fn(*inputs)
        if sync == "fetch":
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf).ravel()[:1]
        else:
            jax.block_until_ready(out)
        return out

    for _ in range(warmup):
        run_once()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        times.append((time.perf_counter() - t0) * 1000)
    times = np.asarray(times)
    return {"mean": float(times.mean()), "std": float(times.std()), "reps": reps}

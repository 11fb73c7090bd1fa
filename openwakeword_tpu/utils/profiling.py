"""Tracing / profiling utilities.

The reference's observability is the opt-in per-call wall-clock timing dict
(reference model.py:253-284), which this framework keeps API-compatible on
Model.predict(timing=True). For deeper TPU analysis this module adds
jax.profiler integration: device traces viewable in TensorBoard/Perfetto and
a stage-timing helper that actually synchronizes (axon's block_until_ready is
asynchronous; see bench.py).
"""

import contextlib
import time
from typing import Dict

import numpy as np
import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/owwt_trace"):
    """Capture a jax.profiler device trace around a code block.

    View with: tensorboard --logdir <log_dir>  (or open the .pb in Perfetto).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, repeats: int = 5, **kwargs) -> Dict[str, float]:
    """Wall-time a jitted callable with true synchronization: the result is
    reduced to a scalar and fetched to host, which is the only reliable
    completion barrier on the axon backend."""
    def sync(out):
        # fetch one element of EVERY leaf: a callable that dispatches
        # multiple device programs is only complete when each program's
        # output is ready, not just the first
        for leaf in jax.tree.leaves(out):
            arr = jax.numpy.asarray(leaf).ravel()
            if arr.size:
                _ = float(arr[0])

    out = fn(*args, **kwargs)   # compile + warm
    sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync(out)
        times.append(time.perf_counter() - t0)
    return {"best_s": float(np.min(times)), "mean_s": float(np.mean(times)),
            "std_s": float(np.std(times))}

"""Throughput benchmark: concurrent real-time 16 kHz streams per TPU chip.

Runs the fused multi-stream step (mel frontend + embedding CNN + all heads)
over S streams for T frames via a scanned device program and reports how many
streams fit in real time (one 80 ms frame per stream per 80 ms wall clock).

Baseline (BASELINE.md): the reference runs 15-20 models real-time on one
Raspberry Pi 3 core -- effectively ~1 stream/core; the BASELINE.json north
star is >= 50,000 concurrent streams per v5e chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import logging
import os
import sys
import time

import numpy as np

logging.disable(logging.WARNING)


def _bench_streams(n_streams: int, n_frames: int = 25, repeats: int = 3):
    import jax
    from openwakeword_tpu.parallel.engine import MultiStreamEngine

    engine = MultiStreamEngine(wakeword_models=[], n_streams=n_streams)
    rng = np.random.default_rng(0)
    frames = rng.integers(-2000, 2000, (n_frames, n_streams, 1280)).astype(np.float32)
    x = jax.numpy.asarray(frames)

    # warm-up / compile
    state0 = jax.tree.map(lambda a: a.copy(), engine.state)
    st, scores = engine._scan_fn(engine.params, engine.state, x)
    jax.block_until_ready(scores)
    engine.state = st

    best = float("inf")
    for _ in range(repeats):
        engine.state, t0 = engine.state, time.perf_counter()
        engine.state, scores = engine._scan_fn(engine.params, engine.state, x)
        jax.block_until_ready(scores)
        best = min(best, time.perf_counter() - t0)
    frames_per_sec = n_streams * n_frames / best
    return frames_per_sec, best


def main():
    n_streams = int(os.environ.get("BENCH_STREAMS", "8192"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "25"))

    fps, wall = _bench_streams(n_streams, n_frames)
    # real-time bar: 12.5 frames per stream-second (80 ms frames)
    realtime_streams = fps / 12.5

    # vs_baseline: reference real-time capacity ~= 15-20 models on one Pi core
    # (README.md:121); treat 20 concurrent model-streams as the baseline.
    baseline_streams = 20.0
    result = {
        "metric": "concurrent_realtime_16khz_streams_per_chip",
        "value": round(realtime_streams, 1),
        "unit": "streams",
        "vs_baseline": round(realtime_streams / baseline_streams, 2),
        "detail": {
            "frames_per_sec": round(fps, 1),
            "bench_streams": n_streams,
            "bench_frames": n_frames,
            "wall_s": round(wall, 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

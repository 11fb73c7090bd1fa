"""Estimate real-time headroom: how many extra models/streams fit in the
80 ms frame budget on this host/chip.

Equivalent of the reference's efficiency benchmark (reference
examples/benchmark_efficiency.py), which uses predict(timing=True) to
estimate how many additional models fit per core; here the second number
that matters is multi-stream capacity, so both are reported.

Usage:
    python benchmark_efficiency.py [--seconds 10] [--streams 512]
"""

import argparse
import time

import numpy as np

import openwakeword_tpu as oww

parser = argparse.ArgumentParser()
parser.add_argument("--seconds", type=int, default=10)
parser.add_argument("--streams", type=int, default=512,
                    help="Stream count for the multi-stream capacity estimate")
args = parser.parse_args()


def main():
    rng = np.random.default_rng(0)
    audio = rng.integers(-1000, 1000, 16000 * args.seconds).astype(np.int16)

    # --- single-stream per-frame timing (reference-style) ---
    model = oww.Model()
    per_stage = {}
    n_frames = 0
    for i in range(0, len(audio) - 1280, 1280):
        _, timing = model.predict(audio[i:i + 1280], timing=True)
        for k, v in timing["models"].items():
            per_stage[k] = per_stage.get(k, 0.0) + v
        n_frames += 1
    total_ms = sum(per_stage.values()) / n_frames * 1000
    print("Single-stream per-frame time by stage (ms):")
    for k, v in sorted(per_stage.items(), key=lambda kv: -kv[1]):
        print(f"  {k:15s} {v / n_frames * 1000:8.3f}")
    print(f"  total          {total_ms:8.3f}  (budget 80 ms)")
    print(f"Estimated additional models that fit in real time: "
          f"{int(max(0, (80 - total_ms) / max(total_ms / max(len(model.models), 1), 1e-9)))}")

    # --- multi-stream capacity ---
    from openwakeword_tpu.parallel import MultiStreamEngine
    engine = MultiStreamEngine(wakeword_models=[], n_streams=args.streams)
    frames = rng.integers(-1000, 1000, (25, args.streams, 1280)).astype(np.float32)
    engine.predict_frames(frames)  # compile + warm
    t0 = time.perf_counter()
    out = engine.predict_frames(frames)
    _ = float(out.mean())
    wall = time.perf_counter() - t0
    fps = args.streams * 25 / wall
    print(f"\nMulti-stream: {fps:,.0f} frames/s "
          f"=> ~{fps / 12.5:,.0f} concurrent real-time streams on this device")


if __name__ == "__main__":
    main()

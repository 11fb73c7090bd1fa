"""Per-frame latency benchmark (reference benchmark/benchmark.py contract):
mean per-stage wall time over random audio via predict(timing=True), plus the
multi-stream throughput figure that is the TPU build's headline metric.

Usage:
    python benchmark/benchmark.py [--seconds 10]
"""

import argparse
import os
import sys

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import openwakeword_tpu as oww

parser = argparse.ArgumentParser()
parser.add_argument("--seconds", type=int, default=10)
args = parser.parse_args()


def main():
    rng = np.random.default_rng(0)
    audio = rng.integers(-1000, 1000, 16000 * args.seconds).astype(np.int16)
    model = oww.Model()

    stage_totals = {}
    n = 0
    for i in range(0, len(audio) - 1280, 1280):
        _, timing = model.predict(audio[i:i + 1280], timing=True)
        for k, v in timing["models"].items():
            stage_totals[k] = stage_totals.get(k, 0.0) + v
        n += 1

    print(f"Frames: {n} (80 ms each)")
    print("Mean per-frame time by stage:")
    for k, v in sorted(stage_totals.items(), key=lambda kv: -kv[1]):
        print(f"  {k:15s} {v / n * 1000:8.3f} ms")
    total = sum(stage_totals.values()) / n * 1000
    print(f"  {'total':15s} {total:8.3f} ms  ({'real-time' if total < 80 else 'NOT real-time'})")


if __name__ == "__main__":
    main()

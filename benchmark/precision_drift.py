"""Score-drift measurement across the engine's precision / mel-kernel
configurations, against the exact `precision='highest'` XLA path.

Feeds the reference test WAVs (`/root/reference/tests/data`, or any 16 kHz
mono clips passed on the command line) plus noise streams through the
multi-stream engine and reports the max |dScore| of each configuration —
the numbers behind the precision ladder in PERF_NOTES.md and the engine's
precision docstring. The 1e-3 budget is the reference-parity bar (SURVEY.md
section 6: scores must match released models to ~3 decimals).

Usage:
    python benchmark/precision_drift.py [clip.wav ...]
"""

import argparse
import os
import sys

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import wave

import numpy as np


def load_clips(paths):
    clips = []
    for p in paths:
        with wave.open(p) as w:
            if w.getframerate() != 16000 or w.getnchannels() != 1:
                continue
            clips.append(np.frombuffer(w.readframes(w.getnframes()), np.int16))
    return clips


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("clips", nargs="*",
                        default=sorted(glob.glob("/root/reference/tests/data/*.wav")))
    parser.add_argument("--streams", type=int, default=64)
    parser.add_argument("--embedding", choices=("default", "student"), default="default",
                        help="measure drift within this embedding mode (the "
                             "'highest' reference uses the same mode, so student "
                             "drift is vs the student-exact pipeline, not the teacher)")
    parser.add_argument("--cnn-probe", action="store_true",
                        help="per-conv-layer probe: measure drift with exactly "
                             "one CNN conv at 'fast' (1-pass bf16) and the rest "
                             "at 'high', for every conv — the data behind the "
                             "mixed-precision 'cnn' tier (PERF_NOTES round 5)")
    parser.add_argument("--cnn-fast-layers", type=str, default=None,
                        help="comma-separated conv indices to run at 'fast' "
                             "(rest 'high'): measure one combined mixed config")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/owwt_jax_cache")
    from openwakeword_tpu.parallel.engine import MultiStreamEngine

    clips = load_clips(args.clips)
    if not clips:
        raise SystemExit("no usable 16 kHz mono clips")
    n = min(len(c) for c in clips)
    T, S = n // 1280, args.streams
    audio = np.stack([clips[i % len(clips)][:T * 1280] for i in range(S)])
    rng = np.random.default_rng(0)
    if S > len(clips):
        audio[len(clips):] = rng.integers(-8000, 8000, (S - len(clips), T * 1280))
    frames = np.stack([audio[:, t * 1280:(t + 1) * 1280]
                       for t in range(T)]).astype(np.int16)

    def run(**kw):
        e = MultiStreamEngine(wakeword_models=[], n_streams=S, rng_seed=0,
                              embedding=args.embedding, **kw)
        return e.predict_frames(frames)

    ref = run(precision="highest", use_pallas_melspec=False)

    if args.cnn_probe or args.cnn_fast_layers is not None:
        from openwakeword_tpu.models import embedding as E
        n = E.n_convs()

        def mixed(fast_idx):
            cnn = tuple("fast" if i in fast_idx else "high" for i in range(n))
            return dict(precision={"mel": "high", "cnn": cnn, "heads": "high"},
                        use_pallas_melspec=True)

        if args.cnn_fast_layers is not None:
            idx = {int(t) for t in args.cnn_fast_layers.split(",") if t}
            out = run(**mixed(idx))
            print(f"cnn fast@{sorted(idx)}: max|dScore| vs highest = "
                  f"{np.abs(out - ref).max():.3e}", flush=True)
        else:
            for i in range(n):
                out = run(**mixed({i}))
                print(f"cnn fast@{i:>2}: max|dScore| vs highest = "
                      f"{np.abs(out - ref).max():.3e}", flush=True)
        return

    configs = [
        ("high, XLA mel", dict(precision="high", use_pallas_melspec=False)),
        ("high, Pallas mel", dict(precision="high", use_pallas_melspec=True)),
        ("mel fast, rest high", dict(precision={"mel": "fast"}, use_pallas_melspec=False)),
        ("mel fast, Pallas", dict(precision={"mel": "fast"}, use_pallas_melspec=True)),
        ("fast", dict(precision="fast", use_pallas_melspec=False)),
        ("bf16, XLA mel", dict(precision="bf16", use_pallas_melspec=False)),
        ("bf16, Pallas mel", dict(precision="bf16", use_pallas_melspec=True)),
    ]
    for name, kw in configs:
        out = run(**kw)
        print(f"{name:>18}: max|dScore| vs highest = "
              f"{np.abs(out - ref).max():.3e}", flush=True)


if __name__ == "__main__":
    main()

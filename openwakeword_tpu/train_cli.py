"""End-to-end training pipeline CLI.

Mirrors the reference's ``python train.py --training_config cfg.yml`` flow
(reference train.py:596-910): synthetic TTS clip generation (via the external
piper-sample-generator, gated), adversarial negative texts, batched JAX
augmentation -> feature memmaps, auto-training of the classifier head, and
export to native + ONNX formats. Every stage is idempotent/resumable: clip
generation skips when >=95% of the target count exists; features are only
recomputed with --overwrite.

Usage:
    python -m openwakeword_tpu.train_cli --training_config my_model.yml \
        --generate_clips --augment_clips --train_model --export_onnx
"""

import argparse
import logging
import os
import random
import sys
import uuid
from pathlib import Path

import numpy as np

from openwakeword_tpu.data import augment_clips, generate_adversarial_texts, mmap_batch_generator
from openwakeword_tpu.features import compute_features_from_generator
from openwakeword_tpu.training.trainer import HeadTrainer


def _load_config(path):
    import yaml
    with open(path, "r") as f:
        return yaml.safe_load(f.read())


def _generate_clip_set(generate_samples, texts, n_target, output_dir, batch_size,
                       noise_scales, length_scales=(0.75, 1.0, 1.25)):
    os.makedirs(output_dir, exist_ok=True)
    n_current = len(os.listdir(output_dir))
    if n_current > 0.95 * n_target:
        logging.warning("Skipping clip generation for %s: ~%d already exist",
                        output_dir, n_target)
        return
    generate_samples(
        text=texts, max_samples=n_target - n_current, batch_size=batch_size,
        noise_scales=list(noise_scales), noise_scale_ws=list(noise_scales),
        length_scales=list(length_scales), output_dir=output_dir,
        auto_reduce_batch_size=True,
        file_names=[uuid.uuid4().hex + ".wav" for _ in range(n_target)])


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--training_config", type=str, required=True,
                        help="Path to the YAML training config (see examples/custom_model.yml)")
    parser.add_argument("--generate_clips", action="store_true",
                        help="Run synthetic TTS data generation (requires piper-sample-generator)")
    parser.add_argument("--augment_clips", action="store_true",
                        help="Run augmentation + feature pre-compute")
    parser.add_argument("--overwrite", action="store_true",
                        help="Recompute features even if they exist")
    parser.add_argument("--distill_student", action="store_true",
                        help="Distill the TPU-shaped student embedding against the "
                             "installed teacher and save it to the registry path "
                             "(prerequisite for embedding: student serving; "
                             "skipped if a student checkpoint already exists "
                             "unless --overwrite)")
    parser.add_argument("--train_model", action="store_true",
                        help="Train the classifier head (auto-train schedule)")
    parser.add_argument("--export_onnx", action="store_true",
                        help="Also export the trained model as ONNX")
    parser.add_argument("--convert_to_tflite", action="store_true",
                        help="Also export the trained model as TFLite")
    args = parser.parse_args(argv)

    config = _load_config(args.training_config)
    config["output_dir"] = os.path.abspath(config["output_dir"])
    # `embedding: student` trains the head on the TPU-shaped student
    # frontend's features (models/embedding_student.py) so the exported model
    # is served drift-free by a student-mode engine. Student features live in
    # *.student.npy files — switching the key never silently reuses features
    # computed with the other frontend.
    embedding = config.get("embedding", "default")
    if embedding not in ("default", "student"):
        raise ValueError(f"config key 'embedding' must be 'default' or "
                         f"'student', got {embedding!r}")
    feat_suffix = ".student.npy" if embedding == "student" else ".npy"
    # optional `seed` config key: makes the whole pipeline (augmentation
    # draws, window-size sampling, trainer init) reproducible run-to-run
    seed = config.get("seed")
    if seed is not None:
        seed = int(seed)
        np.random.seed(seed)
        random.seed(seed)
    model_dir = os.path.join(config["output_dir"], config["model_name"])
    os.makedirs(model_dir, exist_ok=True)

    positive_train = os.path.join(model_dir, "positive_train")
    positive_test = os.path.join(model_dir, "positive_test")
    negative_train = os.path.join(model_dir, "negative_train")
    negative_test = os.path.join(model_dir, "negative_test")
    feature_save_dir = model_dir

    rir_paths = [i.path for j in config.get("rir_paths", []) for i in os.scandir(j)]
    background_paths = []
    dup_rates = config.get("background_paths_duplication_rate", [])
    bg_dirs = config.get("background_paths", [])
    if len(dup_rates) != len(bg_dirs):
        dup_rates = [1] * len(bg_dirs)
    for background_path, duplication_rate in zip(bg_dirs, dup_rates):
        background_paths.extend([i.path for i in os.scandir(background_path)] * duplication_rate)

    # ------------------------------------------------------------------
    if args.generate_clips:
        sys.path.insert(0, os.path.abspath(config["piper_sample_generator_path"]))
        try:
            from generate_samples import generate_samples
        except ImportError as e:
            raise ImportError(
                "Synthetic clip generation requires the external piper-sample-generator "
                "repo (config key 'piper_sample_generator_path'). "
                f"Import failed: {e}") from e

        logging.info("Generating positive clips (train/test)...")
        _generate_clip_set(generate_samples, config["target_phrase"], config["n_samples"],
                           positive_train, config["tts_batch_size"], [0.98])
        _generate_clip_set(generate_samples, config["target_phrase"], config["n_samples_val"],
                           positive_test, config["tts_batch_size"], [1.0])

        logging.info("Generating adversarial negative clips (train/test)...")
        for out_dir, n_target, noise in ((negative_train, config["n_samples"], [0.98]),
                                         (negative_test, config["n_samples_val"], [1.0])):
            adversarial_texts = list(config.get("custom_negative_phrases", []))
            for target_phrase in config["target_phrase"]:
                adversarial_texts.extend(generate_adversarial_texts(
                    input_text=target_phrase,
                    N=n_target // len(config["target_phrase"]),
                    include_partial_phrase=1.0,
                    include_input_words=0.2))
            _generate_clip_set(generate_samples, adversarial_texts, n_target, out_dir,
                               max(1, config["tts_batch_size"] // 7), noise)

    # ------------------------------------------------------------------
    # optional override of the registry's student-checkpoint location (used
    # by both the distill stage and student-mode feature pre-compute; serve
    # with Model(embedding="student", embedding_model_path=<same path>))
    from openwakeword_tpu import registry
    student_path = (config.get("student_checkpoint_path")
                    or registry.FEATURE_MODELS["embedding_student"]["model_path"])

    if args.distill_student:
        if os.path.exists(student_path) and not args.overwrite:
            logging.warning("Student checkpoint already exists at %s; skipping "
                            "distillation (use --overwrite to redo)", student_path)
        else:
            from openwakeword_tpu.training.distill import distill_default_student
            # mix the generated positive clips into the distillation data so
            # the student is fit on the deployment's own speech distribution
            speech_wavs = [str(i) for i in Path(positive_train).glob("*.wav")][:256]
            _, report = distill_default_student(
                student_path, speech_wavs=speech_wavs or None,
                steps=int(config.get("distill_steps", 3000)),
                batch_size=int(config.get("distill_batch_size", 256)),
                seed=seed if seed is not None else 0)
            logging.info("Student distilled (drift report: %s)", report)

    # Auto-size the training window: median positive duration + 750 ms,
    # min/snap 32000 samples (reference train.py:745-758)
    positive_clips = [str(i) for i in Path(positive_test).glob("*.wav")]
    if positive_clips:
        import wave
        durations = []
        for _ in range(min(50, len(positive_clips))):
            p = positive_clips[np.random.randint(0, len(positive_clips))]
            with wave.open(p, "rb") as f:
                durations.append(f.getnframes())
        config["total_length"] = int(round(np.median(durations) / 1000) * 1000) + 12000
        if config["total_length"] < 32000 or abs(config["total_length"] - 32000) <= 4000:
            config["total_length"] = 32000
    else:
        config.setdefault("total_length", 32000)

    # ------------------------------------------------------------------
    if args.augment_clips:
        split_outputs = ((positive_train, "positive_features_train" + feat_suffix),
                         (negative_train, "negative_features_train" + feat_suffix),
                         (positive_test, "positive_features_test" + feat_suffix),
                         (negative_test, "negative_features_test" + feat_suffix))
        # resume-safe: features are computed into a .tmp name and renamed on
        # completion, and the skip check requires EVERY split to exist — a
        # crash mid-stage can therefore never leave a partial (zero-filled
        # memmap) file that later runs mistake for finished features
        all_done = all(os.path.exists(os.path.join(feature_save_dir, name))
                       for _, name in split_outputs)
        if not all_done or args.overwrite:
            logging.info("Augmenting clips and computing features...")
            for si, (split_dir, out_name) in enumerate(split_outputs):
                final_path = os.path.join(feature_save_dir, out_name)
                if os.path.exists(final_path) and not args.overwrite:
                    continue
                clips = [str(i) for i in Path(split_dir).glob("*.wav")] \
                    * config.get("augmentation_rounds", 1)
                gen = augment_clips(clips, total_length=config["total_length"],
                                    batch_size=config.get("augmentation_batch_size", 128),
                                    background_clip_paths=background_paths,
                                    RIR_paths=rir_paths,
                                    seed=(seed + si + 1) if seed is not None else 0)
                tmp_path = final_path + ".tmp.npy"
                compute_features_from_generator(
                    gen, n_total=len(clips), clip_duration=config["total_length"],
                    output_file=tmp_path, embedding=embedding,
                    embedding_model_path=(student_path if embedding == "student"
                                          else ""))
                os.replace(tmp_path, final_path)
        else:
            logging.warning("Features already exist; skipping augmentation "
                            "(use --overwrite to recompute)")

    # ------------------------------------------------------------------
    if args.train_model:
        input_shape = np.load(os.path.join(feature_save_dir,
                                           "positive_features_test" + feat_suffix),
                              mmap_mode="r").shape[1:]
        trainer = HeadTrainer(n_classes=1, input_shape=input_shape,
                              model_type=config.get("model_type", "dnn"),
                              layer_dim=config.get("layer_size", 128),
                              seconds_per_example=1280 * input_shape[0] / 16000,
                              seed=seed if seed is not None else 0)

        def reshape_negative(x, n=input_shape[0]):
            """Re-window negative feature arrays whose clip length differs
            from the model's input frames (reference train.py:829-836)."""
            if n != x.shape[1]:
                x = np.vstack(x)
                return np.array([x[i:i + n, :] for i in range(0, x.shape[0] - n, n)])
            return x

        feature_data_files = dict(config.get("feature_data_files", {}))
        if embedding == "student" and (feature_data_files
                                       or config.get("false_positive_validation_data_path")):
            logging.warning(
                "embedding: student — the pre-computed feature sets in "
                "'feature_data_files' / 'false_positive_validation_data_path' "
                "must themselves have been computed with the student frontend "
                "(compute_features_from_generator(embedding='student')); "
                "teacher-frontend features would poison training/validation")
        data_transforms = {key: reshape_negative for key in feature_data_files.keys()}
        label_transforms = {}
        for key in ["positive"] + list(feature_data_files.keys()) + ["adversarial_negative"]:
            label_transforms[key] = (lambda x: [1 for _ in x]) if key == "positive" \
                else (lambda x: [0 for _ in x])

        feature_data_files["positive"] = os.path.join(
            feature_save_dir, "positive_features_train" + feat_suffix)
        feature_data_files["adversarial_negative"] = os.path.join(
            feature_save_dir, "negative_features_train" + feat_suffix)

        batch_generator = mmap_batch_generator(
            feature_data_files,
            n_per_class=config.get("batch_n_per_class", {}),
            data_transform_funcs=data_transforms,
            label_transform_funcs=label_transforms)

        # Validation sets
        X_val_fp = None
        # one 80 ms model frame per feature row; the FP/hr denominator is
        # the REAL duration of whatever set is supplied, not the published
        # 11.3 h default (an 1 h set judged against 11.3 would under-report
        # FP/hr 11x and suppress the negative-weight doubling)
        val_set_hrs = 11.3
        fp_path = config.get("false_positive_validation_data_path")
        if fp_path and os.path.exists(fp_path):
            fp_feats = np.load(fp_path)
            if fp_feats.ndim != 2:
                raise ValueError(
                    f"false_positive_validation_data_path must hold a 2-D "
                    f"(frames, 96) feature array, got shape {fp_feats.shape}")
            if fp_feats.shape[0] > input_shape[0]:
                # zero-copy stride-1 windows: the dense list-comprehension form
                # allocates ~16x the source array (~3 GB for the recommended
                # 11 h validation set). Chunk into bounded batches so each
                # validation forward transfers/copies a slice, never the
                # whole window view at once.
                windows = np.lib.stride_tricks.sliding_window_view(
                    fp_feats, input_shape[0], axis=0)[:-1].transpose(0, 2, 1)
                chunk = 8192
                X_val_fp = [(windows[i:i + chunk],
                             np.zeros(min(chunk, windows.shape[0] - i), np.float32))
                            for i in range(0, windows.shape[0], chunk)]
                val_set_hrs = fp_feats.shape[0] * 0.08 / 3600.0
            else:
                logging.warning(
                    "false-positive validation features are shorter than one "
                    "model window (%d <= %d rows); skipping FP validation",
                    fp_feats.shape[0], input_shape[0])

        X_val_pos = np.load(os.path.join(feature_save_dir,
                                         "positive_features_test" + feat_suffix))
        X_val_neg = np.load(os.path.join(feature_save_dir,
                                         "negative_features_test" + feat_suffix))
        labels = np.hstack((np.ones(X_val_pos.shape[0]), np.zeros(X_val_neg.shape[0]))).astype(np.float32)
        X_val = [(np.vstack((X_val_pos, X_val_neg)), labels)]
        if X_val_fp is None:
            # falling back to the balanced val set: its duration, not 11.3 h
            val_set_hrs = labels.shape[0] * input_shape[0] * 0.08 / 3600.0

        best_model = trainer.auto_train(
            X_train=batch_generator,
            X_val=X_val,
            false_positive_val_data=X_val_fp or X_val,
            steps=config["steps"],
            max_negative_weight=config.get("max_negative_weight", 1000),
            target_fp_per_hour=config.get("target_false_positives_per_hour", 0.2),
            val_set_hrs=val_set_hrs)

        trainer.save_model(os.path.join(config["output_dir"], config["model_name"] + ".npz"),
                           model=best_model, meta={"embedding": embedding})
        if args.export_onnx:
            from openwakeword_tpu.io.onnx_export import export_head_onnx
            export_head_onnx(best_model,
                             os.path.join(config["output_dir"], config["model_name"] + ".onnx"),
                             output_name=config["model_name"])
        if args.convert_to_tflite:
            # every trainable family exports (dnn/mlp FC chains, rnn via
            # UNIDIRECTIONAL_SEQUENCE_LSTM), matching reference
            # train.py:574-593's convert-anything contract
            from openwakeword_tpu.io.tflite_export import export_head_tflite
            export_head_tflite(best_model,
                               os.path.join(config["output_dir"], config["model_name"] + ".tflite"),
                               output_name=config["model_name"])
        logging.info("Training complete; model saved to %s",
                     os.path.join(config["output_dir"], config["model_name"] + ".npz"))


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()

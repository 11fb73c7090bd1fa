"""End-to-end training-CLI test: synthetic WAV clips -> augmentation ->
feature memmaps -> auto-train -> native + ONNX export (the reference leaves
this whole path untested; SURVEY.md section 4)."""

import os

import numpy as np
import pytest
import yaml

from openwakeword_tpu import data as D


@pytest.fixture()
def training_setup(tmp_path, rng):
    model_dir = tmp_path / "out" / "tiny_model"
    for split in ("positive_train", "positive_test", "negative_train", "negative_test"):
        d = model_dir / split
        d.mkdir(parents=True)
        for i in range(8):
            # positives: tone bursts; negatives: noise (separable-ish)
            n = 16000
            if "positive" in split:
                t = np.arange(n) / 16000
                sig = 0.4 * np.sin(2 * np.pi * (300 + 50 * i) * t) * np.hanning(n)
            else:
                sig = rng.uniform(-0.3, 0.3, n)
            D.write_audio(str(d / f"clip{i}.wav"), sig.astype(np.float32))
    cfg = {
        "model_name": "tiny_model",
        "target_phrase": ["hey tiny"],
        "custom_negative_phrases": [],
        "output_dir": str(tmp_path / "out"),
        "piper_sample_generator_path": "./nonexistent",
        "n_samples": 8,
        "n_samples_val": 8,
        "tts_batch_size": 4,
        "augmentation_batch_size": 8,
        "augmentation_rounds": 1,
        "rir_paths": [],
        "background_paths": [],
        "background_paths_duplication_rate": [],
        "feature_data_files": {},
        "batch_n_per_class": {},
        "false_positive_validation_data_path": "",
        "model_type": "dnn",
        "layer_size": 16,
        "steps": 30,
        "max_negative_weight": 5,
        # unreachable target: the between-sequence negative-weight doubling
        # must fire deterministically in this miniature run
        "target_false_positives_per_hour": -1.0,
        # exercises the config seed path (threaded into augment_clips and
        # HeadTrainer)
        "seed": 3,
    }
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path, cfg


def test_augment_train_export(training_setup, tmp_path, caplog):
    import logging
    from openwakeword_tpu.train_cli import main
    cfg_path, cfg = training_setup
    with caplog.at_level(logging.INFO):
        main(["--training_config", cfg_path, "--augment_clips", "--train_model",
              "--export_onnx"])

    # the miniature run drives all 3 auto-train sequences; with random-init
    # heads the FP/hr target is missed, so the negative-weight doubling
    # between sequences must actually fire (VERDICT r2 item 4)
    assert any("Increasing weight on negative examples" in r.message
               for r in caplog.records)

    out = cfg["output_dir"]
    feats = np.load(os.path.join(out, "tiny_model", "positive_features_train.npy"))
    assert feats.shape[0] == 8 and feats.shape[2] == 96

    # trained model loads in the inference engine and scores audio
    npz = os.path.join(out, "tiny_model.npz")
    onnx = os.path.join(out, "tiny_model.onnx")
    assert os.path.exists(npz) and os.path.exists(onnx)

    import openwakeword_tpu as oww
    m = oww.Model(wakeword_models=[npz])
    preds = m.predict(np.random.default_rng(0).integers(-1000, 1000, 1280).astype(np.int16))
    assert "tiny_model" in preds

    # the ONNX export round-trips through our importer with equal scores
    from openwakeword_tpu.io.loaders import load_model_file
    kind, params, _ = load_model_file(onnx)
    assert kind == "head"
    from openwakeword_tpu.models import heads
    import jax.numpy as jnp
    x = np.random.default_rng(1).normal(0, 1, (2,) + feats.shape[1:]).astype(np.float32)
    kind2, params2, _ = load_model_file(npz)
    np.testing.assert_allclose(np.asarray(heads.apply(params, jnp.asarray(x))),
                               np.asarray(heads.apply(params2, jnp.asarray(x))), atol=1e-6)


def test_student_pipeline_trains_and_tags_frontend(training_setup, tmp_path, caplog):
    """`embedding: student` runs the whole pipeline on student-frontend
    features (suffixed files, tagged checkpoint) and engines warn on a
    frontend mismatch at load (docs/student_embedding.md)."""
    import logging
    import yaml
    from openwakeword_tpu.train_cli import main
    cfg_path, cfg = training_setup
    cfg = dict(cfg, embedding="student", model_name="tiny_student", steps=10,
               distill_steps=3, distill_batch_size=8,
               student_checkpoint_path=str(tmp_path / "student.npz"))
    # reuse the already-generated clip dirs under the original model dir
    import shutil
    src = os.path.join(cfg["output_dir"], "tiny_model")
    dst = os.path.join(cfg["output_dir"], "tiny_student")
    os.makedirs(dst, exist_ok=True)
    for split in ("positive_train", "positive_test", "negative_train", "negative_test"):
        if not os.path.exists(os.path.join(dst, split)):
            shutil.copytree(os.path.join(src, split), os.path.join(dst, split))
    cfg_path2 = str(tmp_path / "cfg_student.yml")
    with open(cfg_path2, "w") as f:
        yaml.safe_dump(cfg, f)
    main(["--training_config", cfg_path2, "--distill_student",
          "--augment_clips", "--train_model"])

    # the distill stage produced a student checkpoint at the override path
    from openwakeword_tpu.io.loaders import load_model_file as _load
    student_npz = str(tmp_path / "student.npz")
    assert os.path.exists(student_npz)
    skind, sparams, _ = _load(student_npz)
    from openwakeword_tpu.models import embedding_student
    assert embedding_student.is_student(sparams)

    # features landed in .student.npy files (never aliasing teacher features)
    feats = np.load(os.path.join(dst, "positive_features_train.student.npy"))
    assert feats.shape[0] == 8 and feats.shape[2] == 96
    assert not os.path.exists(os.path.join(dst, "positive_features_train.npy"))

    # idempotency: a second distill invocation skips (checkpoint exists)
    import logging as _logging
    with caplog.at_level(_logging.WARNING):
        caplog.clear()
        main(["--training_config", cfg_path2, "--distill_student"])
        assert any("skipping distillation" in r.message.lower()
                   for r in caplog.records)

    # the checkpoint records its frontend
    npz = os.path.join(cfg["output_dir"], "tiny_student.npz")
    from openwakeword_tpu.io.loaders import load_model_file
    _, _, meta = load_model_file(npz)
    assert meta.get("embedding") == "student"

    import openwakeword_tpu as oww

    # matched frontend: loads silently (no mismatch warning), serving with
    # the same distilled student the features were computed with
    with caplog.at_level(logging.WARNING):
        caplog.clear()
        m = oww.Model(wakeword_models=[npz], embedding="student",
                      embedding_model_path=student_npz)
        assert not any("embedding frontend" in r.message for r in caplog.records)
        preds = m.predict(np.zeros(1280, np.int16))
        assert "tiny_student" in preds

        # mismatched frontend: loud warning from both engines
        caplog.clear()
        oww.Model(wakeword_models=[npz])
        assert any("embedding frontend" in r.message for r in caplog.records)

        caplog.clear()
        from openwakeword_tpu.parallel.engine import MultiStreamEngine
        MultiStreamEngine(wakeword_models=[npz], n_streams=2)
        assert any("embedding frontend" in r.message for r in caplog.records)

"""Custom verifier end-to-end tests (reference tests/test_custom_verifier_model.py
semantics): train on reference clips, wire into the Model, and check the
error paths."""

import os
import pickle

import numpy as np
import pytest

import openwakeword_tpu as oww
from openwakeword_tpu.custom_verifier_model import (
    train_custom_verifier, train_verifier_model, fold_verifier,
    get_reference_clip_features)


@pytest.fixture(scope="module")
def verifier_path(tmp_path_factory, test_clips):
    """Train a verifier for the (random-weight) alexa head using threshold-0
    mining so positive features exist regardless of untrained scores."""
    from openwakeword_tpu import custom_verifier_model as cvm
    path = str(tmp_path_factory.mktemp("verifier") / "alexa_verifier.pkl")
    orig = cvm.get_reference_clip_features

    def mine_all(clip, model, name, threshold=0.5, N=3, **kw):
        return orig(clip, model, name, threshold=0.0, N=N, **kw)
    cvm.get_reference_clip_features = mine_all
    try:
        train_custom_verifier(
            positive_reference_clips=[test_clips["alexa"]],
            negative_reference_clips=[test_clips["hey_jane"]],
            output_path=path,
            model_name="alexa",
            wakeword_models=["alexa"],
        )
    finally:
        cvm.get_reference_clip_features = orig
    return path


def test_verifier_training_and_loading(verifier_path):
    with open(verifier_path, "rb") as f:
        pipeline = pickle.load(f)
    x = np.random.default_rng(0).normal(0, 1, (3, 16, 96)).astype(np.float32)
    proba = pipeline.predict_proba(x)
    assert proba.shape == (3, 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-6)


def test_verifier_wired_into_model(verifier_path, test_clips, rng):
    m = oww.Model(wakeword_models=["alexa"],
                  custom_verifier_models={"alexa": verifier_path},
                  custom_verifier_threshold=0.0)
    preds = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
    assert 0 <= preds["alexa"] <= 1


def test_verifier_key_mismatch_raises(verifier_path):
    with pytest.raises(ValueError):
        oww.Model(wakeword_models=["alexa"],
                  custom_verifier_models={"not_a_model": verifier_path})


def test_fold_verifier_matches_pipeline(verifier_path, rng):
    with open(verifier_path, "rb") as f:
        pipeline = pickle.load(f)
    w, b = fold_verifier(pipeline)
    x = rng.normal(0, 1, (4, 16, 96)).astype(np.float32)
    want = pipeline.predict_proba(x)[:, -1]
    got = 1 / (1 + np.exp(-(x.reshape(4, -1) @ w + b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_no_positive_features_raises(test_clips, tmp_path):
    """Mining with an impossible threshold must produce the reference's
    'positive features were not created' error."""
    m = oww.Model(wakeword_models=["alexa"])
    feats = get_reference_clip_features(test_clips["alexa"], m, "alexa",
                                        threshold=1.1, N=1)
    assert feats.shape[0] == 0
    with pytest.raises(ValueError):
        # monkeypatch threshold via a trained pipeline path: use the public
        # entry with clips that can never clear threshold 1.1
        from openwakeword_tpu import custom_verifier_model as cvm
        orig = cvm.get_reference_clip_features

        def never_positive(clip, model, name, threshold=0.5, N=3, **kw):
            return orig(clip, model, name, threshold=1.1, N=1, **kw)
        cvm.get_reference_clip_features = never_positive
        try:
            train_custom_verifier([test_clips["alexa"]], [test_clips["hey_jane"]],
                                  str(tmp_path / "v.pkl"), "alexa",
                                  wakeword_models=["alexa"])
        finally:
            cvm.get_reference_clip_features = orig

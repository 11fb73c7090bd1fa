"""Streaming-vs-batch consistency and scan-vs-step equivalence."""

import numpy as np
import pytest

import openwakeword_tpu as oww
from openwakeword_tpu.features import AudioFeatures
from openwakeword_tpu.parallel import MultiStreamEngine


def test_streaming_mel_matches_whole_clip(rng, monkeypatch):
    """Streamed mel frames must match the whole-clip computation except for
    warm-up rows (the reference documents only 'slight numerical issues' at
    boundaries, utils.py:388-392; with the data-dependent clamp disabled the
    match must be exact)."""
    from openwakeword_tpu import config
    monkeypatch.setattr(config, "MEL_TOP_DB", None)
    x = (rng.uniform(-1, 1, 1280 * 20) * 12000).astype(np.int16)
    af = AudioFeatures()
    for t in range(20):
        af(x[t * 1280:(t + 1) * 1280])
    streamed = af.melspectrogram_buffer
    whole = af._get_melspectrogram(x)
    n = min(len(streamed), len(whole)) - 8
    np.testing.assert_allclose(streamed[-n:], whole[-n:], atol=1e-4)


def test_random_chunk_splits_match_1280_feed(rng):
    """Feeding the same audio as arbitrarily-sized chunks (including tiny
    and odd sizes that exercise the accumulate/remainder path, reference
    utils.py:409-452) must leave AudioFeatures in the same state as the
    canonical 1280-sample feed, and the Model's best score must agree."""
    total = 1280 * 16
    x = (rng.uniform(-1, 1, total) * 11000).astype(np.int16)

    ref = AudioFeatures()
    for t in range(16):
        ref(x[t * 1280:(t + 1) * 1280])

    for trial in range(3):
        cuts = np.sort(rng.choice(np.arange(1, total), 25, replace=False))
        pieces = np.split(x, cuts)
        af = AudioFeatures()
        for piece in pieces:
            if piece.size:
                af(piece)
        np.testing.assert_allclose(
            np.asarray(af.melspectrogram_buffer),
            np.asarray(ref.melspectrogram_buffer), atol=2e-3,
            err_msg=f"mel buffer diverged (trial {trial})")
        np.testing.assert_allclose(
            np.asarray(af.feature_buffer)[-19:],
            np.asarray(ref.feature_buffer)[-19:], atol=5e-3,
            err_msg=f"feature buffer diverged (trial {trial})")

    m_ref = oww.Model(wakeword_models=["alexa"])
    best_ref = max(m_ref.predict(x[t * 1280:(t + 1) * 1280])["alexa"]
                   for t in range(16))
    cuts = np.sort(rng.choice(np.arange(1, total), 31, replace=False))
    m = oww.Model(wakeword_models=["alexa"])
    best = 0.0
    for piece in np.split(x, cuts):
        if piece.size:
            best = max(best, m.predict(piece)["alexa"])
    assert abs(best - best_ref) < 5e-3


def test_engine_scan_matches_stepwise(rng):
    # T=40 wraps both steady-scan circular buffers (mel tail: 10 slots,
    # feature ring: 34 rows), covering the phase-cursor arithmetic
    T = 40
    audio = (rng.uniform(-1, 1, (3, 1280 * T)) * 9000).astype(np.int16)
    e1 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=3, rng_seed=0)
    e2 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=3, rng_seed=0)
    stepwise = np.stack([e1.predict(audio[:, t * 1280:(t + 1) * 1280])
                         for t in range(T)])
    frames = np.stack([audio[:, t * 1280:(t + 1) * 1280] for t in range(T)])
    scanned = e2.predict_frames(frames)
    np.testing.assert_allclose(stepwise, scanned, atol=1e-6)
    for key in ("mel_ring", "feat_ring"):
        np.testing.assert_array_equal(np.asarray(e1.state[key]),
                                      np.asarray(e2.state[key]))


def test_engine_scan_single_frame(rng):
    """T=1 scan: the peeled first step runs, the inner steady scan is empty,
    and the exit-time ring reconstruction must still return canonical state."""
    audio = (rng.uniform(-1, 1, (3, 1280 * 2)) * 9000).astype(np.int16)
    e1 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=3, rng_seed=0)
    e2 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=3, rng_seed=0)
    for t in range(2):   # T=1 scans back-to-back, mid-stream on the 2nd
        step = e1.predict(audio[:, t * 1280:(t + 1) * 1280])
        scan = e2.predict_frames(audio[None, :, t * 1280:(t + 1) * 1280])
        np.testing.assert_allclose(step, scan[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(e1.state["mel_ring"]),
                               np.asarray(e2.state["mel_ring"]), atol=0)
    np.testing.assert_allclose(np.asarray(e1.state["feat_ring"]),
                               np.asarray(e2.state["feat_ring"]), atol=0)


def test_mixed_architecture_model(rng, tmp_path):
    """dnn + mlp + rnn heads coexist in one Model."""
    import jax
    from openwakeword_tpu.io.checkpoints import save_checkpoint
    from openwakeword_tpu.models import heads
    rnn = heads.init_params(jax.random.PRNGKey(3), "rnn", 16, 1)
    rnn_path = str(tmp_path / "rnn_head.npz")
    save_checkpoint(rnn_path, "head", rnn)
    m = oww.Model(wakeword_models=["alexa", "timer", rnn_path])
    preds = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
    assert "alexa" in preds and "1_minute_timer" in preds and "rnn_head" in preds


def test_engine_mixed_group_and_single(rng, tmp_path):
    """Engine plan handles fused groups + singletons (timer) together with
    correct label ordering."""
    e = MultiStreamEngine(wakeword_models=["alexa", "timer", "weather"], n_streams=2)
    assert e.labels[0] == "alexa"
    assert "1_minute_timer" in e.labels and "weather" in e.labels
    s = e.predict(rng.integers(-1000, 1000, (2, 1280)).astype(np.int16))
    assert s.shape == (2, len(e.labels))

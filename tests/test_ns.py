"""Native C++ noise-suppression tests (the TPU build's SpeexDSP equivalent)."""

import numpy as np
import pytest

pytest.importorskip("ctypes")


@pytest.fixture(scope="module")
def ns():
    from openwakeword_tpu.ns import NoiseSuppression
    try:
        return NoiseSuppression()
    except (ImportError, OSError) as e:
        pytest.skip(f"native NS unavailable: {e}")


def test_suppresses_stationary_noise_preserves_speech(ns, rng):
    n = 16000 * 3
    noise = rng.normal(0, 800, n).astype(np.int16)
    t = np.arange(n) / 16000
    gate = np.sin(2 * np.pi * 1.2 * t)
    speech = (6000 * np.sin(2 * np.pi * 500 * t) * (gate > 0.4)).astype(np.int16)
    x = (noise.astype(np.int32) + speech.astype(np.int32)).clip(-32768, 32767).astype(np.int16)
    y = ns.process_frames(x)
    assert y.shape == x.shape and y.dtype == np.int16

    mask = (gate <= 0.2).copy(); mask[:16000] = False
    atten_db = 20 * np.log10(np.sqrt(np.mean(y[mask].astype(np.float64) ** 2))
                             / np.sqrt(np.mean(x[mask].astype(np.float64) ** 2)))
    assert atten_db < -4.0, f"noise only attenuated {atten_db:.1f} dB"

    smask = (gate > 0.6).copy(); smask[:16000] = False
    sp_db = 20 * np.log10(np.sqrt(np.mean(y[smask].astype(np.float64) ** 2))
                          / np.sqrt(np.mean(x[smask].astype(np.float64) ** 2)))
    assert sp_db > -1.5, f"speech attenuated {sp_db:.1f} dB"


def test_partial_frame_passthrough(ns, rng):
    x = rng.integers(-1000, 1000, 250).astype(np.int16)  # 160 + 90 leftover
    y = ns.process_frames(x)
    np.testing.assert_array_equal(y[160:], x[160:])  # tail passes through


def test_model_integration(rng):
    import openwakeword_tpu as oww
    try:
        m = oww.Model(wakeword_models=["alexa"], enable_speex_noise_suppression=True)
    except (ImportError, OSError) as e:
        pytest.skip(f"native NS unavailable: {e}")
    out = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
    assert 0 <= out["alexa"] <= 1

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


def test_jax_ns_matches_native(ns, rng):
    """The batched on-device suppressor (ops.ns_jax) must reproduce the
    native library sample-for-sample (same tables, same state recursions;
    only float summation order differs -> at most 1 int16 LSB). A FRESH
    native instance is required: the module fixture's noise floor has
    already adapted to earlier tests' audio."""
    import jax
    from openwakeword_tpu.ns import NoiseSuppression
    from openwakeword_tpu.ops import ns_jax
    ns = NoiseSuppression()
    n = 16000 * 2
    t = np.arange(n) / 16000
    x = (rng.normal(0, 800, n)
         + 6000 * np.sin(2 * np.pi * 500 * t) * (np.sin(2 * np.pi * 1.2 * t) > 0.4)
         ).clip(-32768, 32767).astype(np.int16)
    y_native = ns.process_frames(x)
    state = ns_jax.init_state(1)
    state, y = jax.jit(ns_jax.process_chunk)(state, x.astype(np.float32)[None])
    y_jax = np.asarray(y[0]).astype(np.int16)
    d = np.abs(y_native.astype(np.int32) - y_jax.astype(np.int32))
    assert d.max() <= 1, f"max deviation {d.max()} LSB"
    assert (d == 0).mean() > 0.95


def test_jax_fallback_class_matches_native(ns, rng):
    """JaxNoiseSuppression (host fallback) behind the process_frames
    interface must track a fresh native instance."""
    from openwakeword_tpu.ns import JaxNoiseSuppression, NoiseSuppression
    native = NoiseSuppression()
    fallback = JaxNoiseSuppression()
    x = rng.integers(-8000, 8000, 160 * 30 + 90).astype(np.int16)
    y_native = native.process_frames(x)
    y_jax = fallback.process_frames(x)
    d = np.abs(y_native.astype(np.int32) - y_jax.astype(np.int32))
    assert d.max() <= 1
    np.testing.assert_array_equal(y_jax[160 * 30:], x[160 * 30:])  # tail passthrough


class TestMmseProfile:
    """'mmse' NS profile: the SpeexDSP preprocessor's update rules
    (MMSE-STSA gain, decision-directed prior SNR, speech-probability
    weighting — ops/ns_jax._mmse_gain) behind the same frame contract."""

    @staticmethod
    def _numpy_oracle(x: np.ndarray) -> np.ndarray:
        """Independent numpy+scipy implementation of the mmse step."""
        from scipy.special import i0e, i1e
        from openwakeword_tpu.ops import ns_jax as M

        F, W, K = M.FRAME, M.WIN, M.BINS
        n = np.arange(W)
        window = np.sqrt(0.5 - 0.5 * np.cos(2 * np.pi * n / W))
        ang = 2 * np.pi * np.outer(n, np.arange(K)) / W
        cos_t, sin_t = np.cos(ang), np.sin(ang)
        wk = np.concatenate([[1.0], np.full(K - 2, 2.0), [1.0]])

        prev_in = np.zeros(F); overlap = np.zeros(F)
        psd = np.zeros(K); noise = np.full(K, 1e6)
        prev_amp2 = np.zeros(K); frames_seen = 0
        out = np.empty_like(x)
        for i in range(0, len(x) - F + 1, F):
            fr = x[i:i + F].astype(np.float64)
            buf = np.concatenate([prev_in * window[:F], fr * window[F:]])
            re = buf @ cos_t
            im = -(buf @ sin_t)
            prev_in = fr
            frames_seen = min(frames_seen + 1, M.WARMUP_FRAMES + 1)
            p = re * re + im * im
            psd = M.PSD_ALPHA * psd + (1 - M.PSD_ALPHA) * p
            if frames_seen <= M.WARMUP_FRAMES:
                noise = np.minimum(0.7 * noise + 0.3 * psd, psd)
            else:
                noise = np.where(psd < noise, psd, noise * M.NOISE_RISE)
            nz = np.maximum(noise, 1e-10)
            gamma = np.clip(p / nz, 1e-6, M.SNR_CEIL)
            xi = np.clip(M.DD_ALPHA * prev_amp2 / nz
                         + (1 - M.DD_ALPHA) * np.maximum(gamma - 1, 0),
                         1e-6, M.SNR_CEIL)
            v = xi / (1 + xi) * gamma
            g = (np.sqrt(np.pi * v) / (2 * gamma)) * (
                (1 + v) * i0e(v / 2) + v * i1e(v / 2))
            g = np.clip(g, 1e-6, 1.0)
            gamma_s = np.clip(psd / nz, 1e-6, M.SNR_CEIL)
            v_s = xi / (1 + xi) * gamma_s
            odds = (M.Q_ABSENCE / (1 - M.Q_ABSENCE)) * (1 + xi) \
                * np.exp(-np.minimum(v_s, 50.0))
            p_sp = 1 / (1 + odds)
            g = np.exp(p_sp * np.log(g) + (1 - p_sp) * np.log(M.GAIN_FLOOR))
            g = np.clip(g, M.GAIN_FLOOR, 1.0)
            prev_amp2 = (g * g) * p
            re, im = re * g, im * g
            synth = ((re * wk) @ cos_t.T - (im * wk) @ sin_t.T) * (window / W)
            out[i:i + F] = np.clip(np.round(synth[:F] + overlap),
                                   -32768, 32767).astype(np.int16)
            overlap = synth[F:]
        return out

    def test_matches_numpy_oracle(self, rng):
        import jax
        from openwakeword_tpu.ops import ns_jax
        n = 160 * 40
        t = np.arange(n) / 16000
        x = (rng.normal(0, 600, n)
             + 5000 * np.sin(2 * np.pi * 440 * t)
             * (np.sin(2 * np.pi * 1.5 * t) > 0.3)
             ).clip(-32768, 32767).astype(np.int16)
        y_ref = self._numpy_oracle(x)
        state = ns_jax.init_state(1, profile="mmse")
        state, y = jax.jit(
            lambda s, c: ns_jax.process_chunk(s, c, profile="mmse"))(
                state, x.astype(np.float32)[None])
        y_jax = np.asarray(y[0]).astype(np.int16)
        d = np.abs(y_ref.astype(np.int32) - y_jax.astype(np.int32))
        assert d.max() <= 1, f"max deviation {d.max()} LSB"
        assert (d == 0).mean() > 0.95

    def test_suppresses_noise_preserves_speech(self, rng):
        from openwakeword_tpu.ns import JaxNoiseSuppression
        ns = JaxNoiseSuppression(algorithm="mmse")
        n = 16000 * 3
        t = np.arange(n) / 16000
        noise = rng.normal(0, 800, n).astype(np.int16)
        gate = np.sin(2 * np.pi * 1.2 * t)
        speech = (6000 * np.sin(2 * np.pi * 500 * t) * (gate > 0.4)).astype(np.int16)
        x = (noise.astype(np.int32) + speech.astype(np.int32)
             ).clip(-32768, 32767).astype(np.int16)
        y = ns.process_frames(x)
        mask = (gate <= 0.2).copy(); mask[:16000] = False
        atten_db = 20 * np.log10(
            np.sqrt(np.mean(y[mask].astype(np.float64) ** 2))
            / np.sqrt(np.mean(x[mask].astype(np.float64) ** 2)))
        assert atten_db < -4.0, f"noise only attenuated {atten_db:.1f} dB"
        smask = (gate > 0.6).copy(); smask[:16000] = False
        sp_db = 20 * np.log10(
            np.sqrt(np.mean(y[smask].astype(np.float64) ** 2))
            / np.sqrt(np.mean(x[smask].astype(np.float64) ** 2)))
        assert sp_db > -1.5, f"speech attenuated {sp_db:.1f} dB"

    def test_engine_and_model_integration(self, rng):
        import openwakeword_tpu as oww
        from openwakeword_tpu.parallel.engine import MultiStreamEngine
        eng = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2,
                                enable_noise_suppression=True,
                                noise_suppression_algorithm="mmse",
                                rng_seed=0)
        data = rng.integers(-2000, 2000, (2, 1280 * 3)).astype(np.int16)
        data[1] = data[0]
        scores = eng.predict_clips(data)
        assert np.all((scores >= 0) & (scores <= 1))
        np.testing.assert_allclose(scores[:, 0, 0], scores[:, 1, 0], atol=1e-6)

        m = oww.Model(wakeword_models=["alexa"],
                      enable_speex_noise_suppression=True,
                      noise_suppression_algorithm="mmse")
        from openwakeword_tpu.ns import JaxNoiseSuppression
        assert isinstance(m.speex_ns, JaxNoiseSuppression)
        assert m.speex_ns.algorithm == "mmse"
        out = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        assert 0 <= out["alexa"] <= 1

    def test_invalid_algorithm_rejected(self):
        import openwakeword_tpu as oww
        from openwakeword_tpu.ops import ns_jax
        from openwakeword_tpu.parallel.engine import MultiStreamEngine
        with pytest.raises(ValueError, match="profile"):
            ns_jax.init_state(1, profile="wiener")
        with pytest.raises(ValueError, match="noise_suppression_algorithm"):
            MultiStreamEngine(wakeword_models=["alexa"], n_streams=1,
                              noise_suppression_algorithm="wiener")
        with pytest.raises(ValueError, match="noise_suppression_algorithm"):
            oww.Model(wakeword_models=["alexa"],
                      noise_suppression_algorithm="wiener")


def test_model_uses_fallback_when_native_unavailable(rng, monkeypatch):
    """Model(enable_speex_noise_suppression=True) must still work when the
    native library cannot load."""
    import openwakeword_tpu as oww
    from openwakeword_tpu import ns as ns_mod

    def boom(*a, **k):
        raise OSError("no compiler on this host")
    monkeypatch.setattr(ns_mod, "_load_lib", boom)
    m = oww.Model(wakeword_models=["alexa"], enable_speex_noise_suppression=True)
    from openwakeword_tpu.ns import JaxNoiseSuppression
    assert isinstance(m.speex_ns, JaxNoiseSuppression)
    out = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
    assert 0 <= out["alexa"] <= 1


def test_model_falls_back_when_make_fails(rng, monkeypatch, tmp_path):
    """The 'host has make but g++ fails' scenario: build_and_load must turn
    the compiler failure into ImportError so Model still falls back."""
    import subprocess

    import openwakeword_tpu as oww
    from openwakeword_tpu import ns as ns_mod
    from openwakeword_tpu.ns import JaxNoiseSuppression
    from openwakeword_tpu.utils import native_lib

    # point the loader at a dir that has the source but no .so, with a make
    # that always fails; drop the process-wide lib cache so the build runs
    (tmp_path / "ns.cpp").write_text("// present so the build path is taken")
    monkeypatch.setattr(native_lib, "NATIVE_DIR", str(tmp_path))
    monkeypatch.setattr(ns_mod, "_lib", None)

    def failing_run(*a, **k):
        raise subprocess.CalledProcessError(
            1, a[0], stderr=b"g++: fatal error: no such compiler")
    monkeypatch.setattr(native_lib.subprocess, "run", failing_run)

    with pytest.raises(ImportError, match="toolchain"):
        native_lib.build_and_load("libowwns.so", "ns.cpp")

    m = oww.Model(wakeword_models=["alexa"], enable_speex_noise_suppression=True)
    assert isinstance(m.speex_ns, JaxNoiseSuppression)
    out = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
    assert 0 <= out["alexa"] <= 1

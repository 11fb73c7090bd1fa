"""Biquad filter ops vs the scipy sequential-IIR oracle.

The augmentation EQ/band-stop are RBJ-cookbook biquad cascades applied via
their exact FFT-domain transfer function (ops/filters.py). scipy.signal is
available in this environment and runs the same coefficients sample-
sequentially (sosfilt, zero initial state) -- the ground truth the FFT
application must match up to the zero-padded periodization tail.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openwakeword_tpu.ops import augment, filters

scipy_signal = pytest.importorskip("scipy.signal")


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    return rng.normal(0.0, 0.25, (3, 32000)).astype(np.float32)


def _sosfilt(b, a, x):
    sos = np.concatenate([np.asarray(b), np.asarray(a)], axis=-1)  # (K, 6)
    return scipy_signal.sosfilt(sos, x)


class TestCoefficients:
    def test_peaking_gain_at_center(self):
        """|H(f0)| must equal the requested gain."""
        for f0, g in ((100.0, 6.0), (1000.0, -5.0), (4000.0, 3.0)):
            b, a = filters.peaking_coeffs(f0, 1.0, g)
            _, h = scipy_signal.freqz(np.asarray(b), np.asarray(a),
                                      worN=[2 * np.pi * f0 / 16000.0])
            np.testing.assert_allclose(20 * np.log10(np.abs(h[0])), g, atol=1e-3)

    def test_peaking_unity_far_from_center(self):
        b, a = filters.peaking_coeffs(1000.0, 1.0, 6.0)
        _, h = scipy_signal.freqz(np.asarray(b), np.asarray(a),
                                  worN=[2 * np.pi * 20.0 / 16000.0,
                                        2 * np.pi * 7900.0 / 16000.0])
        np.testing.assert_allclose(np.abs(h), 1.0, atol=0.05)

    def test_notch_kills_center(self):
        b, a = filters.notch_coeffs(440.0, 2.0)
        w, h = scipy_signal.freqz(np.asarray(b), np.asarray(a),
                                  worN=[2 * np.pi * 440.0 / 16000.0])
        assert np.abs(h[0]) < 1e-3
        _, h2 = scipy_signal.freqz(np.asarray(b), np.asarray(a),
                                   worN=[2 * np.pi * 50.0 / 16000.0])
        np.testing.assert_allclose(np.abs(h2[0]), 1.0, atol=0.05)


class TestApplyCascade:
    def test_matches_sosfilt_single_section(self, audio):
        b, a = filters.peaking_coeffs(350.0, 1.0, 5.0)
        B = jnp.broadcast_to(b, (audio.shape[0], 1, 3))
        A = jnp.broadcast_to(a, (audio.shape[0], 1, 3))
        got = np.asarray(filters.apply_cascade(jnp.asarray(audio), B, A))
        want = _sosfilt(b[None], a[None], audio)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_matches_sosfilt_cascade(self, audio):
        """7-band cascade, mixed gains, incl. a low-frequency section (the
        longest impulse response the pad must cover)."""
        centers = np.array([60.0, 150.0, 400.0, 1000.0, 2400.0, 4800.0, 7000.0])
        gains = np.array([4.0, -6.0, 2.5, -3.0, 6.0, -2.0, 5.0])
        b, a = filters.peaking_coeffs(centers, 1.0, gains)            # (7, 3)
        B = jnp.broadcast_to(b[None], (audio.shape[0],) + b.shape)
        A = jnp.broadcast_to(a[None], (audio.shape[0],) + a.shape)
        got = np.asarray(filters.apply_cascade(jnp.asarray(audio), B, A))
        want = _sosfilt(b, a, audio)
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_matches_sosfilt_notch(self, audio):
        b, a = filters.notch_coeffs(800.0, 0.6)
        got = np.asarray(filters.apply_cascade(
            jnp.asarray(audio), jnp.asarray(b)[None, None], jnp.asarray(a)[None, None]))
        want = _sosfilt(b[None], a[None], audio)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_jittable_with_traced_coeffs(self, audio):
        @jax.jit
        def run(key, x):
            return augment.seven_band_eq(key, x)
        out = run(jax.random.PRNGKey(0), jnp.asarray(audio))
        assert out.shape == audio.shape
        assert np.isfinite(np.asarray(out)).all()


class TestAugmentSemantics:
    def test_eq_zero_gain_is_identity(self, audio):
        b, a = filters.peaking_coeffs(
            jnp.asarray([60.0, 1000.0, 7000.0]), 1.0, jnp.zeros(3))
        got = np.asarray(filters.apply_cascade(
            jnp.asarray(audio), jnp.broadcast_to(b, (3,) + b.shape),
            jnp.broadcast_to(a, (3,) + a.shape)))
        np.testing.assert_allclose(got, audio, atol=1e-5)

    def test_band_stop_attenuates_tone_in_band(self):
        t = np.arange(32000) / 16000.0
        tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
        b, a = filters.notch_coeffs(1000.0, 1.0)
        out = np.asarray(filters.apply_cascade(
            jnp.asarray(tone), jnp.asarray(b)[None, None], jnp.asarray(a)[None, None]))
        # steady-state: the tone must be strongly attenuated
        assert np.abs(out[0, 16000:]).max() < 0.02

    def test_band_stop_preserves_out_of_band(self):
        t = np.arange(32000) / 16000.0
        tone = np.sin(2 * np.pi * 3000.0 * t).astype(np.float32)[None]
        b, a = filters.notch_coeffs(300.0, 2.0)
        out = np.asarray(filters.apply_cascade(
            jnp.asarray(tone), jnp.asarray(b)[None, None], jnp.asarray(a)[None, None]))
        np.testing.assert_allclose(np.abs(out[0, 16000:]).max(), 1.0, atol=0.05)


class TestPitchShift:
    """Phase-vocoder pitch shift: a pure tone must move to exactly
    f0 * 2^(semis/12) (measured by FFT peak), at unchanged length."""

    def _dominant_hz(self, y, sr=16000):
        n = y.shape[-1]
        spec = np.abs(np.fft.rfft(y * np.hanning(n)))
        return np.fft.rfftfreq(n, 1.0 / sr)[int(np.argmax(spec))]

    @pytest.mark.parametrize("semis", [2.0, -3.0])
    def test_tone_moves_by_semitones(self, semis):
        sr, n = 16000, 32000
        t = np.arange(n) / sr
        tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)[None]
        out = np.asarray(augment.pitch_shift(
            jax.random.PRNGKey(0), jnp.asarray(tone),
            min_semitones=semis, max_semitones=semis))
        assert out.shape == tone.shape
        got = self._dominant_hz(out[0, 4000:28000])
        want = 440.0 * 2.0 ** (semis / 12.0)
        assert abs(got - want) < 5.0, (got, want)
        # energy preserved within a few dB (vocoder + resample losses)
        r = np.linalg.norm(out[0, 4000:28000]) / np.linalg.norm(tone[0, 4000:28000])
        assert 0.5 < r < 2.0

    def test_zero_shift_is_near_identity(self):
        rng = np.random.default_rng(3)
        x = rng.normal(0, 0.2, (2, 32000)).astype(np.float32)
        out = np.asarray(augment.pitch_shift(
            jax.random.PRNGKey(0), jnp.asarray(x),
            min_semitones=0.0, max_semitones=0.0))
        # vocoder round-trip at rate 1 reconstructs the COLA interior
        np.testing.assert_allclose(out[:, 2048:-2048], x[:, 2048:-2048], atol=5e-3)

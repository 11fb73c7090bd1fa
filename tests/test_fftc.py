"""Spectral-op portability shim tests: the CPU fallback path must produce
the same results as the direct path and never touch device key material
(the axon TPU backend lowers no FFT op and hangs on uint32 fetches)."""

import numpy as np
import jax
import pytest

from openwakeword_tpu.ops import augment as A, fftc, filters as F


@pytest.fixture()
def force_fallback(monkeypatch):
    monkeypatch.setattr(fftc, "_FFT_OK", False)
    yield
    # module global restored by monkeypatch


def test_host_key_matches_prngkey():
    for seed in (0, 7, 2 ** 31 - 1, 123456789):
        np.testing.assert_array_equal(
            fftc.host_key(seed), np.asarray(jax.random.PRNGKey(seed)))


def test_fallback_matches_direct_path(rng, force_fallback):
    """With the fallback forced on a CPU host, every spectral op must equal
    its direct execution bit-for-bit (same backend, same program)."""
    x = rng.normal(0, 0.1, (3, 16000)).astype(np.float32)
    key = fftc.host_key(5)
    got = np.asarray(A.seven_band_eq(key, x))
    fftc._FFT_OK = True
    want = np.asarray(A.seven_band_eq(key, x))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert isinstance(got, np.ndarray)


def test_fallback_all_ops_run(rng, force_fallback):
    x = rng.normal(0, 0.1, (2, 16000)).astype(np.float32)
    key = fftc.host_key(1)
    rir = np.zeros(2000, np.float32)
    rir[0], rir[700] = 1.0, 0.3
    assert np.asarray(A.reverberate(x, rir)).shape == x.shape
    assert np.asarray(A.colored_noise(key, (2, 8000), 1.0)).shape == (2, 8000)
    assert np.asarray(A.pitch_shift(key, x)).shape == x.shape
    assert np.asarray(A.band_stop(key, x)).shape == x.shape
    b, a = F.notch_coeffs(np.array([1000.0]), np.array([2.0]))
    y = F.apply_cascade(x, np.asarray(b)[:, None, :], np.asarray(a)[:, None, :])
    assert np.asarray(y).shape == x.shape


def test_fallback_returns_numpy(rng, force_fallback):
    """Fallback outputs are host numpy so downstream code can feed any
    backend without cross-device transfers."""
    out = A.colored_noise(fftc.host_key(2), (1, 4000), 0.0)
    assert isinstance(out, np.ndarray)


def test_mix_at_snr_has_no_fft_dependency(rng):
    """The hot mixing op is pure real math — it must not be wrapped (runs
    on the default device even where FFT is unavailable)."""
    assert not hasattr(A.mix_at_snr, "__wrapped__")


def test_host_split_matches_jax_split_and_stays_numpy():
    key = fftc.host_key(42)
    got = fftc.host_split(key, 3)
    assert isinstance(got, np.ndarray) and got.dtype == np.uint32
    expected = np.asarray(jax.random.split(jax.random.PRNGKey(42), 3))
    np.testing.assert_array_equal(got, expected)
    # derived keys drive identical draws
    np.testing.assert_array_equal(
        np.asarray(jax.random.uniform(got[1], (4,))),
        np.asarray(jax.random.uniform(expected[1], (4,))))


@pytest.mark.parametrize("val,expect", [("1", True), ("0", False),
                                        ("no", False), ("yes", True)])
def test_env_override_skips_probe(monkeypatch, val, expect):
    """OWWT_FFT_OK short-circuits capability detection entirely — no
    subprocess probe, no marker read — for single-tenant device tunnels
    where a probe subprocess would contend with this process."""
    monkeypatch.setattr(fftc, "_FFT_OK", None)
    monkeypatch.setenv("OWWT_FFT_OK", val)

    def boom(*a, **k):   # any probe attempt is a failure
        raise AssertionError("probe must not run under OWWT_FFT_OK")
    monkeypatch.setattr(fftc.subprocess, "run", boom)
    assert fftc.device_fft_ok() is expect
    fftc._FFT_OK = None  # leave no cross-test residue beyond monkeypatch

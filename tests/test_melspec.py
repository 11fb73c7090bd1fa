"""DSP frontend unit tests against an independent numpy-FFT golden oracle.

The reference has no frontend unit tests (it trusts the frozen graph); these
pin our analytic mel implementation to the documented torchlibrosa semantics
(SURVEY.md section 2.2): win=400/hop=160/n_fft=512 center=False, slaney mel
60-3800 Hz, librosa power_to_db with data-dependent top_db, then spec/10+2.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from openwakeword_tpu import config
from openwakeword_tpu.ops import melspec as M


def oracle_melspec(x, top_db=80.0, transform=True):
    """Independent implementation: numpy rfft (vs our matmul-DFT path)."""
    x = np.asarray(x, np.float32)
    w = M.hann_window()
    T = (len(x) - 512) // 160 + 1
    frames = np.stack([x[i * 160:i * 160 + 512] for i in range(T)])
    spec = np.fft.rfft(frames * w, n=512, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float64)
    mel = power @ M.mel_filterbank()
    log_spec = 10 * np.log10(np.maximum(mel, 1e-10))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec / 10 + 2 if transform else log_spec


@pytest.mark.parametrize("n_samples", [1280, 1760, 16000, 12400])
def test_matches_fft_oracle(rng, n_samples):
    x = (rng.uniform(-1, 1, n_samples) * 30000).astype(np.int16)
    ours = np.asarray(M.melspectrogram(jnp.asarray(x)))
    ref = oracle_melspec(x)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_topdb_clamp_active_on_silence_boundary(rng):
    x = np.concatenate([np.zeros(4000, np.int16),
                        (rng.uniform(-1, 1, 4000) * 30000).astype(np.int16)])
    ours = np.asarray(M.melspectrogram(jnp.asarray(x)))
    ref = oracle_melspec(x)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    # the clamp must actually bind for silence next to loud audio
    unclamped = oracle_melspec(x, top_db=None)
    assert np.abs(ref - unclamped).max() > 1.0


def test_frame_count_formula():
    # reference utils.py:270: n_frames = ceil(n/160 - 3) for hop-aligned n
    for n in (1280, 1760, 2560, 16000, 32000):
        assert M.num_frames(n) == int(np.ceil(n / 160 - 3))


def test_streaming_chunk_yields_8_frames():
    # one 80 ms chunk + 480-sample look-back -> exactly 8 new mel frames
    assert M.num_frames(config.CHUNK_SAMPLES + config.MEL_LOOKBACK_SAMPLES) == 8


def test_batch_shape(rng):
    x = (rng.uniform(-1, 1, (4, 3200)) * 30000).astype(np.float32)
    out = np.asarray(M.melspectrogram(jnp.asarray(x)))
    assert out.shape == (4, M.num_frames(3200), 32)
    # per-example top_db scope: each row equals its standalone result
    for i in range(4):
        solo = np.asarray(M.melspectrogram(jnp.asarray(x[i])))
        np.testing.assert_allclose(out[i], solo, atol=1e-5)


def test_mel_filterbank_properties():
    fb = M.mel_filterbank()
    assert fb.shape == (257, 32)
    assert (fb >= 0).all()
    # triangles live strictly inside [60, 3800] Hz
    freqs = np.linspace(0, 8000, 257)
    nz = fb.sum(axis=1) > 0
    assert freqs[nz].min() >= 40 and freqs[nz].max() <= 3900


@pytest.mark.parametrize("n_samples", [1760, 16000])
def test_factored_dft_matches_oracle(rng, n_samples):
    """Radix-4 factored DFT (four K=128 matmuls + butterfly) against the
    same independent FFT oracle as the direct basis — equal tolerance."""
    x = (rng.uniform(-1, 1, n_samples) * 30000).astype(np.int16)
    ours = np.asarray(M.melspectrogram(jnp.asarray(x), dft="factored"))
    np.testing.assert_allclose(ours, oracle_melspec(x), atol=1e-4)


def test_factored_matches_direct(rng):
    x = (rng.uniform(-1, 1, (3, 3200)) * 30000).astype(np.float32)
    direct = np.asarray(M.melspectrogram(jnp.asarray(x)))
    fact = np.asarray(M.melspectrogram(jnp.asarray(x), dft="factored"))
    np.testing.assert_allclose(fact, direct, atol=5e-5)


def test_factored_power_spectrum_exact(rng):
    """The butterfly recombination itself (before mel/log compression) must
    reproduce the rfft power spectrum: frame the signal, run stage 1 + the
    butterfly, compare |X|^2 bin-by-bin at float64-oracle tolerance."""
    x = (rng.uniform(-1, 1, 512) * 20000).astype(np.float64)
    want = np.abs(np.fft.rfft(x * M.hann_window())) ** 2
    branches = M.deinterleave_branches(jnp.asarray(x, jnp.float32)[None, :])
    bases = jnp.asarray(M.factored_dft_bases(), jnp.float32)
    import jax
    z = jnp.einsum("...ba,bad->...bd", branches, bases,
                   precision=jax.lax.Precision.HIGHEST)
    got = np.asarray(M._factored_power(z))[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-2)


def test_unknown_dft_mode_raises(rng):
    x = (rng.uniform(-1, 1, 1760) * 100).astype(np.float32)
    with pytest.raises(ValueError, match="dft"):
        M.melspectrogram(jnp.asarray(x), dft="fft")

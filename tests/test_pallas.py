"""Pallas fused mel-frontend kernel parity (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from openwakeword_tpu.ops import melspec as M
from openwakeword_tpu.ops.melspec_pallas import melspectrogram_pallas


def test_pallas_melspec_matches_reference_op(rng):
    windows = (rng.uniform(-1, 1, (5, 1760)) * 25000).astype(np.float32)
    got = np.asarray(melspectrogram_pallas(jnp.asarray(windows), tile_s=4,
                                           interpret=True))
    want = np.asarray(M.melspectrogram(jnp.asarray(windows),
                                       apply_transform=False, top_db=None))
    assert got.shape == want.shape == (5, 8, 32)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


def test_pallas_three_pass_high_precision(rng):
    """Precision.HIGH lowers to explicit hi/lo bf16 splits (Mosaic cannot
    lower HIGH itself); deviation vs the exact path must stay at the
    3-pass-bf16 level."""
    import jax
    windows = (rng.uniform(-1, 1, (5, 1760)) * 25000).astype(np.float32)
    got = np.asarray(melspectrogram_pallas(jnp.asarray(windows), tile_s=4,
                                           interpret=True,
                                           precision=jax.lax.Precision.HIGH))
    want = np.asarray(M.melspectrogram(jnp.asarray(windows),
                                       apply_transform=False, top_db=None))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-4)


def test_pallas_handles_silence(rng):
    windows = np.zeros((3, 1760), np.float32)
    got = np.asarray(melspectrogram_pallas(jnp.asarray(windows), tile_s=4,
                                           interpret=True))
    np.testing.assert_allclose(got, -100.0, atol=1e-4)  # amin floor in dB


def test_pallas_factored_matches_reference_op(rng):
    windows = (rng.uniform(-1, 1, (5, 1760)) * 25000).astype(np.float32)
    got = np.asarray(melspectrogram_pallas(jnp.asarray(windows), tile_s=4,
                                           interpret=True, dft="factored"))
    want = np.asarray(M.melspectrogram(jnp.asarray(windows),
                                       apply_transform=False, top_db=None))
    assert got.shape == want.shape == (5, 8, 32)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


def test_pallas_factored_three_pass(rng):
    import jax
    windows = (rng.uniform(-1, 1, (5, 1760)) * 25000).astype(np.float32)
    got = np.asarray(melspectrogram_pallas(jnp.asarray(windows), tile_s=4,
                                           interpret=True, dft="factored",
                                           precision=jax.lax.Precision.HIGH))
    want = np.asarray(M.melspectrogram(jnp.asarray(windows),
                                       apply_transform=False, top_db=None))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-4)

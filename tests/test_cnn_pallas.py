"""Pallas incremental-CNN step kernel (ops.cnn_pallas) parity tests, run in
interpreter mode on CPU. The kernel re-derives the same layer program as
models.embedding_stream in a stream-minor VMEM layout; score-level agreement
is bounded by tap-accumulation reassociation (measured ~1.5e-5 on
embeddings, far inside the 1e-3 activation-score budget)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openwakeword_tpu.models import embedding as E, embedding_stream as ES
from openwakeword_tpu.ops.cnn_pallas import CnnStepKernel, cache_shapes


@pytest.fixture(scope="module")
def folded():
    return E.fold_batchnorm(E.init_params(jax.random.PRNGKey(0)))


@pytest.mark.parametrize("sb,s", [(64, 128), (128, 256)])
def test_step_matches_reference(folded, sb, s, rng):
    k = CnnStepKernel(folded, sb=sb, precision="highest", interpret=True)
    mel0 = rng.normal(0, 1, (s, 76, 32)).astype(np.float32)
    c_ref, e_ref = jax.jit(ES.init_caches)(folded, jnp.asarray(mel0))
    c_k, e_k = k.prime(jnp.asarray(np.transpose(mel0, (1, 2, 0))))
    np.testing.assert_allclose(np.asarray(e_k).T, np.asarray(e_ref), atol=1e-4)
    for _ in range(4):
        new = rng.normal(0, 1, (s, 8, 32)).astype(np.float32)
        c_ref, e_ref = jax.jit(ES.step)(folded, c_ref, jnp.asarray(new))
        c_k, e_k = k.step(c_k, jnp.asarray(np.transpose(new, (1, 2, 0))))
        np.testing.assert_allclose(np.asarray(e_k).T, np.asarray(e_ref), atol=1e-4)


def test_cache_layout_roundtrip(folded, rng):
    """Kernel caches are the stream-minor transposes of the reference's."""
    s = 128
    mel0 = rng.normal(0, 1, (s, 76, 32)).astype(np.float32)
    c_ref, _ = jax.jit(ES.init_caches)(folded, jnp.asarray(mel0))
    k = CnnStepKernel(folded, sb=64, precision="highest", interpret=True)
    c_k, _ = k.prime(jnp.asarray(np.transpose(mel0, (1, 2, 0))))
    for name, shape in cache_shapes():
        assert c_k[name].shape == shape + (s,)
        # reference layout: (S, 2, W, C); kernel layout: (C, 2, W, S)
        np.testing.assert_allclose(np.asarray(c_k[name]),
                                   np.transpose(np.asarray(c_ref[name]), (3, 1, 2, 0)),
                                   atol=1e-4)


def test_stream_minor_xla_variants(folded, rng):
    """The pure-XLA stream-minor step (embedding_stream.step_t) matches the
    NHWC step to float-reassociation tolerance."""
    s = 16
    mel0 = rng.normal(0, 1, (s, 76, 32)).astype(np.float32)
    c1, e1 = jax.jit(ES.init_caches)(folded, jnp.asarray(mel0))
    c2, e2 = jax.jit(ES.init_caches_t)(folded, jnp.asarray(mel0))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)
    new = rng.normal(0, 1, (s, 8, 32)).astype(np.float32)
    _, e1 = jax.jit(ES.step)(folded, c1, jnp.asarray(new))
    _, e2 = jax.jit(ES.step_t)(folded, c2, jnp.asarray(new))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)

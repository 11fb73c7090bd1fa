"""Architecture cross-validation against an independent torch implementation
(subprocess: torch and jax deadlock in-process here). Confirms our conv
padding/pooling/activation and LayerNorm semantics match the reference's
producers BEFORE real weight artifacts are available."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openwakeword_tpu.models import embedding, heads


@pytest.mark.skipif(subprocess.run([sys.executable, "-c", "import torch"],
                                   capture_output=True).returncode != 0,
                    reason="torch unavailable")
def test_embedding_and_head_match_torch(tmp_path, rng):
    emb_params = embedding.init_params(jax.random.PRNGKey(0))
    # non-trivial BN stats
    for k in emb_params:
        if k.startswith("bn_"):
            key = jax.random.PRNGKey(abs(hash(k)) % 2**31)
            n = emb_params[k]["gamma"].shape[0]
            emb_params[k] = {"gamma": 1 + 0.1 * jax.random.normal(key, (n,)),
                             "beta": 0.1 * jax.random.normal(key, (n,)),
                             "mean": 0.1 * jax.random.normal(key, (n,)),
                             "var": jnp.abs(1 + 0.1 * jax.random.normal(key, (n,)))}
    head_params = heads.init_params(jax.random.PRNGKey(1), "dnn", 16, 1, 64, 1)

    emb_x = rng.uniform(-1, 4, (2, 76, 32, 1)).astype(np.float32)
    head_x = rng.normal(0, 1, (4, 16, 96)).astype(np.float32)

    flat = {"emb_x": emb_x, "head_x": head_x, "n_blocks": np.int64(1)}
    for k, v in emb_params.items():
        for kk, vv in v.items():
            flat[f"{k}/{kk}"] = np.asarray(vv, np.float32)
    for k, v in head_params.items():
        if k == "__meta__":
            continue
        for kk, vv in v.items():
            flat[f"{k}/{kk}"] = np.asarray(vv, np.float32)

    in_path, out_path = str(tmp_path / "in.npz"), str(tmp_path / "out.npz")
    np.savez(in_path, **flat)
    oracle = os.path.join(os.path.dirname(__file__), "torch_oracle.py")
    r = subprocess.run([sys.executable, oracle, in_path, out_path],
                       capture_output=True, text=True, timeout=300,
                       env={**os.environ, "JAX_PLATFORMS": ""})
    assert r.returncode == 0, f"oracle failed: {r.stderr[-800:]}"

    with np.load(out_path) as z:
        torch_emb, torch_head = z["emb_y"], z["head_y"]

    ours_emb = np.asarray(embedding.apply(emb_params, jnp.asarray(emb_x)))
    np.testing.assert_allclose(ours_emb, torch_emb, atol=3e-4,
                               err_msg="embedding CNN disagrees with the torch oracle")

    ours_head = np.asarray(heads.apply(head_params, jnp.asarray(head_x)))
    np.testing.assert_allclose(ours_head, torch_head, atol=1e-5,
                               err_msg="dnn head disagrees with the torch oracle")

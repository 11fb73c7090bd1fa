"""bf16 serving-mode tests: dtype invariants, score-drift bounds, and
slot-reset exactness under the quantized state rings."""

import numpy as np
import pytest
import jax.numpy as jnp

from openwakeword_tpu.parallel import MultiStreamEngine
from openwakeword_tpu.parallel.server import StreamServer


@pytest.fixture(scope="module")
def clip():
    import wave
    with wave.open("/root/reference/tests/data/alexa_test.wav", "rb") as f:
        return np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)


def test_state_dtypes(clip):
    e = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2, precision="bf16")
    assert e.state["mel_ring"].dtype == jnp.bfloat16
    assert e.state["feat_ring"].dtype == jnp.bfloat16
    assert all(v.dtype == jnp.bfloat16 for v in e.state["conv_caches"].values())
    assert e.state["pcm_tail"].dtype == jnp.float32
    assert e.state["score_hist"].dtype == jnp.float32
    # dtype invariance across steps (scan-carry / donation contract)
    before = {k: (v.dtype if not isinstance(v, dict) else None) for k, v in e.state.items()}
    e.predict(np.tile(clip[:1280], (2, 1)))
    for k, v in e.state.items():
        if not isinstance(v, dict):
            assert v.dtype == before[k], f"{k} changed dtype across a step"


def test_score_drift_bound(clip):
    e32 = MultiStreamEngine(wakeword_models=["alexa", "timer"], n_streams=2,
                            rng_seed=0, precision="highest")
    e16 = MultiStreamEngine(wakeword_models=["alexa", "timer"], n_streams=2,
                            rng_seed=0, precision="bf16")
    s32 = e32.predict_clips(np.stack([clip, clip]))
    s16 = e16.predict_clips(np.stack([clip, clip]))
    assert np.abs(s32 - s16).max() < 0.02


def test_rnn_head_bf16(tmp_path, rng):
    """rnn heads must run under bf16 with inputs cast to the weight dtype
    (ring quantization is then idempotent)."""
    import jax
    from openwakeword_tpu.io.checkpoints import save_checkpoint
    from openwakeword_tpu.models import heads
    p = heads.init_params(jax.random.PRNGKey(4), "rnn", 16, 1)
    path = str(tmp_path / "rnn_head.npz")
    save_checkpoint(path, "head", p)
    e32 = MultiStreamEngine(wakeword_models=[path], n_streams=2, rng_seed=0)
    e16 = MultiStreamEngine(wakeword_models=[path], n_streams=2, rng_seed=0,
                            precision="bf16")
    audio = (rng.uniform(-1, 1, (2, 1280 * 8)) * 9000).astype(np.int16)
    for t in range(8):
        s32 = e32.predict(audio[:, t * 1280:(t + 1) * 1280])
        s16 = e16.predict(audio[:, t * 1280:(t + 1) * 1280])
    assert np.abs(s32 - s16).max() < 0.05


def test_server_slot_reset_under_bf16(rng):
    server = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0,
                          rng_seed=0, precision="bf16")
    audio = rng.integers(-3000, 3000, 1280 * 10).astype(np.int16)
    s0 = server.add_stream()
    server.push(s0, rng.integers(-500, 500, 1280 * 4).astype(np.int16))
    server.run_pending()
    server.remove_stream(s0)
    server.add_stream()
    s0b = server.add_stream()
    assert s0b == s0
    server.push(s0b, audio)
    server.run_pending()
    got = np.asarray(server.engine.state["score_hist"][s0b, 0, -10:])

    fresh = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2, rng_seed=0,
                              precision="bf16")
    for t in range(10):
        fresh.predict(np.stack([audio[t * 1280:(t + 1) * 1280]] * 2))
    want = np.asarray(fresh.state["score_hist"][0, 0, -10:])
    np.testing.assert_allclose(got, want, atol=1e-5)

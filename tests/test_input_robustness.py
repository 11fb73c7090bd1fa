"""Regression tests for input-robustness review findings: oversized pushes,
wrong PCM dtypes, misconfigured gating, blank verifier entries, and VAD
recompile churn."""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import openwakeword_tpu as oww                                   # noqa: E402
from openwakeword_tpu.features import AudioFeatures             # noqa: E402


def test_giant_push_equals_feeding_its_tail(rng):
    """A single push larger than the 10 s raw ring must behave like feeding
    only the samples the ring can hold (previously negative start indices
    wrapped Python slices and computed mel over giant bogus windows)."""
    x = (rng.uniform(-1, 1, 200_000) * 9000).astype(np.int16)
    af_big = AudioFeatures()
    af_big(x)

    ready = (x.shape[0] // 1280) * 1280          # what the accumulator emits
    keep = af_big.raw_data_buffer_max
    af_ref = AudioFeatures()
    af_ref(x[ready - keep:ready])

    np.testing.assert_allclose(np.asarray(af_big.melspectrogram_buffer),
                               np.asarray(af_ref.melspectrogram_buffer),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(af_big.feature_buffer),
                               np.asarray(af_ref.feature_buffer), atol=1e-5)


def test_wide_integer_pcm_rejected_on_streaming_path(rng):
    """int32/int64 PCM must be rejected like the batch paths do, not wrapped
    mod 65536 into garbage scores."""
    m = oww.Model(wakeword_models=["alexa"])
    for dtype in (np.int32, np.int64):
        with pytest.raises(ValueError, match="int16"):
            m.predict((rng.uniform(-1, 1, 1280) * 1e6).astype(dtype))
    # lists of int16-range values stay accepted on the AudioFeatures path
    # (reference _check_pcm parity; Model.predict itself requires ndarray)
    af = AudioFeatures()
    assert af([0] * 1280) == 1280


def test_patience_without_threshold_raises(rng):
    """A patience'd model with no threshold entry used to compare against
    inf and zero its scores forever, silently."""
    m = oww.Model(wakeword_models=["alexa"])
    x = rng.integers(-1000, 1000, 1280).astype(np.int16)
    with pytest.raises(ValueError, match="threshold"):
        m.predict(x, patience={"alexa": 3}, threshold={"some_other": 0.5})
    # correctly-keyed patience still works
    out = m.predict(x, patience={"alexa": 3}, threshold={"alexa": 0.5})
    assert "alexa" in out


def test_blank_verifier_entry_ignored():
    """''/None verifier paths (config templates) count as 'no verifier'
    instead of tripping the unmatched-keys check with an empty list."""
    m = oww.Model(wakeword_models=["alexa"],
                  custom_verifier_models={"alexa": ""},
                  custom_verifier_threshold=0.3)
    assert m.custom_verifier_models == {}


def test_vad_tail_quantization_bounded_and_equivalent(rng):
    """Distinct clip-tail lengths must not each compile a fresh XLA program;
    truncating to the step boundary is numerically identical for vad_net
    (the sub-hop tail is never seen by the network)."""
    from openwakeword_tpu.vad import VAD
    from openwakeword_tpu.models import vad_net
    params = jax.device_get(vad_net.init_params(jax.random.PRNGKey(2)))

    v_fast = VAD(params=params)
    lengths = [480 * 3 + t for t in (260, 300, 371, 400, 469)]
    clips = [(rng.uniform(-1, 1, n) * 8000).astype(np.int16) for n in lengths]
    fast_scores = [v_fast.predict(x) for x in clips]
    # every tail above quantizes to one of <= 2 step counts, so the jit
    # cache stays bounded: full frames + a couple of tail shapes. (NB: two
    # jax.jit wrappers of the same function share one cache, so the
    # pre-fix VAD below must run AFTER this count is taken.)
    assert v_fast._step._cache_size() <= 3

    v_exact = VAD(params=params)
    v_exact._tail_quantum = None                  # pre-fix behavior
    for x, a, n in zip(clips, fast_scores, lengths):
        b = v_exact.predict(x)
        assert abs(a - b) < 1e-6, f"tail len {n % 480}"
    assert v_exact._step._cache_size() >= len(set(n % 480 for n in lengths))

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


class TestServingConfigRobustness:
    """Engine/server misconfigurations must fail loudly or route correctly,
    not silently change gating behavior."""

    def test_engine_debounce_window_capped(self):
        from openwakeword_tpu import config
        from openwakeword_tpu.parallel import MultiStreamEngine
        e = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2,
                              debounce_time=4.0, threshold={"alexa": 0.5})
        assert e._debounce_frames == config.PREDICTION_BUFFER_MAX

    def test_engine_patience_without_threshold_raises(self):
        from openwakeword_tpu.parallel import MultiStreamEngine
        with pytest.raises(ValueError, match="threshold"):
            MultiStreamEngine(wakeword_models=["alexa", "hey_jarvis"],
                              n_streams=2, patience={"alexa": 2},
                              threshold={"hey_jarvis": 0.5})

    def test_server_dict_threshold_routes_to_engine(self):
        from openwakeword_tpu.parallel.server import StreamServer
        s = StreamServer(wakeword_models=["alexa"], capacity=2,
                         debounce_time=0.5, threshold={"alexa": 0.4})
        assert isinstance(s.threshold, np.ndarray)
        assert s.threshold[s.labels.index("alexa")] == np.float32(0.4)
        assert s.engine._use_debounce
        sid = s.add_stream()
        s.push(sid, np.zeros(1280, np.int16))
        scores = s.step()
        assert scores.shape == (2, len(s.labels))

    def test_server_rejects_wide_integer_pcm(self):
        from openwakeword_tpu.parallel.server import StreamServer
        s = StreamServer(wakeword_models=["alexa"], capacity=2)
        sid = s.add_stream()
        with pytest.raises(ValueError, match="int16"):
            s.push(sid, np.zeros(1280, np.int32))

    def test_server_warm_compiles_both_paths(self, rng):
        from openwakeword_tpu.parallel.server import StreamServer
        s = StreamServer(wakeword_models=["alexa"], capacity=2,
                         warm_compile=True)
        sid = s.add_stream()
        x = rng.integers(-2000, 2000, 1280).astype(np.int16)
        s.push(sid, x)                      # queued path
        s.step()
        rows = s.acquire_block(1)           # staged path
        rows[0] = x
        s.commit_block([sid])
        s.step()
        # warming must not perturb stream state: a fresh unwarmed server
        # fed identically produces the same scores
        s2 = StreamServer(wakeword_models=["alexa"], capacity=2)
        sid2 = s2.add_stream()
        s2.push(sid2, x)
        a = s2.step()[sid2]
        s3 = StreamServer(wakeword_models=["alexa"], capacity=2,
                          warm_compile=True)
        sid3 = s3.add_stream()
        s3.push(sid3, x)
        b = s3.step()[sid3]
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_engine_seed_ring_cached_across_resets(self):
        from openwakeword_tpu.parallel import MultiStreamEngine
        e = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2)
        s1 = e.init_state(2)
        s2 = e.init_state(2)
        assert len(e._seed_ring_cache) == 1
        np.testing.assert_array_equal(np.asarray(s1["feat_ring"]),
                                      np.asarray(s2["feat_ring"]))

    def test_bulk_engine_kwargs_filtered_by_signature(self, tmp_path, rng, monkeypatch):
        import wave
        from openwakeword_tpu.parallel import bulk, engine as eng
        wav = str(tmp_path / "a.wav")
        with wave.open(wav, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(rng.integers(-2000, 2000, 16000)
                          .astype(np.int16).tobytes())
        import functools
        seen = {}

        class Spy(eng.MultiStreamEngine):
            @functools.wraps(eng.MultiStreamEngine.__init__)
            def __init__(self, *args, **kwargs):
                seen.update(kwargs)
                super().__init__(*args, **kwargs)

        monkeypatch.setattr(eng, "MultiStreamEngine", Spy)
        bulk.bulk_predict([wav], ["alexa"], precision="bf16", ncpu=4)
        assert seen.get("precision") == "bf16"
        assert "ncpu" not in seen

    def test_bulk_rejects_wrong_sample_rate(self, tmp_path, rng):
        import wave
        from openwakeword_tpu.parallel import bulk
        wav = str(tmp_path / "b8k.wav")
        with wave.open(wav, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes(rng.integers(-2000, 2000, 8000)
                          .astype(np.int16).tobytes())
        with pytest.raises(ValueError, match="16000"):
            bulk.bulk_predict([wav], ["alexa"])


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

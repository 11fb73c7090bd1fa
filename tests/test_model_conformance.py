"""Behavioral conformance suite: the reference's tested invariants
(SURVEY.md section 4 / reference tests/test_models.py), exercised against the
TPU-native engine. Heads use deterministic random weights (no frozen
artifacts in this environment), which tests every streaming/state/logic
contract -- score *values* vs the ONNX reference are covered by the gated
parity tests in test_weight_import.py.
"""

import os

import numpy as np
import pytest

import openwakeword_tpu as oww
from openwakeword_tpu import config


@pytest.fixture(scope="module")
def alexa_model():
    return oww.Model(wakeword_models=["alexa"])


class TestModels:
    def test_load_by_name_and_predict(self, alexa_model, rng):
        prediction = alexa_model.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        assert 0 <= prediction["alexa"] <= 1

    def test_load_all_pretrained_names(self, rng):
        m = oww.Model()
        preds = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        assert set(m.models.keys()) == {"alexa", "hey_mycroft", "hey_jarvis",
                                        "hey_rhasspy", "timer", "weather"}
        # multiclass labels are expanded through the class mapping
        assert "1_minute_timer" in preds
        for v in preds.values():
            assert 0 <= v <= 1

    def test_unknown_model_name_raises(self):
        with pytest.raises(ValueError):
            oww.Model(wakeword_models=["definitely_not_a_model"])

    def test_chunk_size_invariance_exact(self, test_clips, monkeypatch):
        """Max clip score must be invariant to chunk size (reference
        test_models.py:68-100). With the data-dependent top_db clamp scoped
        per call, tiny boundary differences are inherent (the reference
        author documents the same, utils.py:388-392); with it disabled the
        pipeline must be exactly chunk-size invariant."""
        monkeypatch.setattr(config, "MEL_TOP_DB", None)
        # new jit closure picks up config at trace time; clear caches
        scores = {}
        for chunk in (1280, 2560, 1024, 2048):
            m = oww.Model(wakeword_models=["alexa"])
            preds = m.predict_clip(test_clips["alexa"], chunk_size=chunk)
            scores[chunk] = max(p["alexa"] for p in preds)
        base = scores[1280]
        for chunk, s in scores.items():
            np.testing.assert_approx_equal(s, base, significant=5)

    def test_chunk_size_invariance_default(self, test_clips):
        """Default config (top_db clamp active) is chunk-size invariant by
        construction: the streaming frontend fixes the clamp scope to the
        80 ms block regardless of how callers chunk their audio, so every
        chunking produces identical mel frames (well inside the reference's
        5-significant-figure contract, reference tests/test_models.py:68-100)."""
        scores = {}
        for chunk in (1280, 2560, 1024, 2048):
            m = oww.Model(wakeword_models=["alexa"])
            preds = m.predict_clip(test_clips["alexa"], chunk_size=chunk)
            scores[chunk] = max(p["alexa"] for p in preds)
        base = scores[1280]
        for chunk, s in scores.items():
            np.testing.assert_approx_equal(s, base, significant=5)
            assert abs(s - base) < 1e-5

    def test_multiclass_chunk_size_invariance_default(self, test_clips):
        """Un-patched multiclass mirror of reference tests/test_models.py:
        88-100: max class score invariant across all four chunk sizes under
        the default config (no monkeypatching)."""
        scores = {}
        for chunk in (1280, 2560, 1024, 2048):
            m = oww.Model(wakeword_models=["timer"])
            preds = m.predict_clip(test_clips["alexa"], chunk_size=chunk)
            scores[chunk] = max(p["1_minute_timer"] for p in preds)
        base = scores[1280]
        for chunk, s in scores.items():
            np.testing.assert_approx_equal(s, base, significant=5)
            assert abs(s - base) < 1e-5

    def test_multiclass_chunk_size_invariance(self, test_clips, monkeypatch):
        monkeypatch.setattr(config, "MEL_TOP_DB", None)
        scores = []
        for chunk in (1280, 2560):
            m = oww.Model(wakeword_models=["timer"])
            preds = m.predict_clip(test_clips["alexa"], chunk_size=chunk)
            scores.append(max(p["1_minute_timer"] for p in preds))
        assert abs(scores[0] - scores[1]) < 1e-5

    def test_warmup_zeroing(self, rng):
        """Scores are zeroed for the first 5 predict calls (model.py:330-333)."""
        m = oww.Model(wakeword_models=["alexa"])
        outs = [m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))["alexa"]
                for _ in range(8)]
        assert all(o == 0.0 for o in outs[:5])

    def test_reset_clears_state(self, rng):
        m = oww.Model(wakeword_models=["alexa"])
        for _ in range(10):
            m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        assert len(m.prediction_buffer["alexa"]) == 10
        feat_before = m.preprocessor.feature_buffer.copy()
        m.reset()
        assert len(m.prediction_buffer) == 0
        assert m.preprocessor.accumulated_samples == 0
        assert not np.array_equal(m.preprocessor.feature_buffer, feat_before)
        # warm-up re-applies after reset
        out = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        assert out["alexa"] == 0.0

    def test_patience_requires_threshold(self, rng):
        m = oww.Model(wakeword_models=["alexa"])
        with pytest.raises(ValueError):
            m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16),
                      patience={"alexa": 3})

    def test_patience_and_debounce_mutually_exclusive(self, rng):
        m = oww.Model(wakeword_models=["alexa"])
        with pytest.raises(ValueError):
            m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16),
                      patience={"alexa": 3}, threshold={"alexa": 0.5},
                      debounce_time=1.0)

    def test_patience_suppresses_until_consecutive(self, rng):
        """With patience=N and a threshold never met by history, scores are
        forced to 0 (model.py:346-352)."""
        m = oww.Model(wakeword_models=["alexa"])
        for _ in range(10):
            out = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16),
                            patience={"alexa": 30}, threshold={"alexa": 1.1})
            assert out["alexa"] == 0.0

    def test_patience_eventually_fires(self, rng):
        """Patience must report an activation once the wake word has been
        above threshold for N consecutive frames. The reference's version
        can never fire (it checks a buffer that stores its own filtered
        zeros, model.py:346-363); ours checks the raw score history
        (COMPATIBILITY.md #22)."""
        m = oww.Model(wakeword_models=["alexa"])
        calls = {"n": 0}

        def fake_pred(x):
            calls["n"] += 1
            score = 0.9 if calls["n"] >= 10 else 0.01
            return np.array([[score]], dtype=np.float32)
        m.model_prediction_function["alexa"] = fake_pred

        outs = []
        for _ in range(20):
            out = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16),
                            patience={"alexa": 3}, threshold={"alexa": 0.5})
            outs.append(out["alexa"])
        # frames 10-11 are above threshold but not yet 3-consecutive;
        # from frame 12 the activation must be reported
        assert outs[8] == 0.0 and outs[9] == 0.0 and outs[10] == 0.0
        assert all(o >= 0.5 for o in outs[11:])

    def test_debounce_single_activation(self, test_clips, monkeypatch):
        """A wake phrase must activate exactly once with debounce enabled
        (reference test_models.py:217-231). Random heads have no trained
        activation, so inject a deterministic score spike via a stub head."""
        m = oww.Model(wakeword_models=["alexa"])
        calls = {"n": 0}

        def fake_pred(x):
            calls["n"] += 1
            score = 0.9 if 10 <= calls["n"] <= 20 else 0.01
            return np.array([[score]], dtype=np.float32)
        m.model_prediction_function["alexa"] = fake_pred

        activations = 0
        rng = np.random.default_rng(1)
        for _ in range(30):
            out = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16),
                            debounce_time=2.0, threshold={"alexa": 0.5})
            if out["alexa"] >= 0.5:
                activations += 1
        assert activations == 1

    def test_prediction_buffer_appends_and_caps(self, rng):
        m = oww.Model(wakeword_models=["alexa"])
        for _ in range(40):
            m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        assert len(m.prediction_buffer["alexa"]) == config.PREDICTION_BUFFER_MAX

    def test_timing_dict(self, rng):
        m = oww.Model(wakeword_models=["alexa"])
        preds, timing = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16),
                                  timing=True)
        assert "preprocessor" in timing["models"]
        assert "alexa" in timing["models"]

    def test_custom_class_mapping(self, rng, tmp_path):
        from openwakeword_tpu.io.checkpoints import save_checkpoint
        from openwakeword_tpu.models import heads
        import jax
        params = heads.init_params(jax.random.PRNGKey(0), "mlp", 34, 3, 32)
        path = str(tmp_path / "mc_model.npz")
        save_checkpoint(path, "head", params)
        mapping = {"0": "none", "1": "foo", "2": "bar"}
        m = oww.Model(wakeword_models=[path],
                      class_mapping_dicts=[{"mc_model": mapping}])
        preds = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        assert set(preds.keys()) == {"none", "foo", "bar"}

    def test_get_parent_model_from_label(self):
        m = oww.Model(wakeword_models=["timer"])
        assert m.get_parent_model_from_label("1_minute_timer") == "timer"
        assert m.get_parent_model_from_label("timer") == "timer"

    def test_sub1280_chunks_recycle_score(self, rng):
        """Chunks below 1280 samples return the previous score until a full
        frame accumulates (model.py:303-311)."""
        m = oww.Model(wakeword_models=["alexa"])
        for _ in range(8):
            m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        last = m.prediction_buffer["alexa"][-1]
        out = m.predict(rng.integers(-1000, 1000, 640).astype(np.int16))
        assert out["alexa"] == last

    def test_larger_chunks_max_pool_subframes(self, rng):
        """>1280-sample calls score every 80 ms sub-frame and return the max
        (model.py:287-298)."""
        m = oww.Model(wakeword_models=["alexa"])
        for _ in range(8):
            m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        seen = []
        orig = m.model_prediction_function["alexa"]

        def spy(x):
            out = orig(x)
            seen.append(x.shape[0])
            return out
        m.model_prediction_function["alexa"] = spy
        m.predict(rng.integers(-1000, 1000, 3840).astype(np.int16))
        assert seen and seen[-1] == 3  # 3 sub-frame windows in one batch

    def test_positive_prediction_frames(self, test_clips):
        m = oww.Model(wakeword_models=["alexa"])
        # threshold 0 harvests every frame; features are (N, 16, 96)
        data = m._get_positive_prediction_frames(test_clips["alexa"], threshold=0.0)
        assert "alexa" in data
        assert data["alexa"].shape[1:] == (16, 96)
        assert data["alexa"].shape[0] > 0

    def test_input_type_check(self):
        m = oww.Model(wakeword_models=["alexa"])
        with pytest.raises(ValueError):
            m.predict([0] * 1280)


class TestVADGate:
    def test_vad_gate_zeroes_when_silent(self, rng):
        m = oww.Model(wakeword_models=["alexa"], vad_threshold=0.5)
        # inject deterministic VAD scores: all silence
        m.vad.predict = lambda x, frame_size=640: 0.0
        for _ in range(10):
            out = m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))
        assert out["alexa"] == 0.0

    def test_vad_gate_passes_when_voiced(self, rng):
        m = oww.Model(wakeword_models=["alexa"], vad_threshold=0.5)
        m.vad.predict = lambda x, frame_size=640: 1.0
        outs = []
        for _ in range(10):
            outs.append(m.predict(rng.integers(-1000, 1000, 1280).astype(np.int16))["alexa"])
        # after warm-up, scores flow through unmodified (nonzero for random head)
        assert any(o > 0 for o in outs[config.WARMUP_FRAMES + 2:])

    def test_vad_state_and_buffer(self, rng):
        from openwakeword_tpu.vad import VAD
        v = VAD()
        x = rng.integers(-2000, 2000, 1280).astype(np.int16)
        s1 = v.predict(x)
        assert 0.0 <= s1 <= 1.0
        h_after = v._h.copy()
        v.reset_states()
        assert not np.array_equal(v._h, h_after) or np.allclose(h_after, 0)
        v(x)
        assert len(v.prediction_buffer) == 1


class TestAudioFeatures:
    def test_embedding_shape_contract(self):
        from openwakeword_tpu.features import AudioFeatures
        af = AudioFeatures()
        # 12560 samples -> 76 mel frames -> exactly one embedding window
        assert af.get_embedding_shape(12560 / 16000) == (1, 96)
        # 4 s -> 41 windows (this also sizes the feature-buffer noise seed)
        assert af.get_embedding_shape(4.0) == (41, 96)

    def test_embed_clips_batch(self, rng):
        from openwakeword_tpu.features import AudioFeatures
        af = AudioFeatures()
        clips = (rng.uniform(-1, 1, (3, 32000)) * 20000).astype(np.int16)
        emb = af.embed_clips(clips, batch_size=64)
        n_windows = ((32000 // 160 - 3) - 76) // 8 + 1
        assert emb.shape == (3, n_windows, 96)

    def test_streaming_remainder_handling(self, rng):
        from openwakeword_tpu.features import AudioFeatures
        af = AudioFeatures()
        # 1024-sample chunks: first call accumulates, second processes 1280
        n1 = af(rng.integers(-1000, 1000, 1024).astype(np.int16))
        assert n1 == 1024  # accumulated, nothing processed
        n2 = af(rng.integers(-1000, 1000, 1024).astype(np.int16))
        assert n2 == 1280  # one chunk processed, 768 remainder held
        assert af.raw_data_remainder.shape[0] == 768

    def test_pcm_dtype_check(self):
        from openwakeword_tpu.features import AudioFeatures
        af = AudioFeatures()
        with pytest.raises(ValueError):
            af._get_melspectrogram(np.zeros(1280, dtype=np.float32))

    def test_feature_buffer_cap(self, rng):
        from openwakeword_tpu.features import AudioFeatures
        af = AudioFeatures()
        for _ in range(130):
            af(rng.integers(-1000, 1000, 1280).astype(np.int16))
        assert af.feature_buffer.shape[0] == config.FEATURE_BUFFER_MAX
        assert af.melspectrogram_buffer.shape[0] <= config.MEL_BUFFER_MAX_FRAMES


class TestTrainedVAD:
    def test_bundled_vad_discriminates_speech_from_noise(self, test_clips, rng):
        """The bundled VAD checkpoint must score real speech well above
        noise/silence (trained in training/vad.py)."""
        import os
        from openwakeword_tpu import registry
        if not os.path.exists(registry.VAD_MODELS["silero_vad"]["model_path"]):
            pytest.skip("bundled VAD checkpoint not present")
        from openwakeword_tpu.vad import VAD
        from openwakeword_tpu.data import read_audio
        v = VAD()
        speech = (read_audio(test_clips["alexa"]) * 32767).astype(np.int16)
        s_speech = v.predict(speech)
        v.reset_states()
        s_noise = v.predict(rng.integers(-800, 800, 9600).astype(np.int16))
        v.reset_states()
        s_silence = v.predict(np.zeros(9600, np.int16))
        assert s_speech > 0.6
        assert s_noise < 0.3
        assert s_silence < 0.1

    def test_bundled_vad_far_frr_budget(self, test_clips):
        """The published quality budget (docs/vad_quality.md): FRR <= 5% and
        FAR <= 2% at the 0.5 gate on a held-out synthetic+noise set. A
        regressed VAD retrain must not ship silently."""
        import os
        from openwakeword_tpu import registry
        path = registry.VAD_MODELS["silero_vad"]["model_path"]
        if not os.path.exists(path):
            pytest.skip("bundled VAD checkpoint not present")
        from openwakeword_tpu.data import read_audio
        from openwakeword_tpu.io.loaders import load_model_file
        from openwakeword_tpu.training import vad as VT
        kind, params, _ = load_model_file(path)
        if kind != "vad":
            pytest.skip("bundled VAD is not a native vad_net checkpoint "
                        "(real Silero weights installed)")
        speech = [read_audio(p) for p in test_clips.values()]
        rep = VT.evaluate_vad(params, speech, n_sequences=256, seed=987)
        i = int(np.argmin(np.abs(rep["thresholds"] - 0.5)))
        assert rep["frr"][i] <= 0.05, f"FRR@0.5 {rep['frr'][i]:.3f} over budget"
        assert rep["far"][i] <= 0.02, f"FAR@0.5 {rep['far'][i]:.3f} over budget"


class TestRealWeightAccuracy:
    """Accuracy tests on the bundled clips (reference test_models.py:151-215).
    These need real imported head weights, which this zero-egress environment
    cannot fetch; they activate automatically once resources/models/*.npz
    head checkpoints exist (utils.download.download_models or
    convert_local_models)."""

    @pytest.fixture(autouse=True)
    def _require_real_heads(self):
        from openwakeword_tpu import registry
        if not all(os.path.exists(v["model_path"]) for v in registry.MODELS.values()):
            pytest.skip("real head checkpoints not present")

    def test_clip_accuracy_filename_convention(self, test_clips):
        m = oww.Model()
        for mdl_name in m.models.keys():
            clips = [p for name, p in test_clips.items() if mdl_name in name]
            for clip in clips:
                preds = m.predict_clip(clip)
                assert max(p[mdl_name] for p in preds) >= 0.5, \
                    f"{mdl_name} missed its own clip"
                m.reset()
        # negative: hey_jane must not trigger anything at 0.5
        preds = m.predict_clip(test_clips["hey_jane"])
        for frame in preds:
            for label, score in frame.items():
                assert score < 0.5, f"false positive: {label}"

    def test_engine_score_parity_with_model(self, test_clips):
        """With real weights, engine scores must match the Model to 1e-3
        (the BASELINE.json |dScore| target applied to our own two paths)."""
        import wave
        from openwakeword_tpu.parallel import MultiStreamEngine
        with wave.open(test_clips["alexa"], "rb") as f:
            data = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
        engine = MultiStreamEngine(wakeword_models=["alexa"], n_streams=1, rng_seed=0)
        scores = engine.predict_clips(data[None])
        m = oww.Model(wakeword_models=["alexa"])
        ref = [p["alexa"] for p in m.predict_clip(test_clips["alexa"])]
        np.testing.assert_allclose(scores[:, 0, 0], ref, atol=1e-3)


def test_predict_rejects_oversized_single_call(rng):
    """More sub-frames than the feature ring covers must raise an actionable
    error, not an opaque ragged-concatenate crash (reference utils.py:454-460
    clamps negative indices into empty windows there)."""
    import openwakeword_tpu as oww
    m = oww.Model(wakeword_models=["alexa"])
    with pytest.raises(ValueError, match="feature ring"):
        m.predict(np.zeros(1280 * 125, np.int16))

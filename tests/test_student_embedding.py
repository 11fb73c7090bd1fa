"""TPU-shaped student embedding: module exactness, engine/host conformance
in student mode, and the distillation recipe.

The student (models/embedding_student.py) swaps in for the faithful
speech_embedding CNN behind the same (76, 32) -> 96 contract; these tests
pin that every behavioral invariant of the reference pipeline (streaming ==
batch, chunk-size invariance, reset, warm-up) holds in student mode, and
that distillation (training/distill.py) actually tracks the teacher.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import openwakeword_tpu as oww
from openwakeword_tpu.models import embedding_student as ES
from openwakeword_tpu.parallel.engine import MultiStreamEngine


@pytest.fixture(scope="module")
def student_params():
    return ES.init_params(jax.random.PRNGKey(3))


class TestModule:
    def test_streaming_equals_full_window_exactly(self, student_params, rng):
        """Block boundaries stay 4-row aligned across 8-row hops, so the
        streamed embedding is bit-identical to the full-window one."""
        S, hops = 3, 6
        mel = jnp.asarray(rng.normal(2, 2, (S, 76 + 8 * hops, 32)), jnp.float32)
        refs = [np.asarray(ES.apply(student_params, mel[:, j * 8:j * 8 + 76]))
                for j in range(hops + 1)]
        caches, emb0 = ES.init_caches(student_params, mel[:, :76])
        np.testing.assert_array_equal(np.asarray(emb0), refs[0])
        for j in range(hops):
            caches, e = ES.step(student_params, caches,
                                mel[:, 76 + j * 8:76 + (j + 1) * 8])
            np.testing.assert_array_equal(np.asarray(e), refs[j + 1])

    def test_multi_hop_step_equals_sequential(self, student_params, rng):
        S, k = 2, 4
        mel = jnp.asarray(rng.normal(2, 2, (S, 76 + 8 * k, 32)), jnp.float32)
        c1, _ = ES.init_caches(student_params, mel[:, :76])
        c2, _ = ES.init_caches(student_params, mel[:, :76])
        seq = []
        for j in range(k):
            c1, e = ES.step(student_params, c1, mel[:, 76 + j * 8:76 + (j + 1) * 8])
            seq.append(np.asarray(e))
        c2, multi = ES.step(student_params, c2, mel[:, 76:76 + 8 * k])
        assert multi.shape == (S, k, 96)
        for j in range(k):
            np.testing.assert_array_equal(np.asarray(multi[:, j]), seq[j])
        np.testing.assert_array_equal(np.asarray(c1["blocks"]), np.asarray(c2["blocks"]))

    def test_dims_are_mxu_aligned(self):
        assert ES.BLOCK_IN % 128 == 0
        assert ES.BLOCK_DIM % 128 == 0
        assert (ES.N_BLOCKS * ES.BLOCK_DIM) % 128 == 0
        assert ES.HIDDEN % 128 == 0

    def test_is_student_detection(self, student_params):
        from openwakeword_tpu.models import embedding as E
        assert ES.is_student(student_params)
        assert not ES.is_student(E.init_params(jax.random.PRNGKey(0)))


class TestEngineStudentMode:
    def test_incremental_equals_full_window(self, rng):
        frames = rng.integers(-2000, 2000, (10, 4, 1280)).astype(np.int16)
        e1 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=4,
                               embedding="student")
        e2 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=4,
                               embedding="student", incremental=False)
        np.testing.assert_array_equal(e1.predict_frames(frames),
                                      e2.predict_frames(frames))

    def test_engine_matches_host_model(self, rng):
        """Fused engine step vs the host Model, both in student mode (same
        noise seed => same init state)."""
        audio = rng.integers(-3000, 3000, (2, 1280 * 12)).astype(np.int16)
        engine = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2,
                                   rng_seed=0, embedding="student")
        host = oww.Model(wakeword_models=["alexa"], embedding="student")
        for t in range(12):
            chunks = audio[:, t * 1280:(t + 1) * 1280]
            eng = engine.predict(chunks)
            ref = host.predict(chunks[0])
            assert abs(eng[0, 0] - ref["alexa"]) < 1e-5, f"frame {t}"

    def test_engine_rejects_mismatched_params(self):
        from openwakeword_tpu.models import embedding as E
        with pytest.raises(ValueError, match="student"):
            MultiStreamEngine(wakeword_models=["alexa"], n_streams=2,
                              embedding="student",
                              embedding_params=E.init_params(jax.random.PRNGKey(0)))
        with pytest.raises(ValueError, match="embedding must be"):
            MultiStreamEngine(wakeword_models=["alexa"], n_streams=2,
                              embedding="teacher")

    def test_bf16_mode_runs(self, rng):
        eng = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2,
                                embedding="student", precision="bf16")
        out = eng.predict(rng.integers(-2000, 2000, (2, 1280)).astype(np.int16))
        assert out.shape == (2, 1)
        assert np.isfinite(out).all()


class TestHostStudentMode:
    def test_chunk_size_invariance(self, test_clips):
        """The reference's key streaming contract (test_models.py:68-100)
        must hold regardless of which embedding network is installed."""
        scores = {}
        for chunk in (1280, 2560, 1024, 2048):
            m = oww.Model(wakeword_models=["alexa"], embedding="student")
            preds = m.predict_clip(test_clips["alexa"], chunk_size=chunk)
            scores[chunk] = max(p["alexa"] for p in preds)
        base = scores[1280]
        for chunk, s in scores.items():
            np.testing.assert_approx_equal(s, base, significant=5)

    def test_reset_and_warmup(self, rng):
        m = oww.Model(wakeword_models=["alexa"], embedding="student")
        chunk = rng.integers(-2000, 2000, 1280).astype(np.int16)
        assert m.predict(chunk)["alexa"] == 0.0        # warm-up zeroing
        for _ in range(8):
            m.predict(chunk)
        m.reset()
        assert m.predict(chunk)["alexa"] == 0.0        # reset restarts warm-up


class TestDistillation:
    def test_distill_tracks_teacher(self):
        """A short distillation run must cut the held-out drift far below
        the untrained student's and align embedding directions."""
        from openwakeword_tpu.models import embedding as E
        from openwakeword_tpu.training import distill as D
        teacher = E.init_params(jax.random.PRNGKey(42))  # the deterministic fallback
        random_student = ES.init_params(jax.random.PRNGKey(3))
        before = D.measure_drift(random_student, teacher, batches=2, batch_size=64)
        params, report = D.distill(teacher_params=teacher, steps=150,
                                   batch_size=64, eval_batches=2, log_every=0)
        assert report["relative_rms_err"] < 0.5 * before["relative_rms_err"]
        assert report["mean_cosine"] > 0.8
        assert ES.is_student(params)

    def test_checkpoint_round_trip(self, tmp_path):
        from openwakeword_tpu.io.checkpoints import save_checkpoint
        from openwakeword_tpu.io.loaders import load_model_file
        p = ES.init_params(jax.random.PRNGKey(1))
        path = str(tmp_path / "embedding_student.npz")
        save_checkpoint(path, "embedding_student", p, {"distilled": False})
        kind, p2, meta = load_model_file(path)
        assert kind == "embedding_student"
        assert ES.is_student(p2)
        x = jnp.asarray(np.random.default_rng(0).normal(2, 2, (2, 76, 32)), jnp.float32)
        np.testing.assert_array_equal(np.asarray(ES.apply(p, x)),
                                      np.asarray(ES.apply(p2, x)))


class TestServedScoreDrift:
    """Score-LEVEL teacher-vs-student drift (VERDICT r4: embedding-level
    fidelity bounds nothing a head nonlinearity can amplify — the number a
    deployer needs is served-score drift per head)."""

    def test_ci_gate_on_fallback_recipe(self):
        """CI gate: a short distill against the fallback teacher must reach
        the stated embedding fidelity AND keep served-score drift bounded on
        real heads fed identical audio. Distill regressions fail here."""
        from openwakeword_tpu.models import embedding as E
        from openwakeword_tpu.training import distill as D

        teacher = E.init_params(jax.random.PRNGKey(42))
        params, report = D.distill(teacher_params=teacher, steps=400,
                                   batch_size=64, eval_batches=2, log_every=0)
        # embedding-level gate (short 400-step recipe; the full 3000-step
        # recipe reaches ~0.998 — PERF_NOTES round 4)
        assert report["mean_cosine"] >= 0.9, report
        drift = D.measure_served_score_drift(
            params, teacher_params=teacher,
            wakeword_models=["alexa", "timer"], noise_seconds=8.0, seed=3)
        assert drift["total_frames"] > 50
        assert set(drift["per_label"]) >= {"alexa"}
        for label, rec in drift["per_label"].items():
            assert rec["frames"] > 0
            assert 0.0 <= rec["max_abs_dscore"] <= 1.0
        # served-score gate for the short recipe: scores must stay inside
        # a loose-but-real envelope; a broken distill (random student) shows
        # max |dscore| near 1.0 and flips on a large fraction of frames
        assert drift["max_abs_dscore"] < 0.6, drift
        assert drift["total_activation_flips"] <= 0.05 * drift["total_frames"], drift

    def test_random_student_fails_the_gate(self):
        """Sanity: an UNdistilled student would trip the served-score gate,
        so the gate is actually load-bearing."""
        from openwakeword_tpu.models import embedding as E
        from openwakeword_tpu.training import distill as D

        teacher = E.init_params(jax.random.PRNGKey(42))
        random_student = ES.init_params(jax.random.PRNGKey(9))
        drift = D.measure_served_score_drift(
            random_student, teacher_params=teacher,
            wakeword_models=["alexa"], noise_seconds=6.0, seed=3)
        # the load-bearing signal is the activation-flip RATE: the random
        # student flips ~11% of frames at 0.5 on this audio, far above the
        # distilled gate's 5% ceiling (max |dscore| alone is audio-dependent)
        assert drift["total_activation_flips"] \
            > 0.05 * drift["total_frames"], drift
        assert drift["max_abs_dscore"] > 0.15, drift

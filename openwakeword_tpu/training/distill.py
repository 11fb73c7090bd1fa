"""Distill the faithful speech-embedding CNN into the TPU-shaped student.

The student (models/embedding_student.py) replaces the 27-conv
speech_embedding CNN — the engine's dominant, MXU-starved stage
(PERF_NOTES.md: ~53% of the step at ~8% MFU, every sub-model optimization
measured negative) — with three large matmuls. This module fits it to mimic
the *installed* teacher checkpoint on realistic mel windows, so the same
recipe retargets the real released weights the moment they are importable
(today's zero-egress installs distill against the deterministic fallback).

Training data is synthesized on the fly: colored noise across decays and
levels, harmonic tones with speech-like amplitude modulation, optional real
speech crops with noise mixing, and silence — pushed through the analytic
mel frontend (ops.melspec), i.e. exactly the distribution the embedding
sees in the engine. Loss is MSE on the 96-d teacher embedding.
"""

import logging
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from openwakeword_tpu.models import embedding as embedding_model
from openwakeword_tpu.models import embedding_student
from openwakeword_tpu.ops import melspec as melspec_ops

WINDOW_SAMPLES = (embedding_student.INPUT_SHAPE[0] + 3) * 160   # 12640 -> 76 mel rows


def synth_audio_batch(rng: np.random.Generator, batch_size: int,
                      speech_clips: Optional[Sequence[np.ndarray]] = None
                      ) -> np.ndarray:
    """(B, 12640) int16-range float32 PCM covering the engine's input space:
    noise / harmonic "speech-like" tones / real speech crops / silence.
    Vectorized per kind — the generator must keep up with the device step
    (a per-clip Python loop was ~30x slower than the train step)."""
    n = WINDOW_SAMPLES
    t = np.arange(n)[None, :] / 16000.0
    out = np.empty((batch_size, n), np.float32)
    kind = rng.random(batch_size)
    b_noise = np.where(kind < 0.35)[0]
    hi_speech = 0.9 if speech_clips else 0.75
    b_harm = np.where((kind >= 0.35) & (kind < 0.75))[0]
    b_speech = np.where((kind >= 0.75) & (kind < hi_speech))[0]
    b_quiet = np.where(kind >= hi_speech)[0]

    if b_noise.size:
        # colored noise via shaped spectrum, batched irfft
        m = b_noise.size
        spec = rng.normal(size=(m, n // 2 + 1)) + 1j * rng.normal(size=(m, n // 2 + 1))
        freqs = np.maximum(np.fft.rfftfreq(n, 1 / 16000.0), 1.0)
        decay = rng.uniform(-2.0, 2.0, (m, 1))
        x = np.fft.irfft(spec / freqs[None, :] ** (decay / 2.0), n=n, axis=-1)
        out[b_noise] = x / (np.abs(x).max(axis=-1, keepdims=True) + 1e-9)

    if b_harm.size:
        # harmonic stacks with pitch drift + AM envelope (speech-like)
        m = b_harm.size
        f0 = rng.uniform(80, 320, (m, 1)) * (
            1 + 0.1 * np.sin(2 * np.pi * rng.uniform(1, 4, (m, 1)) * t))
        phase = np.cumsum(f0, axis=-1) / 16000.0
        x = np.zeros((m, n))
        n_harm = rng.integers(3, 9, m)
        for h in range(1, 9):
            amp = np.where(h < n_harm, rng.uniform(0.2, 1.0, m), 0.0)[:, None]
            x += amp / h * np.sin(2 * np.pi * h * phase)
        env = np.clip(np.sin(2 * np.pi * rng.uniform(2, 8, (m, 1)) * t
                             + rng.uniform(0, 6.28, (m, 1))), 0, None)
        x = x * env + rng.normal(0, 1, (m, n)) * rng.uniform(0.001, 0.1, (m, 1))
        out[b_harm] = x / (np.abs(x).max(axis=-1, keepdims=True) + 1e-9)

    for i in b_speech:
        clip = speech_clips[rng.integers(0, len(speech_clips))]
        if len(clip) <= n:
            x = np.zeros(n, np.float32)
            off = rng.integers(0, n - len(clip) + 1)
            x[off:off + len(clip)] = clip
        else:
            r = rng.integers(0, len(clip) - n + 1)
            x = np.asarray(clip[r:r + n], np.float32)
        out[i] = x + rng.normal(0, rng.uniform(0, 0.05), n)

    if b_quiet.size:
        out[b_quiet] = rng.normal(0, 1, (b_quiet.size, n)) \
            * rng.uniform(1e-5, 3e-3, (b_quiet.size, 1))    # near-silence

    out *= rng.uniform(100, 30000, (batch_size, 1))          # int16-range gains
    return np.clip(out, -32768, 32767).astype(np.float32)


def _mel_windows(pcm: jnp.ndarray) -> jnp.ndarray:
    """(B, 12640) PCM -> (B, 76, 32) transformed log-mel windows, exactly
    the engine's frontend output."""
    return melspec_ops.melspectrogram(pcm)[:, :embedding_student.INPUT_SHAPE[0]]


def distill(teacher_params: Optional[Dict] = None,
            steps: int = 3000,
            batch_size: int = 256,
            lr: float = 2e-3,
            seed: int = 0,
            speech_clips: Optional[Sequence[np.ndarray]] = None,
            eval_batches: int = 8,
            log_every: int = 200) -> Tuple[Dict, Dict]:
    """Fit the student to the teacher. Returns (student_params, report).

    The report carries held-out drift metrics on fresh synthetic windows:
    rms/max embedding error, error relative to the teacher's output scale,
    and mean cosine similarity — the numbers PERF_NOTES.md quotes next to
    the student's throughput.
    """
    if teacher_params is None:
        from openwakeword_tpu.features import _load_embedding_params
        teacher_params = _load_embedding_params()
    teacher = embedding_model.ensure_folded(teacher_params)

    params = embedding_student.init_params(jax.random.PRNGKey(seed))
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.02)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, pcm):
        mel = _mel_windows(pcm)
        target = embedding_model.apply_folded(teacher, mel)

        def loss_fn(p):
            pred = embedding_student.apply(p, mel)
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for step in range(steps):
        pcm = jnp.asarray(synth_audio_batch(rng, batch_size, speech_clips))
        params, opt_state, loss = train_step(params, opt_state, pcm)
        if log_every and step % log_every == 0:
            logging.info("distill step %d loss %.5f", step, float(loss))

    report = measure_drift(params, teacher, seed=seed + 1,
                           batches=eval_batches, batch_size=batch_size,
                           speech_clips=speech_clips)
    return params, report


def measure_drift(student_params: Dict, teacher_params: Dict,
                  seed: int = 1, batches: int = 8, batch_size: int = 256,
                  speech_clips: Optional[Sequence[np.ndarray]] = None) -> Dict:
    """Held-out teacher-vs-student drift on fresh synthetic windows."""
    teacher = embedding_model.ensure_folded(teacher_params)
    rng = np.random.default_rng(seed)
    errs, maxes, coss, t_rms = [], [], [], []
    fwd = jax.jit(lambda p, mel: (embedding_student.apply(p, mel),
                                  embedding_model.apply_folded(teacher, mel)))
    for _ in range(batches):
        pcm = jnp.asarray(synth_audio_batch(rng, batch_size, speech_clips))
        mel = _mel_windows(pcm)
        pred, target = fwd(student_params, mel)
        pred, target = np.asarray(pred), np.asarray(target)
        d = pred - target
        errs.append(np.sqrt(np.mean(d ** 2)))
        maxes.append(np.abs(d).max())
        t_rms.append(np.sqrt(np.mean(target ** 2)))
        num = np.sum(pred * target, -1)
        den = (np.linalg.norm(pred, axis=-1) * np.linalg.norm(target, axis=-1) + 1e-9)
        coss.append(np.mean(num / den))
    rms_err, out_rms = float(np.mean(errs)), float(np.mean(t_rms))
    return {
        "rms_err": rms_err,
        "max_abs_err": float(np.max(maxes)),
        "teacher_rms": out_rms,
        "relative_rms_err": rms_err / max(out_rms, 1e-9),
        "mean_cosine": float(np.mean(coss)),
    }


def _as_int16_pcm(clip) -> np.ndarray:
    """Accept int16 PCM, [-1, 1] float audio (data.read_audio's contract),
    or a file path; return int16 PCM for Model.predict_clip."""
    if isinstance(clip, str):
        from openwakeword_tpu.data import read_audio
        clip = read_audio(clip)
    clip = np.asarray(clip)
    if clip.dtype == np.int16:
        return clip
    peak = float(np.max(np.abs(clip))) if clip.size else 0.0
    if peak <= 1.0 + 1e-6:   # normalized float audio
        clip = clip * 32767.0
    return np.clip(np.round(clip), -32768, 32767).astype(np.int16)


def measure_served_score_drift(student_params: Dict,
                               teacher_params: Optional[Dict] = None,
                               wakeword_models: Optional[Sequence[str]] = None,
                               wavs: Optional[Sequence] = None,
                               noise_seconds: float = 20.0,
                               seed: int = 0,
                               threshold: float = 0.5) -> Dict:
    """SCORE-level teacher-vs-student drift: the number a deployer of
    teacher-trained heads needs before switching to ``embedding='student'``
    (COMPATIBILITY.md #13 quantifies "approximate" with this).

    Runs two full pipelines — one serving the teacher embedding, one the
    student — over identical audio (caller-supplied WAVs/arrays plus
    ``noise_seconds`` of random noise) and reports, per served label:
    max/mean |Δscore| per frame and activation flips at ``threshold``.
    Embedding-level drift (:func:`measure_drift`) bounds nothing a head
    nonlinearity can amplify; this measures the served behavior itself.
    """
    from openwakeword_tpu import registry
    from openwakeword_tpu.model import Model

    if wakeword_models is None:
        wakeword_models = list(registry.MODELS.keys())
    rng = np.random.default_rng(seed)
    clips = [_as_int16_pcm(c) for c in (wavs or [])]
    if noise_seconds > 0:
        clips.append(rng.integers(-12000, 12000,
                                  int(noise_seconds * 16000)).astype(np.int16))

    m_teacher = Model(wakeword_models=list(wakeword_models),
                      embedding_params=teacher_params)
    m_student = Model(wakeword_models=list(wakeword_models),
                      embedding_params=student_params)
    stats: Dict[str, Dict] = {}
    for clip in clips:
        m_teacher.reset()
        m_student.reset()
        preds_t = m_teacher.predict_clip(clip)
        preds_s = m_student.predict_clip(clip)
        for ft, fs in zip(preds_t, preds_s):
            for label in ft:
                d = abs(float(ft[label]) - float(fs[label]))
                rec = stats.setdefault(label, {"max": 0.0, "sum": 0.0,
                                               "n": 0, "flips": 0})
                rec["max"] = max(rec["max"], d)
                rec["sum"] += d
                rec["n"] += 1
                rec["flips"] += int((float(ft[label]) >= threshold)
                                    != (float(fs[label]) >= threshold))
    per_label = {
        label: {"max_abs_dscore": round(r["max"], 5),
                "mean_abs_dscore": round(r["sum"] / max(r["n"], 1), 5),
                "activation_flips": r["flips"],
                "frames": r["n"]}
        for label, r in stats.items()}
    return {
        "per_label": per_label,
        "max_abs_dscore": round(max((r["max"] for r in stats.values()),
                                    default=0.0), 5),
        "total_activation_flips": sum(r["flips"] for r in stats.values()),
        "total_frames": sum(r["n"] for r in stats.values()),
        "threshold": threshold,
    }


def distill_default_student(output_path: str,
                            speech_wavs: Optional[Sequence[str]] = None,
                            score_drift_models: Optional[Sequence[str]] = None,
                            **kwargs) -> Tuple[Dict, Dict]:
    """Distill against the installed teacher and save a registry-compatible
    student checkpoint (resources/models/embedding_student.npz by default).

    The saved meta carries BOTH drift levels: embedding-space drift from the
    distillation run and the per-head served-score drift
    (:func:`measure_served_score_drift`) against the same teacher on the
    installed pretrained heads — printed by ``train.py --distill_student``.
    """
    from openwakeword_tpu.io.checkpoints import save_checkpoint
    clips = None
    if speech_wavs:
        from openwakeword_tpu.data import read_audio
        clips = [read_audio(p) for p in speech_wavs]
    params, report = distill(speech_clips=clips, **kwargs)
    report["served_score_drift"] = measure_served_score_drift(
        params, teacher_params=kwargs.get("teacher_params"),
        wakeword_models=score_drift_models,
        wavs=clips[:4] if clips else None,
        seed=kwargs.get("seed", 0))
    save_checkpoint(output_path, "embedding_student", params,
                    {"distilled": True, "drift": report})
    logging.info("student checkpoint saved to %s (drift: %s)", output_path, report)
    return params, report

"""VAD training: fit the JAX VAD network (models/vad_net.py) as a per-frame
speech/non-speech classifier.

The reference ships Silero's frozen ONNX VAD (reference vad.py:54-130); this
trainer produces a native checkpoint with the same inference contract
(480-sample frames, (2, B, 64) recurrent state). Training data is
(speech clips, synthesized noise): speech frames are labeled by a relative
energy gate, negatives are colored noise / silence at varied levels, and
speech+noise mixtures at low SNR are included so the model learns spectral
(not just energy) cues.
"""

import logging
from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from openwakeword_tpu.models import vad_net

FRAME = vad_net.FRAME_SAMPLES  # 480


def _frame_labels_from_energy(clip: np.ndarray, rel_db: float = -30.0,
                              abs_floor: float = 1e-4) -> np.ndarray:
    """Per-480-sample-frame voice labels from a relative energy gate.

    ``abs_floor`` (on [-1, 1]-normalized audio, ~ -80 dBFS) keeps a crop
    that is entirely silence from labeling itself as speech: with only the
    relative gate, uniform near-zero rms gives rms/peak ~= 1 > -30 dB for
    every frame."""
    n = len(clip) // FRAME
    frames = clip[:n * FRAME].reshape(n, FRAME)
    rms = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=-1) + 1e-12)
    peak = rms.max() + 1e-12
    rel_ok = 20 * np.log10(rms / peak) > rel_db
    return (rel_ok & (rms > abs_floor)).astype(np.float32)


def build_training_sequences(speech_clips: Sequence[np.ndarray],
                             n_sequences: int = 512,
                             seq_frames: int = 20,
                             seed: int = 0):
    """-> (x (N, T, 480) float in [-1,1], y (N, T) labels)."""
    rng = np.random.default_rng(seed)
    seq_len = seq_frames * FRAME
    xs, ys = [], []
    from openwakeword_tpu.ops import augment as A

    for i in range(n_sequences):
        kind = rng.random()
        if kind < 0.45 and speech_clips:
            clip = speech_clips[rng.integers(0, len(speech_clips))]
            if len(clip) < seq_len:
                pad = rng.integers(0, seq_len - len(clip) + 1)
                buf = np.zeros(seq_len, np.float32)
                buf[pad:pad + len(clip)] = clip
            else:
                r = rng.integers(0, len(clip) - seq_len + 1)
                buf = clip[r:r + seq_len].astype(np.float32)
            y = _frame_labels_from_energy(buf)
            gain = rng.uniform(0.2, 1.0)
            buf = buf * gain
            if rng.random() < 0.5:  # noisy speech at moderate SNR
                key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
                decay = rng.uniform(-1.0, 2.0)
                noise = np.asarray(A.colored_noise(key, (1, seq_len), decay))[0]
                snr = rng.uniform(5.0, 25.0)
                x_rms = np.sqrt(np.mean(buf ** 2) + 1e-9)
                n_rms = np.sqrt(np.mean(noise ** 2) + 1e-9)
                buf = buf + noise * (x_rms / (n_rms * 10 ** (snr / 20)))
        elif kind < 0.85:
            key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
            decay = rng.uniform(-2.0, 2.0)
            buf = np.asarray(A.colored_noise(key, (1, seq_len), decay))[0]
            buf = buf * rng.uniform(0.005, 0.8)
            y = np.zeros(seq_frames, np.float32)
        else:
            buf = np.zeros(seq_len, np.float32)
            if rng.random() < 0.5:
                buf += rng.normal(0, rng.uniform(1e-5, 1e-3), seq_len)
            y = np.zeros(seq_frames, np.float32)
        xs.append(np.clip(buf, -1.0, 1.0).reshape(seq_frames, FRAME))
        ys.append(y)
    return np.stack(xs).astype(np.float32), np.stack(ys)


def train_vad(speech_clips: Sequence[np.ndarray],
              steps: int = 600,
              batch_size: int = 64,
              seq_frames: int = 20,
              lr: float = 1e-3,
              seed: int = 0) -> Dict:
    """Train the VAD network; returns the params pytree."""
    params = vad_net.init_params(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    x_all, y_all = build_training_sequences(speech_clips, n_sequences=2048,
                                            seq_frames=seq_frames, seed=seed)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            B = x.shape[0]
            h = jnp.zeros((vad_net.LAYERS, B, vad_net.HIDDEN))
            c = jnp.zeros((vad_net.LAYERS, B, vad_net.HIDDEN))

            def body(carry, xt):
                h, c = carry
                score, h, c = vad_net.apply(p, xt, h, c)
                return (h, c), score

            (_, _), scores = jax.lax.scan(body, (h, c), jnp.swapaxes(x, 0, 1))
            scores = jnp.swapaxes(scores, 0, 1)            # (B, T)
            eps = 1e-6
            s = jnp.clip(scores, eps, 1 - eps)
            bce = -(y * jnp.log(s) + (1 - y) * jnp.log(1 - s))
            return jnp.mean(bce), scores

        (loss, scores), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for step in range(steps):
        idx = rng.integers(0, x_all.shape[0], batch_size)
        params, opt_state, loss = train_step(params, opt_state,
                                             jnp.asarray(x_all[idx]), jnp.asarray(y_all[idx]))
        if step % 100 == 0:
            logging.info("vad step %d loss %.4f", step, float(loss))
    return params


def score_sequences(params: Dict, x: np.ndarray) -> np.ndarray:
    """Score (N, T, 480) frame sequences -> (N, T) speech probabilities,
    carrying the recurrent state across each sequence (fresh state per
    sequence, exactly like a stream that just connected)."""
    @jax.jit
    def run(p, xb):
        B = xb.shape[0]
        h = jnp.zeros((vad_net.LAYERS, B, vad_net.HIDDEN))
        c = jnp.zeros((vad_net.LAYERS, B, vad_net.HIDDEN))

        def body(carry, xt):
            h, c = carry
            score, h, c = vad_net.apply(p, xt, h, c)
            return (h, c), score

        (_, _), scores = jax.lax.scan(body, (h, c), jnp.swapaxes(xb, 0, 1))
        return jnp.swapaxes(scores, 0, 1)

    return np.asarray(run(params, jnp.asarray(x, jnp.float32)))


def evaluate_vad(params: Dict,
                 speech_clips: Sequence[np.ndarray],
                 n_sequences: int = 512,
                 seq_frames: int = 20,
                 seed: int = 1234,
                 thresholds: Sequence[float] = None) -> Dict:
    """Frame-level FAR/FRR curve for a VAD checkpoint on a held-out
    synthetic+noise set.

    Builds an evaluation set with the same generator as training but a
    disjoint seed (fresh crops, gains, SNRs, and noise draws), scores it
    with carried per-sequence state, and sweeps the gate threshold:

      * FAR = fraction of non-speech frames scored >= gate (noise, silence,
        and the silent frames inside speech sequences)
      * FRR = fraction of speech frames scored < gate

    This quantifies how the home-trained substitute's gating compares to a
    stated budget (the reference gates on Silero scores, reference
    vad.py:54-130; docs/vad_quality.md publishes the bundled checkpoint's
    curve). Returns {"thresholds", "far", "frr", plus counts}.
    """
    if thresholds is None:
        thresholds = np.linspace(0.05, 0.95, 19)
    thresholds = np.asarray(thresholds, np.float64)
    x, y = build_training_sequences(speech_clips, n_sequences=n_sequences,
                                    seq_frames=seq_frames, seed=seed)
    scores = score_sequences(params, x).reshape(-1)
    labels = y.reshape(-1).astype(bool)
    pos, neg = scores[labels], scores[~labels]
    far = np.array([(neg >= t).mean() if neg.size else 0.0 for t in thresholds])
    frr = np.array([(pos < t).mean() if pos.size else float("nan")
                    for t in thresholds])
    return {"thresholds": thresholds, "far": far, "frr": frr,
            "n_speech_frames": int(pos.size), "n_nonspeech_frames": int(neg.size)}


def make_default_vad_checkpoint(output_path: str,
                                speech_wavs: List[str],
                                steps: int = 600,
                                seed: int = 0):
    """Train on the given speech WAVs and save a registry-compatible
    checkpoint."""
    from openwakeword_tpu.data import read_audio
    from openwakeword_tpu.io.checkpoints import save_checkpoint
    clips = [read_audio(p) for p in speech_wavs]
    params = train_vad(clips, steps=steps, seed=seed)
    save_checkpoint(output_path, "vad", params,
                    {"trained_on": f"{len(clips)} speech clips + synthetic noise"})
    return params

"""Streaming + batch audio feature frontend (AudioFeatures).

API-compatible re-design of the reference's ``AudioFeatures``
(reference openwakeword/utils.py:33-463): the same streaming contract --
80 ms (1280-sample) accumulation with remainder carry-over, a 76-frame mel
window per embedding, ring-buffer history, reset semantics -- but with all
compute expressed as jitted JAX programs instead of frozen ONNX/TFLite
graphs run by a C++ runtime.

Split of responsibilities (TPU-first):
  * Host: O(1) bookkeeping only -- sample accumulation/remainder logic and
    small numpy ring buffers mirroring device outputs (so the reference's
    introspection APIs like ``get_features(start_ndx=...)`` keep working).
  * Device: every FLOP -- the fused STFT+mel matmul program, the embedding
    CNN, batched over all windows of a call at once (the reference loops
    per-window through its interpreter; we batch).

For the pure-device multi-stream path (thousands of streams, donated-buffer
scan) see ``openwakeword_tpu.parallel``.
"""

import logging
from typing import Callable, List, Union

import numpy as np
import jax
import jax.numpy as jnp

from openwakeword_tpu import config
from openwakeword_tpu.models import embedding as embedding_model
from openwakeword_tpu.ops import melspec as melspec_ops


# Module-level jitted programs, shared by all AudioFeatures instances so each
# (function, shape) pair compiles exactly once per process. top_db is a
# static arg so config.MEL_TOP_DB is read live at every call site.
_melspec_jit = jax.jit(lambda x, top_db: melspec_ops.melspectrogram(x, top_db=top_db),
                       static_argnums=1)
_embed_folded_jit = jax.jit(embedding_model.apply_folded)
_embed_raw_jit = jax.jit(embedding_model.apply)
from openwakeword_tpu.models import embedding_student as _embedding_student  # noqa: E402
_embed_student_jit = jax.jit(_embedding_student.apply)


def _load_embedding_params(embedding_model_path: str = "", rng_seed: int = 42,
                           embedding: str = "default"):
    """Resolve embedding params: explicit checkpoint path, the bundled
    registry artifact, or (with a warning) a deterministic random init so the
    full pipeline stays runnable in artifact-less environments.

    ``embedding='student'`` resolves the TPU-shaped distilled network
    (models/embedding_student.py) instead of the faithful CNN; its
    checkpoint is produced locally by training/distill.py.
    """
    import os
    from openwakeword_tpu import registry
    reg_key = "embedding_student" if embedding == "student" else "embedding"
    path = embedding_model_path or registry.FEATURE_MODELS[reg_key]["model_path"]
    if path and os.path.exists(path):
        from openwakeword_tpu.io.loaders import load_model_file
        kind, params, _ = load_model_file(path)
        if kind not in ("embedding", "embedding_student", "unknown"):
            raise ValueError(f"Checkpoint at {path} is a '{kind}' model, expected an embedding model")
        return params
    if embedding == "student":
        from openwakeword_tpu.models import embedding_student
        logging.warning(
            "No student-embedding checkpoint found at '%s'; falling back to a "
            "deterministic random initialization. Distill one against the "
            "installed teacher with openwakeword_tpu.training.distill.", path)
        return embedding_student.init_params(jax.random.PRNGKey(rng_seed))
    logging.warning(
        "No speech-embedding checkpoint found at '%s'; falling back to a deterministic "
        "random initialization. Scores will not match pretrained models -- import real "
        "weights with openwakeword_tpu.io (download_models / convert).", path)
    return embedding_model.init_params(jax.random.PRNGKey(rng_seed))


def compute_features_from_generator(generator, n_total: int, clip_duration: int,
                                    output_file: str, device: str = "",
                                    ncpu: int = 1, embedding: str = "default",
                                    embedding_params=None,
                                    embedding_model_path: str = ""):
    """Stream a generator of (batch, samples) int16 audio through the batch
    embedding path into an on-disk memmapped .npy (supports datasets far
    larger than RAM), then trim trailing empty rows (reference
    utils.py:542-601 contract).

    ``embedding='student'`` computes features with the TPU-shaped student
    network instead of the faithful CNN — use it to train heads that will be
    served by a student-mode engine (features from the two frontends are not
    interchangeable)."""
    from numpy.lib.format import open_memmap
    from openwakeword_tpu.data import trim_mmap

    F = AudioFeatures(embedding=embedding, embedding_params=embedding_params,
                      embedding_model_path=embedding_model_path)
    rows, cols = F.get_embedding_shape(clip_duration / F.sr)
    out = open_memmap(output_file, mode='w+', dtype=np.float32,
                      shape=(n_total, rows, cols))
    written = 0
    for batch in generator:
        if written == 0 and batch.shape[0] > n_total:
            raise ValueError(
                f"n_total ({n_total}) must cover at least one generator "
                f"batch ({batch.shape[0]} clips)")
        feats = F.embed_clips(batch, batch_size=batch.shape[0], ncpu=ncpu)
        take = min(feats.shape[0], n_total - written)
        out[written:written + take] = feats[:take]
        written += take
        out.flush()
        if written >= n_total:
            break
    del out
    trim_mmap(output_file)


class AudioFeatures():
    """Streaming/batch computation of mel-spectrograms and speech embeddings."""

    def __init__(self,
                 melspec_model_path: str = "",
                 embedding_model_path: str = "",
                 sr: int = config.SAMPLE_RATE,
                 ncpu: int = 1,
                 inference_framework: str = "jax",
                 device: str = "",
                 embedding_params=None,
                 embedding: str = "default",
                 fold_embedding_batchnorm: bool = True,
                 rng_seed: int = 0):
        """Args mirror the reference's constructor; ``ncpu``/``device`` are
        accepted for API compatibility (XLA owns threading/placement here).
        ``melspec_model_path`` is accepted but unused: the mel frontend is an
        analytic JAX program, not a learned artifact. ``embedding='student'``
        swaps in the TPU-shaped distilled network (same (76,32)->96
        contract; models/embedding_student.py)."""
        if inference_framework not in ("jax", "tflite", "onnx"):
            raise ValueError(f"Unknown inference_framework '{inference_framework}'")
        if embedding not in ("default", "student"):
            raise ValueError(f"embedding must be 'default' or 'student', got {embedding!r}")
        self.sr = sr
        self._np_rng = np.random.default_rng(rng_seed)

        if embedding_params is None:
            embedding_params = _load_embedding_params(embedding_model_path,
                                                      embedding=embedding)
        self._embedding_params_raw = embedding_params
        # the RESOLVED frontend (params win over the kwarg: student params
        # passed explicitly run the student network regardless of `embedding`)
        self.embedding = "default"
        if _embedding_student.is_student(embedding_params):
            self.embedding = "student"
            self._embedding_params = embedding_params
            self._embed_fn = _embed_student_jit
        elif embedding == "student":
            raise ValueError("embedding='student' but embedding_params is a "
                             "faithful-CNN pytree; pass student params or omit "
                             "embedding_params to load/init the student network")
        elif fold_embedding_batchnorm or embedding_model.is_folded(embedding_params):
            self._embedding_params = embedding_model.ensure_folded(embedding_params)
            self._embed_fn = _embed_folded_jit
        else:
            self._embedding_params = embedding_params
            self._embed_fn = _embed_raw_jit
        self._melspec_fn = _melspec_jit

        # Streaming state (host mirrors; all FLOPs happen on device)
        from openwakeword_tpu.streaming import ChunkAccumulator
        self.raw_data_buffer = np.zeros(0, dtype=np.int16)   # <= 10 s of PCM
        self.raw_data_buffer_max = sr * 10
        self.melspectrogram_buffer = np.ones((76, 32), dtype=np.float32)
        self.melspectrogram_max_len = config.MEL_BUFFER_MAX_FRAMES
        self._accumulator = ChunkAccumulator()
        self._last_push_processed = False
        self.feature_buffer = self._get_embeddings(self._seed_noise())
        self.feature_buffer_max_len = config.FEATURE_BUFFER_MAX

    # ------------------------------------------------------------------
    # Core feature computations (device)
    # ------------------------------------------------------------------

    def _seed_noise(self):
        """4 s of random int16 noise used to seed the feature buffer
        (reference utils.py:169)."""
        return self._np_rng.integers(-1000, 1000, self.sr * config.FEATURE_SEED_SECONDS,
                                     dtype=np.int64).astype(np.int16)

    def _check_pcm(self, x) -> np.ndarray:
        if isinstance(x, list):
            x = np.asarray(x, dtype=np.int16)
        if x.dtype != np.int16:
            raise ValueError(f"Expected 16-bit PCM audio (int16), got dtype {x.dtype}")
        return x

    def _get_melspectrogram(self, x: Union[np.ndarray, List],
                            melspec_transform: Callable = None):
        """Transformed log-mel spectrogram of raw int16 PCM -> (T, 32) float32.

        The default transform (spec/10 + 2) is fused into the device program;
        a custom ``melspec_transform`` is applied host-side for parity with the
        reference's signature (utils.py:180)."""
        x = self._check_pcm(x)
        if x.ndim < 2:
            x = x[None, :]
        spec = np.asarray(self._melspec_fn(jnp.asarray(x.astype(np.float32)), config.MEL_TOP_DB))
        spec = np.squeeze(spec)
        if melspec_transform is not None:
            # undo fused default, then apply user transform to the raw dB values
            spec = melspec_transform((spec - config.MEL_TRANSFORM_SHIFT) / config.MEL_TRANSFORM_SCALE)
        return spec

    def _get_embeddings_from_melspec(self, melspec: np.ndarray) -> np.ndarray:
        """(76, 32[, 1]) or (B, 76, 32[, 1]) mel window(s) -> (B, 96) embeddings."""
        m = np.asarray(melspec, dtype=np.float32)
        if m.ndim == 3 and m.shape[-1] == 1:
            # a single (76, 32, 1) window, not a batch of (32, 1) images
            m = m[None]
        if m.ndim == 2:
            m = m[None]
        if m.ndim == 4:
            m = m[..., 0]
        out = np.asarray(self._embed_fn(self._embedding_params, jnp.asarray(m)))
        return out.squeeze() if out.shape[0] == 1 else out

    def _get_embeddings(self, x: np.ndarray, window_size: int = config.EMB_WINDOW_FRAMES,
                        step_size: int = config.EMB_STEP_FRAMES, **kwargs) -> np.ndarray:
        """Raw PCM clip -> (n_windows, 96) embeddings (all windows batched in
        one device call; the reference loops per window)."""
        spec = self._get_melspectrogram(x, **kwargs)
        starts = [i for i in range(0, spec.shape[0], step_size) if i + window_size <= spec.shape[0]]
        if not starts:
            return np.zeros((0, config.EMB_DIM), dtype=np.float32)
        windows = np.stack([spec[i:i + window_size] for i in starts]).astype(np.float32)
        out = np.asarray(self._embed_fn(self._embedding_params, jnp.asarray(windows)))
        return out.reshape(len(starts), config.EMB_DIM)

    def get_embedding_shape(self, audio_length: float, sr: int = None):
        """Output embedding array shape for a clip of ``audio_length`` seconds.

        Closed form — running the device pipeline on dummy audio (as the
        reference does, utils.py:238-241) would compile a fresh program per
        clip length just to read a shape."""
        sr = sr or self.sr
        n_samples = int(audio_length * sr)
        frames = melspec_ops.num_frames(n_samples)
        n_windows = max(0, (frames - config.EMB_WINDOW_FRAMES)
                        // config.EMB_STEP_FRAMES + 1)
        return (n_windows, config.EMB_DIM)

    # ------------------------------------------------------------------
    # Batch path (training feature pre-compute)
    # ------------------------------------------------------------------

    def _get_melspectrogram_batch(self, x: np.ndarray, batch_size: int = 128, ncpu: int = 1):
        """(N, samples) PCM -> (N, frames, 32) mel, batched on device.

        Matches the reference CPU path's per-clip top_db clamp scope
        (utils.py:243-290 maps _get_melspectrogram over rows)."""
        n_frames = melspec_ops.num_frames(x.shape[1])
        out = np.empty((x.shape[0], n_frames, config.N_MELS), dtype=np.float32)
        for i in range(0, x.shape[0], batch_size):
            batch = x[i:i + batch_size].astype(np.float32)
            out[i:i + batch.shape[0]] = np.asarray(
                self._melspec_fn(jnp.asarray(batch), config.MEL_TOP_DB))
        return out

    def _get_embeddings_batch(self, x: np.ndarray, batch_size: int = 128, ncpu: int = 1):
        """(N, frames, 32[, 1]) mel -> (N, n_windows, 96) embeddings."""
        if x.ndim == 4:
            x = x[..., 0]
        if x.shape[1] < 76:
            raise ValueError(f"Need >= {config.EMB_WINDOW_FRAMES} mel frames per "
                             f"embedding window, got {x.shape[1]}")
        n_windows = (x.shape[1] - config.EMB_WINDOW_FRAMES) // config.EMB_STEP_FRAMES + 1
        out = np.empty((x.shape[0], n_windows, config.EMB_DIM), dtype=np.float32)
        # Slice all windows of a clip on host (cheap views) and batch clips so
        # each device call sees a (B*n_windows, 76, 32) tensor.
        clip_batch = max(1, batch_size // max(1, n_windows))
        for i in range(0, x.shape[0], clip_batch):
            chunk = x[i:i + clip_batch]
            windows = np.stack([chunk[:, j * 8:j * 8 + 76] for j in range(n_windows)], axis=1)
            flat = windows.reshape(-1, 76, 32).astype(np.float32)
            emb = np.asarray(self._embed_fn(self._embedding_params, jnp.asarray(flat)))
            out[i:i + chunk.shape[0]] = emb.reshape(chunk.shape[0], n_windows, config.EMB_DIM)
        return out

    def embed_clips(self, x: np.ndarray, batch_size: int = 128, ncpu: int = 1):
        """(N, samples) PCM -> (N, n_windows, 96) embeddings."""
        melspecs = self._get_melspectrogram_batch(x, batch_size=batch_size, ncpu=ncpu)
        return self._get_embeddings_batch(melspecs, batch_size=batch_size, ncpu=ncpu)

    # ------------------------------------------------------------------
    # Streaming path
    # ------------------------------------------------------------------

    def reset(self):
        """Reset the internal buffers (reference utils.py:172-178 contract)."""
        self.raw_data_buffer = np.zeros(0, dtype=np.int16)
        self.melspectrogram_buffer = np.ones((76, 32), dtype=np.float32)
        self._accumulator.reset()
        self._last_push_processed = False
        self.feature_buffer = self._get_embeddings(self._seed_noise())

    # Introspection mirrors of the reference's accumulation attributes
    # (utils.py:167-168): after a processing call the leftover tail is the
    # "remainder"; between processing calls it is the accumulated count.
    @property
    def raw_data_remainder(self) -> np.ndarray:
        return self._accumulator._pending if self._last_push_processed \
            else np.empty(0, dtype=np.int16)

    @property
    def accumulated_samples(self) -> int:
        return 0 if self._last_push_processed else self._accumulator.pending

    def _streaming_features(self, x) -> int:
        """Advance the streaming state with a PCM packet of any size.

        Packets coalesce into whole 80 ms frames (streaming.ChunkAccumulator);
        each completed batch of frames triggers one device dispatch computing
        all new mel frames (with the 3-hop look-back that keeps streaming
        equal to whole-clip output) and all new embeddings at once. Returns
        the processed-sample count, or the waiting count when no frame
        completed (the Model's score-recycling signal)."""
        ready = self._accumulator.push(x)
        self._last_push_processed = ready is not None
        if ready is None:
            return self._accumulator.pending

        # Keep up to 10 s of raw PCM for mel look-back and introspection.
        self.raw_data_buffer = np.concatenate(
            [self.raw_data_buffer, ready])[-self.raw_data_buffer_max:]

        # New mel frames, one dispatch per call: every 1280-sample block is
        # computed over its own 1760-sample window (480-sample look-back for
        # whole-clip-aligned STFT frames), all blocks batched. Fixing the
        # block as the unit makes the data-dependent top_db clamp scope
        # independent of how callers chunk their audio — streamed scores are
        # chunk-size invariant by construction — and identical to the fused
        # multi-stream engine's per-step scope (engine steps are one block).
        n_ready = int(ready.shape[0])
        L = self.raw_data_buffer.shape[0]
        block = config.CHUNK_SAMPLES
        look = config.MEL_LOOKBACK_SAMPLES
        if n_ready > L:
            # a single push larger than the 10 s raw ring: the oldest ready
            # samples already fell out of the buffer, so only the blocks
            # still present can be processed (negative starts would wrap
            # Python slices and compute mel over giant bogus windows). A
            # >10 s push thus behaves like feeding only its last 10 s.
            n_ready = (L // block) * block
        starts = L - n_ready + block * np.arange(n_ready // block)
        parts = []
        while starts.size and starts[0] < look:
            # first-ever block(s): shorter look-back, like the reference's
            # first streaming call (it pushes 5 frames instead of 8)
            s = int(starts[0])
            window = self.raw_data_buffer[max(0, s - look):s + block]
            parts.append(np.atleast_2d(self._get_melspectrogram(window)))
            starts = starts[1:]
        if starts.size:
            idx = starts[:, None] + np.arange(-look, block)[None, :]
            mel = self._get_melspectrogram(self.raw_data_buffer[idx])  # (k, 8, 32)
            parts.append(mel.reshape(-1, config.N_MELS))
        new_mel = np.vstack(parts)
        self.melspectrogram_buffer = np.vstack(
            [self.melspectrogram_buffer, new_mel])[-self.melspectrogram_max_len:]

        # One 76-frame embedding window per completed 80 ms frame (oldest
        # first), batched into a single device call.
        n_frames = n_ready // config.CHUNK_SAMPLES
        mel_len = self.melspectrogram_buffer.shape[0]
        ends = mel_len - config.EMB_STEP_FRAMES * np.arange(n_frames)[::-1]
        spans = [(e - config.EMB_WINDOW_FRAMES, e) for e in ends
                 if e >= config.EMB_WINDOW_FRAMES]
        if spans:
            batch = np.stack([self.melspectrogram_buffer[s:e] for s, e in spans])
            emb = np.asarray(self._embed_fn(self._embedding_params,
                                            jnp.asarray(batch.astype(np.float32))))
            self.feature_buffer = np.vstack(
                [self.feature_buffer, emb.reshape(len(spans), config.EMB_DIM)]
            )[-self.feature_buffer_max_len:]
        return n_ready

    def get_features(self, n_feature_frames: int = 16, start_ndx: int = -1) -> np.ndarray:
        """Feature window as (1, n_feature_frames, 96) float32: the newest
        frames by default, or an absolute slice via ``start_ndx`` (negative
        indices address from the buffer end, as the sub-frame scoring path
        uses)."""
        if start_ndx == -1:
            window = self.feature_buffer[-int(n_feature_frames):]
        else:
            stop = start_ndx + int(n_feature_frames)
            window = self.feature_buffer[start_ndx:(stop if stop != 0 else None)]
        return window[None].astype(np.float32)

    def __call__(self, x) -> int:
        return self._streaming_features(x)

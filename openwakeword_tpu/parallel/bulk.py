"""Batched bulk prediction: the TPU replacement for the reference's
multiprocessing ``bulk_predict`` (reference utils.py:467-539).

Instead of forking ``ncpu`` OS processes each owning a private engine, clips
are zero-padded to a common length and scored as one multi-stream batch in a
single scanned XLA program. ``ncpu`` is accepted for API compatibility and
ignored (XLA owns parallelism).
"""

import wave
from typing import Dict, List, Sequence

import numpy as np

from openwakeword_tpu import config


def _read_wav(path: str) -> np.ndarray:
    """16-bit WAV -> mono int16 (channel 0), like data.read_audio."""
    with wave.open(path, mode="rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"{path}: only 16-bit PCM WAV is supported "
                             f"(got {8 * f.getsampwidth()}-bit)")
        if f.getframerate() != config.SAMPLE_RATE:
            raise ValueError(
                f"{path}: expected {config.SAMPLE_RATE} Hz audio, got "
                f"{f.getframerate()} Hz — resample before bulk prediction")
        pcm = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
        ch = f.getnchannels()
        return pcm.reshape(-1, ch)[:, 0] if ch > 1 else pcm


def bulk_predict(file_paths: List[str],
                 wakeword_models: Sequence[str],
                 prediction_function: str = "predict_clip",
                 ncpu: int = 1,
                 inference_framework: str = "jax",
                 batch_size: int = 1024,
                 padding: int = 1,
                 **kwargs) -> Dict[str, list]:
    """Predict on many WAV files at once.

    Returns {filepath: [per-frame {label: score} dicts]}, matching
    Model.predict_clip output per file.
    """
    if prediction_function != "predict_clip":
        # Fall back to the generic path for exotic prediction functions
        from openwakeword_tpu.model import Model
        from openwakeword_tpu.utils.args import accepted_kwargs
        init_kwargs = accepted_kwargs(Model.__init__)
        m = Model(wakeword_models=list(wakeword_models),
                  **{k: v for k, v in kwargs.items() if k in init_kwargs})
        func = getattr(m, prediction_function)
        fn_kwargs = accepted_kwargs(func)
        func_kwargs = {k: v for k, v in kwargs.items() if k in fn_kwargs}
        out = {}
        for fp in file_paths:
            out[fp] = func(fp, **func_kwargs)
            m.reset()
        return out

    from openwakeword_tpu.parallel.engine import MultiStreamEngine
    from openwakeword_tpu.utils.args import accepted_kwargs

    # One engine for the whole run (heads load and programs build once);
    # short final batches are zero-padded to the engine's stream capacity.
    # Kwargs are filtered by the engine's real signature (like the generic
    # path above) — a hand-maintained allowlist silently dropped options
    # such as precision/incremental.
    n_streams = min(batch_size, max(1, len(file_paths)))
    engine_init = accepted_kwargs(MultiStreamEngine.__init__)
    engine = MultiStreamEngine(
        wakeword_models=list(wakeword_models), n_streams=n_streams,
        **{k: v for k, v in kwargs.items()
           if k in engine_init and k not in ("wakeword_models", "n_streams")})

    results: Dict[str, list] = {}
    for i in range(0, len(file_paths), n_streams):
        batch_paths = file_paths[i:i + n_streams]
        clips = [_read_wav(p) for p in batch_paths]
        pad = 16000 * padding
        # per-clip frame count under the reference predict_clip contract
        frame_counts = [max(0, -(-(len(c) + 2 * pad - config.CHUNK_SAMPLES)
                                 // config.CHUNK_SAMPLES)) for c in clips]
        max_len = max(len(c) for c in clips)
        batch = np.zeros((n_streams, max_len), dtype=np.int16)
        for j, c in enumerate(clips):
            batch[j, :len(c)] = c

        scores = engine.predict_clips(batch, padding=padding)   # (T, S, L)
        for j, path in enumerate(batch_paths):
            t_j = frame_counts[j]
            results[path] = [
                {lbl: float(scores[t, j, k]) for k, lbl in enumerate(engine.labels)}
                for t in range(min(t_j, scores.shape[0]))
            ]
    return results

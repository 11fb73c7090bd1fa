"""Slot-based serving runtime around the multi-stream engine.

Production serving needs more than a fused step: clients attach/detach at
any time, audio arrives in arbitrary-sized packets, and activations must be
collected per stream. ``StreamServer`` manages a fixed-capacity engine as a
slot pool:

  * ``add_stream()`` leases a slot (resetting its on-device state row);
  * ``push(sid, pcm)`` buffers arbitrary-size PCM per slot;
  * ``step()`` advances every slot by one 80 ms frame, consuming buffered
    audio (slots without a full frame are fed silence -- real-time streams
    deliver 1280 samples per 80 ms by construction);
  * ``poll(sid)`` drains that stream's activations (label, frame, score).

Per-slot reset works through the engine's first-step prime branch: resetting
``frames_seen`` to 0 on one row makes the next step re-derive all activation
caches from the mel rings, which is exact for every stream (the prime path
computes the same full-window values the incremental path maintains).
"""

from collections import deque
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from openwakeword_tpu import config
from openwakeword_tpu.parallel.engine import MultiStreamEngine


class StreamServer:
    def __init__(self, wakeword_models=(), capacity: int = 256,
                 threshold: float = 0.5, engine: Optional[MultiStreamEngine] = None,
                 **engine_kwargs):
        self.engine = engine or MultiStreamEngine(
            wakeword_models=wakeword_models, n_streams=capacity, **engine_kwargs)
        self.capacity = self.engine.n_streams
        self.threshold = threshold
        self.labels = self.engine.labels

        self._free = deque(range(self.capacity))
        self._active: Dict[int, dict] = {}
        self._frame_counter = 0
        # template rows for slot resets (fresh state at index 0), kept on
        # device; resets are jitted per-row scatters (O(1 row), no host trip)
        self._fresh_row = jax.tree.map(lambda a: jnp.asarray(a[0:1]),
                                       self.engine.init_state(1))
        self._reset_fn = jax.jit(
            lambda state, fresh, sid: jax.tree.map(
                lambda full, row: full.at[sid].set(row[0]), state, fresh),
            donate_argnums=(0,))

    # ------------------------------------------------------------------

    def add_stream(self) -> int:
        """Lease a slot; returns the stream id. Raises when at capacity."""
        if not self._free:
            raise RuntimeError(f"StreamServer at capacity ({self.capacity} streams)")
        sid = self._free.popleft()
        self._reset_slot(sid)
        self._active[sid] = {"buffer": np.zeros(0, np.int16),
                             "activations": deque(maxlen=1000)}
        return sid

    def remove_stream(self, sid: int):
        self._active.pop(sid)
        self._free.append(sid)

    def push(self, sid: int, pcm: np.ndarray):
        """Buffer arbitrary-length 16-bit PCM for a stream."""
        st = self._active[sid]
        st["buffer"] = np.concatenate([st["buffer"], np.asarray(pcm, np.int16)])

    def pending_frames(self, sid: int) -> int:
        return len(self._active[sid]["buffer"]) // config.CHUNK_SAMPLES

    def step(self) -> np.ndarray:
        """Advance every slot by one frame. Returns the full (capacity, L)
        score matrix (inactive slots process silence; ignore their rows)."""
        chunk = np.zeros((self.capacity, config.CHUNK_SAMPLES), np.int16)
        for sid, st in self._active.items():
            buf = st["buffer"]
            if len(buf) >= config.CHUNK_SAMPLES:
                chunk[sid] = buf[:config.CHUNK_SAMPLES]
                st["buffer"] = buf[config.CHUNK_SAMPLES:]
        scores = self.engine.predict(chunk)
        self._frame_counter += 1
        for sid, st in self._active.items():
            for k, label in enumerate(self.labels):
                if scores[sid, k] >= self.threshold:
                    st["activations"].append((label, self._frame_counter,
                                              float(scores[sid, k])))
        return scores

    def run_pending(self) -> int:
        """Step until no active stream has a full frame buffered. Returns the
        number of steps taken."""
        steps = 0
        while any(self.pending_frames(sid) > 0 for sid in self._active):
            self.step()
            steps += 1
        return steps

    def poll(self, sid: int) -> List[Tuple[str, int, float]]:
        """Drain (label, frame_index, score) activations for a stream."""
        st = self._active[sid]
        out = list(st["activations"])
        st["activations"].clear()
        return out

    # ------------------------------------------------------------------

    def _reset_slot(self, sid: int):
        """Re-initialize one slot's on-device state row (jitted scatter)."""
        self.engine.state = self._reset_fn(self.engine.state, self._fresh_row,
                                           jnp.asarray(sid, jnp.int32))

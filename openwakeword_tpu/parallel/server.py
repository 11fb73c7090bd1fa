"""Slot-based serving runtime around the multi-stream engine.

Production serving needs more than a fused step: clients attach/detach at
any time, audio arrives in arbitrary-sized packets, and activations must be
collected per stream. ``StreamServer`` manages a fixed-capacity engine as a
slot pool:

  * ``add_stream()`` leases a slot (resetting its on-device state row);
  * ``push(sid, pcm)`` coalesces arbitrary-size PCM packets per slot
    (streaming.ChunkAccumulator, the same component behind the host
    AudioFeatures frontend);
  * ``step()`` advances the slots that have a complete 80 ms frame through
    the engine's masked step; starved slots keep their audio state frozen
    and recycle their previous score (the reference's sub-frame contract,
    model.py:303-311) instead of being fed silence;
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
from openwakeword_tpu.streaming import ChunkAccumulator


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
        # template rows for slot resets, kept on device; resets are jitted
        # per-row scatters (O(1 row), no host trip)
        self._fresh_row = self.engine.init_state(1)
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
        self._active[sid] = {"acc": ChunkAccumulator(),
                             "frames": deque(),
                             "activations": deque(maxlen=1000)}
        return sid

    def remove_stream(self, sid: int):
        self._active.pop(sid)
        self._free.append(sid)

    def push(self, sid: int, pcm: np.ndarray):
        """Add an arbitrary-length 16-bit PCM packet to a stream."""
        st = self._active[sid]
        ready = st["acc"].push(pcm)
        if ready is not None:
            for i in range(0, ready.shape[0], config.CHUNK_SAMPLES):
                st["frames"].append(ready[i:i + config.CHUNK_SAMPLES])

    def pending_frames(self, sid: int) -> int:
        return len(self._active[sid]["frames"])

    def step(self) -> np.ndarray:
        """One serving tick: advance every slot holding a complete frame
        (masked engine step); starved and inactive slots are untouched.
        Returns the full (capacity, L) score matrix."""
        chunk = np.zeros((self.capacity, config.CHUNK_SAMPLES), np.int16)
        valid = np.zeros(self.capacity, dtype=bool)
        for sid, st in self._active.items():
            if st["frames"]:
                chunk[sid] = st["frames"].popleft()
                valid[sid] = True
        scores = self.engine.predict_masked(chunk, valid)
        self._frame_counter += 1
        for sid, st in self._active.items():
            if not valid[sid]:
                continue
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

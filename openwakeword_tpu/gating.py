"""Score post-processing shared by the single-stream Model and the
MultiStreamEngine: warm-up zeroing, patience / debounce activation filtering,
and the VAD gate.

One vectorized implementation, two array backends: the functions take an
``xp`` namespace (numpy on the host path, jax.numpy inside the engine's
compiled step) and operate on a trailing label axis, so the exact same
definitions run per-call on one stream and fused over tens of thousands.

Semantics (reference openwakeword/model.py:330-381):
  * warm-up  — scores are forced to 0 until a label has ``WARMUP_FRAMES``
    history entries (the feature ring is noise-seeded at init, so early
    scores are meaningless).
  * patience — a nonzero score survives only if the last ``patience`` history
    entries all cleared the threshold. Mutually exclusive with debounce.
  * debounce — a score above threshold is suppressed when any of the last
    ``debounce_frames`` history entries already cleared the threshold
    (one activation per utterance).
  * VAD gate — all scores are zeroed unless the maximum VAD score in the
    0.4–0.56 s look-back window reaches ``vad_threshold``.

History arrays are ordered oldest-first with the newest entry last, and
filters run *before* the current scores are pushed into the history.
"""

from typing import Tuple

from openwakeword_tpu import config


def warmup_zero(xp, scores, history_len):
    """Zero scores for labels still inside the warm-up window.

    scores: (..., L); history_len: (...,) or (..., L) entries seen so far.
    """
    warm = history_len >= config.WARMUP_FRAMES
    while getattr(warm, "ndim", 0) < getattr(scores, "ndim", 0):
        warm = warm[..., None]
    return xp.where(warm, scores, 0.0)


def patience_filter(xp, scores, raw_history, patience_vec, threshold_vec):
    """Keep a score only when the wake word has been above threshold for
    ``patience`` consecutive frames: the current raw score and the previous
    ``patience - 1`` raw-history entries must all reach the threshold.

    The history here is the *raw* (pre-filter) score history, NOT the
    reported prediction buffer. The reference checks its prediction buffer
    (model.py:346-352) — but it also stores *filtered* scores there
    (model.py:361-363), so its patience condition can never become true and
    the feature deadlocks (every activation suppressed forever). Checking
    raw scores implements the documented behavior ("the number of
    consecutive frames above the threshold before an activation",
    reference README); COMPATIBILITY.md #22.

    scores: (..., L) raw post-warm-up scores; raw_history: (..., L, H)
    oldest-first raw scores from previous calls; patience_vec /
    threshold_vec: (L,), patience 0 = filter disabled.
    """
    h = raw_history.shape[-1]
    idx = xp.arange(h)
    in_window = idx >= (h - (patience_vec[..., :, None] - 1))
    misses = xp.sum((raw_history < threshold_vec[..., :, None]) & in_window, axis=-1)
    satisfied = (misses == 0) & (scores >= threshold_vec)
    keep = (patience_vec <= 0) | satisfied
    return xp.where(keep, scores, 0.0)


def debounce_filter(xp, scores, history, threshold_vec, debounce_frames, active=None):
    """Suppress a supra-threshold score when one already fired within the
    last ``debounce_frames`` history entries.

    ``active``: optional (L,) bool — labels the filter applies to (the host
    path only debounces labels whose parent model has a threshold entry).
    """
    recent = history[..., history.shape[-1] - debounce_frames:]
    fired_recently = xp.any(recent >= threshold_vec[..., :, None], axis=-1)
    suppress = (scores >= threshold_vec) & fired_recently
    if active is not None:
        suppress = suppress & active
    return xp.where(suppress, 0.0, scores)


def push_history(xp, history, scores):
    """Append the (filtered) scores as the newest history entry."""
    return xp.concatenate([history[..., 1:], scores[..., None]], axis=-1)


def vad_gate(xp, scores, gate_scores, vad_threshold):
    """Zero all scores when speech activity in the gate window is below
    threshold. gate_scores: (..., G) VAD scores 0.4-0.56 s back; negative
    entries mark not-yet-filled ring slots (treated as score 0, matching the
    reference's max-over-empty-buffer = 0)."""
    gate_max = xp.max(xp.where(gate_scores >= 0.0, gate_scores, 0.0), axis=-1)
    return xp.where((gate_max >= vad_threshold)[..., None], scores, 0.0)


def validate_gating_args(patience, threshold, debounce_time) -> Tuple[bool, bool]:
    """Shared constructor/call validation -> (use_patience, use_debounce)."""
    use_patience = bool(patience)
    use_debounce = debounce_time > 0
    if use_patience and use_debounce:
        raise ValueError("patience and debounce_time are mutually exclusive "
                         "activation filters; pass only one of them")
    if (use_patience or use_debounce) and not threshold:
        raise ValueError("patience/debounce filtering needs per-model score "
                         "thresholds: pass them via the threshold argument")
    return use_patience, use_debounce

"""The main inference engine: Model.

Keeps the reference's public surface and per-call semantics (reference
openwakeword/model.py:32-504) -- predict / predict_clip / reset,
patience XOR debounce filtering, 5-frame warm-up zeroing, multiclass label
mapping, custom verifier override, Silero-style VAD gating, per-stage timing
-- while replacing the per-model ONNX/TFLite interpreter calls with jitted
JAX programs that batch all sub-frame windows of a call into single device
dispatches.

For thousands-of-streams throughput use ``openwakeword_tpu.parallel``; this
class is the single-stream, reference-compatible engine.
"""

import functools
import logging
import os
import pickle
import time
import wave
import zlib
from collections import defaultdict, deque
from functools import partial
from typing import DefaultDict, Dict, List, Union

import numpy as np
import jax
import jax.numpy as jnp

from openwakeword_tpu import config, gating, registry
from openwakeword_tpu.features import AudioFeatures
from openwakeword_tpu.models import heads as heads_lib
from openwakeword_tpu.utils.args import re_arg


def _strip_meta(params: Dict) -> Dict:
    return {k: v for k, v in params.items() if k != "__meta__"}


@functools.lru_cache(maxsize=None)
def _head_forward_jit(meta_items: tuple):
    """One jitted head-forward program per architecture (shared across Model
    instances so repeated construction never retraces)."""
    meta = dict(meta_items)
    return jax.jit(partial(heads_lib.forward, meta=meta, inference=True))


class Model():
    """Wake-word engine: shared audio preprocessor + N classifier heads."""

    @re_arg({"wakeword_model_paths": "wakeword_models"})
    def __init__(
            self,
            wakeword_models: List[str] = [],
            class_mapping_dicts: List[dict] = [],
            enable_speex_noise_suppression: bool = False,
            noise_suppression_algorithm: str = "spectral",
            vad_threshold: float = 0,
            custom_verifier_models: dict = {},
            custom_verifier_threshold: float = 0.1,
            inference_framework: str = "jax",
            quantized_execution: str = "dequant",
            **kwargs,
            ):
        """Args mirror the reference constructor (model.py:37-82).

        ``wakeword_models`` entries may be native .npz checkpoints, upstream
        .onnx/.tflite artifacts (imported on the fly), or pretrained model
        names. ``inference_framework`` is accepted for compatibility; all
        execution is JAX/XLA. ``quantized_execution`` selects how
        int8-quantized .tflite heads run: 'dequant' (float emulation, fast
        default) or 'exact' (LiteRT integer-kernel score parity — the
        reference interpreter executes int8 graphs natively,
        reference utils.py:112-161).
        """
        wakeword_models, wakeword_model_names = registry.resolve_wakeword_models(wakeword_models)

        self.models: Dict[str, Dict] = {}          # name -> head params pytree
        self.model_inputs: Dict[str, int] = {}     # name -> input feature frames
        self.model_outputs: Dict[str, int] = {}    # name -> output classes
        self.model_prediction_function: Dict[str, callable] = {}
        self.class_mapping: Dict[str, Dict] = {}
        self.custom_verifier_models: Dict[str, object] = {}
        self.custom_verifier_threshold = custom_verifier_threshold
        head_frontends: Dict[str, str] = {}        # name -> training frontend

        for mdl_path, mdl_name in zip(wakeword_models, wakeword_model_names):
            params, meta = self._load_head(mdl_path, mdl_name,
                                           quantized_execution)
            # heads trained by train_cli record which feature frontend
            # produced their training features; checked against the RESOLVED
            # frontend after the preprocessor is built (below) — the kwarg
            # alone can't tell (student params may arrive via
            # embedding_params/embedding_model_path)
            if meta.get("embedding"):
                head_frontends[mdl_name] = meta["embedding"]
            head_meta = params["__meta__"]
            self.models[mdl_name] = params
            self.model_inputs[mdl_name] = int(head_meta["input_frames"])
            self.model_outputs[mdl_name] = int(head_meta["n_classes"])

            fwd = _head_forward_jit(tuple(sorted(head_meta.items())))
            leaf_params = _strip_meta(params)

            def pred_fn(x, _fwd=fwd, _p=leaf_params):
                return np.asarray(_fwd(_p, jnp.asarray(x, dtype=jnp.float32)))
            self.model_prediction_function[mdl_name] = pred_fn

            # Class-label mapping: user dicts > checkpoint meta > built-ins > identity
            # Accepts {"<model_name>": {"0": "label", ...}} entries (the
            # reference stores the outer dict, a latent multiclass bug; we
            # store the inner int->label mapping).
            if class_mapping_dicts and class_mapping_dicts[wakeword_models.index(mdl_path)].get(mdl_name, None):
                self.class_mapping[mdl_name] = class_mapping_dicts[wakeword_models.index(mdl_path)][mdl_name]
            elif meta.get("class_mapping"):
                self.class_mapping[mdl_name] = dict(meta["class_mapping"])
            elif registry.model_class_mappings.get(mdl_name, None):
                self.class_mapping[mdl_name] = registry.model_class_mappings[mdl_name]
            else:
                self.class_mapping[mdl_name] = {str(i): str(i) for i in range(0, self.model_outputs[mdl_name])}

            if isinstance(custom_verifier_models, dict):
                if custom_verifier_models.get(mdl_name, False):
                    self.custom_verifier_models[mdl_name] = pickle.load(
                        open(custom_verifier_models[mdl_name], 'rb'))

        # blank entries ({'name': ''} / None from config templates) count as
        # "no verifier", matching the load loop's falsy skip above
        provided_verifiers = {k for k, v in (custom_verifier_models or {}).items() if v}
        if len(self.custom_verifier_models) < len(provided_verifiers):
            unmatched = sorted(provided_verifiers - set(self.models))
            raise ValueError(
                f"custom_verifier_models keys {unmatched} do not name any loaded "
                f"base model (loaded: {sorted(self.models)}); key every verifier "
                "by its base model's name")

        # Ordered output-label vector + label->parent map, used to run the
        # shared vectorized gating (gating.py) over all labels at once.
        self._labels: List[str] = []
        self._label_parent: Dict[str, str] = {}
        for mdl_name in self.models:
            self._label_parent[mdl_name] = mdl_name
            if self.model_outputs[mdl_name] == 1:
                self._labels.append(mdl_name)
            else:
                for cls in self.class_mapping[mdl_name].values():
                    self._labels.append(cls)
                    self._label_parent[cls] = mdl_name

        # Per-label score history for warm-up / debounce (reported scores)
        # and the raw pre-filter history the patience filter reads
        self.prediction_buffer: DefaultDict[str, deque] = defaultdict(
            partial(deque, maxlen=config.PREDICTION_BUFFER_MAX))
        self.raw_score_buffer: DefaultDict[str, deque] = defaultdict(
            partial(deque, maxlen=config.PREDICTION_BUFFER_MAX))

        # Noise suppression (native C++ spectral-subtraction module; the
        # reference binds SpeexDSP here, model.py:200-205)
        if noise_suppression_algorithm not in ("spectral", "mmse"):
            raise ValueError(
                "noise_suppression_algorithm must be 'spectral' or 'mmse'; "
                f"got {noise_suppression_algorithm!r}")
        if enable_speex_noise_suppression:
            from openwakeword_tpu.ns import JaxNoiseSuppression, NoiseSuppression
            if noise_suppression_algorithm == "mmse":
                # the MMSE profile (the SpeexDSP preprocessor's update rules)
                # exists as XLA ops only; the native library is spectral-only
                self.speex_ns = JaxNoiseSuppression(algorithm="mmse")
            else:
                try:
                    self.speex_ns = NoiseSuppression(frame_size=160,
                                                     sample_rate=16000)
                except (ImportError, OSError, RuntimeError) as e:
                    # hosts without a C++ toolchain fall back to the XLA
                    # implementation of the same suppressor (<=1 LSB apart)
                    logging.warning(
                        "native noise-suppression library unavailable (%s); "
                        "falling back to the XLA suppressor (ops.ns_jax)", e)
                    self.speex_ns = JaxNoiseSuppression()
        else:
            self.speex_ns = None

        # Voice activity detection
        self.vad_threshold = vad_threshold
        if vad_threshold > 0:
            from openwakeword_tpu.vad import VAD
            self.vad = VAD()

        self.preprocessor = AudioFeatures(**kwargs)

        # a frontend mismatch makes scores meaningless — flag it loudly,
        # against the frontend the preprocessor ACTUALLY resolved
        for mdl_name, trained_on in head_frontends.items():
            if trained_on != self.preprocessor.embedding:
                logging.warning(
                    "Model '%s' was trained on the '%s' embedding frontend but "
                    "this engine runs embedding='%s'; its scores will be "
                    "unreliable. Construct the engine with embedding='%s'.",
                    mdl_name, trained_on, self.preprocessor.embedding,
                    trained_on)

    # ------------------------------------------------------------------

    @staticmethod
    def _load_head(mdl_path: str, mdl_name: str,
                   quantized_execution: str = "dequant"):
        """Load a head checkpoint, importing .onnx/.tflite if needed. When a
        known pretrained name has no artifact on disk (zero-egress installs),
        fall back to a deterministic random init with the published
        architecture so the pipeline stays runnable."""
        if os.path.exists(mdl_path):
            from openwakeword_tpu.io.loaders import load_model_file
            kind, params, meta = load_model_file(
                mdl_path, quantized=quantized_execution)
            if kind not in ("head", "unknown"):
                raise ValueError(f"Model file {mdl_path} is a '{kind}' checkpoint, expected a wakeword head")
            if "__meta__" not in params:
                raise ValueError(f"Head checkpoint {mdl_path} is missing architecture metadata")
            return params, meta
        base = os.path.splitext(os.path.basename(mdl_path))[0]
        spec = registry.PRETRAINED_HEAD_SPECS.get(
            base, {"model_type": "dnn", "input_frames": config.DEFAULT_HEAD_INPUT_FRAMES,
                   "n_classes": 1, "layer_dim": config.DEFAULT_HEAD_WIDTH, "n_blocks": 1})
        logging.warning(
            "No checkpoint found at '%s' for model '%s'; using a deterministic random "
            "initialization with the published architecture. Download/convert real weights "
            "for meaningful scores.", mdl_path, mdl_name)
        seed = zlib.crc32(base.encode())
        params = heads_lib.init_params(jax.random.PRNGKey(seed), **spec)
        return params, {}

    def get_parent_model_from_label(self, label):
        """Parent model name for a prediction label ("" if unknown)."""
        return self._label_parent.get(label, "")

    def reset(self):
        """Reset the prediction and audio feature buffers."""
        self.prediction_buffer = defaultdict(partial(deque, maxlen=config.PREDICTION_BUFFER_MAX))
        # raw (pre-filter) scores: what the patience filter reads
        self.raw_score_buffer = defaultdict(partial(deque, maxlen=config.PREDICTION_BUFFER_MAX))
        self.preprocessor.reset()

    # ------------------------------------------------------------------

    def predict(self, x: np.ndarray, patience: dict = {},
                threshold: dict = {}, debounce_time: float = 0.0, timing: bool = False):
        """Score the current audio frame with every head.

        Semantics per the reference hot path (model.py:232-386): >1280
        prepared samples -> max over per-80 ms sub-frame scores (here: one
        batched device call per head instead of a python loop); <1280 ->
        recycle the previous score; 5-call warm-up zeroing; patience XOR
        debounce; VAD gate over scores 0.4-0.56 s back.
        """
        if not isinstance(x, np.ndarray):
            raise ValueError(f"predict expects int16 PCM as a numpy array; got {type(x)}")

        timing_dict: Dict[str, Dict] = {"models": {}}
        t0 = time.time()
        pcm = self.speex_ns.process_frames(x) if self.speex_ns else x
        n_prepared = self.preprocessor(pcm)
        timing_dict["models"]["preprocessor"] = time.time() - t0

        scores = self._score_heads(n_prepared, timing_dict["models"])
        scores = self._apply_verifiers(scores)
        scores = self._postprocess(scores, n_prepared, patience, threshold, debounce_time)

        if self.vad_threshold > 0:
            t0 = time.time()
            self.vad(x)
            timing_dict["models"]["vad"] = time.time() - t0
            gate = np.asarray(list(self.vad.prediction_buffer)
                              [config.VAD_GATE_LO:config.VAD_GATE_HI], dtype=np.float32)
            if gate.size == 0:
                gate = np.array([-1.0], dtype=np.float32)   # unfilled sentinel
            scores = gating.vad_gate(np, scores, gate, self.vad_threshold)

        predictions = {lbl: float(s) for lbl, s in zip(self._labels, scores)}
        return (predictions, timing_dict) if timing else predictions

    def _score_heads(self, n_prepared: int, model_timing: Dict) -> np.ndarray:
        """Raw per-label scores for this call, ordered as self._labels.

        Sub-frame semantics per the reference hot path: more than one frame
        prepared -> max over all sub-frame windows (batched into one device
        call per head); exactly one -> score the newest window; none -> binary
        labels recycle their previous score, multiclass labels read zero."""
        out = np.zeros(len(self._labels), dtype=np.float32)
        cursor = 0
        n_sub = n_prepared // config.CHUNK_SAMPLES
        for mdl, params in self.models.items():
            t0 = time.time()
            n_in = self.model_inputs[mdl]
            width = 1 if self.model_outputs[mdl] == 1 else len(self.class_mapping[mdl])
            if n_sub >= 1:
                # the oldest sub-frame window must still be inside the
                # feature ring; past that the reference's negative-index
                # clamping yields ragged windows and an opaque concatenate
                # crash (utils.py:454-460) — fail with an actionable message
                cap = len(self.preprocessor.feature_buffer)
                if n_in + n_sub - 1 > cap:
                    raise ValueError(
                        f"predict() received {n_sub} frames (~{n_sub * 80} ms) in "
                        f"one call, but the {cap}-frame feature ring only covers "
                        f"{cap - n_in + 1} sub-frame windows for model '{mdl}'; "
                        "split long audio into smaller calls (predict_clip does)")
                windows = np.concatenate(
                    [self.preprocessor.get_features(n_in, start_ndx=-n_in - i)
                     for i in range(n_sub - 1, -1, -1)])
                group = self.model_prediction_function[mdl](windows)  # (n_sub, C)
                row = group.max(axis=0)
            elif self.model_outputs[mdl] == 1:
                hist = self.prediction_buffer[mdl]
                row = np.array([hist[-1] if hist else 0.0], dtype=np.float32)
            else:
                row = np.zeros(self.model_outputs[mdl], dtype=np.float32)
            if self.model_outputs[mdl] == 1:
                out[cursor] = row[0]
            else:
                cols = [int(i) for i in self.class_mapping[mdl].keys()]
                out[cursor:cursor + width] = row[cols]
            cursor += width
            model_timing[mdl] = time.time() - t0
        return out

    def _apply_verifiers(self, scores: np.ndarray) -> np.ndarray:
        """Second-stage speaker verification: labels at or above the verifier
        threshold are re-scored by their parent model's sklearn pipeline on
        the same feature window (reference model.py:319-328 contract)."""
        if not self.custom_verifier_models:
            return scores
        scores = scores.copy()
        for i, lbl in enumerate(self._labels):
            if scores[i] < self.custom_verifier_threshold:
                continue
            parent = self.get_parent_model_from_label(lbl)
            verifier = self.custom_verifier_models.get(parent)
            if verifier is not None:
                window = self.preprocessor.get_features(self.model_inputs[parent])
                scores[i] = verifier.predict_proba(window)[0][-1]
        return scores

    def _postprocess(self, scores: np.ndarray, n_prepared: int,
                     patience: dict, threshold: dict, debounce_time: float) -> np.ndarray:
        """Warm-up + patience/debounce via the shared vectorized gating
        (gating.py — the MultiStreamEngine compiles the same functions), then
        push the filtered scores into the per-label history."""
        L = len(self._labels)
        hist_len = np.array([len(self.prediction_buffer[lbl]) for lbl in self._labels])
        scores = gating.warmup_zero(np, scores, hist_len)

        raw_scores = scores
        if n_prepared < config.CHUNK_SAMPLES:
            # recycle tick (no head actually ran): repeat each binary label's
            # last raw score (multiclass: zero) instead of feeding the
            # recycled *filtered* score back into the raw history — a
            # recycled activation must not falsely extend a patience streak
            # (MultiStreamEngine applies the same rule to starved slots)
            raw_scores = np.array(
                [self.raw_score_buffer[lbl][-1]
                 if (self.raw_score_buffer[lbl]
                     and self.model_outputs[self.get_parent_model_from_label(lbl)] == 1)
                 else 0.0
                 for lbl in self._labels], dtype=np.float32)

        use_patience, use_debounce = gating.validate_gating_args(
            patience, threshold, debounce_time)
        if use_patience or use_debounce:
            h = config.PREDICTION_BUFFER_MAX
            parents = [self.get_parent_model_from_label(lbl) for lbl in self._labels]
            threshold_vec = np.array([threshold.get(p, np.inf) for p in parents],
                                     dtype=np.float32)
            if use_patience:
                # a patience'd model whose threshold is missing would compare
                # against inf and zero its scores FOREVER with no error; the
                # reference surfaces this misconfiguration as a KeyError
                # (reference model.py:346-352) — match that loudness
                missing = sorted({p for p in parents
                                  if patience.get(p, 0) > 0 and p not in threshold})
                if missing:
                    raise ValueError(
                        f"patience is set for {missing} but threshold has no "
                        "entry for them; the patience filter needs a per-model "
                        "threshold")
                # patience reads the RAW score history (gating.patience_filter
                # docs; the reported buffer would deadlock the filter)
                patience_vec = np.array([patience.get(p, 0) for p in parents])
                scores = gating.patience_filter(
                    np, scores, self._score_history(self.raw_score_buffer, h),
                    patience_vec, threshold_vec)
            else:
                history = self._score_history(self.prediction_buffer, h)
                frame_seconds = max(n_prepared, 1) / self.preprocessor.sr
                n_frames = int(np.ceil(debounce_time / frame_seconds))
                active = np.array([p in threshold for p in parents])
                scores = gating.debounce_filter(np, scores, history, threshold_vec,
                                                min(n_frames, h), active)

        for lbl, raw, s in zip(self._labels, raw_scores, scores):
            self.raw_score_buffer[lbl].append(float(raw))
            self.prediction_buffer[lbl].append(float(s))
        return scores

    def _score_history(self, buffers, h: int) -> np.ndarray:
        """Zero-padded (labels, h) history matrix from a per-label deque dict
        (used for both the raw patience history and the reported debounce
        history — one layout, one implementation)."""
        hist = np.zeros((len(self._labels), h), dtype=np.float32)
        for i, lbl in enumerate(self._labels):
            past = np.fromiter(buffers[lbl], dtype=np.float32)
            if past.size:
                hist[i, -past.size:] = past
        return hist

    # ------------------------------------------------------------------

    @staticmethod
    def _read_pcm(clip: Union[str, np.ndarray]) -> np.ndarray:
        """WAV path or array -> int16 PCM."""
        if not isinstance(clip, str):
            return clip
        with wave.open(clip, mode='rb') as f:
            return np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)

    def _stream_chunks(self, data: np.ndarray, chunk_size: int = config.CHUNK_SAMPLES,
                       **kwargs):
        """Yield (sample_offset, predictions) streaming over a PCM array."""
        for i in range(0, data.shape[0] - chunk_size, chunk_size):
            yield i, self.predict(data[i:i + chunk_size], **kwargs)

    def predict_clip(self, clip: Union[str, np.ndarray], padding: int = 1,
                     chunk_size: int = 1280, **kwargs):
        """Streaming prediction over a whole 16-bit 16 kHz WAV clip/array,
        padded with ``padding`` seconds of silence on both sides."""
        data = self._read_pcm(clip)
        if padding:
            z = np.zeros(self.preprocessor.sr * padding, dtype=np.int16)
            data = np.concatenate((z, data, z))
        return [p for _, p in self._stream_chunks(data, chunk_size, **kwargs)]

    def _get_positive_prediction_frames(self, file: str, threshold: float = 0.5,
                                        return_type: str = "features", **kwargs):
        """Harvest feature windows (or 4 s audio context) wherever any label
        scores >= threshold. Useful for false-positive mining."""
        data = self._read_pcm(file)
        sr = self.preprocessor.sr
        harvested = defaultdict(list)
        for offset, predictions in self._stream_chunks(data, **kwargs):
            for lbl, score in predictions.items():
                if score < threshold:
                    continue
                if return_type == "features":
                    parent = self.get_parent_model_from_label(lbl)
                    harvested[lbl].append(
                        self.preprocessor.get_features(self.model_inputs[parent]))
                elif return_type == "audio":
                    context = data[max(0, offset - sr * 3):offset + sr]
                    if context.shape[0] == sr * 4:
                        harvested[lbl].append(context)
        return {lbl: np.vstack(v) for lbl, v in harvested.items()}

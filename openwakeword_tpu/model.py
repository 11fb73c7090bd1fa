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

from openwakeword_tpu import config, registry
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
            vad_threshold: float = 0,
            custom_verifier_models: dict = {},
            custom_verifier_threshold: float = 0.1,
            inference_framework: str = "jax",
            **kwargs,
            ):
        """Args mirror the reference constructor (model.py:37-82).

        ``wakeword_models`` entries may be native .npz checkpoints, upstream
        .onnx/.tflite artifacts (imported on the fly), or pretrained model
        names. ``inference_framework`` is accepted for compatibility; all
        execution is JAX/XLA.
        """
        wakeword_models, wakeword_model_names = registry.resolve_wakeword_models(wakeword_models)

        self.models: Dict[str, Dict] = {}          # name -> head params pytree
        self.model_inputs: Dict[str, int] = {}     # name -> input feature frames
        self.model_outputs: Dict[str, int] = {}    # name -> output classes
        self.model_prediction_function: Dict[str, callable] = {}
        self.class_mapping: Dict[str, Dict] = {}
        self.custom_verifier_models: Dict[str, object] = {}
        self.custom_verifier_threshold = custom_verifier_threshold

        for mdl_path, mdl_name in zip(wakeword_models, wakeword_model_names):
            params, meta = self._load_head(mdl_path, mdl_name)
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

        if len(self.custom_verifier_models.keys()) < len(custom_verifier_models.keys()):
            raise ValueError(
                "Custom verifier models were provided, but some were not matched with a base model!"
                " Make sure that the keys provided in the `custom_verifier_models` dictionary argument"
                " exactly match that of the `.models` attribute of an instantiated openWakeWord Model object"
                " that has the same base models but doesn't have custom verifier models."
            )

        # Per-label score history for warm-up / patience / debounce
        self.prediction_buffer: DefaultDict[str, deque] = defaultdict(partial(deque, maxlen=config.PREDICTION_BUFFER_MAX))

        # Noise suppression (native C++ spectral-subtraction module; the
        # reference binds SpeexDSP here, model.py:200-205)
        if enable_speex_noise_suppression:
            from openwakeword_tpu.ns import NoiseSuppression
            self.speex_ns = NoiseSuppression(frame_size=160, sample_rate=16000)
        else:
            self.speex_ns = None

        # Voice activity detection
        self.vad_threshold = vad_threshold
        if vad_threshold > 0:
            from openwakeword_tpu.vad import VAD
            self.vad = VAD()

        self.preprocessor = AudioFeatures(**kwargs)

    # ------------------------------------------------------------------

    @staticmethod
    def _load_head(mdl_path: str, mdl_name: str):
        """Load a head checkpoint, importing .onnx/.tflite if needed. When a
        known pretrained name has no artifact on disk (zero-egress installs),
        fall back to a deterministic random init with the published
        architecture so the pipeline stays runnable."""
        if os.path.exists(mdl_path):
            from openwakeword_tpu.io.loaders import load_model_file
            kind, params, meta = load_model_file(mdl_path)
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
        """Gets the parent model associated with a given prediction label."""
        parent_model = ""
        for mdl in self.class_mapping.keys():
            if label in self.class_mapping[mdl].values():
                parent_model = mdl
            elif label in self.class_mapping.keys() and label == mdl:
                parent_model = mdl
        return parent_model

    def reset(self):
        """Reset the prediction and audio feature buffers."""
        self.prediction_buffer = defaultdict(partial(deque, maxlen=config.PREDICTION_BUFFER_MAX))
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
            raise ValueError(f"The input audio data (x) must by a Numpy array, instead received an object of type {type(x)}.")

        if timing:
            timing_dict: Dict[str, Dict] = {"models": {}}
            feature_start = time.time()

        if self.speex_ns:
            n_prepared_samples = self.preprocessor(self.speex_ns.process_frames(x))
        else:
            n_prepared_samples = self.preprocessor(x)

        if timing:
            timing_dict["models"]["preprocessor"] = time.time() - feature_start

        predictions = {}
        for mdl in self.models.keys():
            if timing:
                model_start = time.time()

            n_in = self.model_inputs[mdl]
            if n_prepared_samples > config.CHUNK_SAMPLES:
                # One window per processed 80 ms sub-frame, batched
                n_sub = n_prepared_samples // config.CHUNK_SAMPLES
                windows = [self.preprocessor.get_features(n_in, start_ndx=-n_in - i)[0]
                           for i in range(n_sub - 1, -1, -1)]
                group = self.model_prediction_function[mdl](np.stack(windows))
                prediction = group.max(axis=0)[None, ]
            elif n_prepared_samples == config.CHUNK_SAMPLES:
                prediction = self.model_prediction_function[mdl](
                    self.preprocessor.get_features(n_in))
            else:  # not enough new samples; recycle previous score
                if self.model_outputs[mdl] == 1:
                    score = self.prediction_buffer[mdl][-1] if len(self.prediction_buffer[mdl]) > 0 else 0
                    prediction = np.array([[score]], dtype=np.float32)
                else:
                    n_classes = max([int(i) for i in self.class_mapping[mdl].keys()])
                    prediction = np.zeros((1, n_classes + 1), dtype=np.float32)

            if self.model_outputs[mdl] == 1:
                predictions[mdl] = float(prediction[0][0])
            else:
                for int_label, cls in self.class_mapping[mdl].items():
                    predictions[cls] = float(prediction[0][int(int_label)])

            # Custom verifier override (reference model.py:319-328)
            if self.custom_verifier_models != {}:
                for cls in predictions.keys():
                    if predictions[cls] >= self.custom_verifier_threshold:
                        parent_model = self.get_parent_model_from_label(cls)
                        if self.custom_verifier_models.get(parent_model, False):
                            verifier_prediction = self.custom_verifier_models[parent_model].predict_proba(
                                self.preprocessor.get_features(self.model_inputs[mdl])
                            )[0][-1]
                            predictions[cls] = verifier_prediction

            # Warm-up: zero scores for the first 5 calls
            for cls in predictions.keys():
                if len(self.prediction_buffer[cls]) < config.WARMUP_FRAMES:
                    predictions[cls] = 0.0

            if timing:
                timing_dict["models"][mdl] = time.time() - model_start

        # Patience XOR debounce filtering (reference model.py:339-359)
        if patience != {} or debounce_time > 0:
            if threshold == {}:
                raise ValueError("Error! When using the `patience` argument, threshold "
                                 "values must be provided via the `threshold` argument!")
            if patience != {} and debounce_time > 0:
                raise ValueError("Error! The `patience` and `debounce_time` arguments cannot be used together!")
            for mdl in predictions.keys():
                parent_model = self.get_parent_model_from_label(mdl)
                if predictions[mdl] != 0.0:
                    if parent_model in patience.keys():
                        scores = np.array(self.prediction_buffer[mdl])[-patience[parent_model]:]
                        if (scores >= threshold[parent_model]).sum() < patience[parent_model]:
                            predictions[mdl] = 0.0
                    elif debounce_time > 0:
                        if parent_model in threshold.keys():
                            n_frames = int(np.ceil(debounce_time / (n_prepared_samples / self.preprocessor.sr)))
                            recent_predictions = np.array(self.prediction_buffer[mdl])[-n_frames:]
                            if predictions[mdl] >= threshold[parent_model] and \
                               (recent_predictions >= threshold[parent_model]).sum() > 0:
                                predictions[mdl] = 0.0

        for mdl in predictions.keys():
            self.prediction_buffer[mdl].append(predictions[mdl])

        # VAD gate (reference model.py:365-381)
        if self.vad_threshold > 0:
            if timing:
                vad_start = time.time()
            self.vad(x)
            if timing:
                timing_dict["models"]["vad"] = time.time() - vad_start

            vad_frames = list(self.vad.prediction_buffer)[config.VAD_GATE_LO:config.VAD_GATE_HI]
            vad_max_score = np.max(vad_frames) if len(vad_frames) > 0 else 0
            if vad_max_score < self.vad_threshold:
                for mdl in predictions.keys():
                    predictions[mdl] = 0.0

        if timing:
            return predictions, timing_dict
        return predictions

    # ------------------------------------------------------------------

    def predict_clip(self, clip: Union[str, np.ndarray], padding: int = 1,
                     chunk_size: int = 1280, **kwargs):
        """Streaming prediction over a whole 16-bit 16 kHz WAV clip/array,
        padded with ``padding`` seconds of silence on both sides."""
        if isinstance(clip, str):
            with wave.open(clip, mode='rb') as f:
                data = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
        else:
            data = clip

        if padding:
            z = np.zeros(self.preprocessor.sr * padding, dtype=np.int16)
            data = np.concatenate((z, data, z))

        predictions = []
        for i in range(0, data.shape[0] - chunk_size, chunk_size):
            predictions.append(self.predict(data[i:i + chunk_size], **kwargs))
        return predictions

    def _get_positive_prediction_frames(self, file: str, threshold: float = 0.5,
                                        return_type: str = "features", **kwargs):
        """Harvest feature windows (or 4 s audio context) wherever any label
        scores >= threshold. Useful for false-positive mining."""
        with wave.open(file, mode='rb') as f:
            data = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)

        positive_data = defaultdict(list)
        step_size = config.CHUNK_SAMPLES
        for i in range(0, data.shape[0] - step_size, step_size):
            predictions = self.predict(data[i:i + step_size], **kwargs)
            for lbl in predictions.keys():
                if predictions[lbl] >= threshold:
                    mdl = self.get_parent_model_from_label(lbl)
                    features = self.preprocessor.get_features(self.model_inputs[mdl])
                    if return_type == 'features':
                        positive_data[lbl].append(features)
                    if return_type == 'audio':
                        context = data[max(0, i - self.preprocessor.sr * 3):i + self.preprocessor.sr]
                        if len(context) == self.preprocessor.sr * 4:
                            positive_data[lbl].append(context)

        return {lbl: np.vstack(v) for lbl, v in positive_data.items()}

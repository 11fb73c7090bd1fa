"""Model registry & asset management.

Maps pretrained model names to bundled native checkpoint paths plus the
upstream release URLs they are converted from (reference
openwakeword/__init__.py:8-69). The native on-disk format is ``.npz``
(openwakeword_tpu.io.checkpoints); upstream ``.onnx``/``.tflite`` artifacts
are importable via openwakeword_tpu.io converters and cached as ``.npz``.
"""

import os
import pathlib

_RES = os.path.join(pathlib.Path(__file__).parent.resolve(), "resources", "models")
_RELEASE = "https://github.com/dscripka/openWakeWord/releases/download/v0.5.1"

FEATURE_MODELS = {
    "embedding": {
        "model_path": os.path.join(_RES, "embedding_model.npz"),
        "download_url": f"{_RELEASE}/embedding_model.tflite",
    },
    "melspectrogram": {
        # The mel frontend is analytic (openwakeword_tpu.ops.melspec); no
        # artifact is required. Kept for registry parity.
        "model_path": "",
        "download_url": f"{_RELEASE}/melspectrogram.tflite",
    },
    "embedding_student": {
        # TPU-shaped distilled embedding (models/embedding_student.py);
        # produced locally by training/distill.py against the installed
        # teacher checkpoint — there is no upstream artifact to download.
        "model_path": os.path.join(_RES, "embedding_student.npz"),
        "download_url": "",
    },
}

VAD_MODELS = {
    "silero_vad": {
        "model_path": os.path.join(_RES, "silero_vad.npz"),
        "download_url": f"{_RELEASE}/silero_vad.onnx",
    },
}

MODELS = {
    "alexa": {
        "model_path": os.path.join(_RES, "alexa_v0.1.npz"),
        "download_url": f"{_RELEASE}/alexa_v0.1.tflite",
    },
    "hey_mycroft": {
        "model_path": os.path.join(_RES, "hey_mycroft_v0.1.npz"),
        "download_url": f"{_RELEASE}/hey_mycroft_v0.1.tflite",
    },
    "hey_jarvis": {
        "model_path": os.path.join(_RES, "hey_jarvis_v0.1.npz"),
        "download_url": f"{_RELEASE}/hey_jarvis_v0.1.tflite",
    },
    "hey_rhasspy": {
        "model_path": os.path.join(_RES, "hey_rhasspy_v0.1.npz"),
        "download_url": f"{_RELEASE}/hey_rhasspy_v0.1.tflite",
    },
    "timer": {
        "model_path": os.path.join(_RES, "timer_v0.1.npz"),
        "download_url": f"{_RELEASE}/timer_v0.1.tflite",
    },
    "weather": {
        "model_path": os.path.join(_RES, "weather_v0.1.npz"),
        "download_url": f"{_RELEASE}/weather_v0.1.tflite",
    },
}

model_class_mappings = {
    "timer": {
        "1": "1_minute_timer",
        "2": "5_minute_timer",
        "3": "10_minute_timer",
        "4": "20_minute_timer",
        "5": "30_minute_timer",
        "6": "1_hour_timer",
    }
}

# Architecture metadata for the published heads, used when instantiating a
# named model without its weight artifact (docs/models/*.md specs).
PRETRAINED_HEAD_SPECS = {
    "alexa_v0.1": {"model_type": "dnn", "input_frames": 16, "n_classes": 1, "layer_dim": 64, "n_blocks": 1},
    "hey_mycroft_v0.1": {"model_type": "dnn", "input_frames": 16, "n_classes": 1, "layer_dim": 64, "n_blocks": 1},
    "hey_jarvis_v0.1": {"model_type": "dnn", "input_frames": 16, "n_classes": 1, "layer_dim": 64, "n_blocks": 1},
    "hey_rhasspy_v0.1": {"model_type": "dnn", "input_frames": 16, "n_classes": 1, "layer_dim": 64, "n_blocks": 1},
    "timer_v0.1": {"model_type": "mlp", "input_frames": 34, "n_classes": 7, "layer_dim": 128},
    "weather_v0.1": {"model_type": "dnn", "input_frames": 16, "n_classes": 1, "layer_dim": 64, "n_blocks": 1},
}


def get_pretrained_model_paths(inference_framework: str = "jax"):
    """Paths of all bundled pretrained wakeword checkpoints."""
    return [MODELS[i]["model_path"] for i in MODELS.keys()]


def resolve_wakeword_models(wakeword_models):
    """Resolve user-supplied model specs (file paths or pretrained names,
    spaces allowed) to (paths, names); empty input selects every pretrained
    model (reference model.py:83-100 contract). Shared by Model and
    MultiStreamEngine so name resolution cannot drift between engines."""
    pretrained = get_pretrained_model_paths()
    if not wakeword_models:
        return list(pretrained), list(MODELS.keys())
    paths, names = [], []
    for i in wakeword_models:
        if os.path.exists(i):
            paths.append(i)
            names.append(os.path.splitext(os.path.basename(i))[0])
        else:
            matching = [j for j in pretrained
                        if i.replace(" ", "_") in j.split(os.path.sep)[-1]]
            if not matching:
                raise ValueError(f"Could not find pretrained model for model name '{i}'")
            if len(matching) > 1:
                # the reference silently loads matching[0] under the requested
                # label (model.py:96-100); an ambiguous substring like 'hey'
                # matches three pretrained models — raise instead
                opts = ", ".join(os.path.basename(m) for m in sorted(matching))
                raise ValueError(f"Model name '{i}' is ambiguous: matches {opts}")
            paths.append(matching[0])
            names.append(i)
    return paths, names

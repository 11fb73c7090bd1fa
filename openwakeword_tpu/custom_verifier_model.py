"""Speaker-specific verifier models (second-stage classifiers).

Capability parity with the reference's verifier stage (reference
openwakeword/custom_verifier_model.py:32-177): mine feature windows from a
user's reference clips wherever the base model fires, then fit a logistic
regression over the flattened (F, 96) windows. The trained model is saved as
a pickle with a ``predict_proba`` interface, so verifiers trained here and by
the reference are mutually loadable by both engines.

The classifier itself is a closed-form-fittable linear model; at inference
the Model class calls ``predict_proba`` on a single window (host-side -- it
is a 1536-d dot product, far below device-dispatch granularity). A pure-JAX
affine fold (scaler+LR -> one matmul) is provided for the fused multi-stream
engine via ``fold_verifier``.
"""

import os
import pickle
import wave
from collections import defaultdict
from typing import List, Union

import numpy as np


def _read_wav(path: str) -> np.ndarray:
    with wave.open(path, mode="rb") as f:
        return np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)


def get_reference_clip_features(reference_clip, oww_model, model_name: str,
                                threshold: float = 0.5, N: int = 3, **kwargs) -> np.ndarray:
    """Run a clip through the engine N times with random <=1280-sample start
    offsets, harvesting the (F, 96) feature window behind every frame whose
    score clears ``threshold``. Returns (n_hits, F, 96)."""
    positive_data = defaultdict(list)
    for _ in range(N):
        dat = _read_wav(reference_clip) if isinstance(reference_clip, str) else reference_clip
        if N != 1:
            dat = dat[np.random.randint(0, 1280):]
        step_size = 1280
        for i in range(0, dat.shape[0] - step_size, step_size):
            predictions = oww_model.predict(dat[i:i + step_size], **kwargs)
            if predictions[model_name] >= threshold:
                features = oww_model.preprocessor.get_features(oww_model.model_inputs[model_name])
                positive_data[model_name].append(features)

    if len(positive_data[model_name]) == 0:
        positive_data[model_name].append(
            np.empty((0, oww_model.model_inputs[model_name], 96)))
    return np.vstack(positive_data[model_name])


def flatten_features(x):
    return [i.flatten() for i in x]


def train_verifier_model(features: np.ndarray, labels: np.ndarray):
    """Fit the verifier pipeline: flatten -> standardize -> logistic
    regression (C=0.001, max_iter=2000), the reference's exact estimator."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import FunctionTransformer, StandardScaler

    clf = LogisticRegression(random_state=0, max_iter=2000, C=0.001)
    pipeline = make_pipeline(FunctionTransformer(flatten_features), StandardScaler(), clf)
    pipeline.fit(features, labels)
    return pipeline


def fold_verifier(pipeline):
    """Fold a trained verifier pipeline (scaler + logistic regression) into a
    single affine form: score = sigmoid(x_flat @ w + b). Returns (w, b) as
    float32 arrays, suitable for fusing into the on-device engine."""
    scaler = pipeline.named_steps["standardscaler"]
    lr = pipeline.named_steps["logisticregression"]
    coef = lr.coef_[0] / scaler.scale_
    bias = lr.intercept_[0] - np.dot(lr.coef_[0], scaler.mean_ / scaler.scale_)
    return coef.astype(np.float32), np.float32(bias)


def train_custom_verifier(
        positive_reference_clips: List[Union[str, os.PathLike]],
        negative_reference_clips: List[Union[str, os.PathLike]],
        output_path: str,
        model_name: str,
        **kwargs):
    """End-to-end verifier training (reference custom_verifier_model.py:116-177):
    positives mined at threshold 0.5 with 5 jittered passes, negatives at
    threshold 0.0 (every frame) with one pass; model pickled to output_path."""
    import openwakeword_tpu as oww_pkg

    if os.path.exists(model_name):
        oww = oww_pkg.Model(wakeword_models=[model_name], **kwargs)
        model_name = os.path.splitext(model_name)[0].split(os.path.sep)[-1]
    else:
        oww = oww_pkg.Model(**kwargs)

    positive_features = np.vstack(
        [get_reference_clip_features(i, oww, model_name, N=5)
         for i in positive_reference_clips])
    if positive_features.shape[0] == 0:
        raise ValueError("The positive features were not created! Make sure that"
                         " the positive reference clips contain the appropriate audio"
                         " for the desired model.")

    if not negative_reference_clips:
        raise ValueError("At least one negative reference clip is required to "
                         "train a verifier (the classifier needs both classes)")
    negative_features = np.vstack(
        [get_reference_clip_features(i, oww, model_name, threshold=0.0, N=1)
         for i in negative_reference_clips])
    if negative_features.shape[0] == 0:
        raise ValueError("The negative features were not created! Negative "
                         "reference clips must be at least two 1280-sample "
                         "frames (160 ms) of 16 kHz audio.")

    lr_model = train_verifier_model(
        np.vstack((positive_features, negative_features)),
        np.array([1] * positive_features.shape[0] + [0] * negative_features.shape[0]))

    with open(output_path, "wb") as f:
        pickle.dump(lr_model, f)

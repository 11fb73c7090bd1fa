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
from typing import List, Union

import numpy as np


def get_reference_clip_features(reference_clip, oww_model, model_name: str,
                                threshold: float = 0.5, N: int = 3, **kwargs) -> np.ndarray:
    """Harvest verifier-training windows from one reference clip.

    Streams the clip through ``oww_model`` ``N`` times — each pass trimmed
    at the start by a random sub-frame offset so the 80 ms window grid lands
    differently — and collects the feature window behind every frame whose
    ``model_name`` score clears ``threshold``. Mining contract per the
    reference (custom_verifier_model.py:60-88); implemented over the
    engine's shared ``_stream_chunks`` streaming helper.

    Returns float32 ``(n_hits, F, 96)`` where F is the head's input frame
    count; n_hits may be 0.
    """
    pcm = oww_model._read_pcm(reference_clip)
    n_frames = int(oww_model.model_inputs[model_name])
    hits: List[np.ndarray] = []
    for _ in range(N):
        trimmed = pcm[np.random.randint(0, 1280):] if N != 1 else pcm
        for _, scores in oww_model._stream_chunks(trimmed, **kwargs):
            if scores[model_name] >= threshold:
                hits.append(oww_model.preprocessor.get_features(n_frames)[0])
    if not hits:
        return np.empty((0, n_frames, 96), dtype=np.float32)
    return np.stack(hits).astype(np.float32)


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

"""Native checkpoint format for openwakeword_tpu models.

A checkpoint is a single ``.npz`` file holding a flattened params pytree plus
a JSON metadata record. This replaces the reference's frozen .onnx/.tflite
artifacts as the primary on-disk format; converters from ONNX/TFLite live in
``openwakeword_tpu.io.onnx_import`` / ``tflite_import``.

Layout:
    __meta__  : JSON string (kind, architecture metadata, class mapping, ...)
    p/<path>  : one array per pytree leaf, '/'-joined dict keys
"""

import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

SUFFIX = ".npz"


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if k == "__meta__":
            continue
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_checkpoint(path: str, kind: str, params: Dict, meta: Dict[str, Any] | None = None):
    """Write params + metadata to a .npz checkpoint."""
    meta = dict(meta or {})
    meta["kind"] = kind
    if isinstance(params.get("__meta__"), dict):
        meta.setdefault("model", params["__meta__"])
    arrays = {f"p/{k}": v for k, v in _flatten(params).items()}
    arrays["__meta__"] = np.array(json.dumps(meta))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(path: str) -> Tuple[str, Dict, Dict]:
    """Read a checkpoint -> (kind, params, meta). Restores '__meta__' on the
    params pytree when the metadata carries architecture info."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        flat = {k[2:]: z[k] for k in z.files if k.startswith("p/")}
    params = _unflatten(flat)
    if "model" in meta:
        params["__meta__"] = dict(meta["model"])
    return meta.get("kind", "unknown"), params, meta

"""Shared head-contract inference for generic graph imports.

Both graph compilers (io.onnx_graph.OnnxProgram, io.tflite_graph.
TfliteProgram) expose the same surface — ``params``, ``input_names``,
``output_names``, ``apply(params, {name: x})`` — so the logic that turns a
compiled graph into a servable 'graph' head lives here once: infer the
(batch, frames, 96) / (batch, frames*96) window contract from the declared
input shape, measure n_classes by running the graph on zeros, and detect
whether the graph accepts batches (TFLite files routinely pin batch=1 — the
LiteRT interpreter resizes inputs at runtime, reference utils.py:88-108; a
pinned graph is served per-sample under vmap instead, models/heads.py).
"""

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def build_graph_head(prog, dims: Sequence[Optional[int]], path: str
                     ) -> Tuple[Dict, Dict]:
    """-> (params pytree with 'graph' __meta__, file meta)."""
    if len(prog.input_names) != 1:
        raise ValueError(
            f"{path}: generic head import needs exactly one dynamic input, "
            f"got {prog.input_names} — stateful/multi-input graphs have no "
            "standard wakeword-head calling convention")
    in_name = prog.input_names[0]
    dims = [d if isinstance(d, (int, np.integer)) and d > 0 else None
            for d in dims]
    if len(dims) == 3 and dims[2] == 96 and dims[1]:
        input_frames, input_rank = int(dims[1]), 3
    elif len(dims) == 2 and dims[1] and dims[1] % 96 == 0:
        input_frames, input_rank = int(dims[1]) // 96, 2
    else:
        raise ValueError(
            f"{path}: generic head import needs a (batch, frames, 96) or "
            f"(batch, frames*96) input, got declared shape {list(dims)} — "
            "this graph does not consume speech-embedding windows")

    def probe(batch):
        shape = ((batch, input_frames, 96) if input_rank == 3
                 else (batch, input_frames * 96))
        out = prog.apply(prog.params, {in_name: np.zeros(shape, np.float32)})
        return np.asarray(out[prog.output_names[0]])

    # one concrete evaluation proves every op lowers AND measures n_classes;
    # probing with batch 2 additionally tells whether the graph is
    # batch-flexible or pinned (fixed Reshape/state shapes). A pinned graph
    # may *accept* a batch-2 input without erroring (e.g. a fixed-index
    # slice on axis 0 silently drops the batch dim), so batch-flexibility
    # requires the batch-2 output to actually carry 2x the per-sample
    # payload of the batch-1 probe — not merely reshape into two rows.
    base = probe(1)
    batch1_only = False
    try:
        first = probe(2)
        if not (first.ndim >= 1 and first.shape[0] == 2
                and first.size == 2 * base.size):
            raise ValueError("output does not carry the batch dim")
    except Exception:
        batch1_only = True
    n_classes = int(base.reshape(1, -1).shape[-1])

    params = dict(prog.params)
    params["__meta__"] = {
        "model_type": "graph",
        "input_frames": input_frames,
        "n_classes": n_classes,
        "input_rank": input_rank,
        "input_name": in_name,
        "output_name": prog.output_names[0],
        "batch1_only": batch1_only,
        "program": prog,
    }
    return params, {"kind": "head", "output_names": list(prog.output_names),
                    "generic_graph": True}

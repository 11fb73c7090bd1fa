"""Generic graph-head import: arbitrary-architecture .onnx classifiers.

The reference serves ANY user .onnx through onnxruntime (reference
model.py:105-141); its own train.py only ever produces dnn/mlp/rnn heads, but
nothing stops users feeding models trained elsewhere. Architectures outside
the known families must compile through the general ONNX->XLA compiler into a
'graph' head (io.onnx_import.import_graph_head_onnx) instead of being
rejected — and then behave like any other head in Model and the engine.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_HAVE_TORCH = subprocess.run(
    [sys.executable, "-c", "import torch"], capture_output=True).returncode == 0

pytestmark = pytest.mark.skipif(not _HAVE_TORCH, reason="torch oracle unavailable")


@pytest.fixture(scope="module", params=["cnn", "attn_pool"])
def graph_head(request, tmp_path_factory):
    from tests import fixture_builders
    tmp = tmp_path_factory.mktemp("graph_head")
    onnx_path = str(tmp / f"{request.param}_head.onnx")
    oracle_path = str(tmp / "oracle.npz")
    script = os.path.join(os.path.dirname(__file__), "graph_head_oracle.py")
    r = subprocess.run([sys.executable, script, request.param, oracle_path],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    oracle = dict(np.load(oracle_path))
    # the .onnx is written by our own protobuf encoder from the torch weights
    # (torch.onnx.export needs the `onnx` package, absent in this image)
    if request.param == "cnn":
        fixture_builders.build_cnn_graph_head_onnx(onnx_path, oracle)
    else:
        fixture_builders.build_attn_graph_head_onnx(onnx_path, oracle)
    return request.param, onnx_path, oracle["probe"], oracle["out"]


class TestGenericGraphImport:
    def test_imports_as_graph_head(self, graph_head):
        from openwakeword_tpu.io.onnx_import import import_onnx_model
        arch, path, probe, _ = graph_head
        kind, params, meta = import_onnx_model(path)
        assert kind == "head"
        m = params["__meta__"]
        assert m["model_type"] == "graph"
        assert m["input_frames"] == 16
        assert m["n_classes"] == (1 if arch == "cnn" else 3)
        assert meta.get("generic_graph") is True

    def test_forward_matches_torch_oracle(self, graph_head):
        from openwakeword_tpu.io.onnx_import import import_onnx_model
        from openwakeword_tpu.models import heads as heads_lib
        arch, path, probe, expected = graph_head
        _, params, _ = import_onnx_model(path)
        x = probe.reshape(probe.shape[0], 16, 96)   # forward takes (B, F, 96)
        got = np.asarray(heads_lib.apply(params, x))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_training_path_rejected(self, graph_head):
        from openwakeword_tpu.io.onnx_import import import_onnx_model
        from openwakeword_tpu.models import heads as heads_lib
        arch, path, probe, _ = graph_head
        _, params, _ = import_onnx_model(path)
        with pytest.raises(ValueError, match="inference-only"):
            heads_lib.forward(
                {k: v for k, v in params.items() if k != "__meta__"},
                probe.reshape(-1, 16, 96), params["__meta__"], inference=False)


class TestQdqOnnxGraph:
    """QDQ-quantized ONNX graphs (onnxruntime's quantization form) execute
    with exact QuantizeLinear/DequantizeLinear semantics — round-half-even,
    saturation in the zero_point dtype, per-axis scales."""

    @pytest.fixture(scope="class")
    def qdq(self, tmp_path_factory):
        from tests import fixture_builders
        tmp = tmp_path_factory.mktemp("qdq_head")
        oracle_path = str(tmp / "oracle.npz")
        script = os.path.join(os.path.dirname(__file__), "graph_head_oracle.py")
        r = subprocess.run([sys.executable, script, "cnn", oracle_path],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        oracle = dict(np.load(oracle_path))
        qdq_path = str(tmp / "cnn_qdq.onnx")
        deq = fixture_builders.build_qdq_cnn_graph_head_onnx(qdq_path, oracle)
        twin_path = str(tmp / "cnn_deq_twin.onnx")
        fixture_builders.build_cnn_graph_head_onnx(twin_path, deq)
        return qdq_path, twin_path, float(deq["in_scale"]), oracle["probe"], oracle["out"]

    def test_exact_qdq_semantics(self, qdq):
        """QDQ graph == float twin (dequantized weights) fed the fake-quanted
        input, computed independently in numpy: proves round-half-even,
        int8 saturation, per-axis weight dequant, and uint8 zp-128."""
        from openwakeword_tpu.io.onnx_graph import OnnxProgram
        from openwakeword_tpu.io import onnx_proto as opr
        qdq_path, twin_path, in_scale, probe, _ = qdq
        x = probe.reshape(-1, 16, 96)
        fq = np.clip(np.round(x / in_scale), -128, 127) * in_scale

        qprog = OnnxProgram(opr.load_onnx(qdq_path)["graph"])
        got = np.asarray(qprog.apply(qprog.params, {"emb": x})["score"])
        tprog = OnnxProgram(opr.load_onnx(twin_path)["graph"])
        want = np.asarray(tprog.apply(tprog.params,
                                      {"emb": fq.astype(np.float32)})["score"])
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_imports_and_stays_close_to_float_oracle(self, qdq):
        from openwakeword_tpu.io.onnx_import import import_onnx_model
        from openwakeword_tpu.models import heads as heads_lib
        qdq_path, _, _, probe, expected = qdq
        kind, params, meta = import_onnx_model(qdq_path)
        assert kind == "head" and params["__meta__"]["model_type"] == "graph"
        got = np.asarray(heads_lib.apply(params, probe.reshape(-1, 16, 96)))
        np.testing.assert_allclose(got, expected, atol=0.05)


class TestGraphHeadInModel:
    def test_model_streams_a_clip(self, graph_head, test_clips):
        import openwakeword_tpu as oww
        arch, path, _, _ = graph_head
        m = oww.Model(wakeword_models=[path])
        name = os.path.splitext(os.path.basename(path))[0]
        assert name in m.models
        preds = m.predict_clip(test_clips["alexa"])
        assert len(preds) > 10
        for frame in preds:
            for v in frame.values():
                assert 0.0 <= float(v) <= 1.0
        n_labels = 1 if arch == "cnn" else 3
        assert len(preds[0]) == n_labels

    def test_engine_matches_model(self, graph_head):
        """The multi-stream engine runs graph heads through the same forward
        (single-head plan) — scores must match the host Model frame-for-frame."""
        import openwakeword_tpu as oww
        from openwakeword_tpu.parallel import MultiStreamEngine
        arch, path, _, _ = graph_head
        rng = np.random.default_rng(0)
        audio = rng.integers(-3000, 3000, 1280 * 12).astype(np.int16)

        m = oww.Model(wakeword_models=[path])
        host_scores = []
        for i in range(12):
            out = m.predict(audio[i * 1280:(i + 1) * 1280])
            host_scores.append([out[lbl] for lbl in sorted(out)])

        eng = MultiStreamEngine(wakeword_models=[path], n_streams=2, rng_seed=0)
        frames = np.broadcast_to(
            audio.reshape(12, 1, 1280), (12, 2, 1280)).copy()
        eng_scores = np.asarray(eng.predict_frames(frames))  # (12, 2, L)
        order = np.argsort(eng.labels)
        np.testing.assert_allclose(eng_scores[:, 0, order],
                                   np.asarray(host_scores), atol=2e-5)
        np.testing.assert_allclose(eng_scores[:, 0], eng_scores[:, 1],
                                   atol=1e-6)


def test_silent_batch_dropping_graph_classified_pinned():
    """A graph that ACCEPTS a batch-2 probe but silently drops the batch dim
    (fixed-index slice on axis 0 — common converter output) must classify as
    batch1_only, not as batch-flexible with a halved n_classes."""
    from openwakeword_tpu.io.graph_head import build_graph_head

    class _PinnedProg:
        params = {}
        input_names = ["x"]
        output_names = ["y"]

        def apply(self, params, inputs):
            x = np.asarray(inputs["x"])
            first = x.reshape(x.shape[0], -1)[0]      # batch dim dropped
            return {"y": np.zeros((1, 4), np.float32) + first[:1]}

    params, meta = build_graph_head(_PinnedProg(), [1, 16, 96], "<mem>")
    m = params["__meta__"]
    assert m["batch1_only"] is True
    assert m["n_classes"] == 4


def test_foreign_lstm_graphs_rejected_by_family_extractors():
    """Graphs containing LSTMs plus ops outside the rnn-export vocabulary
    (e.g. a conv stem feeding stacked LSTMs) must NOT be silently rebuilt as
    bare rnn heads with the stem dropped — both family extractors raise so
    the caller falls back to the general graph executors."""
    from openwakeword_tpu.io import tflite_import as TL
    from openwakeword_tpu.io.onnx_import import import_head_onnx

    model = {
        "tensors": [{"name": f"t{i}", "shape": [], "dtype": 0, "data": None,
                     "is_variable": False, "quant": None} for i in range(4)],
        "operators": [
            {"opcode": TL.OP_CONV_2D, "inputs": [0], "outputs": [1]},
            {"opcode": TL.OP_UNIDIRECTIONAL_SEQUENCE_LSTM,
             "inputs": [1], "outputs": [2]},
            {"opcode": TL.OP_FULLY_CONNECTED, "inputs": [2], "outputs": [3]},
        ],
        "inputs": [0], "outputs": [3],
    }
    with pytest.raises(ValueError, match="rnn head vocabulary"):
        TL.import_head_tflite("<mem>", model)

    graph = {"nodes": [{"op_type": "Conv"}, {"op_type": "LSTM"},
                       {"op_type": "Gemm"}],
             "inputs": [], "outputs": [], "initializers": {}}
    with pytest.raises(ValueError, match="rnn head vocabulary"):
        import_head_onnx("<mem>", graph)

"""General TFLite->XLA executor (io.tflite_graph.TfliteProgram).

Two proof sources: (a) differential execution of this package's OWN head
exports (dnn/mlp/rnn through export_head_tflite) against the native forward —
covering FC, the decomposed-LayerNorm op chain, STRIDED_SLICE, CONCATENATION,
REVERSE_V2, and UNIDIRECTIONAL_SEQUENCE_LSTM; (b) a hand-built
microWakeWord-style depthwise-CNN graph checked against a torch oracle —
covering CONV_2D/DEPTHWISE_CONV_2D (fused activations), MAX_POOL_2D, MEAN,
and the pinned-batch (vmap) serving path. The reference runs any such file
through the LiteRT interpreter (reference utils.py:88-108); this executor is
that capability on XLA.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from openwakeword_tpu.io.tflite_import import load_tflite
from openwakeword_tpu.io.tflite_graph import TfliteProgram
from openwakeword_tpu.models import heads as heads_lib

_HAVE_TORCH = subprocess.run(
    [sys.executable, "-c", "import torch"], capture_output=True).returncode == 0


@pytest.mark.parametrize("spec", [
    dict(model_type="dnn", input_frames=16, n_classes=1, layer_dim=32, n_blocks=1),
    dict(model_type="mlp", input_frames=16, n_classes=3, layer_dim=24),
    dict(model_type="rnn", input_frames=16, n_classes=1, layer_dim=16),
])
def test_executes_own_exports(tmp_path, spec):
    """TfliteProgram(run our own export) == native heads.apply."""
    from openwakeword_tpu.io.tflite_export import export_head_tflite

    params = heads_lib.init_params(jax.random.PRNGKey(5), **spec)
    path = str(tmp_path / "head.tflite")
    export_head_tflite(params, path, output_name="test")

    model = load_tflite(path)
    prog = TfliteProgram(model)
    assert len(prog.input_names) == 1

    in_dims = model["tensors"][model["inputs"][0]]["shape"]
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, [d if d > 0 else 1 for d in in_dims]).astype(np.float32)
    got = np.asarray(prog.apply(prog.params, {prog.input_names[0]: x})
                     [prog.output_names[0]])
    want = np.asarray(heads_lib.apply(params, x.reshape(
        -1, spec["input_frames"], 96)))
    np.testing.assert_allclose(got.reshape(want.shape), want, atol=2e-5)


@pytest.mark.skipif(not _HAVE_TORCH, reason="torch oracle unavailable")
class TestDepthwiseCnnGraph:
    @pytest.fixture(scope="class")
    def cnn2d(self, tmp_path_factory):
        from tests import fixture_builders
        tmp = tmp_path_factory.mktemp("tflite_graph")
        oracle_path = str(tmp / "oracle.npz")
        script = os.path.join(os.path.dirname(__file__), "graph_head_oracle.py")
        r = subprocess.run([sys.executable, script, "cnn2d", oracle_path],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        oracle = dict(np.load(oracle_path))
        path = str(tmp / "cnn2d_head.tflite")
        fixture_builders.build_cnn2d_graph_head_tflite(path, oracle)
        return path, oracle["probe"], oracle["out"]

    def test_imports_as_graph_head_and_matches_torch(self, cnn2d):
        from openwakeword_tpu.io.tflite_import import import_tflite_model
        path, probe, expected = cnn2d
        kind, params, meta = import_tflite_model(path)
        assert kind == "head"
        m = params["__meta__"]
        assert m["model_type"] == "graph"
        assert (m["input_frames"], m["n_classes"]) == (16, 1)
        # batch pinned at 1 by the fixed Reshape — served under vmap
        assert m["batch1_only"] is True
        got = np.asarray(heads_lib.apply(params, probe))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_model_serves_it(self, cnn2d, test_clips):
        import openwakeword_tpu as oww
        path, _, _ = cnn2d
        m = oww.Model(wakeword_models=[path])
        preds = m.predict_clip(test_clips["alexa"])
        assert len(preds) > 10
        assert all(0.0 <= float(v) <= 1.0 for fr in preds for v in fr.values())

    def test_engine_serves_it(self, cnn2d):
        from openwakeword_tpu.parallel import MultiStreamEngine
        path, _, _ = cnn2d
        eng = MultiStreamEngine(wakeword_models=[path], n_streams=3, rng_seed=0)
        frames = np.random.default_rng(1).integers(
            -3000, 3000, (4, 3, 1280)).astype(np.int16)
        scores = np.asarray(eng.predict_frames(frames))
        assert scores.shape == (4, 3, len(eng.labels))
        assert np.all(scores >= 0.0) and np.all(scores <= 1.0)


@pytest.mark.skipif(not _HAVE_TORCH, reason="torch oracle unavailable")
class TestQuantizedGraph:
    """Quantized .tflite graphs execute as dequantized-float emulation (the
    reference's LiteRT interpreter runs int8 graphs natively, reference
    utils.py:88-108; here the weights dequantize at load and the body runs
    float32 — see io/tflite_graph.py module docstring)."""

    @pytest.fixture(scope="class")
    def quantized(self, tmp_path_factory):
        from tests import fixture_builders
        tmp = tmp_path_factory.mktemp("tflite_quant")
        oracle_path = str(tmp / "oracle.npz")
        script = os.path.join(os.path.dirname(__file__), "graph_head_oracle.py")
        r = subprocess.run([sys.executable, script, "cnn2d", oracle_path],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        oracle = dict(np.load(oracle_path))
        qpath = str(tmp / "cnn2d_int8.tflite")
        deq = fixture_builders.build_quantized_cnn2d_graph_head_tflite(
            qpath, oracle)
        fpath = str(tmp / "cnn2d_deq_twin.tflite")
        fixture_builders.build_cnn2d_graph_head_tflite(fpath, deq)
        return qpath, fpath, oracle["probe"], oracle["out"]

    def test_matches_float_twin_exactly(self, quantized):
        """Executing the int8 graph == executing a float graph built from
        the dequantized weights: proves qparam parsing (per-channel int8,
        uint8 zp-128, int32 bias) + QUANTIZE/DEQUANTIZE pass-through."""
        qpath, fpath, probe, _ = quantized
        outs = []
        for path in (qpath, fpath):
            prog = TfliteProgram(load_tflite(path))
            got = np.stack([
                np.asarray(prog.apply(prog.params,
                                      {prog.input_names[0]: x[None]})
                           [prog.output_names[0]]).reshape(-1)
                for x in probe])
            outs.append(got)
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)

    def test_close_to_float_oracle(self, quantized):
        """Weight-quantization error is the ONLY divergence from the torch
        float model — scores stay close."""
        qpath, _, probe, expected = quantized
        _, params, _ = __import__(
            "openwakeword_tpu.io.tflite_import",
            fromlist=["import_tflite_model"]).import_tflite_model(qpath)
        assert params["__meta__"]["model_type"] == "graph"
        got = np.asarray(heads_lib.apply(params, probe))
        np.testing.assert_allclose(got, expected, atol=0.05)

    def test_model_serves_it(self, quantized, test_clips):
        import openwakeword_tpu as oww
        qpath, _, _, _ = quantized
        m = oww.Model(wakeword_models=[qpath])
        preds = m.predict_clip(test_clips["alexa"])
        assert len(preds) > 10
        assert all(0.0 <= float(v) <= 1.0 for fr in preds for v in fr.values())


def test_quantized_graph_missing_scale_rejected(tmp_path):
    """int8 tensors WITHOUT quantization params raise a typed error naming
    the tensor, not a crash."""
    from openwakeword_tpu.io.tflite_export import _TfliteBuilder
    from openwakeword_tpu.io import tflite_import as TL

    tb = _TfliteBuilder()
    x = tb.add_tensor((1, 16 * 96), "emb")
    w = tb.add_tensor((1, 16 * 96), "w",
                      np.zeros((1, 16 * 96), np.int8), ttype=9)
    y = tb.add_tensor((1, 1), "out")
    tb.add_op(TL.OP_FULLY_CONNECTED, [x, w, -1], [y],
              tb.OPT_FULLY_CONNECTED, tb._empty_options(3))
    path = str(tmp_path / "quant.tflite")
    with open(path, "wb") as f:
        f.write(tb.finish([x], [y]))
    with pytest.raises(NotImplementedError, match="quantized"):
        TfliteProgram(load_tflite(path))


def test_unknown_opcode_rejected(tmp_path):
    from openwakeword_tpu.io.tflite_export import _TfliteBuilder

    tb = _TfliteBuilder()
    x = tb.add_tensor((1, 4), "in")
    y = tb.add_tensor((1, 4), "out")
    tb.add_op(127, [x], [y])            # BITCAST-ish: not implemented
    path = str(tmp_path / "exotic.tflite")
    with open(path, "wb") as f:
        f.write(tb.finish([x], [y]))
    with pytest.raises(NotImplementedError, match="opcode"):
        TfliteProgram(load_tflite(path))


def test_strided_slice_ellipsis_new_axis_masks_rejected(tmp_path):
    """ellipsis_mask / new_axis_mask change the rank mapping the executor's
    per-dim slice loop assumes — a graph using either must raise a typed
    error instead of executing with silently wrong shapes."""
    from openwakeword_tpu.io.tflite_export import _TfliteBuilder
    from openwakeword_tpu.io import tflite_import as TL

    for kwargs in ({"ellipsis_mask": 1}, {"new_axis_mask": 2}):
        tb = _TfliteBuilder()
        x = tb.add_tensor((1, 4, 4), "in")
        begin = tb.add_tensor((3,), "begin", np.zeros(3, np.int32), ttype=2)
        end = tb.add_tensor((3,), "end", np.asarray([1, 4, 4], np.int32),
                            ttype=2)
        strd = tb.add_tensor((3,), "strides", np.ones(3, np.int32), ttype=2)
        y = tb.add_tensor((1, 4, 4), "out")
        tb.add_op(TL.OP_STRIDED_SLICE, [x, begin, end, strd], [y],
                  tb.OPT_STRIDED_SLICE, tb._strided_slice_options(**kwargs))
        path = str(tmp_path / "ss.tflite")
        with open(path, "wb") as f:
            f.write(tb.finish([x], [y]))
        prog = TfliteProgram(load_tflite(path))
        with pytest.raises(NotImplementedError, match="mask"):
            prog.apply(prog.params, {prog.input_names[0]:
                                     np.zeros((1, 4, 4), np.float32)})


class _FakeLstmOpts:
    """Stands in for a flatbuffer _Table: UnidirectionalSequenceLSTMOptions
    field 1 = cell_clip, field 3 = time_major."""

    def __init__(self, cell_clip=0.0, time_major=False):
        self._f = {1: cell_clip, 3: int(time_major)}

    def scalar(self, field, fmt, default):
        return self._f.get(field, default)


def _craft_lstm_model(rng, hidden=4, t=3, inp=2, cifg=False, cell_clip=0.0):
    """Hand-built parsed-model dict around one UNIDIRECTIONAL_SEQUENCE_LSTM
    op (the executor accepts parsed dicts directly, like the import tests)."""
    def w(shape):
        return rng.normal(0, 0.5, shape).astype(np.float32)

    tensors = [{"name": f"t{i}", "shape": [], "dtype": 0, "data": None,
                "is_variable": False, "quant": None} for i in range(22)]
    weights = {}
    for i in range(1, 5):       # w_i, w_f, w_c, w_o: (H, I)
        weights[i] = w((hidden, inp))
    for i in range(5, 9):       # recurrent: (H, H)
        weights[i] = w((hidden, hidden))
    for i in range(12, 16):     # biases: (H,)
        weights[i] = w((hidden,))
    for i, arr in weights.items():
        tensors[i]["data"] = arr
    ins = [0] + list(range(1, 9)) + [-1, -1, -1] + list(range(12, 16)) \
        + [-1, -1, 18, 19]      # 18/19: variable state tensors
    tensors[18]["is_variable"] = tensors[19]["is_variable"] = True
    if cifg:
        ins[1], ins[5], ins[12] = -1, -1, -1
    op = {"opcode": 44, "inputs": ins, "outputs": [21],
          "options_type": 71,
          "options": _FakeLstmOpts(cell_clip=cell_clip)}
    tensors[0]["shape"] = [1, t, inp]
    model = {"tensors": tensors, "operators": [op],
             "inputs": [0], "outputs": [21]}
    return model, weights


def _numpy_lstm(x, weights, cell_clip=0.0):
    """Independent float LSTM (gate order i,f,c,o) with optional cell clip."""
    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))
    B, T, _ = x.shape
    H = weights[1].shape[0]
    h = np.zeros((B, H), np.float64)
    c = np.zeros((B, H), np.float64)
    outs = []
    for t in range(T):
        xt = x[:, t].astype(np.float64)
        i = sig(xt @ weights[1].T + h @ weights[5].T + weights[12])
        f = sig(xt @ weights[2].T + h @ weights[6].T + weights[13])
        g = np.tanh(xt @ weights[3].T + h @ weights[7].T + weights[14])
        o = sig(xt @ weights[4].T + h @ weights[8].T + weights[15])
        c = f * c + i * g
        if cell_clip > 0:
            c = np.clip(c, -cell_clip, cell_clip)
        h = o * np.tanh(c)
        outs.append(h)
    return np.stack(outs, axis=1)


def test_lstm_cell_clip_applied():
    """cell_clip > 0 in the LSTM options clips the cell state every step
    (lite/kernels/lstm_eval.cc) — weights scaled up so the clip actually
    binds, checked against an independent numpy LSTM."""
    rng = np.random.default_rng(3)
    model, weights = _craft_lstm_model(rng, cell_clip=0.4)
    # inflate gate drive so |c| would exceed the clip without it
    for i in (12, 13, 14, 15):
        weights[i] *= 4
        model["tensors"][i]["data"] = weights[i]
    prog = TfliteProgram(model)
    x = rng.normal(0, 2, (1, 3, 2)).astype(np.float32)
    got = np.asarray(prog.apply(prog.params, {"t0": x})["t21"])
    want = _numpy_lstm(x, weights, cell_clip=0.4)
    want_unclipped = _numpy_lstm(x, weights, cell_clip=0.0)
    assert np.abs(want - want_unclipped).max() > 1e-3, \
        "fixture too tame: the clip never binds"
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lstm_cifg_rejected_typed():
    """CIFG models (input-gate tensors absent, index -1) raise a typed
    NotImplementedError instead of crashing on a None concatenate."""
    rng = np.random.default_rng(4)
    model, _ = _craft_lstm_model(rng, cifg=True)
    prog = TfliteProgram(model)
    with pytest.raises(NotImplementedError, match="CIFG"):
        prog.apply(prog.params, {"t0": np.zeros((1, 3, 2), np.float32)})

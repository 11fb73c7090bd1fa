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

"""Weight import/export tests.

Real reference artifacts are unavailable in this zero-egress environment, so
these tests validate the codecs against (a) exact round-trips through our own
encoder, (b) synthetic graphs replicating the producers' layouts
(torch.onnx-style decomposed LayerNorm + Gemm transB; TFLite flatbuffers
built with the flatbuffers runtime), and (c) gated parity tests that run
whenever real artifacts are present on disk.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openwakeword_tpu.models import embedding, heads
from openwakeword_tpu.io import onnx_proto as op
from openwakeword_tpu.io.onnx_export import export_head_onnx
from openwakeword_tpu.io.onnx_import import import_head_onnx, import_embedding_onnx, import_onnx_model
from openwakeword_tpu.io.checkpoints import save_checkpoint, load_checkpoint


class TestCheckpointRoundTrip:
    def test_head_npz(self, tmp_path):
        p = heads.init_params(jax.random.PRNGKey(0), "dnn", 16, 1, 64, 2)
        path = str(tmp_path / "h.npz")
        save_checkpoint(path, "head", p, {"class_mapping": {"0": "x"}})
        kind, p2, meta = load_checkpoint(path)
        assert kind == "head" and meta["class_mapping"] == {"0": "x"}
        assert p2["__meta__"]["n_blocks"] == 2
        x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 16, 96)), jnp.float32)
        np.testing.assert_array_equal(np.asarray(heads.apply(p, x)),
                                      np.asarray(heads.apply(p2, x)))

    def test_embedding_npz(self, tmp_path):
        p = embedding.init_params(jax.random.PRNGKey(1))
        path = str(tmp_path / "e.npz")
        save_checkpoint(path, "embedding", p)
        kind, p2, _ = load_checkpoint(path)
        assert kind == "embedding"
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 4, (2, 76, 32, 1)), jnp.float32)
        np.testing.assert_array_equal(np.asarray(embedding.apply(p, x)),
                                      np.asarray(embedding.apply(p2, x)))


class TestOnnxHeads:
    @pytest.mark.parametrize("spec", [("dnn", 16, 1, 64, 1), ("dnn", 16, 1, 32, 2),
                                      ("mlp", 34, 7, 128, 1)])
    def test_export_import_round_trip(self, tmp_path, spec):
        mt, frames, ncls, dim, blocks = spec
        p = heads.init_params(jax.random.PRNGKey(2), mt, frames, ncls, dim, blocks)
        path = str(tmp_path / "h.onnx")
        export_head_onnx(p, path, output_name="label")
        p2, meta = import_head_onnx(path)
        assert meta["output_names"] == ["label"]
        x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (3, frames, 96)), jnp.float32)
        np.testing.assert_allclose(np.asarray(heads.apply(p, x)),
                                   np.asarray(heads.apply(p2, x)), atol=1e-7)

    def test_torch_style_graph(self, tmp_path):
        """Gemm with transB=1 and torch's Pow-based LayerNorm decomposition."""
        rng = np.random.default_rng(3)
        W1 = rng.normal(0, 0.1, (64, 1536)).astype(np.float32)
        b1 = rng.normal(0, 0.1, 64).astype(np.float32)
        g1 = rng.normal(1, 0.1, 64).astype(np.float32)
        be1 = rng.normal(0, 0.1, 64).astype(np.float32)
        W2 = rng.normal(0, 0.1, (1, 64)).astype(np.float32)
        b2 = np.zeros(1, np.float32)
        inits = [op.encode_tensor(n, a) for n, a in [
            ("W1", W1), ("b1", b1), ("g1", g1), ("be1", be1), ("W2", W2), ("b2", b2),
            ("eps", np.float32(1e-5).reshape(())), ("two", np.float32(2.0).reshape(())),
            ("shape", np.asarray([0, 1536], np.int64))]]
        nodes = [
            op.encode_node("Reshape", ["input", "shape"], ["flat"]),
            op.encode_node("Gemm", ["flat", "W1", "b1"], ["fc1"], transB=1),
            op.encode_node("ReduceMean", ["fc1"], ["mu"], axes=[-1], keepdims=1),
            op.encode_node("Sub", ["fc1", "mu"], ["cen"]),
            op.encode_node("Pow", ["cen", "two"], ["sq"]),
            op.encode_node("ReduceMean", ["sq"], ["var"], axes=[-1], keepdims=1),
            op.encode_node("Add", ["var", "eps"], ["vareps"]),
            op.encode_node("Sqrt", ["vareps"], ["std"]),
            op.encode_node("Div", ["cen", "std"], ["norm"]),
            op.encode_node("Mul", ["norm", "g1"], ["scaled"]),
            op.encode_node("Add", ["scaled", "be1"], ["ln1"]),
            op.encode_node("Relu", ["ln1"], ["r1"]),
            op.encode_node("Gemm", ["r1", "W2", "b2"], ["logits"], transB=1),
            op.encode_node("Sigmoid", ["logits"], ["alexa_v0.1"]),
        ]
        path = str(tmp_path / "t.onnx")
        with open(path, "wb") as f:
            f.write(op.encode_model(nodes, inits,
                                    [op.encode_value_info("input", ["batch", 16, 96])],
                                    [op.encode_value_info("alexa_v0.1", ["batch", 1])]))
        p, meta = import_head_onnx(path)
        assert p["__meta__"]["model_type"] == "dnn"
        assert meta["output_names"] == ["alexa_v0.1"]
        x = rng.normal(0, 1, (4, 16, 96)).astype(np.float32)
        h = x.reshape(4, -1) @ W1.T + b1
        mu = h.mean(-1, keepdims=True)
        v = ((h - mu) ** 2).mean(-1, keepdims=True)
        ln = (h - mu) / np.sqrt(v + 1e-5) * g1 + be1
        expect = 1 / (1 + np.exp(-(np.maximum(ln, 0) @ W2.T + b2)))
        got = np.asarray(heads.apply(p, jnp.asarray(x)))
        np.testing.assert_allclose(got, expect, atol=1e-6)


class TestOnnxEmbedding:
    def test_synthetic_embedding_graph(self, tmp_path):
        """Build an ONNX Conv/BN graph from known params (OIHW layout, as the
        released artifact uses) and check the importer reproduces them."""
        p = embedding.init_params(jax.random.PRNGKey(4))
        # give BNs non-trivial values
        for k in p:
            if k.startswith("bn_"):
                key = jax.random.PRNGKey(hash(k) % 2**31)
                n = p[k]["gamma"].shape[0]
                p[k] = {"gamma": 1 + 0.1 * jax.random.normal(key, (n,)),
                        "beta": 0.1 * jax.random.normal(key, (n,)),
                        "mean": 0.1 * jax.random.normal(key, (n,)),
                        "var": jnp.abs(1 + 0.1 * jax.random.normal(key, (n,)))}
        nodes, inits = [], []
        prev = "input"
        conv_i = bn_i = 0
        for layer in embedding.spec():
            if layer[0] == "conv":
                w = np.transpose(np.asarray(p[f"conv_{conv_i}"]["w"]), (3, 2, 0, 1))  # HWIO->OIHW
                inits.append(op.encode_tensor(f"w{conv_i}", w.astype(np.float32)))
                out = f"conv{conv_i}"
                nodes.append(op.encode_node("Conv", [prev, f"w{conv_i}"], [out]))
                prev = out
                conv_i += 1
            elif layer[0] == "bnact":
                bn = p[f"bn_{bn_i}"]
                for nm, arr in [("g", bn["gamma"]), ("b", bn["beta"]),
                                ("m", bn["mean"]), ("v", bn["var"])]:
                    inits.append(op.encode_tensor(f"bn{bn_i}{nm}", np.asarray(arr, np.float32)))
                out = f"bn{bn_i}"
                nodes.append(op.encode_node(
                    "BatchNormalization",
                    [prev, f"bn{bn_i}g", f"bn{bn_i}b", f"bn{bn_i}m", f"bn{bn_i}v"], [out],
                    epsilon=float(embedding.BN_EPS)))
                prev = out
                bn_i += 1
        path = str(tmp_path / "emb.onnx")
        with open(path, "wb") as f:
            f.write(op.encode_model(nodes, inits,
                                    [op.encode_value_info("input_1", [1, 76, 32, 1])],
                                    [op.encode_value_info(prev, [1, 1, 1, 96])]))
        p2 = import_embedding_onnx(path)
        x = jnp.asarray(np.random.default_rng(4).uniform(-1, 4, (2, 76, 32, 1)), jnp.float32)
        np.testing.assert_allclose(np.asarray(embedding.apply(p, x)),
                                   np.asarray(embedding.apply(p2, x)), atol=1e-6)

    def test_classify_dispatch(self, tmp_path):
        p = heads.init_params(jax.random.PRNGKey(5), "dnn", 16, 1, 64, 1)
        path = str(tmp_path / "h.onnx")
        export_head_onnx(p, path)
        kind, _, _ = import_onnx_model(path)
        assert kind == "head"


class TestTfliteWalker:
    def test_flatbuffer_reader_on_builder_output(self, tmp_path):
        """Build a minimal TFLite model (1 FULLY_CONNECTED + LOGISTIC) with
        the flatbuffers runtime and check the schema walker parses it."""
        import flatbuffers
        from openwakeword_tpu.io import tflite_import as TL

        b = flatbuffers.Builder(1024)

        rng = np.random.default_rng(6)
        W = rng.normal(0, 0.1, (1, 1536)).astype(np.float32)
        bias = rng.normal(0, 0.1, (1,)).astype(np.float32)

        def buffer_table(data: bytes):
            dv = b.CreateByteVector(data) if data else None
            b.StartObject(1)
            if dv:
                b.PrependUOffsetTRelativeSlot(0, dv, 0)
            return b.EndObject()

        buf_offsets = [buffer_table(b"")]          # buffer 0: empty (input)
        buf_offsets.append(buffer_table(W.tobytes()))
        buf_offsets.append(buffer_table(bias.tobytes()))
        buf_offsets.append(buffer_table(b""))      # fc out
        buf_offsets.append(buffer_table(b""))      # logistic out

        def int_vector(vals):
            b.StartVector(4, len(vals), 4)
            for v in reversed(vals):
                b.PrependInt32(v)
            return b.EndVector()

        def tensor_table(shape, ttype, buf, name):
            name_off = b.CreateString(name)
            shape_off = int_vector(shape)
            b.StartObject(6)
            b.PrependUOffsetTRelativeSlot(0, shape_off, 0)
            b.PrependInt8Slot(1, ttype, 0)
            b.PrependUint32Slot(2, buf, 0)
            b.PrependUOffsetTRelativeSlot(3, name_off, 0)
            return b.EndObject()

        tensors = [
            tensor_table([1, 1536], 0, 0, "input"),
            tensor_table([1, 1536], 0, 1, "fc_w"),
            tensor_table([1], 0, 2, "fc_b"),
            tensor_table([1, 1], 0, 3, "fc_out"),
            tensor_table([1, 1], 0, 4, "alexa_v0.1"),
        ]

        def opcode_table(code):
            b.StartObject(4)
            b.PrependInt8Slot(0, min(code, 127), 0)
            b.PrependInt32Slot(3, code, 0)
            return b.EndObject()

        opcodes = [opcode_table(TL.OP_FULLY_CONNECTED), opcode_table(TL.OP_LOGISTIC)]

        def operator_table(opcode_idx, ins, outs):
            ins_off, outs_off = int_vector(ins), int_vector(outs)
            b.StartObject(5)
            b.PrependUint32Slot(0, opcode_idx, 0)
            b.PrependUOffsetTRelativeSlot(1, ins_off, 0)
            b.PrependUOffsetTRelativeSlot(2, outs_off, 0)
            return b.EndObject()

        operators = [operator_table(0, [0, 1, 2], [3]), operator_table(1, [3], [4])]

        def offset_vector(offs):
            b.StartVector(4, len(offs), 4)
            for o in reversed(offs):
                b.PrependUOffsetTRelative(o)
            return b.EndVector()

        tensors_off = offset_vector(tensors)
        ops_off = offset_vector(operators)
        sg_in, sg_out = int_vector([0]), int_vector([4])
        b.StartObject(5)
        b.PrependUOffsetTRelativeSlot(0, tensors_off, 0)
        b.PrependUOffsetTRelativeSlot(1, sg_in, 0)
        b.PrependUOffsetTRelativeSlot(2, sg_out, 0)
        b.PrependUOffsetTRelativeSlot(3, ops_off, 0)
        sg = b.EndObject()

        sgs_off = offset_vector([sg])
        codes_off = offset_vector(opcodes)
        bufs_off = offset_vector(buf_offsets)
        b.StartObject(8)
        b.PrependInt32Slot(0, 3, 0)
        b.PrependUOffsetTRelativeSlot(1, codes_off, 0)
        b.PrependUOffsetTRelativeSlot(2, sgs_off, 0)
        b.PrependUOffsetTRelativeSlot(4, bufs_off, 0)
        model = b.EndObject()
        b.Finish(model, b"TFL3")

        path = str(tmp_path / "mini.tflite")
        with open(path, "wb") as f:
            f.write(b.Output())

        parsed = TL.load_tflite(path)
        assert [o["opcode"] for o in parsed["operators"]] == [TL.OP_FULLY_CONNECTED, TL.OP_LOGISTIC]
        assert parsed["tensors"][1]["data"].shape == (1, 1536)
        np.testing.assert_array_equal(parsed["tensors"][1]["data"], W)
        assert parsed["tensors"][4]["name"] == "alexa_v0.1"
        assert parsed["outputs"] == [4]

    def test_head_extractor_on_parsed_dict(self):
        """Extractor logic on a synthetic parsed model (converter layout:
        FC -> decomposed LN (MEAN/SQUARED_DIFFERENCE/RSQRT) -> MUL/ADD)."""
        from openwakeword_tpu.io import tflite_import as TL
        rng = np.random.default_rng(7)
        W1 = rng.normal(0, 0.1, (64, 1536)).astype(np.float32)
        b1 = np.zeros(64, np.float32)
        g1 = rng.normal(1, 0.1, 64).astype(np.float32)
        be1 = rng.normal(0, 0.1, 64).astype(np.float32)
        W2 = rng.normal(0, 0.1, (1, 64)).astype(np.float32)
        b2 = np.zeros(1, np.float32)
        tensors = [{"name": f"t{i}", "shape": [], "dtype": 0, "data": d} for i, d in
                   enumerate([None, W1, b1, None, None, None, None, g1, None, be1,
                              None, W2, b2, None, None])]
        ops = [
            {"opcode": TL.OP_FULLY_CONNECTED, "inputs": [0, 1, 2], "outputs": [3]},
            {"opcode": TL.OP_MEAN, "inputs": [3], "outputs": [4]},
            {"opcode": TL.OP_SQUARED_DIFFERENCE, "inputs": [3, 4], "outputs": [5]},
            {"opcode": TL.OP_RSQRT, "inputs": [5], "outputs": [6]},
            {"opcode": TL.OP_MUL, "inputs": [6, 7], "outputs": [8]},
            {"opcode": TL.OP_ADD, "inputs": [8, 9], "outputs": [10]},
            {"opcode": TL.OP_RELU, "inputs": [10], "outputs": [13]},
            {"opcode": TL.OP_FULLY_CONNECTED, "inputs": [13, 11, 12], "outputs": [14]},
            {"opcode": TL.OP_LOGISTIC, "inputs": [14], "outputs": [14]},
        ]
        model = {"tensors": tensors, "operators": ops, "inputs": [0], "outputs": [14]}
        params, meta = TL.import_head_tflite("<mem>", model)
        assert params["__meta__"]["model_type"] == "dnn"
        assert params["__meta__"]["n_blocks"] == 0
        np.testing.assert_array_equal(params["layer1"]["w"], W1.T)
        np.testing.assert_array_equal(params["ln1"]["gamma"], g1)
        np.testing.assert_array_equal(params["out"]["w"], W2.T)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                    "artifacts")),
    reason="real reference artifacts not present (zero-egress environment)")
class TestRealArtifactParity:
    """Runs only when released artifacts exist under repo-root/artifacts/."""

    def test_convert_all(self):
        from openwakeword_tpu.utils.download import convert_local_models
        root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
        converted = convert_local_models(root)
        assert converted


class TestTfliteExport:
    @pytest.mark.parametrize("spec", [("dnn", 16, 1, 64, 1), ("mlp", 34, 7, 128, 1),
                                      ("rnn", 16, 1, 64, 1), ("rnn", 12, 3, 64, 1)])
    def test_export_import_round_trip(self, tmp_path, spec):
        from openwakeword_tpu.io.tflite_export import export_head_tflite
        from openwakeword_tpu.io.tflite_import import import_head_tflite
        mt, frames, ncls, dim, blocks = spec
        p = heads.init_params(jax.random.PRNGKey(8), mt, frames, ncls, dim, blocks)
        path = str(tmp_path / "h.tflite")
        export_head_tflite(p, path, output_name="label")
        p2, meta = import_head_tflite(path)
        assert meta["output_names"] == ["label"]
        assert p2["__meta__"]["model_type"] == mt
        x = jnp.asarray(np.random.default_rng(8).normal(0, 1, (3, frames, 96)), jnp.float32)
        np.testing.assert_allclose(np.asarray(heads.apply(p, x)),
                                   np.asarray(heads.apply(p2, x)), atol=1e-6)

    def test_rnn_weights_round_trip_exact(self, tmp_path):
        """The gate re-slicing through per-gate TFLite tensors must lose no
        bits; b_ih comes back as the b_ih+b_hh sum (the only form the
        forward pass consumes) with b_hh zeroed."""
        from openwakeword_tpu.io.tflite_export import export_head_tflite
        from openwakeword_tpu.io.tflite_import import import_head_tflite
        p = jax.device_get(heads.init_params(jax.random.PRNGKey(5), "rnn", 16, 1))
        # non-trivial biases so the b_ih+b_hh fold is actually exercised
        for k in p:
            if k.startswith("lstm"):
                p[k]["b_ih"] = np.random.default_rng(1).normal(0, 0.2, p[k]["b_ih"].shape).astype(np.float32)
                p[k]["b_hh"] = np.random.default_rng(2).normal(0, 0.2, p[k]["b_hh"].shape).astype(np.float32)
        path = str(tmp_path / "r.tflite")
        export_head_tflite(p, path)
        p2, _ = import_head_tflite(path)
        for k in p:
            if not k.startswith("lstm"):
                continue
            np.testing.assert_array_equal(np.asarray(p[k]["w_ih"], np.float32), p2[k]["w_ih"])
            np.testing.assert_array_equal(np.asarray(p[k]["w_hh"], np.float32), p2[k]["w_hh"])
            np.testing.assert_array_equal(
                np.asarray(p[k]["b_ih"]) + np.asarray(p[k]["b_hh"]), p2[k]["b_ih"])
            assert (p2[k]["b_hh"] == 0).all()
        np.testing.assert_array_equal(np.asarray(p["out"]["w"], np.float32), p2["out"]["w"])

    def test_onnx_to_tflite_conversion(self, tmp_path):
        from openwakeword_tpu.io.tflite_export import convert_onnx_to_tflite
        from openwakeword_tpu.io.loaders import load_model_file
        p = heads.init_params(jax.random.PRNGKey(9), "dnn", 16, 1, 32, 1)
        onnx_path = str(tmp_path / "h.onnx")
        tfl_path = str(tmp_path / "h.tflite")
        export_head_onnx(p, onnx_path)
        convert_onnx_to_tflite(onnx_path, tfl_path)
        kind, p2, _ = load_model_file(tfl_path)
        assert kind == "head"
        x = jnp.asarray(np.random.default_rng(9).normal(0, 1, (2, 16, 96)), jnp.float32)
        np.testing.assert_allclose(np.asarray(heads.apply(p, x)),
                                   np.asarray(heads.apply(p2, x)), atol=1e-6)


class TestTfliteBuiltinOptions:
    def test_exported_ops_carry_builtin_options(self, tmp_path):
        """LiteRT requires the builtin-options union on option-bearing ops;
        verify the exporter writes the right discriminants (schema.fbs
        BuiltinOptions values)."""
        import struct
        from openwakeword_tpu.io import tflite_import as TL
        from openwakeword_tpu.io.tflite_export import export_head_tflite

        p = heads.init_params(jax.random.PRNGKey(9), "dnn", 16, 1, 64, 1)
        p = {k: ({kk: np.asarray(vv) for kk, vv in v.items()} if isinstance(v, dict) else v)
             for k, v in p.items()}
        path = str(tmp_path / "h.tflite")
        export_head_tflite(p, path)

        buf = open(path, "rb").read()
        root = TL._Table(buf, struct.unpack_from("<I", buf, 0)[0])
        opcodes = [max(oc.scalar(0, "<b", 0), oc.scalar(3, "<i", 0))
                   for oc in root.vector_tables(1)]
        sg = root.vector_tables(2)[0]
        expected = {TL.OP_RESHAPE: 17, TL.OP_FULLY_CONNECTED: 8, TL.OP_MEAN: 27,
                    TL.OP_SQUARED_DIFFERENCE: 76, TL.OP_ADD: 11, TL.OP_SUB: 28,
                    TL.OP_MUL: 21, TL.OP_RSQRT: 0, TL.OP_RELU: 0, TL.OP_LOGISTIC: 0}
        n_checked = 0
        for op_t in sg.vector_tables(3):
            code = opcodes[op_t.scalar(0, "<I", 0)]
            opt_type = op_t.scalar(3, "<B", 0)
            assert opt_type == expected[code], f"op {code}: options type {opt_type}"
            n_checked += 1
        assert n_checked >= 10


def test_onnx_single_op_layernormalization(tmp_path, rng):
    """torch opset >= 17 exports LayerNorm as one LayerNormalization node;
    the head importer must pick up its scale/bias instead of silently
    importing an LN-free 'mlp' (round-2 review)."""
    import jax.numpy as jnp
    from openwakeword_tpu.io import onnx_proto as op
    from openwakeword_tpu.io.onnx_import import import_head_onnx
    from openwakeword_tpu.models import heads
    W1 = rng.normal(0, 0.1, (1536, 64)).astype(np.float32)
    b1 = rng.normal(0, 0.1, 64).astype(np.float32)
    g1 = rng.normal(1, 0.1, 64).astype(np.float32)
    be1 = rng.normal(0, 0.1, 64).astype(np.float32)
    W2 = rng.normal(0, 0.1, (64, 1)).astype(np.float32)
    b2 = np.zeros(1, np.float32)
    inits = [op.encode_tensor(n, a) for n, a in [
        ("W1", W1), ("b1", b1), ("g1", g1), ("be1", be1), ("W2", W2), ("b2", b2),
        ("shape", np.asarray([0, 1536], np.int64))]]
    nodes = [
        op.encode_node("Reshape", ["input", "shape"], ["flat"]),
        op.encode_node("Gemm", ["flat", "W1", "b1"], ["fc1"]),
        op.encode_node("LayerNormalization", ["fc1", "g1", "be1"], ["ln1"],
                       axis=-1, epsilon=1e-5),
        op.encode_node("Relu", ["ln1"], ["r1"]),
        op.encode_node("Gemm", ["r1", "W2", "b2"], ["logits"]),
        op.encode_node("Sigmoid", ["logits"], ["score"]),
    ]
    path = str(tmp_path / "ln17_head.onnx")
    with open(path, "wb") as f:
        f.write(op.encode_model(nodes, inits,
                                [op.encode_value_info("input", ["b", 16, 96])],
                                [op.encode_value_info("score", ["b", 1])]))
    params, _ = import_head_onnx(path)
    meta = params["__meta__"]
    assert meta["model_type"] == "dnn" and meta["n_blocks"] == 0
    np.testing.assert_array_equal(params["ln1"]["gamma"], g1)
    # imported params must reproduce the graph numerics
    x = rng.normal(0, 1, (4, 16, 96)).astype(np.float32)
    got = np.asarray(heads.apply(params, jnp.asarray(x)))[:, 0]
    flat = x.reshape(4, -1)
    h = flat @ W1 + b1
    mu, var = h.mean(-1, keepdims=True), h.var(-1, keepdims=True)
    h = (h - mu) / np.sqrt(var + 1e-5) * g1 + be1
    want = 1 / (1 + np.exp(-(np.maximum(h, 0) @ W2 + b2)))
    np.testing.assert_allclose(got, want[:, 0], atol=1e-5)


class TestRoundTripProperty:
    """Randomized export->import->forward property: any head configuration
    the trainer can produce must survive both artifact formats bit-close.
    Fixed specs above pin the published architectures; this sweeps the
    configuration space (frames, classes, width, depth) so a writer/reader
    regression on an untested shape cannot slip through."""

    @pytest.mark.parametrize("seed", range(8))
    def test_randomized_head_round_trips(self, tmp_path, seed):
        from openwakeword_tpu.io.tflite_export import export_head_tflite
        from openwakeword_tpu.io.tflite_import import import_head_tflite

        rng = np.random.default_rng(seed)
        mt = ["dnn", "mlp", "rnn"][seed % 3]
        frames = int(rng.integers(4, 40))
        ncls = int(rng.choice([1, 2, 5, 7]))
        dim = int(rng.choice([8, 16, 48, 96, 160]))
        blocks = int(rng.integers(1, 4))
        p = heads.init_params(jax.random.PRNGKey(seed), mt, frames, ncls,
                              dim, blocks)

        onnx_path = str(tmp_path / "h.onnx")
        export_head_onnx(p, onnx_path, output_name="y")
        p_onnx, _ = import_head_onnx(onnx_path)
        tfl_path = str(tmp_path / "h.tflite")
        export_head_tflite(p, tfl_path, output_name="y")
        p_tfl, _ = import_head_tflite(tfl_path)

        x = jnp.asarray(rng.normal(0, 1, (3, frames, 96)), jnp.float32)
        want = np.asarray(heads.apply(p, x))
        np.testing.assert_allclose(
            want, np.asarray(heads.apply(p_onnx, x)), atol=1e-5,
            err_msg=f"onnx roundtrip {mt},{frames},{ncls},{dim},{blocks}")
        np.testing.assert_allclose(
            want, np.asarray(heads.apply(p_tfl, x)), atol=1e-5,
            err_msg=f"tflite roundtrip {mt},{frames},{ncls},{dim},{blocks}")

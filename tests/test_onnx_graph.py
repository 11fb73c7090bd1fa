"""Tests for the ONNX graph -> JAX program compiler (io.onnx_graph) and the
Silero VAD import path (models.silero, io.onnx_import kind 'vad').

The oracle for the Silero-structured fixture is an independent torch
implementation (torch.nn.LSTM with ONNX->torch gate reordering, F.conv1d,
F.batch_norm) run in a subprocess (torch+jax deadlock in one process).
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixture_builders import build_silero_onnx  # noqa: E402

from openwakeword_tpu.io import onnx_proto as op  # noqa: E402
from openwakeword_tpu.io.loaders import load_model_file  # noqa: E402
from openwakeword_tpu.io.onnx_graph import OnnxProgram, load_program  # noqa: E402
from openwakeword_tpu.models import silero  # noqa: E402


@pytest.fixture(scope="module")
def silero_fixture(tmp_path_factory):
    rng = np.random.default_rng(20)
    path = str(tmp_path_factory.mktemp("silero") / "silero_vad.onnx")
    weights = build_silero_onnx(path, rng)
    return path, weights


_ORACLE = textwrap.dedent("""
    import sys
    import numpy as np
    import torch
    import torch.nn.functional as F

    z = np.load(sys.argv[1])
    x = torch.from_numpy(z["x"])          # (B, T)
    h = torch.from_numpy(z["h"])          # (2, B, 64)
    c = torch.from_numpy(z["c"])
    H = 64

    def conv_block(y, i):
        y = F.conv1d(y, torch.from_numpy(z[f"enc{i}_w"]), torch.from_numpy(z[f"enc{i}_b"]),
                     stride=int(z[f"enc{i}_stride"]), padding=1)
        y = F.batch_norm(y, torch.from_numpy(z[f"enc{i}_m"]), torch.from_numpy(z[f"enc{i}_v"]),
                         torch.from_numpy(z[f"enc{i}_g"]), torch.from_numpy(z[f"enc{i}_bb"]),
                         training=False, eps=1e-5)
        return F.relu(y)

    def run_lstm(xs, i, h0, c0):
        W = torch.from_numpy(z[f"lstm{i}_W"])[0]   # (4H, I) onnx order iofc
        R = torch.from_numpy(z[f"lstm{i}_R"])[0]
        B = torch.from_numpy(z[f"lstm{i}_B"])[0]
        reorder = lambda M: torch.cat([M[0:H], M[2*H:3*H], M[3*H:4*H], M[H:2*H]], 0)
        lstm = torch.nn.LSTM(input_size=W.shape[1], hidden_size=H, num_layers=1)
        with torch.no_grad():
            lstm.weight_ih_l0.copy_(reorder(W))
            lstm.weight_hh_l0.copy_(reorder(R))
            lstm.bias_ih_l0.copy_(reorder(B[:4*H]))
            lstm.bias_hh_l0.copy_(reorder(B[4*H:]))
        out, (hn, cn) = lstm(xs, (h0.contiguous(), c0.contiguous()))
        return out, hn, cn

    with torch.no_grad():
        y = x.unsqueeze(1)
        y = F.pad(y, (64, 64), mode="reflect")
        spec = F.conv1d(y, torch.from_numpy(z["stft_w"]), stride=64)
        re, im = spec[:, :129], spec[:, 129:]
        y = torch.sqrt(re * re + im * im)
        for i in range(4):
            y = conv_block(y, i)
        xs = y.permute(2, 0, 1)                       # (T, B, C)
        out0, hn0, cn0 = run_lstm(xs, 0, h[0:1], c[0:1])
        out1, hn1, cn1 = run_lstm(out0, 1, h[1:2], c[1:2])
        ys = F.relu(out1.permute(1, 2, 0))            # (B, 64, T)
        logit = F.conv1d(ys, torch.from_numpy(z["head_w"]), torch.from_numpy(z["head_b"]))
        probs = torch.sigmoid(logit)
        output = probs.mean(dim=2)
        hn = torch.cat([hn0, hn1], 0)
        cn = torch.cat([cn0, cn1], 0)

    np.savez(sys.argv[2], output=output.numpy(), hn=hn.numpy(), cn=cn.numpy())
""")


def _torch_oracle(tmp_path, weights, x, h, c):
    flat = {"x": x, "h": h, "c": c, "stft_w": weights["stft_w"],
            "head_w": weights["head_w"], "head_b": weights["head_b"]}
    for i, blk in enumerate(weights["enc"]):
        for k in ("w", "b", "g", "bb", "m", "v"):
            flat[f"enc{i}_{k}"] = blk[k]
        flat[f"enc{i}_stride"] = np.asarray(blk["stride"])
    for i in range(2):
        for k in ("W", "R", "B"):
            flat[f"lstm{i}_{k}"] = weights[f"lstm{i}"][k]
    in_npz = str(tmp_path / "oracle_in.npz")
    out_npz = str(tmp_path / "oracle_out.npz")
    script = str(tmp_path / "oracle.py")
    np.savez(in_npz, **flat)
    with open(script, "w") as f:
        f.write(_ORACLE)
    env = dict(os.environ, JAX_PLATFORMS="")
    r = subprocess.run([sys.executable, script, in_npz, out_npz],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, f"torch oracle failed:\n{r.stderr[-2000:]}"
    with np.load(out_npz) as z:
        return z["output"], z["hn"], z["cn"]


class TestSileroImport:
    def test_classify_and_roles(self, silero_fixture):
        path, _ = silero_fixture
        kind, params, meta = load_model_file(path)
        assert kind == "vad"
        assert meta["format"] == "onnx_program"
        prog = silero.from_meta(meta, params)
        assert prog._in == ("input", "h", "c")
        assert prog._out == ("output", "hn", "cn")

    def test_scores_match_torch_oracle(self, silero_fixture, tmp_path):
        """North-star-style parity: the compiled JAX program reproduces an
        independent torch execution of the same graph to well under 1e-3."""
        path, weights = silero_fixture
        rng = np.random.default_rng(21)
        x = rng.normal(0, 0.2, (3, 640)).astype(np.float32)
        h = rng.normal(0, 0.5, (2, 3, 64)).astype(np.float32)
        c = rng.normal(0, 0.5, (2, 3, 64)).astype(np.float32)

        prog = silero.import_onnx(path)
        score, hn, cn = jax.jit(prog.apply)(
            prog.params, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
        exp_out, exp_hn, exp_cn = _torch_oracle(tmp_path, weights, x, h, c)
        assert np.abs(np.asarray(score) - exp_out[:, 0]).max() < 1e-3
        assert np.abs(np.asarray(hn) - exp_hn).max() < 1e-3
        assert np.abs(np.asarray(cn) - exp_cn).max() < 1e-3
        # and much tighter in practice
        assert np.abs(np.asarray(score) - exp_out[:, 0]).max() < 1e-5

    def test_state_threading(self, silero_fixture):
        """The recurrent state must actually advance and influence scores."""
        path, _ = silero_fixture
        prog = silero.import_onnx(path)
        rng = np.random.default_rng(22)
        x = rng.normal(0, 0.2, (1, 640)).astype(np.float32)
        z = np.zeros((2, 1, 64), np.float32)
        fn = jax.jit(prog.apply)
        s1, h1, c1 = fn(prog.params, x, z, z)
        assert np.abs(np.asarray(h1)).max() > 0
        s2, _, _ = fn(prog.params, x, np.asarray(h1), np.asarray(c1))
        assert abs(float(s1[0]) - float(s2[0])) > 1e-7

    def test_sr_switch_folds(self, silero_fixture):
        """Pinning sr=8000 must select the else branch (analytically
        sigmoid(mean(x)) in the fixture)."""
        path, _ = silero_fixture
        prog8 = silero.import_onnx(path, static_sr=8000)
        rng = np.random.default_rng(23)
        x = rng.normal(0, 0.3, (2, 640)).astype(np.float32)
        z = np.zeros((2, 2, 64), np.float32)
        s, hn, cn = jax.jit(prog8.apply)(prog8.params, x, z, z)
        expect = 1 / (1 + np.exp(-x.mean(axis=1)))
        np.testing.assert_allclose(np.asarray(s), expect, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hn), z)  # passthrough state

    def test_vad_class_and_npz_round_trip(self, silero_fixture, tmp_path):
        from openwakeword_tpu.io.checkpoints import save_checkpoint
        from openwakeword_tpu.vad import VAD
        path, _ = silero_fixture
        rng = np.random.default_rng(24)
        audio = rng.integers(-5000, 5000, 1280).astype(np.int16)

        v1 = VAD(model_path=path)
        s1 = v1.predict(audio, frame_size=640)
        kind, params, meta = load_model_file(path)
        npz = str(tmp_path / "silero_vad.npz")
        save_checkpoint(npz, kind, params, meta)
        v2 = VAD(model_path=npz)
        s2 = v2.predict(audio, frame_size=640)
        assert abs(s1 - s2) < 1e-6
        # state carried across predict calls
        s3 = v2.predict(audio, frame_size=640)
        assert abs(s2 - s3) > 0 or np.abs(v2._h).max() > 0

    def test_engine_uses_silero_program(self, silero_fixture, monkeypatch):
        """MultiStreamEngine picks up an imported Silero program through the
        registry and runs the fused step with its state in StreamState."""
        from openwakeword_tpu import registry
        from openwakeword_tpu.parallel.engine import MultiStreamEngine
        path, _ = silero_fixture
        monkeypatch.setitem(registry.VAD_MODELS, "silero_vad",
                            {"model_path": path, "download_url": ""})
        eng = MultiStreamEngine(wakeword_models=["alexa"], n_streams=4,
                                vad_threshold=0.3)
        rng = np.random.default_rng(25)
        chunk = rng.integers(-8000, 8000, (4, 1280)).astype(np.float32)
        scores = eng.predict(chunk)
        assert scores.shape == (4, 1)
        assert np.abs(np.asarray(eng.state["vad_h"])).max() > 0


class TestOnnxProgramGeneral:
    def test_head_graph_via_program(self, tmp_path):
        """The generic program executor agrees with the structural head
        importer + native heads.apply on a torch-style export graph."""
        from openwakeword_tpu.io.onnx_import import import_head_onnx
        from openwakeword_tpu.models import heads
        rng = np.random.default_rng(30)
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
            op.encode_node("Sigmoid", ["logits"], ["score"]),
        ]
        path = str(tmp_path / "head.onnx")
        with open(path, "wb") as f:
            f.write(op.encode_model(nodes, inits,
                                    [op.encode_value_info("input", ["batch", 16, 96])],
                                    [op.encode_value_info("score", ["batch", 1])]))
        prog = load_program(path)
        hp, _ = import_head_onnx(path)
        x = rng.normal(0, 1, (5, 16, 96)).astype(np.float32)
        via_prog = np.asarray(jax.jit(
            lambda p, x: prog.apply(p, {"input": x})["score"])(prog.params, x))
        via_head = np.asarray(heads.apply(hp, jnp.asarray(x)))
        np.testing.assert_allclose(via_prog[:, 0], via_head[:, 0], atol=1e-6)

    def test_spec_round_trip(self, silero_fixture):
        path, _ = silero_fixture
        prog = silero.import_onnx(path).program
        spec = prog.to_spec()
        import json
        json.dumps(spec)  # must be JSON-safe
        prog2 = OnnxProgram.from_spec(spec, prog.params)
        rng = np.random.default_rng(31)
        x = rng.normal(0, 0.2, (2, 512)).astype(np.float32)
        z = np.zeros((2, 2, 64), np.float32)
        o1 = prog.apply(prog.params, {"input": x, "h": z, "c": z})
        o2 = prog2.apply(prog2.params, {"input": x, "h": z, "c": z})
        for k in o1:
            np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o2[k]), atol=1e-7)

    def test_unsupported_op_errors(self, tmp_path):
        nodes = [op.encode_node("TotallyMadeUpOp", ["x"], ["y"])]
        path = str(tmp_path / "bad.onnx")
        with open(path, "wb") as f:
            f.write(op.encode_model(nodes, [],
                                    [op.encode_value_info("x", [1, 4])],
                                    [op.encode_value_info("y", [1, 4])]))
        prog = load_program(path)
        with pytest.raises(NotImplementedError, match="TotallyMadeUpOp"):
            prog.apply(prog.params, {"x": np.zeros((1, 4), np.float32)})


class TestCompilerEdgeSemantics:
    """Regressions for ONNX edge semantics found in round-2 review."""

    def _prog(self, tmp_path, nodes, inits, ins, outs, fname="g.onnx"):
        path = str(tmp_path / fname)
        with open(path, "wb") as f:
            f.write(op.encode_model(nodes, inits, ins, outs))
        return load_program(path)

    def test_reduce_absent_axes_reduces_all(self, tmp_path):
        nodes = [op.encode_node("ReduceSum", ["x"], ["y"], keepdims=0)]
        prog = self._prog(tmp_path, nodes, [],
                          [op.encode_value_info("x", [2, 3])],
                          [op.encode_value_info("y", [])])
        x = np.arange(6, dtype=np.float32).reshape(2, 3)
        got = np.asarray(prog.apply(prog.params, {"x": x})["y"])
        np.testing.assert_allclose(got, x.sum())

    def test_reduce_noop_with_empty_axes_is_identity(self, tmp_path):
        # axes input slot absent entirely + noop_with_empty_axes=1 -> identity
        nodes = [op.encode_node("ReduceSum", ["x"], ["y"], keepdims=0,
                                noop_with_empty_axes=1)]
        prog = self._prog(tmp_path, nodes, [],
                          [op.encode_value_info("x", [2, 3])],
                          [op.encode_value_info("y", [2, 3])])
        x = np.arange(6, dtype=np.float32).reshape(2, 3)
        got = np.asarray(prog.apply(prog.params, {"x": x})["y"])
        np.testing.assert_allclose(got, x)

    def test_shape_start_end_attrs(self, tmp_path):
        nodes = [op.encode_node("Shape", ["x"], ["y"], start=1),
                 op.encode_node("Shape", ["x"], ["z"], start=0, end=2)]
        prog = self._prog(tmp_path, nodes, [],
                          [op.encode_value_info("x", [2, 3, 5])],
                          [op.encode_value_info("y", [2]),
                           op.encode_value_info("z", [2])])
        out = prog.apply(prog.params, {"x": np.zeros((2, 3, 5), np.float32)})
        np.testing.assert_array_equal(np.asarray(out["y"]), [3, 5])
        np.testing.assert_array_equal(np.asarray(out["z"]), [2, 3])

    def test_lstm_custom_activations_rejected(self, tmp_path):
        """The 'activations' attribute is a repeated-string field; it must be
        decoded (onnx_proto field 9) so non-default activations error instead
        of silently evaluating with sigmoid/tanh."""
        rng = np.random.default_rng(44)
        H, I = 4, 3
        inits = [op.encode_tensor("W", rng.normal(0, .1, (1, 4 * H, I)).astype(np.float32)),
                 op.encode_tensor("R", rng.normal(0, .1, (1, 4 * H, H)).astype(np.float32))]
        nodes = [op.encode_node("LSTM", ["x", "W", "R"], ["Y"], hidden_size=H,
                                activations=["HardSigmoid", "Tanh", "Tanh"])]
        prog = self._prog(tmp_path, nodes, inits,
                          [op.encode_value_info("x", [5, 1, I])],
                          [op.encode_value_info("Y", [5, 1, 1, H])])
        with pytest.raises(NotImplementedError, match="activations"):
            prog.apply(prog.params, {"x": np.zeros((5, 1, I), np.float32)})

    def test_gru_torch_and_numpy_oracles(self, tmp_path):
        """ONNX GRU (gate order zrh) against two independent oracles:
        torch.nn.GRU in a subprocess (== linear_before_reset=1 semantics,
        with zrh→rzn gate reordering) and a numpy spec implementation for
        both linear_before_reset modes, clip, and bidirectional."""
        rng = np.random.default_rng(46)
        H, I, T, B = 5, 3, 7, 2
        W = rng.normal(0, .6, (1, 3 * H, I)).astype(np.float32)
        R = rng.normal(0, .6, (1, 3 * H, H)).astype(np.float32)
        Bb = rng.normal(0, .6, (1, 6 * H)).astype(np.float32)
        x = rng.normal(0, 1.2, (T, B, I)).astype(np.float32)

        def np_gru(xs, Wd, Rd, Bd, lbr=False, clip=None):
            def sig(v):
                return 1.0 / (1.0 + np.exp(-v))

            def pre(v):
                return np.clip(v, -clip, clip) if clip else v
            wb, rb = Bd[:3 * H], Bd[3 * H:]
            Wz, Wr, Wh = np.split(Wd, 3, 0)
            Rz, Rr, Rh = np.split(Rd, 3, 0)
            wbz, wbr, wbh = np.split(wb, 3)
            rbz, rbr, rbh = np.split(rb, 3)
            h = np.zeros((xs.shape[1], H))
            ys = []
            for t in range(xs.shape[0]):
                xt = xs[t]
                zg = sig(pre(xt @ Wz.T + h @ Rz.T + wbz + rbz))
                rg = sig(pre(xt @ Wr.T + h @ Rr.T + wbr + rbr))
                if lbr:
                    hh = np.tanh(pre(xt @ Wh.T + wbh
                                     + rg * (h @ Rh.T + rbh)))
                else:
                    hh = np.tanh(pre(xt @ Wh.T + (rg * h) @ Rh.T
                                     + wbh + rbh))
                h = (1.0 - zg) * hh + zg * h
                ys.append(h)
            return np.stack(ys), h

        def run(direction="forward", **kwargs):
            n_dirs = 2 if direction == "bidirectional" else 1
            inits = [op.encode_tensor("W", np.repeat(W, n_dirs, 0)),
                     op.encode_tensor("R", np.repeat(R, n_dirs, 0)),
                     op.encode_tensor("Bb", np.repeat(Bb, n_dirs, 0))]
            nodes = [op.encode_node("GRU", ["x", "W", "R", "Bb"], ["Y"],
                                    hidden_size=H, direction=direction,
                                    **kwargs)]
            prog = self._prog(tmp_path, nodes, inits,
                              [op.encode_value_info("x", [T, B, I])],
                              [op.encode_value_info("Y", [T, n_dirs, B, H])])
            return np.asarray(prog.apply(prog.params, {"x": x})["Y"])

        # linear_before_reset=0 (default) + clip, numpy oracle
        want0, _ = np_gru(x, W[0], R[0], Bb[0], lbr=False, clip=0.6)
        np.testing.assert_allclose(run(clip=0.6)[:, 0], want0, atol=1e-5)

        # linear_before_reset=1: numpy oracle AND torch.nn.GRU subprocess
        got1 = run(linear_before_reset=1)[:, 0]
        want1, _ = np_gru(x, W[0], R[0], Bb[0], lbr=True)
        assert np.abs(want1 - want0).max() > 1e-3, \
            "fixture too tame: lbr modes coincide"
        np.testing.assert_allclose(got1, want1, atol=1e-5)
        oracle = textwrap.dedent("""
            import sys
            import numpy as np
            import torch
            z = np.load(sys.argv[1])
            W, R, B, x = z["W"], z["R"], z["B"], torch.from_numpy(z["x"])
            H = R.shape[-1]

            def zrh_to_rzn(m):
                zz, rr, hh = np.split(m.reshape(3, -1), 3, axis=0)
                return np.concatenate([rr, zz, hh], 0).reshape(m.shape)
            gru = torch.nn.GRU(input_size=W.shape[-1], hidden_size=H)
            with torch.no_grad():
                gru.weight_ih_l0.copy_(torch.from_numpy(zrh_to_rzn(W)))
                gru.weight_hh_l0.copy_(torch.from_numpy(zrh_to_rzn(R)))
                gru.bias_ih_l0.copy_(torch.from_numpy(zrh_to_rzn(B[:3*H])))
                gru.bias_hh_l0.copy_(torch.from_numpy(zrh_to_rzn(B[3*H:])))
                y, hn = gru(x)
            np.savez(sys.argv[2], y=y.numpy())
        """)
        in_npz, out_npz = str(tmp_path / "gi.npz"), str(tmp_path / "go.npz")
        script = str(tmp_path / "gru_oracle.py")
        np.savez(in_npz, W=W[0], R=R[0], B=Bb[0], x=x)
        with open(script, "w") as f:
            f.write(oracle)
        r = subprocess.run([sys.executable, script, in_npz, out_npz],
                           capture_output=True, text=True,
                           env=dict(os.environ, JAX_PLATFORMS=""),
                           timeout=300)
        assert r.returncode == 0, f"torch GRU oracle failed:\n{r.stderr[-2000:]}"
        with np.load(out_npz) as zz:
            np.testing.assert_allclose(got1, zz["y"], atol=1e-5)

        # bidirectional (reverse leg = numpy oracle on reversed input)
        got_bi = run(direction="bidirectional")
        want_fwd, _ = np_gru(x, W[0], R[0], Bb[0])
        want_bwd, _ = np_gru(x[::-1], W[0], R[0], Bb[0])
        np.testing.assert_allclose(got_bi[:, 0], want_fwd, atol=1e-5)
        np.testing.assert_allclose(got_bi[:, 1], want_bwd[::-1], atol=1e-5)

    def test_rnn_torch_and_numpy_oracles(self, tmp_path):
        """ONNX vanilla RNN against torch.nn.RNN in a subprocess (weights
        map 1:1, no gate reorder) plus a numpy spec implementation for
        clip, Relu activation, and bidirectional."""
        rng = np.random.default_rng(47)
        H, I, T, B = 5, 3, 7, 2
        W = rng.normal(0, .6, (1, H, I)).astype(np.float32)
        R = rng.normal(0, .6, (1, H, H)).astype(np.float32)
        Bb = rng.normal(0, .6, (1, 2 * H)).astype(np.float32)
        x = rng.normal(0, 1.2, (T, B, I)).astype(np.float32)

        def np_rnn(xs, Wd, Rd, Bd, f=np.tanh, clip=None):
            h = np.zeros((xs.shape[1], H))
            ys = []
            for t in range(xs.shape[0]):
                z = xs[t] @ Wd.T + h @ Rd.T + Bd[:H] + Bd[H:]
                if clip:
                    z = np.clip(z, -clip, clip)
                h = f(z)
                ys.append(h)
            return np.stack(ys)

        def run(direction="forward", **kwargs):
            n_dirs = 2 if direction == "bidirectional" else 1
            inits = [op.encode_tensor("W", np.repeat(W, n_dirs, 0)),
                     op.encode_tensor("R", np.repeat(R, n_dirs, 0)),
                     op.encode_tensor("Bb", np.repeat(Bb, n_dirs, 0))]
            nodes = [op.encode_node("RNN", ["x", "W", "R", "Bb"], ["Y"],
                                    hidden_size=H, direction=direction,
                                    **kwargs)]
            prog = self._prog(tmp_path, nodes, inits,
                              [op.encode_value_info("x", [T, B, I])],
                              [op.encode_value_info("Y", [T, n_dirs, B, H])])
            return np.asarray(prog.apply(prog.params, {"x": x})["Y"])

        # default Tanh vs torch.nn.RNN subprocess oracle
        got = run()[:, 0]
        np.testing.assert_allclose(got, np_rnn(x, W[0], R[0], Bb[0]),
                                   atol=1e-5)
        oracle = textwrap.dedent("""
            import sys
            import numpy as np
            import torch
            z = np.load(sys.argv[1])
            W, R, B, x = z["W"], z["R"], z["B"], torch.from_numpy(z["x"])
            H = R.shape[-1]
            rnn = torch.nn.RNN(input_size=W.shape[-1], hidden_size=H)
            with torch.no_grad():
                rnn.weight_ih_l0.copy_(torch.from_numpy(W))
                rnn.weight_hh_l0.copy_(torch.from_numpy(R))
                rnn.bias_ih_l0.copy_(torch.from_numpy(B[:H]))
                rnn.bias_hh_l0.copy_(torch.from_numpy(B[H:]))
                y, hn = rnn(x)
            np.savez(sys.argv[2], y=y.numpy())
        """)
        in_npz, out_npz = str(tmp_path / "ri.npz"), str(tmp_path / "ro.npz")
        script = str(tmp_path / "rnn_oracle.py")
        np.savez(in_npz, W=W[0], R=R[0], B=Bb[0], x=x)
        with open(script, "w") as f:
            f.write(oracle)
        r = subprocess.run([sys.executable, script, in_npz, out_npz],
                           capture_output=True, text=True,
                           env=dict(os.environ, JAX_PLATFORMS=""),
                           timeout=300)
        assert r.returncode == 0, f"torch RNN oracle failed:\n{r.stderr[-2000:]}"
        with np.load(out_npz) as zz:
            np.testing.assert_allclose(got, zz["y"], atol=1e-5)

        # Relu activation + binding clip, numpy oracle
        got_r = run(activations=["Relu"], clip=0.8)[:, 0]
        want_r = np_rnn(x, W[0], R[0], Bb[0],
                        f=lambda v: np.maximum(v, 0.0), clip=0.8)
        np.testing.assert_allclose(got_r, want_r, atol=1e-5)

        # bidirectional (reverse leg = numpy oracle on reversed input)
        got_bi = run(direction="bidirectional")
        np.testing.assert_allclose(got_bi[:, 0], np_rnn(x, W[0], R[0], Bb[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(
            got_bi[:, 1], np_rnn(x[::-1], W[0], R[0], Bb[0])[::-1], atol=1e-5)

        # unsupported activation is a typed error
        nodes = [op.encode_node("RNN", ["x", "W", "R", "Bb"], ["Y"],
                                hidden_size=H, activations=["Affine"])]
        inits = [op.encode_tensor("W", W), op.encode_tensor("R", R),
                 op.encode_tensor("Bb", Bb)]
        prog = self._prog(tmp_path, nodes, inits,
                          [op.encode_value_info("x", [T, B, I])],
                          [op.encode_value_info("Y", [T, 1, B, H])])
        with pytest.raises(NotImplementedError, match="activations"):
            prog.apply(prog.params, {"x": x})

    def test_activation_ops_match_torch_oracle(self, tmp_path):
        """Elu/Selu/Softplus/Softsign/HardSigmoid/HardSwish/PRelu/
        ThresholdedRelu/LogSoftmax/Gelu(none,tanh)/InstanceNormalization
        against torch.nn.functional in one subprocess."""
        rng = np.random.default_rng(48)
        x = rng.normal(0, 1.5, (3, 7)).astype(np.float32)
        slope = rng.normal(0, 0.5, (7,)).astype(np.float32)
        xi = rng.normal(0, 1.5, (2, 3, 4, 5)).astype(np.float32)
        w_in = rng.normal(1, 0.3, (3,)).astype(np.float32)
        b_in = rng.normal(0, 0.3, (3,)).astype(np.float32)

        def run(op_type, inputs, inits, in_infos, out_shape, **kwargs):
            nodes = [op.encode_node(op_type, inputs, ["y"], **kwargs)]
            prog = self._prog(tmp_path, nodes, inits, in_infos,
                              [op.encode_value_info("y", out_shape)],
                              fname=f"{op_type}.onnx")
            feeds = {"x": x if op_type != "InstanceNormalization" else xi}
            return np.asarray(prog.apply(prog.params, feeds)["y"])

        xinfo = [op.encode_value_info("x", list(x.shape))]
        got = {
            "elu": run("Elu", ["x"], [], xinfo, list(x.shape), alpha=1.3),
            "selu": run("Selu", ["x"], [], xinfo, list(x.shape)),
            "softplus": run("Softplus", ["x"], [], xinfo, list(x.shape)),
            "softsign": run("Softsign", ["x"], [], xinfo, list(x.shape)),
            "hardsigmoid": run("HardSigmoid", ["x"], [], xinfo,
                               list(x.shape), alpha=1.0 / 6.0, beta=0.5),
            "hardswish": run("HardSwish", ["x"], [], xinfo, list(x.shape)),
            "prelu": run("PRelu", ["x", "s"],
                         [op.encode_tensor("s", slope)], xinfo, list(x.shape)),
            "thresholded": run("ThresholdedRelu", ["x"], [], xinfo,
                               list(x.shape), alpha=0.7),
            "logsoftmax": run("LogSoftmax", ["x"], [], xinfo,
                              list(x.shape), axis=1),
            "gelu": run("Gelu", ["x"], [], xinfo, list(x.shape)),
            "gelu_tanh": run("Gelu", ["x"], [], xinfo, list(x.shape),
                             approximate="tanh"),
            "instnorm": run("InstanceNormalization", ["x", "w", "b"],
                            [op.encode_tensor("w", w_in),
                             op.encode_tensor("b", b_in)],
                            [op.encode_value_info("x", list(xi.shape))],
                            list(xi.shape), epsilon=1e-5),
        }
        oracle = textwrap.dedent("""
            import sys
            import numpy as np
            import torch
            import torch.nn.functional as F
            z = np.load(sys.argv[1])
            x = torch.from_numpy(z["x"])
            xi = torch.from_numpy(z["xi"])
            out = dict(
                elu=F.elu(x, 1.3), selu=F.selu(x), softplus=F.softplus(x),
                softsign=F.softsign(x), hardsigmoid=F.hardsigmoid(x),
                hardswish=F.hardswish(x),
                prelu=F.prelu(x, torch.from_numpy(z["slope"])),
                thresholded=F.threshold(x, 0.7, 0.0),
                logsoftmax=F.log_softmax(x, dim=1),
                gelu=F.gelu(x), gelu_tanh=F.gelu(x, approximate="tanh"),
                instnorm=F.instance_norm(
                    xi, weight=torch.from_numpy(z["w"]),
                    bias=torch.from_numpy(z["b"]), eps=1e-5),
            )
            np.savez(sys.argv[2], **{k: v.numpy() for k, v in out.items()})
        """)
        in_npz, out_npz = str(tmp_path / "ai.npz"), str(tmp_path / "ao.npz")
        script = str(tmp_path / "act_oracle.py")
        np.savez(in_npz, x=x, xi=xi, slope=slope, w=w_in, b=b_in)
        with open(script, "w") as f:
            f.write(oracle)
        r = subprocess.run([sys.executable, script, in_npz, out_npz],
                           capture_output=True, text=True,
                           env=dict(os.environ, JAX_PLATFORMS=""),
                           timeout=300)
        assert r.returncode == 0, f"torch oracle failed:\n{r.stderr[-2000:]}"
        with np.load(out_npz) as want:
            for k in got:
                np.testing.assert_allclose(
                    got[k], want[k], atol=1e-5, err_msg=k)

    def test_reduce_composites_and_argminmax(self, tmp_path):
        """ReduceL1/L2/LogSum/LogSumExp/SumSquare and ArgMax/ArgMin
        (keepdims both ways) against numpy."""
        rng = np.random.default_rng(49)
        x = np.abs(rng.normal(1, 0.8, (3, 4, 5))).astype(np.float32)
        xinfo = [op.encode_value_info("x", list(x.shape))]

        def run(op_type, **kwargs):
            nodes = [op.encode_node(op_type, ["x"], ["y"], **kwargs)]
            prog = self._prog(tmp_path, nodes, [], xinfo,
                              [op.encode_value_info("y", [])],
                              fname=f"{op_type}.onnx")
            return np.asarray(prog.apply(prog.params, {"x": x})["y"])

        np.testing.assert_allclose(run("ReduceL1", axes=[1], keepdims=1),
                                   np.abs(x).sum(1, keepdims=True), rtol=1e-5)
        np.testing.assert_allclose(run("ReduceL2", axes=[-1], keepdims=0),
                                   np.sqrt((x * x).sum(-1)), rtol=1e-5)
        np.testing.assert_allclose(run("ReduceLogSum", axes=[0, 2]),
                                   np.log(x.sum((0, 2), keepdims=True)),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            run("ReduceLogSumExp", axes=[1], keepdims=0),
            np.log(np.exp(x.astype(np.float64)).sum(1)), rtol=1e-5)
        np.testing.assert_allclose(run("ReduceSumSquare"),
                                   (x * x).sum(keepdims=True).reshape(1, 1, 1),
                                   rtol=1e-5)
        np.testing.assert_array_equal(run("ArgMax", axis=1, keepdims=1),
                                      x.argmax(1)[:, None])
        np.testing.assert_array_equal(run("ArgMin", axis=-1, keepdims=0),
                                      x.argmin(-1))
        with pytest.raises(NotImplementedError, match="select_last_index"):
            run("ArgMax", axis=0, select_last_index=1)

    def test_convtranspose_resize_match_torch_oracle(self, tmp_path):
        """ConvTranspose (1d/2d, stride/pad/output_padding/groups) and
        Resize (linear half_pixel & align_corners, nearest asymmetric
        floor = torch's three interpolate modes) against torch."""
        rng = np.random.default_rng(50)
        x2 = rng.normal(0, 1, (2, 4, 5, 6)).astype(np.float32)
        w2 = rng.normal(0, .5, (4, 3, 3, 3)).astype(np.float32)  # g=2
        b2 = rng.normal(0, .5, (6,)).astype(np.float32)
        x1 = rng.normal(0, 1, (2, 3, 9)).astype(np.float32)
        w1 = rng.normal(0, .5, (3, 5, 4)).astype(np.float32)
        xr = rng.normal(0, 1, (2, 3, 4, 5)).astype(np.float32)

        def run(op_type, feeds, inputs, inits, out_rank, **kwargs):
            nodes = [op.encode_node(op_type, inputs, ["y"], **kwargs)]
            in_infos = [op.encode_value_info(k, list(v.shape))
                        for k, v in feeds.items()]
            prog = self._prog(tmp_path, nodes, inits, in_infos,
                              [op.encode_value_info("y", [0] * out_rank)],
                              fname=f"{op_type}{len(inits)}.onnx")
            return np.asarray(prog.apply(prog.params, feeds)["y"])

        got = {
            "ct2": run("ConvTranspose", {"x": x2},
                       ["x", "w", "b"],
                       [op.encode_tensor("w", w2), op.encode_tensor("b", b2)],
                       4, strides=[2, 2], pads=[1, 1, 1, 1],
                       output_padding=[1, 1], group=2),
            "ct1": run("ConvTranspose", {"x": x1}, ["x", "w"],
                       [op.encode_tensor("w", w1)], 3,
                       strides=[3], pads=[2, 2], dilations=[2]),
            "rz_lin": run("Resize", {"x": xr}, ["x", "", "s"],
                          [op.encode_tensor(
                              "s", np.array([1, 1, 2, 1.5], np.float32))],
                          4, mode="linear"),
            "rz_ac": run("Resize", {"x": xr}, ["x", "", "s"],
                         [op.encode_tensor(
                             "s", np.array([1, 1, 2, 1.5], np.float32))],
                         4, mode="linear",
                         coordinate_transformation_mode="align_corners"),
            "rz_nn": run("Resize", {"x": xr}, ["x", "", "", "z"],
                         [op.encode_tensor(
                             "z", np.array([2, 3, 7, 13], np.int64))],
                         4, mode="nearest",
                         coordinate_transformation_mode="asymmetric",
                         nearest_mode="floor"),
        }
        oracle = textwrap.dedent("""
            import sys
            import numpy as np
            import torch
            import torch.nn.functional as F
            z = np.load(sys.argv[1])
            t = {k: torch.from_numpy(z[k]) for k in z.files}
            out = dict(
                ct2=F.conv_transpose2d(t["x2"], t["w2"], t["b2"], stride=2,
                                       padding=1, output_padding=1, groups=2),
                ct1=F.conv_transpose1d(t["x1"], t["w1"], stride=3, padding=2,
                                       dilation=2),
                rz_lin=F.interpolate(t["xr"], scale_factor=(2, 1.5),
                                     mode="bilinear", align_corners=False),
                rz_ac=F.interpolate(t["xr"], scale_factor=(2, 1.5),
                                    mode="bilinear", align_corners=True),
                rz_nn=F.interpolate(t["xr"], size=(7, 13), mode="nearest"),
            )
            np.savez(sys.argv[2], **{k: v.numpy() for k, v in out.items()})
        """)
        in_npz, out_npz = str(tmp_path / "ci.npz"), str(tmp_path / "co.npz")
        script = str(tmp_path / "ct_oracle.py")
        np.savez(in_npz, x2=x2, w2=w2, b2=b2, x1=x1, w1=w1, xr=xr)
        with open(script, "w") as f:
            f.write(oracle)
        r = subprocess.run([sys.executable, script, in_npz, out_npz],
                           capture_output=True, text=True,
                           env=dict(os.environ, JAX_PLATFORMS=""),
                           timeout=300)
        assert r.returncode == 0, f"torch oracle failed:\n{r.stderr[-2000:]}"
        with np.load(out_npz) as want:
            for k in got:
                np.testing.assert_allclose(got[k], want[k], atol=2e-5,
                                           err_msg=k)

    def test_topk_einsum_space_depth(self, tmp_path):
        """TopK (largest & smallest), Einsum, DepthToSpace (DCR/CRD) and
        SpaceToDepth against numpy."""
        rng = np.random.default_rng(51)
        x = rng.normal(0, 1, (3, 8)).astype(np.float32)
        xe = rng.normal(0, 1, (2, 3, 4)).astype(np.float32)
        we = rng.normal(0, 1, (4, 5)).astype(np.float32)
        xd = np.arange(2 * 8 * 2 * 3, dtype=np.float32).reshape(2, 8, 2, 3)

        def run(op_type, feeds, inputs, inits, n_out=1, **kwargs):
            outs = [f"y{i}" for i in range(n_out)]
            nodes = [op.encode_node(op_type, inputs, outs, **kwargs)]
            in_infos = [op.encode_value_info(k, list(v.shape))
                        for k, v in feeds.items()]
            prog = self._prog(tmp_path, nodes, inits, in_infos,
                              [op.encode_value_info(o, []) for o in outs],
                              fname=f"{op_type}{n_out}{len(kwargs)}.onnx")
            res = prog.apply(prog.params, feeds)
            return [np.asarray(res[o]) for o in outs]

        kt = op.encode_tensor("k", np.array([3], np.int64))
        v, i = run("TopK", {"x": x}, ["x", "k"], [kt], n_out=2)
        order = np.argsort(-x, axis=-1)[:, :3]
        np.testing.assert_array_equal(i, order)
        np.testing.assert_allclose(v, np.take_along_axis(x, order, -1))
        v, i = run("TopK", {"x": x}, ["x", "k"], [kt], n_out=2, largest=0)
        order = np.argsort(x, axis=-1)[:, :3]
        np.testing.assert_array_equal(i, order)

        (ye,) = run("Einsum", {"x": xe}, ["x", "w"],
                    [op.encode_tensor("w", we)], equation="bij,jk->bik")
        np.testing.assert_allclose(ye, np.einsum("bij,jk->bik", xe, we),
                                   atol=1e-5)

        bs = 2
        n, c, h, w = xd.shape
        dcr = xd.reshape(n, bs, bs, c // 4, h, w).transpose(
            0, 3, 4, 1, 5, 2).reshape(n, c // 4, h * bs, w * bs)
        crd = xd.reshape(n, c // 4, bs, bs, h, w).transpose(
            0, 1, 4, 2, 5, 3).reshape(n, c // 4, h * bs, w * bs)
        (yd,) = run("DepthToSpace", {"x": xd}, ["x"], [], blocksize=2)
        np.testing.assert_array_equal(yd, dcr)
        (yd,) = run("DepthToSpace", {"x": xd}, ["x"], [], blocksize=2,
                    mode="CRD")
        np.testing.assert_array_equal(yd, crd)
        (ys,) = run("SpaceToDepth", {"x": dcr}, ["x"], [], blocksize=2)
        # SpaceToDepth inverts DepthToSpace(DCR) up to the channel grouping
        assert ys.shape == xd.shape
        xs = np.arange(1 * 4 * 4 * 6, dtype=np.float32).reshape(1, 4, 4, 6)
        want = xs.reshape(1, 4, 2, 2, 3, 2).transpose(
            0, 3, 5, 1, 2, 4).reshape(1, 16, 2, 3)
        (ys,) = run("SpaceToDepth", {"x": xs}, ["x"], [], blocksize=2)
        np.testing.assert_array_equal(ys, want)

    def test_lstm_peephole_clip_input_forget(self, tmp_path):
        """P peephole weights (Pi/Po/Pf on c_{t-1}/c_t), the `clip`
        pre-activation bound, and input_forget gate coupling (f = 1 - i)
        execute with ONNX-spec semantics — numpy oracle. (Previously P,
        clip, and input_forget were silently ignored, scoring peephole
        graphs wrong with no error.)"""
        rng = np.random.default_rng(45)
        H, I, T, B = 4, 3, 6, 2
        W = rng.normal(0, .6, (1, 4 * H, I)).astype(np.float32)
        R = rng.normal(0, .6, (1, 4 * H, H)).astype(np.float32)
        Bb = rng.normal(0, .6, (1, 8 * H)).astype(np.float32)
        P = rng.normal(0, .6, (1, 3 * H)).astype(np.float32)
        x = rng.normal(0, 1.5, (T, B, I)).astype(np.float32)

        def oracle(clip=None, input_forget=False):
            def sig(v):
                return 1.0 / (1.0 + np.exp(-v))

            def pre(v):
                return np.clip(v, -clip, clip) if clip else v
            wb, rb = Bb[0, :4 * H], Bb[0, 4 * H:]
            p_i, p_o, p_f = P[0, :H], P[0, H:2 * H], P[0, 2 * H:]
            h = np.zeros((B, H))
            c = np.zeros((B, H))
            ys = []
            for t in range(T):
                g4 = x[t] @ W[0].T + h @ R[0].T + wb + rb
                i, o, f, g = np.split(g4, 4, axis=-1)
                i, f = i + p_i * c, f + p_f * c
                ia = sig(pre(i))
                fa = 1.0 - ia if input_forget else sig(pre(f))
                c = fa * c + ia * np.tanh(pre(g))
                o = o + p_o * c
                h = sig(pre(o)) * np.tanh(c)
                ys.append(h)
            return np.stack(ys)                     # (T, B, H)

        inits = [op.encode_tensor("W", W), op.encode_tensor("R", R),
                 op.encode_tensor("Bb", Bb), op.encode_tensor("P", P)]
        plain = oracle()
        for kwargs, want in (({}, plain),
                             ({"clip": 0.5}, oracle(clip=0.5)),
                             ({"input_forget": 1},
                              oracle(input_forget=True))):
            nodes = [op.encode_node(
                "LSTM", ["x", "W", "R", "Bb", "", "", "", "P"], ["Y"],
                hidden_size=H, **kwargs)]
            prog = self._prog(tmp_path, nodes, inits,
                              [op.encode_value_info("x", [T, B, I])],
                              [op.encode_value_info("Y", [T, 1, B, H])])
            got = np.asarray(prog.apply(prog.params, {"x": x})["Y"])[:, 0]
            if kwargs:      # each attribute must actually bind on this data
                assert np.abs(want - plain).max() > 1e-3, \
                    f"fixture too tame for {kwargs}"
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_pool_ceil_mode_rejected(self, tmp_path):
        nodes = [op.encode_node("MaxPool", ["x"], ["y"], kernel_shape=[2],
                                strides=[2], ceil_mode=1)]
        prog = self._prog(tmp_path, nodes, [],
                          [op.encode_value_info("x", [1, 1, 5])],
                          [op.encode_value_info("y", [1, 1, 3])])
        with pytest.raises(NotImplementedError, match="ceil_mode"):
            prog.apply(prog.params, {"x": np.zeros((1, 1, 5), np.float32)})

    def test_if_branch_output_consumed_inside_branch(self, tmp_path):
        """A branch tensor that is both a branch output AND an input of a
        later in-branch node: splicing renames the producer to the outer
        name, so the consumer must be renamed too."""
        from openwakeword_tpu.io.onnx_proto import GraphAttr
        # then-branch: t1 = x + 1 (branch output #1); t2 = t1 * 2 (output #2)
        b_nodes = [op.encode_node("Add", ["x", "one"], ["t1"]),
                   op.encode_node("Mul", ["t1", "two"], ["t2"])]
        b_inits = [op.encode_tensor("one", np.float32(1.0).reshape(())),
                   op.encode_tensor("two", np.float32(2.0).reshape(()))]
        branch = GraphAttr(op.encode_graph(
            b_nodes, b_inits, [],
            [op.encode_value_info("t1", [2]), op.encode_value_info("t2", [2])]))
        nodes = [op.encode_node("If", ["cond"], ["o1", "o2"],
                                then_branch=branch, else_branch=branch)]
        inits = [op.encode_tensor("cond", np.asarray(True))]
        prog = self._prog(tmp_path, nodes, inits,
                          [op.encode_value_info("x", [2])],
                          [op.encode_value_info("o1", [2]),
                           op.encode_value_info("o2", [2])])
        out = prog.apply(prog.params, {"x": np.asarray([1.0, 2.0], np.float32)})
        np.testing.assert_allclose(np.asarray(out["o1"]), [2.0, 3.0])
        np.testing.assert_allclose(np.asarray(out["o2"]), [4.0, 6.0])

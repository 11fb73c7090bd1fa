"""Differential fuzz of the ONNX->XLA compiler (io/onnx_graph.py).

The compiler is the gateway for the released artifacts (heads, the Silero
VAD graph): a silent semantics mismatch on some attribute combination would
surface as score drift the day real weights are imported. Two oracles:

* attr-heavy NN ops (Conv / pools / Gemm / BatchNorm / Softmax / LayerNorm /
  LSTM) run against **torch** in a subprocess (torch + jax deadlock when
  imported together here) -- torch is an independent implementation of the
  same op conventions;
* indexing / shape plumbing (Slice / Reduce / Gather / Split / Flatten /
  Squeeze / Unsqueeze / Pad) run against independent numpy re-derivations
  written from the ONNX spec text (not from the compiler's code).

Every case is generated from a fixed seed, built into a real .onnx file via
io/onnx_proto, loaded with load_program, and executed with the data input as
a *runtime* input (exercising the traced-jnp path, not static folding).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from openwakeword_tpu.io import onnx_proto as op          # noqa: E402
from openwakeword_tpu.io.onnx_graph import load_program   # noqa: E402

ORACLE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "onnx_op_oracle.py")


def _build(tmp_path, cid, nodes, inits, ins, outs):
    path = str(tmp_path / f"{cid}.onnx")
    with open(path, "wb") as f:
        f.write(op.encode_model(nodes, inits, ins, outs))
    return load_program(path)


def _dyn(shape):
    return list(shape)


# ---------------------------------------------------------------------------
# torch-oracle cases: each entry returns (case_spec, arrays, nodes, inits,
# value_infos_in, value_infos_out, runtime_inputs)


def _gen_conv_cases(rng):
    cases = []
    for n in range(10):
        cid = f"conv{n}"
        rank = int(rng.integers(1, 3))
        g = int(rng.choice([1, 2])) if n % 3 == 0 else 1
        cin = g * int(rng.integers(1, 3))
        cout = g * int(rng.integers(1, 3))
        k = [int(rng.integers(1, 4)) for _ in range(rank)]
        dil = [int(rng.integers(1, 3)) for _ in range(rank)]
        strides = [int(rng.integers(1, 3)) for _ in range(rank)]
        spatial = [int(rng.integers((ki - 1) * di + 1, 13))
                   for ki, di in zip(k, dil)]
        x = rng.normal(0, 1, [2, cin] + spatial).astype(np.float32)
        w = rng.normal(0, 0.5, [cout, cin // g] + k).astype(np.float32)
        attrs = {"strides": strides, "dilations": dil, "group": g}
        if n % 4 == 0:
            attrs["auto_pad"] = str(rng.choice(["SAME_UPPER", "SAME_LOWER"]))
        else:
            attrs["pads"] = [int(rng.integers(0, 3)) for _ in range(2 * rank)]
        arrays = {f"{cid}/x": x, f"{cid}/w": w}
        node_in = ["x", "w"]
        inits = [op.encode_tensor("w", w)]
        if n % 2 == 0:
            b = rng.normal(0, 0.5, cout).astype(np.float32)
            arrays[f"{cid}/b"] = b
            inits.append(op.encode_tensor("b", b))
            node_in.append("b")
        nodes = [op.encode_node("Conv", node_in, ["y"], **attrs)]
        cases.append(({"id": cid, "op": "Conv", "attrs": attrs}, arrays,
                      nodes, inits, [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info("y", [])], {"x": x}, 1))
    return cases


def _gen_pool_cases(rng):
    cases = []
    for n in range(8):
        is_max = n % 2 == 0
        cid = f"pool{n}"
        rank = int(rng.integers(1, 3))
        k = [int(rng.integers(1, 4)) for _ in range(rank)]
        strides = [int(rng.integers(1, 3)) for _ in range(rank)]
        spatial = [int(rng.integers(ki, ki + 9)) for ki in k]
        x = rng.normal(0, 1, [2, int(rng.integers(1, 4))] + spatial).astype(np.float32)
        attrs = {"kernel_shape": k, "strides": strides}
        if is_max:
            attrs["pads"] = [int(rng.integers(0, 2)) for _ in range(2 * rank)]
            opname = "MaxPool"
        else:
            sym = [int(rng.integers(0, ki // 2 + 1)) for ki in k]
            attrs["pads"] = sym + sym
            attrs["count_include_pad"] = int(rng.integers(0, 2))
            opname = "AveragePool"
        nodes = [op.encode_node(opname, ["x"], ["y"], **attrs)]
        cases.append(({"id": cid, "op": opname, "attrs": attrs},
                      {f"{cid}/x": x}, nodes, [],
                      [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info("y", [])], {"x": x}, 1))
    return cases


def _gen_gemm_cases(rng):
    cases = []
    for n in range(8):
        cid = f"gemm{n}"
        M, K, N = (int(rng.integers(1, 7)) for _ in range(3))
        tA, tB = int(rng.integers(0, 2)), int(rng.integers(0, 2))
        A = rng.normal(0, 1, (K, M) if tA else (M, K)).astype(np.float32)
        B = rng.normal(0, 1, (N, K) if tB else (K, N)).astype(np.float32)
        attrs = {"alpha": float(np.round(rng.uniform(0.5, 2.0), 3)),
                 "beta": float(np.round(rng.uniform(0.5, 2.0), 3)),
                 "transA": tA, "transB": tB}
        arrays = {f"{cid}/a": A, f"{cid}/b": B}
        node_in = ["a", "b"]
        inits = [op.encode_tensor("b", B)]
        if n % 4 != 3:
            c_shape = [(M, N), (1, N), (N,), ()][n % 4]
            C = rng.normal(0, 1, c_shape).astype(np.float32)
            arrays[f"{cid}/c"] = C
            inits.append(op.encode_tensor("c", C))
            node_in.append("c")
        nodes = [op.encode_node("Gemm", node_in, ["y"], **attrs)]
        cases.append(({"id": cid, "op": "Gemm", "attrs": attrs}, arrays,
                      nodes, inits, [op.encode_value_info("a", _dyn(A.shape))],
                      [op.encode_value_info("y", [])], {"a": A}, 1))
    return cases


def _gen_norm_cases(rng):
    cases = []
    for n in range(6):                                     # BatchNorm
        cid = f"bn{n}"
        rank = int(rng.integers(2, 5))
        C = int(rng.integers(1, 5))
        shape = [2, C] + [int(rng.integers(1, 5)) for _ in range(rank - 2)]
        x = rng.normal(0, 1, shape).astype(np.float32)
        ps = {nm: rng.normal(0, 1, C).astype(np.float32)
              for nm in ("scale", "bias", "mean")}
        ps["var"] = rng.uniform(0.1, 2.0, C).astype(np.float32)
        attrs = {"epsilon": float(rng.choice([1e-5, 1e-3]))}
        arrays = {f"{cid}/x": x, **{f"{cid}/{k}": v for k, v in ps.items()}}
        inits = [op.encode_tensor(k, v) for k, v in ps.items()]
        nodes = [op.encode_node("BatchNormalization",
                                ["x", "scale", "bias", "mean", "var"], ["y"],
                                **attrs)]
        cases.append(({"id": cid, "op": "BatchNormalization", "attrs": attrs},
                      arrays, nodes, inits,
                      [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info("y", [])], {"x": x}, 1))
    for n in range(6):                                     # Softmax
        cid = f"sm{n}"
        rank = int(rng.integers(2, 5))
        shape = [int(rng.integers(1, 5)) for _ in range(rank)]
        x = rng.normal(0, 2, shape).astype(np.float32)
        axis = int(rng.integers(-rank, rank))
        nodes = [op.encode_node("Softmax", ["x"], ["y"], axis=axis)]
        cases.append(({"id": cid, "op": "Softmax", "attrs": {"axis": axis}},
                      {f"{cid}/x": x}, nodes, [],
                      [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info("y", [])], {"x": x}, 1))
    for n in range(8):                                     # LayerNorm
        cid = f"ln{n}"
        rank = int(rng.integers(2, 5))
        shape = [int(rng.integers(2, 6)) for _ in range(rank)]
        x = rng.normal(0, 2, shape).astype(np.float32)
        axis = int(rng.integers(1, rank)) * (1 if n % 2 else -1)
        if axis < 0:
            axis = -int(rng.integers(1, rank))
        nshape = shape[axis % rank:]
        scale = rng.normal(1, 0.3, nshape).astype(np.float32)
        attrs = {"axis": axis, "epsilon": float(rng.choice([1e-5, 1e-3]))}
        arrays = {f"{cid}/x": x, f"{cid}/scale": scale}
        inits = [op.encode_tensor("scale", scale)]
        node_in = ["x", "scale"]
        if n % 3 != 2:
            bias = rng.normal(0, 0.3, nshape).astype(np.float32)
            arrays[f"{cid}/bias"] = bias
            inits.append(op.encode_tensor("bias", bias))
            node_in.append("bias")
        n_out = 3 if n % 4 == 1 else 1
        outs = ["y", "mu", "inv"][:n_out]
        nodes = [op.encode_node("LayerNormalization", node_in, outs, **attrs)]
        cases.append(({"id": cid, "op": "LayerNormalization", "attrs": attrs,
                       "n_out": n_out}, arrays, nodes, inits,
                      [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info(o, []) for o in outs],
                      {"x": x}, n_out))
    return cases


def _gen_lstm_cases(rng):
    cases = []
    for n, direction in enumerate(["forward", "reverse", "bidirectional",
                                   "forward", "bidirectional"]):
        cid = f"lstm{n}"
        T, B = int(rng.integers(2, 7)), int(rng.integers(1, 4))
        I, H = int(rng.integers(2, 6)), int(rng.integers(2, 5))
        D = 2 if direction == "bidirectional" else 1
        x = rng.normal(0, 1, (T, B, I)).astype(np.float32)
        W = rng.normal(0, 0.4, (D, 4 * H, I)).astype(np.float32)
        R = rng.normal(0, 0.4, (D, 4 * H, H)).astype(np.float32)
        attrs = {"hidden_size": H, "direction": direction}
        arrays = {f"{cid}/x": x, f"{cid}/w": W, f"{cid}/r": R}
        inits = [op.encode_tensor("W", W), op.encode_tensor("R", R)]
        node_in = ["x", "W", "R"]
        if n % 2 == 0:
            Bb = rng.normal(0, 0.3, (D, 8 * H)).astype(np.float32)
            arrays[f"{cid}/bb"] = Bb
            inits.append(op.encode_tensor("Bb", Bb))
            node_in.append("Bb")
        else:
            node_in.append("")
        node_in.append("")                                 # sequence_lens
        if n % 3 == 0:
            h0 = rng.normal(0, 0.5, (D, B, H)).astype(np.float32)
            c0 = rng.normal(0, 0.5, (D, B, H)).astype(np.float32)
            arrays[f"{cid}/h0"], arrays[f"{cid}/c0"] = h0, c0
            inits += [op.encode_tensor("h0", h0), op.encode_tensor("c0", c0)]
            node_in += ["h0", "c0"]
        outs = ["Y", "Y_h", "Y_c"]
        nodes = [op.encode_node("LSTM", node_in, outs, **attrs)]
        cases.append(({"id": cid, "op": "LSTM", "attrs": attrs, "n_out": 3},
                      arrays, nodes, inits,
                      [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info(o, []) for o in outs],
                      {"x": x}, 3))
    return cases


@pytest.fixture(scope="module")
def torch_cases(tmp_path_factory):
    rng = np.random.default_rng(2026)
    cases = (_gen_conv_cases(rng) + _gen_pool_cases(rng) + _gen_gemm_cases(rng)
             + _gen_norm_cases(rng) + _gen_lstm_cases(rng))
    tmp = tmp_path_factory.mktemp("onnx_fuzz")
    arrays, spec = {}, []
    for c_spec, arrs, *_ in cases:
        arrays.update(arrs)
        spec.append(c_spec)
    np.savez(tmp / "in.npz", spec=json.dumps(spec), **arrays)
    subprocess.run([sys.executable, ORACLE, str(tmp / "in.npz"),
                    str(tmp / "out.npz")], check=True, timeout=600)
    oracle = dict(np.load(tmp / "out.npz"))
    return cases, oracle, tmp


def test_torch_oracle_parity(torch_cases):
    cases, oracle, tmp = torch_cases
    failures = []
    for c_spec, _arrs, nodes, inits, ins, outs, runtime, n_out in cases:
        cid = c_spec["id"]
        prog = _build(tmp, cid, nodes, inits, ins, outs)
        got = prog.apply(prog.params, runtime)
        out_names = [o for o in got]
        for j in range(n_out):
            want = oracle[f"{cid}/out{j}"]
            have = np.asarray(got[out_names[j]])
            if have.shape != want.shape:
                failures.append(f"{cid} out{j}: shape {have.shape} vs {want.shape}")
                continue
            # MaxPool windows fully inside -inf padding legitimately yield
            # -inf on both sides; require the non-finite masks+values to
            # match exactly and compare the finite positions numerically.
            fin = np.isfinite(want)
            if (not np.array_equal(fin, np.isfinite(have))
                    or not np.array_equal(have[~fin], want[~fin])):
                failures.append(f"{cid} out{j}: non-finite mismatch")
                continue
            err = (np.max(np.abs(have[fin] - want[fin]))
                   if fin.any() else 0.0)
            if err > 2e-4:
                failures.append(f"{cid} out{j}: max|err|={err:.3e}")
    assert not failures, "\n".join(failures)


# ---------------------------------------------------------------------------
# numpy-oracle plumbing cases (independent re-derivations from the spec text)


def _slice_oracle(x, starts, ends, axes, steps):
    """ONNX Slice semantics derived from the spec text: normalize negatives
    by +dim, then clamp start to [0, dim] / [0, dim-1] and end to [0, dim] /
    [-1, dim-1] for positive / negative steps; gather explicit index lists."""
    y = x
    for s, e, a, st in zip(starts, ends, axes, steps):
        a = a + x.ndim if a < 0 else a
        dim = y.shape[a]
        if s < 0:
            s += dim
        if e < 0 and e > np.iinfo(np.int64).min:
            e += dim
        if st > 0:
            s, e = min(max(s, 0), dim), min(max(e, 0), dim)
        else:
            s, e = min(max(s, 0), dim - 1), min(max(e, -1), dim - 1)
        idx = list(range(s, e, st))
        y = np.take(y, idx, axis=a)
    return y


def test_slice_fuzz(tmp_path):
    rng = np.random.default_rng(7)
    big = np.iinfo(np.int64).max
    for n in range(25):
        rank = int(rng.integers(1, 4))
        x = rng.normal(0, 1, [int(rng.integers(3, 8)) for _ in range(rank)]
                       ).astype(np.float32)
        n_ax = int(rng.integers(1, rank + 1))
        axes = list(rng.choice(rank, n_ax, replace=False).astype(int))
        axes = [a - rank if rng.random() < 0.3 else a for a in axes]
        steps = [int(rng.choice([-2, -1, 1, 1, 2])) for _ in axes]
        starts, ends = [], []
        for a, st in zip(axes, steps):
            dim = x.shape[a]
            starts.append(int(rng.integers(-dim - 1, dim + 2)))
            if rng.random() < 0.15:
                ends.append(big if st > 0 else -big)
            else:
                ends.append(int(rng.integers(-dim - 1, dim + 2)))
        want = _slice_oracle(x, starts, ends, axes, steps)
        if want.size == 0:
            continue                       # XLA requires non-empty outputs here
        inits = [op.encode_tensor("s", np.asarray(starts, np.int64)),
                 op.encode_tensor("e", np.asarray(ends, np.int64)),
                 op.encode_tensor("a", np.asarray(axes, np.int64)),
                 op.encode_tensor("st", np.asarray(steps, np.int64))]
        nodes = [op.encode_node("Slice", ["x", "s", "e", "a", "st"], ["y"])]
        prog = _build(tmp_path, f"slice{n}", nodes, inits,
                      [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info("y", [])])
        got = np.asarray(prog.apply(prog.params, {"x": x})["y"])
        np.testing.assert_array_equal(got, want, err_msg=f"case {n}")


def test_reduce_fuzz(tmp_path):
    rng = np.random.default_rng(8)
    fns = {"ReduceSum": np.sum, "ReduceMean": np.mean, "ReduceMax": np.max,
           "ReduceMin": np.min, "ReduceProd": np.prod}
    for n in range(20):
        name = list(fns)[n % 5]
        rank = int(rng.integers(1, 4))
        x = rng.normal(0, 1, [int(rng.integers(2, 5)) for _ in range(rank)]
                       ).astype(np.float32)
        keep = int(rng.integers(0, 2))
        if n % 4 == 0:
            axes = None                    # absent -> reduce all
            want = fns[name](x, axis=None, keepdims=bool(keep))
        else:
            n_ax = int(rng.integers(1, rank + 1))
            axes = sorted(rng.choice(rank, n_ax, replace=False).astype(int))
            axes = [int(a - rank) if rng.random() < 0.4 else int(a)
                    for a in axes]
            want = fns[name](x, axis=tuple(a % rank for a in axes),
                             keepdims=bool(keep))
        attrs = {"keepdims": keep}
        inits = []
        node_in = ["x"]
        # opset < 13 passes axes as an attribute; opset >= 13/18 as an input
        # initializer -- alternate so both forms stay covered
        if axes is not None:
            if n % 2:
                attrs["axes"] = axes
            else:
                inits.append(op.encode_tensor("ax", np.asarray(axes, np.int64)))
                node_in.append("ax")
        nodes = [op.encode_node(name, node_in, ["y"], **attrs)]
        prog = _build(tmp_path, f"red{n}", nodes, inits,
                      [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info("y", [])])
        got = np.asarray(prog.apply(prog.params, {"x": x})["y"])
        assert got.shape == np.asarray(want).shape, f"case {n}"
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"case {n}")


def test_gather_fuzz(tmp_path):
    rng = np.random.default_rng(9)
    for n in range(12):
        rank = int(rng.integers(1, 4))
        x = rng.normal(0, 1, [int(rng.integers(2, 6)) for _ in range(rank)]
                       ).astype(np.float32)
        axis = int(rng.integers(-rank, rank))
        dim = x.shape[axis]
        idx_shape = [(), (int(rng.integers(1, 4)),),
                     (2, int(rng.integers(1, 3)))][n % 3]
        idx = rng.integers(-dim, dim, idx_shape).astype(np.int64)
        want = np.take(x, idx, axis=axis)  # numpy wraps negatives like ONNX
        nodes = [op.encode_node("Gather", ["x", "i"], ["y"], axis=axis)]
        prog = _build(tmp_path, f"gath{n}", nodes,
                      [op.encode_tensor("i", idx)],
                      [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info("y", [])])
        got = np.asarray(prog.apply(prog.params, {"x": x})["y"])
        np.testing.assert_array_equal(got, want, err_msg=f"case {n}")


def test_shape_plumbing_fuzz(tmp_path):
    """Flatten / Squeeze / Unsqueeze / Transpose / Split / Pad / Expand /
    Tile with randomized attrs vs independent numpy derivations."""
    rng = np.random.default_rng(10)
    for n in range(30):
        kind = n % 8
        rank = int(rng.integers(1, 4))
        shape = [int(rng.integers(1, 5)) for _ in range(rank)]
        x = rng.normal(0, 1, shape).astype(np.float32)
        inits, extra_in = [], []
        if kind == 0:                      # Flatten
            axis = int(rng.integers(-rank, rank + 1))
            a = axis % (rank + 1)
            want = x.reshape(int(np.prod(shape[:a], dtype=np.int64)), -1)
            nodes = [op.encode_node("Flatten", ["x"], ["y"], axis=axis)]
        elif kind == 1:                    # Squeeze (axes input OR attr form)
            ones = [i for i, d in enumerate(shape) if d == 1]
            if not ones:
                continue
            pick = sorted(rng.choice(ones, int(rng.integers(1, len(ones) + 1)),
                                     replace=False).astype(int))
            want = np.squeeze(x, axis=tuple(pick))
            pick = [int(p - rank) if rng.random() < 0.5 else int(p) for p in pick]
            if n % 2:                      # opset < 13 attribute form
                nodes = [op.encode_node("Squeeze", ["x"], ["y"], axes=pick)]
            else:
                inits = [op.encode_tensor("ax", np.asarray(pick, np.int64))]
                nodes = [op.encode_node("Squeeze", ["x", "ax"], ["y"])]
        elif kind == 2:                    # Unsqueeze (input OR attr form)
            n_new = int(rng.integers(1, 3))
            out_rank = rank + n_new
            pos = sorted(rng.choice(out_rank, n_new, replace=False).astype(int))
            want = x
            for p in pos:
                want = np.expand_dims(want, p)
            pos = [int(p - out_rank) if rng.random() < 0.5 else int(p)
                   for p in pos]
            if n % 2:
                nodes = [op.encode_node("Unsqueeze", ["x"], ["y"], axes=pos)]
            else:
                inits = [op.encode_tensor("ax", np.asarray(pos, np.int64))]
                nodes = [op.encode_node("Unsqueeze", ["x", "ax"], ["y"])]
        elif kind == 3:                    # Transpose
            if n % 2:
                perm = [int(p) for p in rng.permutation(rank)]
                want = np.transpose(x, perm)
                nodes = [op.encode_node("Transpose", ["x"], ["y"], perm=perm)]
            else:
                want = np.transpose(x)
                nodes = [op.encode_node("Transpose", ["x"], ["y"])]
        elif kind == 4:                    # Split uneven via sizes input
            axis = int(rng.integers(-rank, rank))
            dim = shape[axis]
            if dim < 2:
                continue
            cut = int(rng.integers(1, dim))
            sizes = [cut, dim - cut]
            want = np.split(x, [cut], axis=axis)[int(rng.integers(0, 2))]
            pick = 0 if want.shape[axis] == cut else 1
            want = np.split(x, [cut], axis=axis)[pick]
            inits = [op.encode_tensor("sz", np.asarray(sizes, np.int64))]
            nodes = [op.encode_node("Split", ["x", "sz"], ["y0", "y1"],
                                    axis=axis)]
        elif kind == 5:                    # Pad with axes subset
            mode = ["constant", "edge", "reflect"][n % 3]
            if mode == "reflect" and min(shape) < 2:
                continue
            n_ax = int(rng.integers(1, rank + 1))
            axes = sorted(rng.choice(rank, n_ax, replace=False).astype(int))
            lo = [int(rng.integers(0, 2)) for _ in axes]
            hi = [int(rng.integers(0, 2)) for _ in axes]
            width = [(0, 0)] * rank
            for a, l, h in zip(axes, lo, hi):
                width[a] = (l, h)
            cval = float(np.round(rng.normal(), 3))
            want = (np.pad(x, width, constant_values=cval) if mode == "constant"
                    else np.pad(x, width, mode=mode))
            pads = np.asarray(lo + hi, np.int64)
            inits = [op.encode_tensor("p", pads),
                     op.encode_tensor("cv", np.float32(cval).reshape(())),
                     op.encode_tensor("ax", np.asarray(axes, np.int64))]
            nodes = [op.encode_node("Pad", ["x", "p", "cv", "ax"], ["y"],
                                    mode=mode)]
        elif kind == 6:                    # Expand
            target = [int(rng.integers(1, 4))] + [d if rng.random() < 0.7 else 1
                                                  for d in shape]
            bshape = np.broadcast_shapes(tuple(x.shape), tuple(target))
            want = np.broadcast_to(x, bshape)
            inits = [op.encode_tensor("t", np.asarray(target, np.int64))]
            nodes = [op.encode_node("Expand", ["x", "t"], ["y"])]
        else:                              # Tile
            reps = [int(rng.integers(1, 3)) for _ in range(rank)]
            want = np.tile(x, reps)
            inits = [op.encode_tensor("r", np.asarray(reps, np.int64))]
            nodes = [op.encode_node("Tile", ["x", "r"], ["y"])]
        out_names = ["y0", "y1"] if kind == 4 else ["y"]
        prog = _build(tmp_path, f"plumb{n}", nodes, inits,
                      [op.encode_value_info("x", _dyn(x.shape))],
                      [op.encode_value_info(o, []) for o in out_names])
        got = prog.apply(prog.params, {"x": x})
        key = "y" if "y" in got else ("y0" if want.shape == np.asarray(
            got["y0"]).shape else "y1")
        np.testing.assert_array_equal(np.asarray(got[key]), want,
                                      err_msg=f"case {n} (kind {kind})")

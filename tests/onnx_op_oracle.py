"""Torch oracle for the ONNX-compiler differential fuzz (run as a SUBPROCESS
-- torch and jax deadlock when imported into one process in this environment).

Reads an .npz containing a JSON case list (key ``spec``) plus per-case input
arrays (``{cid}/{name}``), evaluates each case with torch as an independent
implementation of the ONNX op semantics, and writes ``{cid}/out{j}`` arrays.

Usage: python onnx_op_oracle.py <in.npz> <out.npz>
"""

import json
import sys

import numpy as np
import torch
import torch.nn.functional as F


def _auto_pads(auto, in_shape, k_eff, strides, rank):
    """Per-axis (begin, end) pads for SAME_UPPER / SAME_LOWER, from the ONNX
    spec text: out = ceil(in / stride); total = (out-1)*stride + k_eff - in."""
    out = []
    for i in range(rank):
        n = in_shape[2 + i]
        o = -(-n // strides[i])
        total = max(0, (o - 1) * strides[i] + k_eff[i] - n)
        if auto == "SAME_UPPER":
            out.append((total // 2, total - total // 2))
        else:
            out.append((total - total // 2, total // 2))
    return out


def _pad_nchw(x, per_axis, value=0.0):
    """F.pad wants (last-dim begin, last-dim end, ..., first spatial pair)."""
    seq = []
    for b, e in reversed(per_axis):
        seq += [b, e]
    return F.pad(x, seq, value=value)


def conv(z, c):
    a = c["attrs"]
    x = torch.from_numpy(z[c["id"] + "/x"])
    w = torch.from_numpy(z[c["id"] + "/w"])
    b = torch.from_numpy(z[c["id"] + "/b"]) if c["id"] + "/b" in z else None
    rank = x.dim() - 2
    strides = a.get("strides", [1] * rank)
    dil = a.get("dilations", [1] * rank)
    g = a.get("group", 1)
    if "pads" in a:
        per_axis = [(a["pads"][i], a["pads"][rank + i]) for i in range(rank)]
    elif a.get("auto_pad", "NOTSET") in ("SAME_UPPER", "SAME_LOWER"):
        k_eff = [(w.shape[2 + i] - 1) * dil[i] + 1 for i in range(rank)]
        per_axis = _auto_pads(a["auto_pad"], x.shape, k_eff, strides, rank)
    else:
        per_axis = [(0, 0)] * rank
    x = _pad_nchw(x, per_axis)
    fn = F.conv1d if rank == 1 else F.conv2d
    return [fn(x, w, b, stride=strides, padding=0, dilation=dil, groups=g)]


def maxpool(z, c):
    a = c["attrs"]
    x = torch.from_numpy(z[c["id"] + "/x"])
    rank = x.dim() - 2
    k = a["kernel_shape"]
    strides = a.get("strides", [1] * rank)
    pads = a.get("pads", [0] * (2 * rank))
    per_axis = [(pads[i], pads[rank + i]) for i in range(rank)]
    x = _pad_nchw(x, per_axis, value=float("-inf"))
    fn = F.max_pool1d if rank == 1 else F.max_pool2d
    return [fn(x, kernel_size=k, stride=strides, padding=0)]


def avgpool(z, c):
    a = c["attrs"]
    x = torch.from_numpy(z[c["id"] + "/x"])
    rank = x.dim() - 2
    fn = F.avg_pool1d if rank == 1 else F.avg_pool2d
    pads = a.get("pads", [0] * (2 * rank))
    sym = pads[:rank]
    assert pads[rank:] == sym, "oracle avg-pool cases use symmetric pads"
    return [fn(x, kernel_size=a["kernel_shape"],
               stride=a.get("strides", [1] * rank), padding=sym,
               count_include_pad=bool(a.get("count_include_pad", 0)))]


def gemm(z, c):
    a = c["attrs"]
    A = torch.from_numpy(z[c["id"] + "/a"])
    B = torch.from_numpy(z[c["id"] + "/b"])
    if a.get("transA", 0):
        A = A.t()
    if a.get("transB", 0):
        B = B.t()
    y = a.get("alpha", 1.0) * (A @ B)
    if c["id"] + "/c" in z:
        y = y + a.get("beta", 1.0) * torch.from_numpy(z[c["id"] + "/c"])
    return [y]


def batchnorm(z, c):
    i = c["id"]
    return [F.batch_norm(torch.from_numpy(z[i + "/x"]),
                         torch.from_numpy(z[i + "/mean"]),
                         torch.from_numpy(z[i + "/var"]),
                         torch.from_numpy(z[i + "/scale"]),
                         torch.from_numpy(z[i + "/bias"]),
                         training=False, eps=c["attrs"].get("epsilon", 1e-5))]


def softmax(z, c):
    return [F.softmax(torch.from_numpy(z[c["id"] + "/x"]),
                      dim=c["attrs"].get("axis", -1))]


def layernorm(z, c):
    i = c["id"]
    x = torch.from_numpy(z[i + "/x"])
    axis = c["attrs"].get("axis", -1) % x.dim()
    eps = c["attrs"].get("epsilon", 1e-5)
    dims = tuple(range(axis, x.dim()))
    mean = x.mean(dim=dims, keepdim=True)
    var = ((x - mean) ** 2).mean(dim=dims, keepdim=True)
    inv = torch.rsqrt(var + eps)
    y = (x - mean) * inv * torch.from_numpy(z[i + "/scale"])
    if i + "/bias" in z:
        y = y + torch.from_numpy(z[i + "/bias"])
    outs = [y, mean, inv]
    return outs[:c.get("n_out", 1)]


def lstm(z, c):
    """ONNX LSTM via torch.nn.LSTM. ONNX gate row order is [i, o, f, c];
    torch's is [i, f, g(=c), o]."""
    i = c["id"]
    X = torch.from_numpy(z[i + "/x"])                      # (T, B, I)
    W = torch.from_numpy(z[i + "/w"])                      # (D, 4H, I)
    R = torch.from_numpy(z[i + "/r"])                      # (D, 4H, H)
    H = R.shape[-1]
    direction = c["attrs"].get("direction", "forward")
    bidir = direction == "bidirectional"
    D = 2 if bidir else 1
    B = (torch.from_numpy(z[i + "/bb"]) if i + "/bb" in z
         else torch.zeros(D, 8 * H))
    h0 = (torch.from_numpy(z[i + "/h0"]) if i + "/h0" in z
          else torch.zeros(D, X.shape[1], H))
    c0 = (torch.from_numpy(z[i + "/c0"]) if i + "/c0" in z
          else torch.zeros(D, X.shape[1], H))

    def reorder(m):                                        # iofc -> ifco
        ii, oo, ff, cc = m[0:H], m[H:2 * H], m[2 * H:3 * H], m[3 * H:4 * H]
        return torch.cat([ii, ff, cc, oo], dim=0)

    net = torch.nn.LSTM(X.shape[2], H, num_layers=1, bidirectional=bidir)
    with torch.no_grad():
        for d in range(D):
            sfx = "_reverse" if d == 1 else ""
            getattr(net, "weight_ih_l0" + sfx).copy_(reorder(W[d]))
            getattr(net, "weight_hh_l0" + sfx).copy_(reorder(R[d]))
            getattr(net, "bias_ih_l0" + sfx).copy_(reorder(B[d, :4 * H]))
            getattr(net, "bias_hh_l0" + sfx).copy_(reorder(B[d, 4 * H:]))
        Xd = X.flip(0) if direction == "reverse" else X
        y, (hn, cn) = net(Xd, (h0, c0))
        if direction == "reverse":
            y = y.flip(0)
        T, Bb = X.shape[0], X.shape[1]
        y = y.reshape(T, Bb, D, H).permute(0, 2, 1, 3)     # ONNX Y (T, D, B, H)
    return [y, hn, cn][:c.get("n_out", 1)]


OPS = {"Conv": conv, "MaxPool": maxpool, "AveragePool": avgpool,
       "Gemm": gemm, "BatchNormalization": batchnorm, "Softmax": softmax,
       "LayerNormalization": layernorm, "LSTM": lstm}


def main():
    z = dict(np.load(sys.argv[1]))
    cases = json.loads(str(z.pop("spec")))
    out = {}
    for c in cases:
        for j, y in enumerate(OPS[c["op"]](z, c)):
            out[f"{c['id']}/out{j}"] = y.numpy()
    np.savez(sys.argv[2], **out)


if __name__ == "__main__":
    main()

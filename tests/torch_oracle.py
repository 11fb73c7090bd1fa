"""Torch oracle for architecture cross-validation (run as a SUBPROCESS --
torch and jax deadlock when imported into one process in this environment).

Reads an .npz with inputs + our params, rebuilds the same architectures in
torch (independent conv/LN implementations), and writes outputs to an .npz.

Usage: python torch_oracle.py <in.npz> <out.npz>
"""

import sys

import numpy as np
import torch
import torch.nn.functional as F


def clipped_leaky(x):
    return torch.clamp(torch.maximum(0.2 * x, x), min=-0.4)


def embedding_forward(z, x):
    """x: (B, 76, 32, 1) NHWC float32; params from our npz (HWIO convs)."""
    t = torch.from_numpy(x).permute(0, 3, 1, 2)          # NCHW
    conv_i = bn_i = 0
    # layer program mirrored from the conversion-notebook spec
    spec = [
        ("pad", (0, 1)),
        ("conv", (3, 3), "valid", "relu"), ("bnact",),
        ("conv", (1, 3), "same", None), ("bnact",),
        ("conv", (3, 1), "valid", None), ("bnact",),
        ("pool", (2, 2), (2, 2)),
        ("conv", (1, 3), "same", None), ("bnact",),
        ("conv", (3, 1), "valid", None), ("bnact",),
        ("conv", (1, 3), "same", None), ("bnact",),
        ("conv", (3, 1), "valid", None), ("bnact",),
        ("pool", (1, 2), (1, 2)),
        ("conv", (1, 3), "same", None), ("bnact",),
        ("conv", (3, 1), "valid", None), ("bnact",),
        ("conv", (1, 3), "same", None), ("bnact",),
        ("conv", (3, 1), "valid", None), ("bnact",),
        ("pool", (2, 2), (2, 2)),
        ("conv", (1, 3), "same", None), ("bnact",),
        ("conv", (3, 1), "valid", None), ("bnact",),
        ("conv", (1, 3), "same", None), ("bnact",),
        ("conv", (3, 1), "valid", None), ("bnact",),
        ("pool", (1, 2), (1, 2)),
        ("conv", (1, 3), "same", None), ("bnact",),
        ("conv", (3, 1), "valid", None), ("bnact",),
        ("conv", (1, 3), "same", None), ("bnact",),
        ("conv", (3, 1), "valid", None), ("bnact",),
        ("pool", (2, 2), (2, 2)),
        ("conv", (3, 1), "valid", None),
    ]
    for layer in spec:
        if layer[0] == "pad":
            t = F.pad(t, (layer[1][1], layer[1][1], layer[1][0], layer[1][0]))
        elif layer[0] == "conv":
            w = torch.from_numpy(z[f"conv_{conv_i}/w"]).permute(3, 2, 0, 1)  # HWIO->OIHW
            pad = "same" if layer[2] == "same" else 0
            t = F.conv2d(t, w, padding=pad)
            if layer[3] == "relu":
                t = F.relu(t)
            conv_i += 1
        elif layer[0] == "bnact":
            g = torch.from_numpy(z[f"bn_{bn_i}/gamma"])[None, :, None, None]
            b = torch.from_numpy(z[f"bn_{bn_i}/beta"])[None, :, None, None]
            m = torch.from_numpy(z[f"bn_{bn_i}/mean"])[None, :, None, None]
            v = torch.from_numpy(z[f"bn_{bn_i}/var"])[None, :, None, None]
            t = (t - m) / torch.sqrt(v + 1e-3) * g + b
            t = clipped_leaky(t)
            bn_i += 1
        elif layer[0] == "pool":
            t = F.max_pool2d(t, kernel_size=layer[1], stride=layer[2])
    return t.reshape(t.shape[0], -1).numpy()


def dnn_head_forward(z, x, n_blocks):
    t = torch.from_numpy(x).reshape(x.shape[0], -1)
    def lin(name, t):
        return t @ torch.from_numpy(z[f"{name}/w"]) + torch.from_numpy(z[f"{name}/b"])
    def ln(name, t):
        return F.layer_norm(t, (t.shape[-1],),
                            torch.from_numpy(z[f"{name}/gamma"]),
                            torch.from_numpy(z[f"{name}/beta"]))
    t = F.relu(ln("ln1", lin("layer1", t)))
    for i in range(n_blocks):
        t = F.relu(ln(f"block{i}_ln", lin(f"block{i}_fc", t)))
    return torch.sigmoid(lin("out", t)).numpy()


def main():
    z = dict(np.load(sys.argv[1]))
    out = {}
    if "emb_x" in z:
        out["emb_y"] = embedding_forward(z, z["emb_x"])
    if "head_x" in z:
        out["head_y"] = dnn_head_forward(z, z["head_x"], int(z["n_blocks"]))
    np.savez(sys.argv[2], **out)


if __name__ == "__main__":
    main()

"""Torch oracle for arbitrary-architecture classifier heads (run as a
SUBPROCESS — torch and jax deadlock when imported into one process in this
environment; torch.onnx.export is also unavailable here because neither
`onnx` nor `onnxscript` is installed, so the .onnx files themselves are built
by tests/fixture_builders.py from the weights this script emits).

These architectures are deliberately OUTSIDE the dnn/mlp/rnn families the
order-based extractors recognize, to exercise the generic graph-head import
path (io.onnx_import.import_graph_head_onnx) that mirrors the reference's
serve-any-onnx contract (reference model.py:105-141 builds an
InferenceSession from whatever path it is given).

Usage: python graph_head_oracle.py <arch> <weights_and_oracle.npz>
  arch: 'cnn' (Conv1d tower, (B,16,96) input, 1 class)
        'attn_pool' (flattened (B,1536) input, softmax-attention pooling, 3 classes)
"""

import sys

import numpy as np
import torch
import torch.nn.functional as F


class CnnHead(torch.nn.Module):
    """(B, 16, 96) embedding windows -> sigmoid score."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv1d(96, 48, 3, padding=1)
        self.conv2 = torch.nn.Conv1d(48, 32, 3, padding=1)
        self.fc = torch.nn.Linear(32, 1)

    def forward(self, x):
        h = x.transpose(1, 2)          # (B, 96, 16)
        h = F.relu(self.conv1(h))
        h = F.relu(self.conv2(h))
        h = h.mean(dim=2)              # (B, 32)
        return torch.sigmoid(self.fc(h))


class AttnPoolHead(torch.nn.Module):
    """(B, 16*96) flattened windows -> 3-class softmax."""

    def __init__(self):
        super().__init__()
        self.proj = torch.nn.Linear(96, 24)
        self.score = torch.nn.Linear(24, 1)
        self.out = torch.nn.Linear(24, 3)

    def forward(self, x):
        h = x.reshape(x.shape[0], 16, 96)
        h = torch.tanh(self.proj(h))                    # (B, 16, 24)
        a = torch.softmax(self.score(h), dim=1)         # (B, 16, 1)
        pooled = (h * a).sum(dim=1)                     # (B, 24)
        return torch.softmax(self.out(pooled), dim=-1)


class Cnn2DHead(torch.nn.Module):
    """(B, 16, 96) windows -> 2-D conv tower with a depthwise stage ->
    sigmoid score. Mirrors the microWakeWord-style depthwise-CNN .tflite
    graph built by fixture_builders.build_cnn2d_graph_head_tflite."""

    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(1, 8, 3, padding=1)          # SAME
        self.dw = torch.nn.Conv2d(8, 8, 3, padding=1, groups=8)  # depthwise
        self.fc = torch.nn.Linear(8, 1)

    def forward(self, x):
        h = x.reshape(x.shape[0], 1, 16, 96)       # NCHW
        h = F.relu(self.conv(h))
        h = F.max_pool2d(h, 2, 2)                  # (B, 8, 8, 48)
        h = F.relu(self.dw(h))
        h = h.mean(dim=(2, 3))                     # (B, 8)
        return torch.sigmoid(self.fc(h))


def main():
    arch, out_path = sys.argv[1], sys.argv[2]
    torch.manual_seed(11)
    if arch == "cnn":
        model = CnnHead().eval()
        probe = torch.from_numpy(
            np.random.default_rng(3).normal(0, 1, (5, 16, 96)).astype(np.float32))
    elif arch == "attn_pool":
        model = AttnPoolHead().eval()
        probe = torch.from_numpy(
            np.random.default_rng(3).normal(0, 1, (5, 16 * 96)).astype(np.float32))
    elif arch == "cnn2d":
        model = Cnn2DHead().eval()
        probe = torch.from_numpy(
            np.random.default_rng(3).normal(0, 1, (5, 16, 96)).astype(np.float32))
    else:
        raise SystemExit(f"unknown arch {arch}")

    with torch.no_grad():
        out = model(probe).numpy()
    weights = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez(out_path, probe=probe.numpy(), out=out, **weights)


if __name__ == "__main__":
    main()

"""Fused Pallas kernel for the incremental embedding-CNN step.

The incremental CNN is the dominant engine stage (PERF_NOTES.md: 53% of the
fused step at ~8% MFU). XLA's conv path pads the <=96-channel activations to
128 lanes and round-trips HBM between layers; this kernel instead runs the
whole 20-conv streaming step for a tile of streams entirely in VMEM with
**streams on the lane axis** — every tensor is lane-dense for 128-stream
tiles — and lowers each conv to tap-accumulated MXU matmuls
(Cout, Cin) @ (Cin, T*W*SB), one per kernel tap, with no materialized im2col.

State layout for this path: conv caches are stored stream-minor,
(C, rows, W, S); the mel input arrives as (8, 32, S) and the embedding is
produced as (96, S). The engine transposes at the kernel boundary (cheap XLA
transposes of small tensors) so the rest of the step is unchanged.

Bit-compatible with models.embedding_stream.step / step_t (same arithmetic,
same tap order); parity is tested in interpret mode on CPU and the fused
engine path re-verifies end-to-end.
"""

import functools
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openwakeword_tpu.models import embedding as E


def _layer_plan() -> List[Tuple]:
    """Static layer program with per-layer geometry, derived from the
    embedding spec. Entries:
      ("stem_pad", w_pad)
      ("conv", conv_i, kh, kw, relu)
      ("affine", bn_i) / ("leaky",)
      ("pool", (ph, pw))
    """
    plan = []
    for layer in E.spec():
        kind = layer[0]
        if kind == "pad":
            plan.append(("stem_pad", layer[1][1]))
        elif kind == "conv":
            _, _, (kh, kw), padding, act = layer
            plan.append(("conv", kh, kw, padding, act == "relu"))
        elif kind == "bnact":
            plan.append(("bnact",))
        elif kind == "pool":
            plan.append(("pool", layer[1]))
    return plan


def cache_shapes() -> List[Tuple[str, Tuple[int, int, int]]]:
    """[(cache_name, (C, rows, W))] in program order for the stream-minor
    cache layout (rows = kh - 1 = 2 everywhere)."""
    shapes = []
    t, w, c = 76, 32, 1
    conv_i = 0
    for layer in E.spec():
        kind = layer[0]
        if kind == "pad":
            w += 2 * layer[1][1]
        elif kind == "conv":
            _, cout, (kh, kw), padding, _ = layer
            if kh > 1:
                shapes.append((f"cache_{conv_i}", (c, 2, w)))
            t = t - kh + 1
            if padding == "VALID":
                w = w - kw + 1
            c = cout
            conv_i += 1
        elif kind == "pool":
            _, (ph, pw), _, _ = layer
            t //= ph
            w //= pw
    return shapes


def _prep_params(folded: Dict, dtype) -> List[np.ndarray]:
    """Flatten folded params into the kernel's argument list:
    per conv: one (kh*kw, Cout, Cin) tap-weight stack + (Cout, 1) bias;
    then the stem affine (scale, shift) as (24, 1) each."""
    args = []
    conv_i = 0
    for layer in E.spec():
        if layer[0] != "conv":
            continue
        w = np.asarray(folded[f"conv_{conv_i}"]["w"], np.float32)   # (kh,kw,Cin,Cout)
        kh, kw, cin, cout = w.shape
        taps = np.transpose(w.reshape(kh * kw, cin, cout), (0, 2, 1))  # (taps,Cout,Cin)
        args.append(taps.astype(dtype))
        args.append(np.asarray(folded[f"conv_{conv_i}"]["b"], np.float32).reshape(cout, 1))
        conv_i += 1
    aff = folded.get("affine_0")
    scale = np.asarray(aff["scale"], np.float32) if aff is not None else np.ones(24, np.float32)
    shift = np.asarray(aff["shift"], np.float32) if aff is not None else np.zeros(24, np.float32)
    args.append(scale.reshape(-1, 1))
    args.append(shift.reshape(-1, 1))
    return [np.asarray(a) for a in args]


_DN = (((1,), (0,)), ((), ()))


def _dot(w, rhs, mode):
    """(Cout, Cin) @ (Cin, N) with the engine's precision modes, expressed in
    Mosaic-supported primitives (Mosaic has no Precision.HIGH: the 3-pass
    bf16 scheme is spelled out with explicit hi/lo splits)."""
    if mode == "highest":
        return jax.lax.dot_general(w, rhs, _DN,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    if mode == "bf16":
        return jax.lax.dot_general(w.astype(jnp.bfloat16),
                                   rhs.astype(jnp.bfloat16), _DN,
                                   preferred_element_type=jnp.float32)
    # 'high': x*w ~= xh*wh + xh*wl + xl*wh  (drops only the lo*lo term)
    w_hi = w.astype(jnp.bfloat16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    r_hi = rhs.astype(jnp.bfloat16)
    r_lo = (rhs - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(w_hi, r_hi, _DN, preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(w_hi, r_lo, _DN, preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(w_lo, r_hi, _DN, preferred_element_type=jnp.float32)
    return out


def _conv_taps(x, taps_w, bias, kh, kw, mode):
    """x: (Cin, T, W, SB) already padded; accumulate one matmul per tap."""
    cin, t, wd, sb = x.shape
    t_out, w_out = t - kh + 1, wd - kw + 1
    acc = None
    for dt in range(kh):
        for dw in range(kw):
            tap = x[:, dt:dt + t_out, dw:dw + w_out, :]
            rhs = tap.reshape(cin, t_out * w_out * sb)
            part = _dot(taps_w[dt * kw + dw], rhs, mode)     # (Cout, N)
            acc = part if acc is None else acc + part
    cout = taps_w.shape[1]
    return acc.reshape(cout, t_out, w_out, sb) + bias[:, :, None, None]


def _pool(x, ph, pw):
    """2x max pools as unrolled static slice pairs (Mosaic lowers strided
    slices on >2D arrays to unsupported gathers; T<=8 and W<=32 here, so the
    unroll is small and static)."""
    c, t, wd, sb = x.shape
    if ph > 1:
        rows = [jnp.maximum(x[:, i:i + 1], x[:, i + 1:i + 2])
                for i in range(0, t, 2)]
        x = jnp.concatenate(rows, axis=1) if len(rows) > 1 else rows[0]
    if pw > 1:
        wd = x.shape[2]
        cols = [jnp.maximum(x[:, :, j:j + 1], x[:, :, j + 1:j + 2])
                for j in range(0, wd, 2)]
        x = jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]
    return x


def _leaky(x):
    return jnp.maximum(jnp.maximum(0.2 * x, x), -0.4)


def _make_kernel(mode, prime: bool):
    plan = _layer_plan()
    n_caches = len(cache_shapes())
    n_convs = sum(1 for p in plan if p[0] == "conv")

    def kernel(*refs):
        # argument order: mel, caches..., (taps,bias)*convs, scale, shift |
        #                 emb_out, new_caches...
        mel_ref = refs[0]
        cache_refs = refs[1:1 + n_caches]
        p = 1 + n_caches
        param_refs = refs[p:p + 2 * n_convs + 2]
        emb_ref = refs[p + 2 * n_convs + 2]
        out_cache_refs = refs[p + 2 * n_convs + 3:]

        x = mel_ref[:][None]                       # (1, T, 32, SB)
        conv_i = bn_i = cache_i = 0
        for step_ in plan:
            kind = step_[0]
            if kind == "stem_pad":
                wp = step_[1]
                x = jnp.pad(x, ((0, 0), (0, 0), (wp, wp), (0, 0)))
            elif kind == "conv":
                _, kh, kw, padding, relu = step_
                if kw > 1 and padding == "SAME":
                    x = jnp.pad(x, ((0, 0), (0, 0), (kw // 2, kw // 2), (0, 0)))
                if kh > 1:
                    if not prime:
                        x = jnp.concatenate(
                            [cache_refs[cache_i][:].astype(x.dtype), x], axis=1)
                    out_cache_refs[cache_i][:] = x[:, -2:].astype(
                        out_cache_refs[cache_i].dtype)
                    cache_i += 1
                taps_w = param_refs[2 * conv_i][:]
                bias = param_refs[2 * conv_i + 1][:]
                x = _conv_taps(x, taps_w, bias, kh, kw, mode)
                if relu:
                    x = jnp.maximum(x, 0.0)
                conv_i += 1
            elif kind == "bnact":
                if bn_i == 0:
                    scale = param_refs[2 * n_convs][:]
                    shift = param_refs[2 * n_convs + 1][:]
                    x = x * scale[:, :, None, None] + shift[:, :, None, None]
                x = _leaky(x)
                bn_i += 1
            elif kind == "pool":
                x = _pool(x, step_[1][0], step_[1][1])
        emb_ref[:] = x.reshape(E.OUTPUT_DIM, x.shape[-1])

    return kernel


@functools.partial(jax.jit, static_argnames=("sb", "precision_name", "prime",
                                             "interpret"))
def _run(mel_t, caches_flat, params_flat, sb, precision_name, prime, interpret):
    t_in = mel_t.shape[0]
    S = mel_t.shape[-1]
    n_tiles = S // sb
    shapes = cache_shapes()

    grid = (n_tiles,)
    lane_block = lambda *dims: pl.BlockSpec(tuple(dims) + (sb,),
                                            lambda i: (0,) * len(dims) + (i,))
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    in_specs = [lane_block(t_in, 32)]
    in_specs += [lane_block(*shape) for _, shape in shapes]
    in_specs += [full(p) for p in params_flat]

    out_shapes = [jax.ShapeDtypeStruct((E.OUTPUT_DIM, S), jnp.float32)]
    out_specs = [lane_block(E.OUTPUT_DIM)]
    for (_, shape), c in zip(shapes, caches_flat):
        out_shapes.append(jax.ShapeDtypeStruct(shape[:2] + shape[2:] + (S,), c.dtype))
        out_specs.append(lane_block(*shape))

    kwargs = {}
    if not interpret:
        # v5e has 128 MB of VMEM; Mosaic's default 16 MB scoped limit is
        # conservative for this kernel's transients at 128-stream tiles
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    outs = pl.pallas_call(
        _make_kernel(precision_name, prime),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # caches update in place: saves VMEM double-buffers and HBM traffic
        input_output_aliases={1 + i: 1 + i for i in range(len(caches_flat))},
        interpret=interpret,
        **kwargs,
    )(mel_t, *caches_flat, *params_flat)
    return outs[0], list(outs[1:])


class CnnStepKernel:
    """Engine-facing wrapper. Holds the prepped params and cache layout.

    apply(caches, new_mel_t (8, 32, S)) -> (new_caches, emb (96, S))
    prime(mel_window_t (76, 32, S))     -> (caches, emb (96, S))
    """

    def __init__(self, folded: Dict, sb: int = 128, precision: str = "high",
                 weight_dtype=jnp.float32, interpret: bool = False):
        self.sb = sb
        self.precision = precision
        self.interpret = interpret
        self._folded = folded
        self.params_flat = [jnp.asarray(a.astype(weight_dtype)
                                        if a.ndim == 3 else a)
                            for a in _prep_params(folded, np.float32)]
        self.cache_names = [name for name, _ in cache_shapes()]

    def _flat(self, caches: Dict) -> List[jnp.ndarray]:
        return [caches[n] for n in self.cache_names]

    def prime(self, mel_window_t: jnp.ndarray, use_pallas: bool = False):
        """Derive the caches from a full (76, 32, S) window.

        Priming happens once per reset, so by default it runs through the
        XLA stream-minor path (embedding_stream.init_caches_t) — the Mosaic
        compile of the full-window kernel is minutes-slow for no steady-state
        benefit — and only the per-step kernel is Pallas."""
        if use_pallas:
            shapes = cache_shapes()
            dummy = [jnp.zeros(s[:2] + s[2:] + (mel_window_t.shape[-1],), jnp.float32)
                     for _, s in shapes]
            emb, new_caches = _run(mel_window_t, tuple(dummy), tuple(self.params_flat),
                                   self.sb, self.precision, True, self.interpret)
            return dict(zip(self.cache_names, new_caches)), emb
        from openwakeword_tpu.models import embedding_stream as ES
        folded = self._folded
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "bf16": None}[self.precision]
        caches, emb = ES.init_caches_t(folded, jnp.transpose(mel_window_t, (2, 0, 1)),
                                       precision=prec)
        return caches, jnp.transpose(emb)

    def step(self, caches: Dict, new_mel_t: jnp.ndarray):
        emb, new_caches = _run(new_mel_t, tuple(self._flat(caches)),
                               tuple(self.params_flat),
                               self.sb, self.precision, False, self.interpret)
        return dict(zip(self.cache_names, new_caches)), emb

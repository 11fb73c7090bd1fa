"""Fused Pallas TPU kernel for the streaming mel frontend.

Computes, for a batch of per-stream 1760-sample analysis windows, the 8 new
raw log-mel frames of an 80 ms step in a single VMEM-resident kernel:
framing -> windowed cos/sin DFT matmuls (MXU) -> power -> mel projection
(MXU) -> log10, with no HBM round-trips between stages. The engine applies
the data-dependent top_db clamp and the /10+2 affine outside (they need the
first-step frame-validity mask; see parallel/engine.py).

Numerics: in interpret mode this matches
ops.melspec.melspectrogram(apply_transform=False, top_db=None) to float32
rounding (tests/test_pallas.py). Precision follows jax.lax.Precision:
None/DEFAULT runs the MXU's fast bf16 passes; HIGH is implemented as
explicit 3-pass bf16 hi/lo splits (Mosaic cannot lower Precision.HIGH
itself); HIGHEST is exact f32. Measured in-engine with pipelined dispatch
(PERF_NOTES.md): ~6% end-to-end win at 'high' and ~17% at 'bf16' vs the
XLA mel path, at the same score drift (3.5e-5 vs 3.1e-5 at 'high' against
'highest'), so the engine defaults to this kernel on TPU backends for
every mel mode except 'highest' (which keeps the XLA path for bit-level
parity with the host Model).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openwakeword_tpu import config
from openwakeword_tpu.ops import melspec as melspec_ops

WINDOW = config.CHUNK_SAMPLES + config.MEL_LOOKBACK_SAMPLES   # 1760
FRAMES = config.MELS_PER_CHUNK                                # 8
N_FFT = config.N_FFT                                          # 512
N_FREQS = N_FFT // 2 + 1                                      # 257
N_MELS = config.N_MELS                                        # 32
HOP = config.HOP_LENGTH                                       # 160
_LOG10_INV = float(1.0 / np.log(10.0))


@functools.lru_cache(maxsize=None)
def _consts():
    basis = melspec_ops.stft_power_basis()          # (512, 514) windowed
    cos = np.ascontiguousarray(basis[:, 0::2]).astype(np.float32)   # (512, 257)
    sin = np.ascontiguousarray(basis[:, 1::2]).astype(np.float32)
    melw = melspec_ops.mel_filterbank().astype(np.float32)           # (257, 32)
    return cos, sin, melw


RADIX = melspec_ops.RADIX                           # 4
SUB = N_FFT // RADIX                                # 128 sub-DFT length/bins
_BRANCH_HOP = HOP // RADIX                          # 40: per-frame branch stride


@functools.lru_cache(maxsize=None)
def _factored_consts():
    bases = melspec_ops.factored_dft_bases()        # (4, 128, 256) win+twiddle
    fcos = np.ascontiguousarray(bases[:, :, 0::2]).astype(np.float32)
    fim = np.ascontiguousarray(bases[:, :, 1::2]).astype(np.float32)
    melw = melspec_ops.mel_filterbank().astype(np.float32)           # (257, 32)
    return fcos, fim, melw


def _bf16_split(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= x (residual split)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_kernel(precision):
    # Mosaic does not lower Precision.HIGH; spell out its 3-pass-bf16
    # semantics (hi*hi + hi*lo + lo*hi) explicitly when requested.
    if isinstance(precision, str):        # 'high' etc. — normalize before
        precision = jax.lax.Precision(precision)   # comparing, or the string
    three_pass = precision == jax.lax.Precision.HIGH  # would slip through to Mosaic
    dot_prec = None if three_pass else precision

    def _dot(a, b_hi, b_lo):
        if not three_pass:
            return jnp.dot(a, b_hi, preferred_element_type=jnp.float32,
                           precision=dot_prec)
        a_hi, a_lo = _bf16_split(a)
        return (jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
                + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
                + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32))

    def _kernel(win_ref, cos_ref, sin_ref, mel_ref, out_ref):
        if three_pass:
            cos_hi, cos_lo = _bf16_split(cos_ref[:])
            sin_hi, sin_lo = _bf16_split(sin_ref[:])
            mel_hi, mel_lo = _bf16_split(mel_ref[:])
        else:
            cos_hi = cos_ref[:]
            sin_hi = sin_ref[:]
            mel_hi = mel_ref[:]
            cos_lo = sin_lo = mel_lo = None
        for j in range(FRAMES):
            frames = win_ref[:, HOP * j:HOP * j + N_FFT]                 # (T, 512)
            re = _dot(frames, cos_hi, cos_lo)
            im = _dot(frames, sin_hi, sin_lo)
            power = re * re + im * im                                    # (T, 257)
            mel = _dot(power, mel_hi, mel_lo)
            out_ref[:, j, :] = jnp.log(jnp.maximum(mel, config.MEL_AMIN)) * (10.0 * _LOG10_INV)
    return _kernel


def _make_factored_kernel(precision):
    """Radix-4 factored-DFT variant (ops.melspec.factored_dft_bases): four
    K=128 MXU-exact matmuls per frame + a VPU butterfly replace the
    (512, 514) basis matmul (~2.5x fewer padded MACs). The input is the
    branch-deinterleaved window (T, 4, 440) — branch b holds samples
    b::4, so frame j's branch operand is columns [40j, 40j + 128)."""
    if isinstance(precision, str):
        precision = jax.lax.Precision(precision)
    three_pass = precision == jax.lax.Precision.HIGH
    dot_prec = None if three_pass else precision

    def _dot(a, b_hi, b_lo):
        if not three_pass:
            return jnp.dot(a, b_hi, preferred_element_type=jnp.float32,
                           precision=dot_prec)
        a_hi, a_lo = _bf16_split(a)
        return (jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
                + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
                + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32))

    def _kernel(win_ref, fcos_ref, fim_ref, mel_ref, out_ref):
        def split(x):
            return _bf16_split(x) if three_pass else (x, None)
        fcos = [split(fcos_ref[b]) for b in range(RADIX)]
        fim = [split(fim_ref[b]) for b in range(RADIX)]
        mel0 = split(mel_ref[0:SUB])          # k in [0, 128)
        mel1 = split(mel_ref[SUB:2 * SUB])    # k in [128, 256)
        mel_last = mel_ref[2 * SUB:2 * SUB + 1]   # k = 256 row, (1, 32)
        for j in range(FRAMES):
            res, ims = [], []
            for b in range(RADIX):
                s = win_ref[:, b, _BRANCH_HOP * j:_BRANCH_HOP * j + SUB]
                res.append(_dot(s, *fcos[b]))
                ims.append(_dot(s, *fim[b]))
            # radix-4 butterfly (ops.melspec._factored_power, inlined so the
            # k=256 bin can skip the lane concat): c=0 sum, c=1 = D - iF
            e_re, e_im = res[0] + res[2], ims[0] + ims[2]
            o_re, o_im = res[1] + res[3], ims[1] + ims[3]
            p0 = (e_re + o_re) ** 2 + (e_im + o_im) ** 2
            d_re, d_im = res[0] - res[2], ims[0] - ims[2]
            f_re, f_im = res[1] - res[3], ims[1] - ims[3]
            p1 = (d_re + f_im) ** 2 + (d_im - f_re) ** 2
            p2 = ((e_re - o_re) ** 2 + (e_im - o_im) ** 2)[:, :1]  # k = 256
            mel = _dot(p0, *mel0) + _dot(p1, *mel1) + p2 * mel_last
            out_ref[:, j, :] = jnp.log(jnp.maximum(mel, config.MEL_AMIN)) * (10.0 * _LOG10_INV)
    return _kernel


def melspectrogram_pallas(windows: jnp.ndarray, tile_s: int = 128,
                          interpret: bool = False,
                          precision=None,
                          dft: str = "direct") -> jnp.ndarray:
    """(S, 1760) float32 windows -> (S, 8, 32) raw dB mel frames.

    S is padded up to a multiple of ``tile_s`` internally. ``precision``
    follows jax.lax.Precision: None = fast MXU passes (serving),
    HIGH = explicit 3-pass-bf16 splits (Mosaic cannot lower Precision.HIGH
    directly), HIGHEST = exact f32 (parity mode, slower).

    ``dft='factored'`` uses the radix-4 factored-DFT kernel (~2.5x fewer
    padded MACs; f32-rounding equivalent, not bit-equal — see
    ops.melspec.factored_dft_bases).
    """
    S = windows.shape[0]
    pad = (-S) % tile_s
    if pad:
        windows = jnp.concatenate(
            [windows, jnp.zeros((pad, WINDOW), windows.dtype)], axis=0)
    Sp = windows.shape[0]

    if dft == "factored":
        fcos, fim, melw = _factored_consts()
        n_branch = WINDOW // RADIX                      # 440
        # branch-deinterleave outside the kernel: win_d[s, b, m] = win[s, 4m+b]
        win_d = jnp.swapaxes(
            windows.astype(jnp.float32).reshape(Sp, n_branch, RADIX), -1, -2)
        out = pl.pallas_call(
            _make_factored_kernel(precision),
            grid=(Sp // tile_s,),
            in_specs=[
                pl.BlockSpec((tile_s, RADIX, n_branch), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RADIX, SUB, SUB), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RADIX, SUB, SUB), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FREQS, N_MELS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_s, FRAMES, N_MELS), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Sp, FRAMES, N_MELS), jnp.float32),
            interpret=interpret,
        )(win_d, jnp.asarray(fcos), jnp.asarray(fim), jnp.asarray(melw))
        return out[:S]
    if dft != "direct":
        raise ValueError(f"unknown dft mode {dft!r} (expected 'direct' or 'factored')")
    cos, sin, melw = _consts()

    out = pl.pallas_call(
        _make_kernel(precision),
        grid=(Sp // tile_s,),
        in_specs=[
            pl.BlockSpec((tile_s, WINDOW), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_FREQS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_FREQS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FREQS, N_MELS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_s, FRAMES, N_MELS), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sp, FRAMES, N_MELS), jnp.float32),
        interpret=interpret,
    )(windows.astype(jnp.float32), jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(melw))
    return out[:S]

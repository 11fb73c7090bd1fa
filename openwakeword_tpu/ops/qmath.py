"""LiteRT integer-kernel fixed-point primitives, expressed in XLA-traceable
int32 arithmetic.

The reference runtime executes int8-quantized .tflite graphs with true
integer kernels (reference openwakeword/utils.py:112-161 hands whatever the
file contains to the LiteRT interpreter, whose quantized kernels live in
tensorflow/lite/kernels). Matching those scores bit-for-bit requires the
exact fixed-point requantization pipeline those kernels use — int32
accumulation, a Q31 "quantized multiplier" with a saturating rounding
doubling high-mul, and a rounding power-of-two divide — not a float
approximation.

The awkward part on this side is that those primitives are specified over
int64 intermediates while JAX disables 64-bit types by default (and flipping
``jax_enable_x64`` process-wide would change dtypes across the package). So
``srdhm`` computes the exact 32x32->64-bit product with 16-bit limb
arithmetic in uint32 lanes, which XLA compiles fine on any backend. All
functions accept either scalars or per-channel arrays for the multiplier /
shift (per-channel conv quantization).

Semantics mirrored (spec, not code):
- gemmlowp ``SaturatingRoundingDoublingHighMul``: nudge = +2^30 for
  non-negative products, 1-2^30 otherwise; truncating division by 2^31.
- gemmlowp ``RoundingDivideByPOT``: round-to-nearest, ties away from zero.
- TFLite ``MultiplyByQuantizedMultiplier``: left-shift the accumulator for
  positive shifts, high-mul by the Q31 multiplier, rounding-divide for
  negative shifts.
- TFLite ``QuantizeMultiplier`` (host side): frexp decomposition with
  round-half-away-from-zero to Q31.
"""

import math
from typing import Sequence, Tuple, Union

import numpy as np

import jax.numpy as jnp

_I32 = jnp.int32
_U32 = jnp.uint32


def quantize_multiplier(real_multiplier: float) -> Tuple[int, int]:
    """Host-side decomposition real = q31 * 2^(shift-31), q31 in [2^30, 2^31).

    Returns ``(quantized_multiplier, shift)``; ``(0, 0)`` for zero or
    underflowing multipliers (shift < -31 behaves as multiply-by-zero, as in
    lite/kernels/internal/quantization_util).
    """
    if real_multiplier == 0.0:
        return 0, 0
    if real_multiplier < 0.0:
        raise ValueError("quantized multipliers must be non-negative, got "
                         f"{real_multiplier}")
    q, shift = math.frexp(real_multiplier)         # real = q * 2^shift
    q_fixed = int(math.floor(q * (1 << 31) + 0.5))  # round half away (q > 0)
    if q_fixed == (1 << 31):
        q_fixed //= 2
        shift += 1
    if shift < -31:
        return 0, 0
    if shift > 30:
        raise ValueError(
            f"quantized multiplier {real_multiplier} overflows the "
            "fixed-point representation (shift > 30)")
    return q_fixed, shift


def quantize_multipliers(real: Sequence[float]) -> Tuple[np.ndarray, np.ndarray]:
    """Vector form of :func:`quantize_multiplier` -> (q31 int32, shift int32)."""
    pairs = [quantize_multiplier(float(m)) for m in np.atleast_1d(real)]
    qm = np.asarray([p[0] for p in pairs], np.int32)
    sh = np.asarray([p[1] for p in pairs], np.int32)
    return qm, sh


def srdhm(a, b):
    """SaturatingRoundingDoublingHighMul(a, b) for int32 ``a`` and POSITIVE
    int32 ``b`` (quantized multipliers are always in [2^30, 2^31)).

    Computes trunc((a*b + nudge) / 2^31) with the exact 64-bit product built
    from 16-bit limbs in uint32 lanes. The gemmlowp overflow case
    (a == b == INT32_MIN) cannot occur with a positive ``b``.
    """
    a = jnp.asarray(a, _I32)
    b = jnp.asarray(b, _I32)
    au = a.astype(_U32)                      # two's-complement bit pattern
    bu = b.astype(_U32)
    a0, a1 = au & _U32(0xFFFF), au >> 16
    b0, b1 = bu & _U32(0xFFFF), bu >> 16
    # schoolbook 32x32 -> (hi, lo) unsigned product, 16-bit limbs
    t = a0 * b0
    w0 = t & _U32(0xFFFF)
    k = t >> 16
    t = a1 * b0 + k
    w1 = t & _U32(0xFFFF)
    w2 = t >> 16
    t = a0 * b1 + w1
    w1 = t & _U32(0xFFFF)
    k = t >> 16
    t = a1 * b1 + w2 + k                     # == (w3 << 16) | w2, fits u32
    lo = w0 | (w1 << 16)
    hi = t
    # signed correction: a signed * b positive -> subtract b<<32 when a < 0
    hi = hi - jnp.where(a < 0, bu, _U32(0))
    # nudge by the sign of the (pre-nudge) 64-bit product
    neg = (hi >> 31) != 0
    nudge_lo = jnp.where(neg, _U32((1 - (1 << 30)) & 0xFFFFFFFF),
                         _U32(1 << 30))
    nudge_hi = jnp.where(neg, _U32(0xFFFFFFFF), _U32(0))
    lo2 = lo + nudge_lo
    carry = (lo2 < lo).astype(_U32)
    hi2 = hi + nudge_hi + carry
    # truncating division of the signed 64-bit (hi2, lo2) by 2^31: arithmetic
    # shift (= floor) then +1 when negative with a nonzero remainder
    r = ((hi2 << 1) | (lo2 >> 31)).astype(_I32)
    x_neg = (hi2 >> 31) != 0
    rem = lo2 & _U32(0x7FFFFFFF)
    return r + jnp.where(x_neg & (rem != 0), _I32(1), _I32(0))


def rounding_divide_by_pot(x, exponent):
    """gemmlowp RoundingDivideByPOT: nearest, ties away from zero.

    ``exponent`` may be a scalar or a per-channel int32 array in [0, 31].
    """
    x = jnp.asarray(x, _I32)
    exponent = jnp.asarray(exponent, _I32)
    mask = (jnp.left_shift(_I32(1), exponent) - _I32(1)).astype(_I32)
    remainder = jnp.bitwise_and(x, mask)
    threshold = jnp.right_shift(mask, 1) + jnp.where(x < 0, _I32(1), _I32(0))
    return jnp.right_shift(x, exponent) + \
        jnp.where(remainder > threshold, _I32(1), _I32(0))


def multiply_by_quantized_multiplier(x, quantized_multiplier, shift):
    """TFLite MultiplyByQuantizedMultiplier(x, qm, shift).

    ``quantized_multiplier``/``shift`` may be scalars or per-channel arrays
    broadcastable against ``x`` (per-channel conv requantization).
    """
    x = jnp.asarray(x, _I32)
    qm = jnp.asarray(quantized_multiplier, _I32)
    shift = jnp.asarray(shift, _I32)
    left = jnp.maximum(shift, 0)
    right = jnp.maximum(-shift, 0)
    shifted = x * jnp.left_shift(_I32(1), left)      # wrapping, as in C
    return rounding_divide_by_pot(srdhm(shifted, qm), right)


def round_half_away(x):
    """TfLiteRound: round half away from zero (jnp.round is half-to-even)."""
    x = jnp.asarray(x)
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def round_half_away_host(x) -> np.ndarray:
    """Host/numpy twin of :func:`round_half_away`."""
    x = np.asarray(x)
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


Number = Union[int, float]


def quantized_activation_range(activation: int, scale: float, zero_point: int,
                               qmin: int, qmax: int) -> Tuple[int, int]:
    """CalculateActivationRangeQuantized: clamp bounds for a fused activation
    expressed in the output's quantized domain (host-side, static metadata).

    ActivationFunctionType: NONE=0 RELU=1 RELU_N1_TO_1=2 RELU6=3.
    """
    def q(v: float) -> int:
        return int(zero_point + round_half_away_host(v / scale))

    if activation == 0:
        return qmin, qmax
    if activation == 1:
        return max(qmin, q(0.0)), qmax
    if activation == 2:
        return max(qmin, q(-1.0)), min(qmax, q(1.0))
    if activation == 3:
        return max(qmin, q(0.0)), min(qmax, q(6.0))
    raise NotImplementedError(
        f"quantized fused activation {activation} unsupported")

"""Batched audio augmentation ops in JAX.

The reference composes audiomentations / torch_audiomentations / speechbrain
transforms on CPU/GPU per clip (reference data.py:558-697). Here every
augmentation is a pure, batched JAX function over (B, N) float audio in
[-1, 1], so whole batches augment in one XLA program on TPU:

  gain, tanh distortion, seven-band parametric EQ (RBJ peaking-biquad
  cascade, zero-state-exact in the FFT domain -- ops.filters), band-stop
  filter (RBJ notch biquad), colored noise at SNR (PSD ~ 1/f^decay),
  background-noise mixing at SNR, RIR reverberation (FFT convolution with
  speechbrain-style average-amplitude rescale), and pitch shift
  (rfft bin remap).

All randomness is explicit via jax.random keys.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openwakeword_tpu.ops.fftc import spectral_op


def gain(key, x, min_gain_db=-18.0, max_gain_db=0.0):
    g_db = jax.random.uniform(key, (x.shape[0], 1), minval=min_gain_db, maxval=max_gain_db)
    return x * 10.0 ** (g_db / 20.0)


def tanh_distortion(key, x, min_distortion=0.0001, max_distortion=0.10):
    """Soft-clipping distortion; drive grows with the distortion amount and
    output is rescaled to the input RMS (audiomentations semantics)."""
    d = jax.random.uniform(key, (x.shape[0], 1), minval=min_distortion, maxval=max_distortion)
    drive = 1.0 + d * 50.0
    y = jnp.tanh(x * drive)
    rms_in = jnp.sqrt(jnp.mean(x ** 2, axis=-1, keepdims=True) + 1e-9)
    rms_out = jnp.sqrt(jnp.mean(y ** 2, axis=-1, keepdims=True) + 1e-9)
    return y * (rms_in / rms_out)


@spectral_op
def seven_band_eq(key, x, min_gain_db=-6.0, max_gain_db=6.0, sr=16000):
    """Seven-band parametric EQ as a cascade of RBJ peaking biquads (the
    filter family audiomentations' SevenBandParametricEQ runs sequentially
    on CPU), applied batched via the cascade's exact transfer function
    (ops.filters). Q = 1 gives ~1-octave bands that cross over smoothly."""
    from openwakeword_tpu.ops import filters
    centers = jnp.asarray([60.0, 150.0, 400.0, 1000.0, 2400.0, 4800.0, 7000.0])
    gains = jax.random.uniform(key, (x.shape[0], centers.shape[0]),
                               minval=min_gain_db, maxval=max_gain_db)
    b, a = filters.peaking_coeffs(centers[None, :], 1.0, gains, sr)   # (B,7,3)
    return filters.apply_cascade(x, b, a)


@spectral_op
def band_stop(key, x, min_center_hz=200.0, max_center_hz=4000.0,
              min_bandwidth_fraction=0.5, max_bandwidth_fraction=1.99, sr=16000):
    """Attenuate a random frequency band with an RBJ notch biquad
    (torch_audiomentations BandStopFilter parameter ranges: log-uniform
    center, bandwidth as a fraction of it; Q = center/bandwidth = 1/frac),
    zero-state-exact via the FFT-domain transfer function."""
    from openwakeword_tpu.ops import filters
    k1, k2 = jax.random.split(key)
    B = x.shape[0]
    center = jnp.exp(jax.random.uniform(k1, (B,), minval=jnp.log(min_center_hz),
                                        maxval=jnp.log(max_center_hz)))
    frac = jax.random.uniform(k2, (B,), minval=min_bandwidth_fraction,
                              maxval=max_bandwidth_fraction)
    b, a = filters.notch_coeffs(center, 1.0 / frac, sr)               # (B, 3)
    return filters.apply_cascade(x, b[:, None, :], a[:, None, :])


@spectral_op
def colored_noise(key, shape, f_decay, sr=16000):
    """Noise with PSD ~ 1/f^decay (decay 0=white, 1=pink, 2=brown; negative
    values tilt blue/violet), normalized to unit peak per example."""
    k1, _ = jax.random.split(key)
    n = shape[-1]
    n_freqs = n // 2 + 1
    spec = jax.random.normal(k1, shape[:-1] + (n_freqs,), dtype=jnp.complex64)
    freqs = jnp.asarray(np.fft.rfftfreq(n, 1.0 / sr), jnp.float32)
    shaping = jnp.where(freqs > 0, jnp.maximum(freqs, 1e-6) ** (-jnp.asarray(f_decay)[..., None] / 2.0), 0.0)
    noise = jnp.fft.irfft(spec * shaping, n=n)
    peak = jnp.max(jnp.abs(noise), axis=-1, keepdims=True)
    return (noise / jnp.maximum(peak, 1e-9)).astype(jnp.float32)


def add_noise_at_snr(key, x, noise, min_snr_db, max_snr_db):
    """Add noise to x at a random per-example SNR (x is the signal):
    noise scaled so snr = rms(x)/rms(noise) in dB."""
    snr = jax.random.uniform(key, (x.shape[0], 1), minval=min_snr_db, maxval=max_snr_db)
    x_rms = jnp.sqrt(jnp.mean(x ** 2, axis=-1, keepdims=True) + 1e-9)
    n_rms = jnp.sqrt(jnp.mean(noise ** 2, axis=-1, keepdims=True) + 1e-9)
    scale = x_rms / (n_rms * 10.0 ** (snr / 20.0))
    return x + scale * noise


def mix_at_snr(bg, fg, snr_db):
    """Batched foreground/background mix at target SNR (the reference's
    per-clip mix_clip, data.py:491-497, as one device program): fg is scaled
    by 10^(snr/20) * ||bg|| / ||fg||, added, and the sum halved.

    Args:
        bg: (B, N) float32 background rows.
        fg: (B, N) float32 foreground rows, already zero-placed at their
            start offsets (zero padding leaves the norms unchanged).
        snr_db: (B,) per-row target SNR in dB.
    Returns:
        (B, N) float32 mixed audio.
    """
    bg = jnp.asarray(bg, jnp.float32)
    fg = jnp.asarray(fg, jnp.float32)
    bg_rms = jnp.linalg.norm(bg, axis=-1)
    fg_rms = jnp.maximum(jnp.linalg.norm(fg, axis=-1), 1e-9)
    scale = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 20.0) * bg_rms / fg_rms
    return (bg + scale[:, None] * fg) / 2.0


@spectral_op
def reverberate(x, rir, rescale_amp="avg"):
    """FFT convolution with an RIR, shifted to the RIR's direct path and
    rescaled to the input's average amplitude (speechbrain semantics used at
    reference data.py:692-694). ``rir`` may be one (L,) response shared by
    the batch or per-example (B, L) responses (per-example peak
    normalization and direct-path alignment)."""
    n = x.shape[-1]
    rir = rir / jnp.maximum(jnp.max(jnp.abs(rir), axis=-1, keepdims=True), 1e-9)
    direct = jnp.argmax(jnp.abs(rir), axis=-1)       # () shared or (B,)
    m = n + rir.shape[-1] - 1
    X = jnp.fft.rfft(x, n=m)
    H = jnp.fft.rfft(rir, n=m)
    y = jnp.fft.irfft(X * H, n=m)
    if direct.ndim == 0:
        y = jax.lax.dynamic_slice_in_dim(y, direct, n, axis=-1)
    else:
        y = jax.vmap(lambda row, d: jax.lax.dynamic_slice_in_dim(row, d, n))(
            y, jnp.broadcast_to(direct, y.shape[:-1]))
    if rescale_amp == "avg":
        amp_in = jnp.mean(jnp.abs(x), axis=-1, keepdims=True)
        amp_out = jnp.mean(jnp.abs(y), axis=-1, keepdims=True)
        y = y * amp_in / jnp.maximum(amp_out, 1e-9)
    return y.astype(x.dtype)


def _overlap_add(frames, hop, n_out, window_sq):
    """(B, T, n_fft) windowed frames -> (B, n_out) with window-power
    normalization (COLA)."""
    t, n_fft = frames.shape[-2], frames.shape[-1]
    out = jnp.zeros(frames.shape[:-2] + (n_out,), frames.dtype)
    norm = jnp.zeros((n_out,), jnp.float32)

    def body(carry, i):
        out, norm = carry
        out = jax.lax.dynamic_update_slice_in_dim(
            out, jax.lax.dynamic_slice_in_dim(out, i * hop, n_fft, axis=-1)
            + frames[..., i, :], i * hop, axis=-1)
        norm = jax.lax.dynamic_update_slice_in_dim(
            norm, jax.lax.dynamic_slice_in_dim(norm, i * hop, n_fft, axis=-1)
            + window_sq, i * hop, axis=-1)
        return (out, norm), None

    (out, norm), _ = jax.lax.scan(body, (out, norm), jnp.arange(t))
    return out / jnp.maximum(norm, 1e-6)


@spectral_op
def pitch_shift(key, x, min_semitones=-3.0, max_semitones=3.0,
                n_fft=1024, hop=256):
    """Batch pitch shift: phase-vocoder time stretch, then resample back --
    the same algorithm family as the reference's torch_audiomentations
    PitchShift (torch-pitch-shift stretches with a vocoder then resamples).
    One shift per batch (its 'per_batch' mode, reference data.py:632-639).

    For a shift of ``semis`` semitones: the vocoder advances its analysis
    position ``rate = 2^(-semis/12)`` input frames per synthesis frame
    (fractional positions: magnitudes linearly interpolated, phases
    propagated from the princarg-corrected instantaneous frequency), which
    stretches the audio to ``n/rate`` samples at unchanged pitch; linear
    resampling at read step ``1/rate`` then restores length ``n`` while
    scaling every frequency by ``2^(semis/12)``.

    Shapes are static: the synthesis frame count covers the largest
    configured stretch, and the resample clamps within the synthesized
    span (<= ``n_fft`` trailing samples repeat at the extreme shift).
    """
    semis = jax.random.uniform(key, (), minval=min_semitones, maxval=max_semitones)
    rate = 2.0 ** (-semis / 12.0)          # analysis frames per synthesis frame
    n = x.shape[-1]
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    t_in = (n - n_fft) // hop + 1
    if t_in < 2:
        # the vocoder interpolates between analysis frames; 0 frames would
        # silently return zeros and 1 frame indexes an empty phase-delta axis
        raise ValueError(f"pitch_shift needs at least {n_fft + hop} samples "
                         f"(2 analysis frames); got {n}")
    idx = np.arange(t_in)[:, None] * hop + np.arange(n_fft)[None, :]
    spec = jnp.fft.rfft(x[..., idx] * window, axis=-1)          # (B, T, F)
    mag, phase = jnp.abs(spec), jnp.angle(spec)

    # static synthesis frame count: enough for the slowest configured rate
    rate_min = 2.0 ** (-max(abs(float(min_semitones)), abs(float(max_semitones))) / 12.0)
    t_syn = int(np.ceil((t_in - 1) / rate_min)) + 1
    pos = jnp.arange(t_syn) * rate                               # fractional input frame
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t_in - 1)
    hi = jnp.clip(lo + 1, 0, t_in - 1)
    w = (pos - lo)[:, None].astype(jnp.float32)
    mag_t = mag[..., lo, :] * (1 - w) + mag[..., hi, :] * w      # (B, T', F)

    # per-bin phase advance at each analysis position: expected advance
    # omega plus the princarg-wrapped deviation measured between the
    # neighboring input frames (the bin's instantaneous frequency)
    omega = jnp.asarray(2.0 * np.pi * np.arange(n_fft // 2 + 1) * hop / n_fft,
                        jnp.float32)
    dphi = phase[..., 1:, :] - phase[..., :-1, :] - omega        # (B, T-1, F)
    dphi = dphi - 2.0 * np.pi * jnp.round(dphi / (2.0 * np.pi))
    inc = omega + dphi[..., jnp.clip(lo, 0, t_in - 2), :]        # (B, T', F)

    # synthesis phase: first frame keeps its measured phase, then the
    # increments accumulate (exclusive cumulative sum)
    acc = phase[..., :1, :] + jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(inc[..., :1, :]), inc[..., :-1, :]],
                        axis=-2), axis=-2)
    frames_out = jnp.fft.irfft(mag_t * jnp.exp(1j * acc), n=n_fft, axis=-1) * window
    n_stretch = (t_syn - 1) * hop + n_fft
    y = _overlap_add(frames_out, hop, n_stretch, window ** 2)    # (B, n_stretch)

    # resample: output sample i reads stretched position i/rate, undoing the
    # duration change and scaling pitch by 2^(semis/12)
    src = jnp.arange(n) / rate
    lo_s = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_stretch - 1)
    hi_s = jnp.clip(lo_s + 1, 0, n_stretch - 1)
    ws = (src - lo_s).astype(jnp.float32)
    out = y[..., lo_s] * (1 - ws) + y[..., hi_s] * ws
    return out.astype(x.dtype)

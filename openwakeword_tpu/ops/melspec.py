"""TPU-native log-mel spectrogram frontend.

Re-implements, in pure JAX, the numerics of the reference's frozen
``melspectrogram.onnx`` graph (a torchlibrosa export -- see reference
``notebooks/converting_google_speech_embedding_model.ipynb`` cell 15 and
``openwakeword/utils.py:180-208``):

    STFT:  win_length=400 (25 ms), hop=160 (10 ms), n_fft=512, center=False,
           periodic Hann window zero-padded (centered) to 512, power=2
    Mel:   32 slaney-normalized triangular filters, 60-3800 Hz, htk=False
    dB:    10*log10(clamp(mel, 1e-10)) - 10*log10(max(1e-10, ref=1.0)),
           then clamp(min = max - top_db(=80)) where the max is taken over the
           whole per-example spectrogram (data-dependent!).
    Affine: spec/10 + 2 applied downstream (reference utils.py:180).

Design notes (TPU-first):
  * The STFT is expressed as one (T, 512) x (512, 514) matmul against a
    combined cos/-sin DFT basis rather than an FFT: at streaming shapes
    (8 frames) and at multi-stream batch shapes ((S*8, 512)) this maps
    straight onto the MXU and fuses with the (257, 32) mel projection.
  * Everything is static-shape and jit/vmap/pjit friendly: frame counts are
    derived from the (static) input length.
  * Inputs are *raw int16-range* float32 values, NOT normalized to [-1, 1]
    (reference utils.py:194-199 feeds raw PCM values to the graph).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from openwakeword_tpu import config


# ---------------------------------------------------------------------------
# Constant factories (host-side, float64 precision, cached)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def hann_window(win_length: int = config.WIN_LENGTH, n_fft: int = config.N_FFT):
    """Periodic Hann window of ``win_length``, zero-padded (centered) to ``n_fft``.

    Matches scipy.signal.get_window('hann', win_length, fftbins=True) followed
    by librosa-style pad_center, which is what torchlibrosa bakes into its conv
    weights.
    """
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    pad_left = (n_fft - win_length) // 2
    full = np.zeros(n_fft, dtype=np.float64)
    full[pad_left:pad_left + win_length] = w
    return full


def _hz_to_mel_slaney(freqs):
    """Slaney-style (librosa default, htk=False) Hz -> mel."""
    freqs = np.asarray(freqs, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freqs / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freqs >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freqs, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filterbank(sr: int = config.SAMPLE_RATE,
                   n_fft: int = config.N_FFT,
                   n_mels: int = config.N_MELS,
                   fmin: float = config.FMIN,
                   fmax: float = config.FMAX):
    """Slaney-normalized triangular mel filterbank, shape (n_fft//2+1, n_mels).

    Equivalent to librosa.filters.mel(..., htk=False, norm='slaney').T, which
    is the matrix torchlibrosa registers (LogmelFilterBank.melW).
    """
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_f = _mel_to_hz_slaney(np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.T  # (n_freqs, n_mels)


@functools.lru_cache(maxsize=None)
def stft_power_basis(n_fft: int = config.N_FFT,
                     win_length: int = config.WIN_LENGTH):
    """Windowed real-DFT basis, shape (n_fft, 2*(n_fft//2+1)).

    Column 2k holds window*cos(2*pi*k*n/n_fft), column 2k+1 holds
    window*(-sin(...)); a frame matmul against this basis yields interleaved
    (real, imag) spectra so |X|^2 = basis_out[..., 0::2]^2 + [..., 1::2]^2.
    Expressing the STFT as a single matmul keeps it on the MXU.
    """
    n_freqs = 1 + n_fft // 2
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    angles = 2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, n_freqs)
    w = hann_window(win_length, n_fft)[:, None]
    basis = np.empty((n_fft, 2 * n_freqs), dtype=np.float64)
    basis[:, 0::2] = w * np.cos(angles)
    basis[:, 1::2] = w * -np.sin(angles)
    return basis


RADIX = 4  # factored-DFT branch count (512 = 4 * 128: K=128 is MXU-exact)


@functools.lru_cache(maxsize=None)
def factored_dft_bases(n_fft: int = config.N_FFT,
                       win_length: int = config.WIN_LENGTH):
    """Stage-1 bases of the radix-4 factored DFT, shape (4, n_fft//4, 2*(n_fft//4)).

    Decimation n = 4a + b splits the length-512 windowed DFT into four
    length-128 sub-DFTs plus a constant radix-4 butterfly:

        X[128c + d] = sum_b e^{-2pi i bc/4} * Z[b, d]
        Z[b, d]     = sum_a x[4a + b] * w[4a + b] * e^{-2pi i ad/128}
                                                  * e^{-2pi i bd/512}

    Both the Hann window and the (b, d) twiddle fold into the per-branch
    basis ``B_b[a, d]``, so stage 1 is four (T, 128) x (128, 256) matmuls —
    K = 128 contractions that map exactly onto the MXU (the direct
    (512, 514) basis pads its 514 output columns to 640 lanes; this form
    does ~2.5x fewer padded MACs). Column 2d holds Re, 2d+1 holds -Im
    (matching stft_power_basis' interleave convention). The butterfly that
    completes X from Z is pure adds/subs (see _factored_power).
    """
    assert n_fft % RADIX == 0
    m = n_fft // RADIX                      # 128 sub-DFT length / output bins
    w = hann_window(win_length, n_fft)      # (512,) float64
    a = np.arange(m, dtype=np.float64)
    d = np.arange(m, dtype=np.float64)
    bases = np.empty((RADIX, m, 2 * m), dtype=np.float64)
    for b in range(RADIX):
        ang = 2.0 * np.pi * (np.outer(a, d) / m + b * d[None, :] / n_fft)
        wb = w[b::RADIX][:, None]           # window samples of branch b
        bases[b, :, 0::2] = wb * np.cos(ang)
        bases[b, :, 1::2] = wb * -np.sin(ang)
    return bases


def deinterleave_branches(frames: jnp.ndarray) -> jnp.ndarray:
    """(..., n_fft) frames -> (..., RADIX, n_fft//RADIX) branch slices
    (branch b = samples b::RADIX), the stage-1 operand layout."""
    n = frames.shape[-1]
    return jnp.swapaxes(frames.reshape(frames.shape[:-1] + (n // RADIX, RADIX)),
                        -1, -2)


def _factored_power(z: jnp.ndarray) -> jnp.ndarray:
    """Radix-4 butterfly + |X|^2 for the one-sided spectrum.

    ``z``: (..., 4, 2*m) interleaved per-branch sub-spectra — column 2d is
    Re(Z_b[d]), column 2d+1 is Im(Z_b[d]) (the -sin basis column of a
    e^{-i ang} kernel IS the imaginary part, same convention as
    stft_power_basis). Returns (..., n_fft//2 + 1) power. Only c = 0, 1 and
    the single c = 2, d = 0 bin (k = 256) are needed for k in [0, 256]:

        c=0: X[d]     = Z0 + Z1 + Z2 + Z3
        c=1: X[128+d] = (Z0 - Z2) - i(Z1 - Z3)
        k=256:        = (Z0 + Z2) - (Z1 + Z3) at d = 0
    """
    re, im = z[..., 0::2], z[..., 1::2]
    e_re, e_im = re[..., 0, :] + re[..., 2, :], im[..., 0, :] + im[..., 2, :]
    o_re, o_im = re[..., 1, :] + re[..., 3, :], im[..., 1, :] + im[..., 3, :]
    # c = 0: straight sum
    p0 = (e_re + o_re) ** 2 + (e_im + o_im) ** 2
    # c = 1: D - iF with D = Z0 - Z2, F = Z1 - Z3:
    #   Re = D_re + F_im,  Im = D_im - F_re
    d_re, d_im = re[..., 0, :] - re[..., 2, :], im[..., 0, :] - im[..., 2, :]
    f_re, f_im = re[..., 1, :] - re[..., 3, :], im[..., 1, :] - im[..., 3, :]
    p1 = (d_re + f_im) ** 2 + (d_im - f_re) ** 2
    # k = 256: even - odd at d = 0
    p2 = ((e_re - o_re) ** 2 + (e_im - o_im) ** 2)[..., :1]
    return jnp.concatenate([p0, p1, p2], axis=-1)


def _f32(x):
    return jnp.asarray(np.asarray(x, dtype=np.float32))


# ---------------------------------------------------------------------------
# JAX ops
# ---------------------------------------------------------------------------

def num_frames(n_samples: int,
               n_fft: int = config.N_FFT,
               hop: int = config.HOP_LENGTH) -> int:
    """Frame count for center=False STFT (reference utils.py:270 computes
    the same value as ceil(n/160 - 3) for hop-aligned inputs)."""
    if n_samples < n_fft:
        return 0
    return (n_samples - n_fft) // hop + 1


def frame_signal(x: jnp.ndarray,
                 n_fft: int = config.N_FFT,
                 hop: int = config.HOP_LENGTH) -> jnp.ndarray:
    """Slice (..., N) audio into (..., T, n_fft) frames, center=False.

    Implemented as ``ceil(n_fft/hop)`` contiguous slice+reshape segments
    concatenated along the frame axis instead of one overlapping-window
    gather: frame k's segment j is samples ``k*hop + [j*hop, j*hop+w_j)``,
    which for every k is a plain stride-``hop`` reshape of a contiguous
    slice. TPU gathers materialize through scattered loads; the slice form
    is pure layout work XLA fuses into the downstream DFT matmul. Measured
    (pipelined dispatch, 4096 streams x 50 frames, precision 'high'): full
    engine step 0.2033 -> 0.1792 s, +13% end-to-end (PERF_NOTES.md).
    """
    n = x.shape[-1]
    t = num_frames(n, n_fft, hop)
    if t <= 0:
        raise ValueError(f"Input of {n} samples is shorter than one {n_fft}-sample STFT frame")
    lead = x.shape[:-1]
    if hop > n_fft:
        # non-overlapping frames with gaps: the segment construction below
        # assumes hop <= n_fft, and there is no traffic win to chase (each
        # sample is read at most once) — plain gather
        idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
        return x[..., idx]
    span = (t - 1) * hop + n_fft
    y = x[..., :span]
    parts = []
    for j in range(-(-n_fft // hop)):
        w = min(hop, n_fft - j * hop)
        # start so the slice length is exactly t*hop; for a partial last
        # segment shift left by (hop - w) and drop those columns post-reshape
        s = j * hop - (hop - w)
        seg = y[..., s:s + t * hop].reshape(lead + (t, hop))
        parts.append(seg if w == hop else seg[..., hop - w:])
    return jnp.concatenate(parts, axis=-1)


def power_to_db(mel: jnp.ndarray,
                amin: float = config.MEL_AMIN,
                ref: float = config.MEL_REF,
                top_db: float = config.MEL_TOP_DB) -> jnp.ndarray:
    """librosa-style power_to_db exactly as baked into the reference export
    (conversion notebook cell 15): the top_db floor is data-dependent, taken
    over each example's full (T, n_mels) spectrogram."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    log_spec = log_spec - 10.0 * np.log10(max(amin, ref))
    if top_db is not None:
        peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def melspectrogram(x: jnp.ndarray,
                   apply_transform: bool = True,
                   top_db: float = config.MEL_TOP_DB,
                   compute_dtype=jnp.float32,
                   precision=None,
                   dft: str = "direct") -> jnp.ndarray:
    """Log-mel spectrogram of raw int16-range audio, shape (..., T, 32).

    With ``apply_transform`` the downstream affine spec/10 + 2 (reference
    utils.py:180) is fused in, i.e. this returns exactly what the reference's
    ``AudioFeatures._get_melspectrogram`` returns.

    ``compute_dtype=jnp.bfloat16`` runs the DFT/mel matmuls in bf16 with f32
    accumulation (~0.4% relative power error -> ~0.02 dB; the serving-speed
    path). float32 uses HIGHEST precision for exact parity.

    ``dft='factored'`` computes the spectrum via the radix-4 factored DFT
    (factored_dft_bases): ~2.5x fewer padded MACs at equal-or-better
    rounding (K = 128 accumulation chains instead of 512). f32-rounding
    equivalent to 'direct', not bit-equal — parity paths keep 'direct'.
    """
    bf16 = compute_dtype == jnp.bfloat16
    prec = precision if precision is not None \
        else (None if bf16 else jax.lax.Precision.HIGHEST)
    x = x.astype(jnp.float32)
    frames = frame_signal(x).astype(compute_dtype)             # (..., T, 512)
    if dft == "factored":
        branches = deinterleave_branches(frames)               # (..., T, 4, 128)
        bases = _f32(factored_dft_bases()).astype(compute_dtype)  # (4, 128, 256)
        z = jnp.einsum("...ba,bad->...bd", branches, bases,
                       precision=prec, preferred_element_type=jnp.float32)
        power = _factored_power(z)                             # (..., T, 257)
    elif dft == "direct":
        basis = _f32(stft_power_basis()).astype(compute_dtype)  # (512, 514)
        spec = jnp.matmul(frames, basis, precision=prec,
                          preferred_element_type=jnp.float32)
        power = spec[..., 0::2] ** 2 + spec[..., 1::2] ** 2    # (..., T, 257)
    else:
        raise ValueError(f"unknown dft mode {dft!r} (expected 'direct' or 'factored')")
    melw = _f32(mel_filterbank())                              # (257, 32)
    mel = jnp.matmul(power, melw, precision=jax.lax.Precision.HIGHEST)
    out = power_to_db(mel, top_db=top_db)
    if apply_transform:
        out = out * config.MEL_TRANSFORM_SCALE + config.MEL_TRANSFORM_SHIFT
    return out


def log_mel_features(x: jnp.ndarray) -> jnp.ndarray:
    """Alias for the fully-transformed mel features fed to the embedding CNN."""
    return melspectrogram(x, apply_transform=True)

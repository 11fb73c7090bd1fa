"""Batched on-device noise suppression for the multi-stream engine.

Same algorithm and numerics as the native host-side suppressor
(native/ns.cpp — itself the TPU build's equivalent of the SpeexDSP
preprocessor the reference binds, reference model.py:200-205, 481-504):
50%-overlap sqrt-Hann analysis/synthesis, per-bin smoothed power,
minimum-statistics noise-floor tracking, Wiener-style gain with a spectral
floor, overlap-add resynthesis — but expressed as batched XLA ops with a
leading stream axis, so suppression runs inside the fused engine step for
every stream at once instead of one 10 ms frame at a time on the host.
The DFT is a table matmul (W=320, K=161): exactly the MXU-friendly shape
the mel frontend already uses.

Per-stream state: previous input frame, synthesis overlap tail, smoothed
PSD, tracked noise floor, and a frame counter (drives the 20-frame warmup
adaptation). All fixed-shape; carried in the engine's StreamState pytree.
"""

import numpy as np
import jax
import jax.numpy as jnp

FRAME = 160          # 10 ms at 16 kHz (native ns.cpp frame contract)
WIN = 2 * FRAME      # 50% overlap analysis window
BINS = FRAME + 1     # real-DFT bins

NOISE_RISE = 1.0020  # slow multiplicative noise-floor rise (~ +0.9 dB/s)
GAIN_FLOOR = 0.18    # max attenuation ~ -15 dB
OVER_SUB = 1.4       # over-subtraction factor
PSD_ALPHA = 0.82     # power smoothing
WARMUP_FRAMES = 20   # fast initial noise adaptation window

# ---- 'mmse' profile constants (the SpeexDSP preprocessor's algorithm
# family: Ephraim-Malah MMSE-STSA gain under a decision-directed prior SNR,
# soft-weighted by a per-bin speech-presence probability — the update rules
# libspeexdsp's preprocess.c implements with fixed-point gain tables; here
# they are evaluated exactly in float via scaled Bessel functions).
# Divergence from libspeexdsp is therefore its fixed-point tables and its
# frequency-dependent speech-absence prior (qcurve), not the update rules.
DD_ALPHA = 0.98      # decision-directed prior-SNR smoothing (E&M 1984)
SNR_CEIL = 100.0     # prior/post SNR clamp (Speex clamps to ~100 = 20 dB)
Q_ABSENCE = 0.3      # prior probability of speech absence (Speex qcurve mid)


def _tables():
    """sqrt-Hann window and DFT cos/sin tables, identical to the native
    library's (ns.cpp owwns_create). Returned as numpy constants (embedded
    into each jitted program at trace time — a cached jnp array populated
    inside a trace would leak that trace's tracers)."""
    n = np.arange(WIN)
    window = np.sqrt(0.5 - 0.5 * np.cos(2.0 * np.pi * n / WIN)).astype(np.float32)
    k = np.arange(BINS)
    ang = 2.0 * np.pi * np.outer(n, k) / WIN                  # (WIN, BINS)
    return (window,
            np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


_WINDOW, _COS_TAB, _SIN_TAB = _tables()


def init_state(n_streams: int, profile: str = "spectral"):
    """Fresh per-stream suppressor state (ns.cpp owwns_create init values).
    The 'mmse' profile carries one extra leaf: the previous frame's clean-
    speech power estimate (decision-directed prior SNR numerator)."""
    if profile not in ("spectral", "mmse"):
        raise ValueError(f"unknown NS profile {profile!r}; "
                         "expected 'spectral' or 'mmse'")
    S = n_streams
    state = {
        "prev_in": jnp.zeros((S, FRAME), jnp.float32),
        "overlap": jnp.zeros((S, FRAME), jnp.float32),
        "psd": jnp.zeros((S, BINS), jnp.float32),
        "noise": jnp.full((S, BINS), 1e6, jnp.float32),   # start high, adapt down
        "frames_seen": jnp.zeros((S,), jnp.int32),
    }
    if profile == "mmse":
        state["prev_amp2"] = jnp.zeros((S, BINS), jnp.float32)
    return state


def _mmse_gain(p, psd, noise, prev_amp2):
    """Speex-family MMSE gain for one frame.

    Args:
        p: (S, BINS) instantaneous power |X|^2.
        psd: smoothed power (drives the speech-presence prior like Speex's
            smoothed post SNR).
        noise: tracked noise floor.
        prev_amp2: previous clean-speech power estimate (A_{t-1}^2).
    Returns:
        (gain, amp2'): amplitude-domain gain in [GAIN_FLOOR, 1] and the
        updated clean-speech power estimate.
    """
    from jax.scipy.special import i0e, i1e

    nz = jnp.maximum(noise, 1e-10)
    gamma = jnp.clip(p / nz, 1e-6, SNR_CEIL)                 # post SNR
    # decision-directed prior SNR (Ephraim & Malah 1984, eq. 51)
    xi = jnp.clip(DD_ALPHA * prev_amp2 / nz
                  + (1.0 - DD_ALPHA) * jnp.maximum(gamma - 1.0, 0.0),
                  1e-6, SNR_CEIL)
    v = xi / (1.0 + xi) * gamma
    # MMSE-STSA amplitude gain (E&M 1984, eq. 7), evaluated with
    # exponentially-scaled Bessels: exp(-v/2)*I_n(v/2) = i_ne(v/2), so the
    # exp(-v/2) factor cancels exactly and nothing overflows at large v
    g = (jnp.sqrt(jnp.pi * v) / (2.0 * gamma)) * (
        (1.0 + v) * i0e(v / 2.0) + v * i1e(v / 2.0))
    g = jnp.clip(g, 1e-6, 1.0)
    # speech-presence probability under the smoothed-SNR prior; soft-weight
    # the gain OM-LSA style (Speex applies its probability the same way,
    # blending toward the floor where speech is unlikely)
    gamma_s = jnp.clip(psd / nz, 1e-6, SNR_CEIL)
    v_s = xi / (1.0 + xi) * gamma_s
    odds = (Q_ABSENCE / (1.0 - Q_ABSENCE)) * (1.0 + xi) \
        * jnp.exp(-jnp.minimum(v_s, 50.0))
    p_speech = 1.0 / (1.0 + odds)
    g = jnp.exp(p_speech * jnp.log(g)
                + (1.0 - p_speech) * jnp.log(jnp.float32(GAIN_FLOOR)))
    g = jnp.clip(g, GAIN_FLOOR, 1.0)
    return g, (g * g) * p


def step(state, frame, precision=jax.lax.Precision.HIGHEST,
         profile: str = "spectral"):
    """Suppress one (S, 160) float32 frame of int16-range PCM.

    ``profile='spectral'`` (default) is the native library's Wiener-style
    spectral subtraction (ns.cpp twin, <=1 LSB apart). ``profile='mmse'``
    swaps only the gain rule for the SpeexDSP preprocessor's MMSE-STSA /
    decision-directed / speech-probability update rules (_mmse_gain);
    analysis, noise tracking, and synthesis are shared.

    Returns (state', (S, 160) suppressed samples, rounded and clipped to the
    int16 grid like the native path's output short cast).
    """
    window, cos_tab, sin_tab = _WINDOW, _COS_TAB, _SIN_TAB

    buf = jnp.concatenate([state["prev_in"] * window[:FRAME],
                           frame * window[FRAME:]], axis=-1)        # (S, 320)
    re = jnp.dot(buf, cos_tab, precision=precision)                 # (S, 161)
    im = -jnp.dot(buf, sin_tab, precision=precision)

    # Clamp once past warmup: an int32 counter would wrap negative after
    # ~2^31 frames (~248 days of continuous audio) and re-trigger the
    # warmup branch, dropping the tracked noise floor on long-lived streams.
    frames_seen = jnp.minimum(state["frames_seen"] + 1, WARMUP_FRAMES + 1)
    warmup = (frames_seen <= WARMUP_FRAMES)[:, None]                # (S, 1)

    p = re * re + im * im
    psd = PSD_ALPHA * state["psd"] + (1.0 - PSD_ALPHA) * p
    noise_warm = jnp.minimum(0.7 * state["noise"] + 0.3 * psd, psd)
    noise_run = jnp.where(psd < state["noise"], psd, state["noise"] * NOISE_RISE)
    noise = jnp.where(warmup, noise_warm, noise_run)

    if profile == "mmse":
        g, amp2 = _mmse_gain(p, psd, noise, state["prev_amp2"])
    else:
        g = jnp.where(psd > 1e-12, (psd - OVER_SUB * noise) / psd, 0.0)
        g = jnp.clip(g, GAIN_FLOOR, 1.0)
    re = re * g
    im = im * g

    # inverse real DFT with conjugate-symmetry weights (1 at DC/Nyquist)
    wk = jnp.concatenate([jnp.ones(1), jnp.full(BINS - 2, 2.0), jnp.ones(1)]
                         ).astype(jnp.float32)
    synth = (jnp.dot(re * wk, cos_tab.T, precision=precision)
             - jnp.dot(im * wk, sin_tab.T, precision=precision))    # (S, 320)
    synth = synth * (window / WIN)

    out = jnp.clip(jnp.round(synth[:, :FRAME] + state["overlap"]),
                   -32768.0, 32767.0)
    new_state = {
        "prev_in": frame,
        "overlap": synth[:, FRAME:],
        "psd": psd,
        "noise": noise,
        "frames_seen": frames_seen,
    }
    if profile == "mmse":
        new_state["prev_amp2"] = amp2
    return new_state, out


def process_chunk(state, chunk, precision=jax.lax.Precision.HIGHEST,
                  profile: str = "spectral"):
    """Suppress a (S, k*160) chunk frame by frame (the engine's 1280-sample
    step = 8 suppressor frames). Returns (state', suppressed chunk)."""
    S, n = chunk.shape
    if n % FRAME:
        raise ValueError(f"NS chunk length {n} is not a multiple of {FRAME}")
    frames = chunk.reshape(S, n // FRAME, FRAME)

    def body(st, fr):
        st, out = step(st, fr, precision=precision, profile=profile)
        return st, out

    state, outs = jax.lax.scan(body, state, jnp.swapaxes(frames, 0, 1))
    return state, jnp.swapaxes(outs, 0, 1).reshape(S, n)

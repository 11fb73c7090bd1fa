"""Spectral-op portability shim.

The axon TPU backend in this environment lowers NO fft op and no complex
exp (probed 2026-08-17: `jnp.fft.rfft` itself raises UNIMPLEMENTED), so
every FFT-based augmentation (RIR reverb, EQ/band-stop cascades, colored
noise, the phase vocoder) would crash when the default platform is that
TPU. These ops are *eager host-pipeline* calls (data augmentation), never
traced inside the engine's jitted programs, so the portable answer is to
run them on the always-present CPU backend when the default backend cannot
lower them — one probe per process, zero cost on backends with FFT support
(every CPU/GPU and standard TPU runtime).

Usage: decorate the spectral function with @spectral_op. Array inputs are
materialized to host numpy (all real-valued), the body executes under
``jax.default_device(cpu)``, and the result returns as numpy so downstream
code can feed any backend.
"""

import functools
import logging
import os
import subprocess
import sys

import numpy as np
import jax

_FFT_OK = None


def device_fft_ok() -> bool:
    """True when the default backend can lower a complex FFT (probed once).

    The probe runs in a SUBPROCESS: a failed FFT lowering on the axon
    backend leaves the in-process runtime client unusable (subsequent
    device_puts raise UNIMPLEMENTED too), so the failure must never happen
    in the calling process. CPU always supports FFT and skips the probe.
    """
    global _FFT_OK
    if _FFT_OK is None:
        forced = os.environ.get("OWWT_FFT_OK")
        if forced is not None:
            # explicit override: skip probing entirely (useful on backends
            # where a probe subprocess would contend with this process for
            # a single-tenant device tunnel)
            _FFT_OK = forced not in ("0", "no", "false")
            return _FFT_OK
        if jax.default_backend() == "cpu":
            _FFT_OK = True
            return True
        # probing costs minutes on tunneled backends — cache per machine
        import tempfile
        marker = os.path.join(tempfile.gettempdir(),
                              f"owwt_fft_probe_{jax.default_backend()}")
        if os.path.exists(marker):
            with open(marker) as f:
                _FFT_OK = f.read().strip() == "ok"
            return _FFT_OK
        code = ("import jax, jax.numpy as jnp, numpy as np; "
                "np.asarray(jax.jit(jnp.fft.rfft)(jnp.zeros(16, jnp.float32)))")
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=120)
            _FFT_OK = r.returncode == 0
        except subprocess.TimeoutExpired:
            # a hung probe usually means the probe subprocess could not
            # attach to a single-tenant device this process already holds —
            # that says nothing about FFT support, so fall back to CPU for
            # THIS process only and leave the per-machine cache unwritten
            logging.warning(
                "FFT-capability probe timed out (device busy?); running "
                "spectral augmentations on the CPU backend for this "
                "process. Set OWWT_FFT_OK=1/0 to skip the probe.")
            _FFT_OK = False
            return False
        except Exception:
            _FFT_OK = False
        try:
            with open(marker, "w") as f:
                f.write("ok" if _FFT_OK else "no")
        except OSError:
            pass
        if not _FFT_OK:
            logging.info(
                "Default %s backend cannot lower FFT ops; spectral "
                "augmentations will run on the CPU backend.",
                jax.default_backend())
    return _FFT_OK


def host_key(seed: int) -> np.ndarray:
    """A threefry PRNGKey as a plain numpy array ([hi, lo] uint32 — the
    exact layout jax.random.PRNGKey produces), built WITHOUT touching the
    default device. On the axon backend a device-resident uint32 key cannot
    be fetched back (the transfer hangs), so key material used by spectral
    fallbacks must start — and stay — on the host."""
    seed = int(seed)
    return np.array([(seed >> 32) & 0xffffffff, seed & 0xffffffff],
                    dtype=np.uint32)


def host_split(key, num: int = 2) -> np.ndarray:
    """Split a threefry key on the CPU backend, returning numpy key material.

    Host-pipeline code (augment_clips) must split keys HERE rather than with
    a bare ``jax.random.split``: that would place the resulting raw uint32
    keys on the default device, and when a @spectral_op fallback later
    materializes its arguments, the device uint32 fetch hangs on the axon
    backend (see host_key)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return np.asarray(jax.random.split(np.asarray(key), num))


def spectral_op(fn):
    """Run ``fn`` on the CPU backend when the default backend lacks FFT."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if device_fft_ok():
            return fn(*args, **kwargs)
        cpu = jax.devices("cpu")[0]
        host = jax.tree.map(
            lambda t: np.asarray(t) if isinstance(t, jax.Array)
            and not jax.dtypes.issubdtype(t.dtype, jax.dtypes.prng_key) else t,
            (args, kwargs))
        with jax.default_device(cpu):
            out = fn(*host[0], **host[1])
        return jax.tree.map(
            lambda t: np.asarray(t) if isinstance(t, jax.Array) else t, out)
    return wrapper

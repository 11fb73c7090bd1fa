"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so the
platform must be forced back to CPU via jax.config (env vars alone are
clobbered). Sharding tests rely on the 8 virtual host devices.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache makes repeated test runs fast. It must live in
# a machine-local dir: a cache shared across hosts serves executables compiled
# for other CPUs (cpu_aot_loader feature mismatch -> subtly different numerics).
_cache_dir = os.path.join("/tmp", "owwt_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA_DIR = "/root/reference/tests/data"


@pytest.fixture(scope="session")
def test_clips():
    return {
        "alexa": os.path.join(DATA_DIR, "alexa_test.wav"),
        "hey_mycroft": os.path.join(DATA_DIR, "hey_mycroft_test.wav"),
        "hey_jane": os.path.join(DATA_DIR, "hey_jane.wav"),
    }


@pytest.fixture()
def rng():
    return np.random.default_rng(0)

"""Standalone incremental-CNN stage benchmark: NHWC conv layout vs the
stream-minor (lanes) dot_general layout, isolated from the rest of the step.

Run on real TPU (no platform override):  python benchmark/bench_cnn.py
"""

import os
import sys
import time

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from openwakeword_tpu.models import embedding as E, embedding_stream as ES

S = int(os.environ.get("BENCH_STREAMS", 4096))
T = int(os.environ.get("BENCH_FRAMES", 50))
PREC = jax.lax.Precision.HIGH


def bench(name, init_fn, step_fn):
    folded = E.fold_batchnorm(E.init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    mel0 = jnp.asarray(rng.normal(0, 1, (S, 76, 32)).astype(np.float32))
    frames = jnp.asarray(rng.normal(0, 1, (T, S, 8, 32)).astype(np.float32))

    caches, _ = jax.jit(lambda p, m: init_fn(p, m, precision=PREC))(folded, mel0)

    @jax.jit
    def scan(folded, caches, frames):
        def body(c, f):
            c2, emb = step_fn(folded, c, f, precision=PREC)
            return c2, jnp.sum(emb)
        c, sums = jax.lax.scan(body, caches, frames)
        return jax.tree.leaves(c)[0].reshape(-1)[0] + jnp.sum(sums)

    # compile + warm-up
    t0 = time.time()
    out = scan(folded, caches, frames)
    _ = float(out)          # scalar fetch = sync (axon block_until_ready no-op)
    compile_s = time.time() - t0

    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = scan(folded, caches, frames)
        _ = float(out)
        best = min(best, time.time() - t0)
    rt = S * T * 0.08 / best
    print(f"{name}: wall={best:.4f}s  compile={compile_s:.1f}s  "
          f"rt-streams={rt:,.0f}", flush=True)
    return best


def bench_pallas():
    from openwakeword_tpu.ops.cnn_pallas import CnnStepKernel
    folded = E.fold_batchnorm(E.init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    mel0 = jnp.asarray(rng.normal(0, 1, (76, 32, S)).astype(np.float32))
    frames = jnp.asarray(rng.normal(0, 1, (T, 8, 32, S)).astype(np.float32))
    k = CnnStepKernel(folded, sb=int(os.environ.get("BENCH_SB", 128)),
                      precision=os.environ.get("BENCH_KPREC", "high"))
    caches, _ = k.prime(mel0)

    @jax.jit
    def scan(caches, frames):
        def body(c, f):
            c2, emb = k.step(c, f)
            return c2, jnp.sum(emb)
        c, sums = jax.lax.scan(body, caches, frames)
        return jax.tree.leaves(c)[0].reshape(-1)[0] + jnp.sum(sums)

    t0 = time.time()
    out = scan(caches, frames)
    _ = float(out)
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = scan(caches, frames)
        _ = float(out)
        best = min(best, time.time() - t0)
    rt = S * T * 0.08 / best
    print(f"pallas kernel : wall={best:.4f}s  compile={compile_s:.1f}s  "
          f"rt-streams={rt:,.0f}", flush=True)
    return best


if __name__ == "__main__":
    import os
    print(f"devices: {jax.devices()}  S={S} T={T}", flush=True)
    which = os.environ.get("BENCH_WHICH", "all")
    t_nhwc = bench("nhwc lax.conv ", ES.init_caches, ES.step) \
        if which in ("all", "nhwc") else None
    if which in ("all", "lanes"):
        bench("stream-minor  ", ES.init_caches_t, ES.step_t)
    if which in ("all", "pallas"):
        t_p = bench_pallas()
        if t_nhwc:
            print(f"pallas speedup vs nhwc: {t_nhwc / t_p:.2f}x", flush=True)

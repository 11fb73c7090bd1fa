"""HeadTrainer throughput benchmark: training steps/sec on TPU.

Measures the published-config shape (reference examples/custom_model.yml:
dnn head, layer_size 128, 16x96 feature windows, ~1024-example batches)
three ways:

  (a) device-only: chained `_train_step` calls on resident data — the
      compiled-step ceiling;
  (b) end-to-end: `train_model` over an in-memory batch iterable — adds the
      per-step host->device feed;
  (c) loader-fed: `train_model` over the real `mmap_batch_generator`
      (feature memmaps on disk) — shows whether the data loader starves the
      device.

Run on real TPU:  python benchmark/bench_train.py
(JAX_PLATFORMS=cpu works for a slow smoke run.)
"""

import argparse
import os
import sys
import tempfile
import time

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=1024)
parser.add_argument("--steps", type=int, default=200)
parser.add_argument("--layer_dim", type=int, default=128)
args = parser.parse_args()


def make_batches(rng, n, batch):
    xs = rng.normal(0, 1, (n, batch, 16, 96)).astype(np.float32)
    ys = (rng.random((n, batch)) < 0.5).astype(np.float32)
    return [(xs[i], ys[i]) for i in range(n)]


def bench_device_only(trainer, batch, steps):
    """Chained jitted steps on resident data: the compiled-step ceiling.
    Queued dispatches pipeline on-device; one scalar fetch synchronizes
    (PERF_NOTES.md tunnel methodology)."""
    import jax
    import jax.numpy as jnp
    from openwakeword_tpu.training.trainer import _train_step

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, 16, 96)).astype(np.float32))
    y = jnp.asarray((rng.random(batch) < 0.5).astype(np.float32))
    params = trainer._leaf(trainer.params)
    opt_state = trainer.opt_state
    acc = {"n_acc": jnp.asarray(0, jnp.int32), "acc_steps": jnp.asarray(1, jnp.int32)}

    def sync(p):
        return float(jax.tree.leaves(p)[0].ravel()[0])

    # warm-up / compile
    params, opt_state, acc, _ = _train_step(
        params, opt_state, acc, x, y, 1.0, 1e-4, trainer._meta_items)
    sync(params)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, acc, _ = _train_step(
            params, opt_state, acc, x, y, 1.0, 1e-4, trainer._meta_items)
    sync(params)
    wall = time.perf_counter() - t0
    return steps / wall


def bench_train_model(trainer, batches, steps):
    t0 = time.perf_counter()
    trainer.train_model(X=batches, max_steps=steps, warmup_steps=steps // 5,
                        hold_steps=steps // 5, val_steps=(steps + 1,))
    return steps / (time.perf_counter() - t0)


def bench_loader_fed(trainer, batch, steps, tmpdir):
    from openwakeword_tpu.data import mmap_batch_generator
    rng = np.random.default_rng(0)
    files = {}
    for name, n_rows in (("positive", 20000), ("adversarial_negative", 20000)):
        path = os.path.join(tmpdir, f"{name}.npy")
        np.save(path, rng.normal(0, 1, (n_rows, 16, 96)).astype(np.float32))
        files[name] = path
    gen = mmap_batch_generator(
        files, n_per_class={"positive": batch // 2, "adversarial_negative": batch // 2},
        label_transform_funcs={"positive": lambda x: [1 for _ in x],
                               "adversarial_negative": lambda x: [0 for _ in x]})
    batches = (next(gen) for _ in range(steps))
    t0 = time.perf_counter()
    trainer.train_model(X=batches, max_steps=steps, warmup_steps=steps // 5,
                        hold_steps=steps // 5, val_steps=(steps + 1,))
    wall = time.perf_counter() - t0
    # host-only loader rate for the starvation comparison
    t0 = time.perf_counter()
    for _ in range(50):
        next(gen)
    loader_rate = 50 / (time.perf_counter() - t0)
    return steps / wall, loader_rate


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/owwt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from openwakeword_tpu.training.trainer import HeadTrainer

    def fresh():
        return HeadTrainer(n_classes=1, input_shape=(16, 96), model_type="dnn",
                           layer_dim=args.layer_dim)

    dev = bench_device_only(fresh(), args.batch, args.steps)
    print({"mode": "device_only", "steps_per_sec": round(dev, 1),
           "examples_per_sec": round(dev * args.batch, 0)})

    rng = np.random.default_rng(1)
    batches = make_batches(rng, min(args.steps, 64), args.batch)
    e2e = bench_train_model(fresh(), batches * (args.steps // len(batches) + 1),
                            args.steps)
    print({"mode": "train_model_inmem", "steps_per_sec": round(e2e, 1),
           "examples_per_sec": round(e2e * args.batch, 0)})

    with tempfile.TemporaryDirectory() as td:
        fed, loader = bench_loader_fed(fresh(), args.batch, args.steps, td)
    print({"mode": "train_model_mmap_loader", "steps_per_sec": round(fed, 1),
           "examples_per_sec": round(fed * args.batch, 0),
           "loader_only_batches_per_sec": round(loader, 1),
           "loader_starves_device": loader < fed})


if __name__ == "__main__":
    main()

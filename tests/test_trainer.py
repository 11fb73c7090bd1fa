"""HeadTrainer unit tests: convergence, reference training semantics, and
mid-run checkpoint/resume."""

import numpy as np
import pytest

from openwakeword_tpu.training.trainer import HeadTrainer, lr_warmup_cosine_decay


def make_gen(rng, n_steps, bs=64, sep=1.5):
    def gen():
        for _ in range(n_steps):
            y = rng.integers(0, 2, bs)
            x = rng.normal(0, 1, (bs, 16, 96)).astype(np.float32) + y[:, None, None] * sep
            yield x, y
    return gen()


def test_lr_schedule_shape():
    lrs = [lr_warmup_cosine_decay(s, warmup_steps=10, hold=20, total_steps=100,
                                  target_lr=1e-3) for s in range(100)]
    assert lrs[0] < lrs[9]                    # warmup rises
    assert abs(lrs[15] - 1e-3) < 1e-9         # hold at target
    assert lrs[99] < lrs[40]                  # cosine decays


def test_training_converges_and_snapshots(rng):
    t = HeadTrainer(layer_dim=32, seed=0)
    xv, yv = next(make_gen(rng, 1, 256))
    t.train_model(make_gen(rng, 300), max_steps=300, warmup_steps=60,
                  hold_steps=100, lr=1e-3, X_val=[(xv, yv)],
                  val_steps=list(range(50, 300, 50)))
    assert t.accuracy(t.forward(xv), yv) > 0.95
    assert len(t.best_models) >= 1
    avg = t.average_models()
    assert t.accuracy(t.forward(xv, params=avg), yv) > 0.9


def test_multiclass_training(rng):
    t = HeadTrainer(n_classes=3, input_shape=(16, 96), layer_dim=32, seed=0)

    def gen(n):
        for _ in range(n):
            y = rng.integers(0, 3, 96)
            x = rng.normal(0, 1, (96, 16, 96)).astype(np.float32)
            x += (y[:, None, None] - 1) * 2.0
            yield x, y
    xv, yv = next(gen(1))
    t.train_model(gen(300), max_steps=300, warmup_steps=30, hold_steps=100, lr=1e-3)
    preds = t.forward(xv)
    assert preds.shape == (96, 3)
    assert np.mean(np.argmax(preds, 1) == yv) > 0.8


def test_save_and_resume_state(rng, tmp_path):
    t = HeadTrainer(layer_dim=32, seed=0)
    xv, yv = next(make_gen(rng, 1, 128))
    t.train_model(make_gen(rng, 100), max_steps=100, warmup_steps=20,
                  hold_steps=30, lr=1e-3, X_val=[(xv, yv)], val_steps=[50, 99])
    path = str(tmp_path / "trainer_state.pkl")
    t.save_state(path)

    t2 = HeadTrainer(layer_dim=32, seed=1)
    t2.load_state(path)
    np.testing.assert_allclose(t2.forward(xv), t.forward(xv), atol=1e-6)
    assert t2.history["val_accuracy"] == t.history["val_accuracy"]
    assert len(t2.best_models) == len(t.best_models)
    # resumed trainer keeps training without error
    t2.train_model(make_gen(rng, 20), max_steps=20, warmup_steps=5,
                   hold_steps=5, lr=1e-4)


def test_select_best_model(rng):
    t = HeadTrainer(layer_dim=32, seed=0)
    xv, yv = next(make_gen(rng, 1, 128))
    t.train_model(make_gen(rng, 200), max_steps=200, warmup_steps=20,
                  hold_steps=50, lr=1e-3, X_val=[(xv, yv)],
                  val_steps=list(range(40, 200, 40)))
    fp_data = [(rng.normal(0, 1, (200, 16, 96)).astype(np.float32), np.zeros(200))]
    best = t._select_best_model(fp_data, val_set_hrs=1.0, max_fp_per_hour=1e9,
                                min_recall=0.0)
    assert best is not None


def test_predict_on_features_sliding_windows(rng):
    t = HeadTrainer(layer_dim=16, seed=0)
    clips = rng.normal(0, 1, (2, 30, 96)).astype(np.float32)
    preds = t.predict_on_features(clips)
    assert preds.shape[0] == 2
    # step-1 sliding windows, INCLUDING the final valid window (start =
    # frames - 16; the reference's range excludes it — documented fix)
    assert preds.shape[1] == 30 - 16 + 1
    # a clip with exactly one window's worth of frames scores one window
    one = t.predict_on_features(rng.normal(0, 1, (1, 16, 96)).astype(np.float32))
    assert one.shape[:2] == (1, 1)


def test_mesh_data_parallel_matches_single_device(rng):
    """Sharding batches over the 8-device CPU mesh must reproduce
    single-device training (pure DP: same math, XLA inserts the gradient
    all-reduce) up to f32 reassociation."""
    import jax
    from jax.sharding import Mesh

    x = rng.normal(0, 1, (20, 64, 16, 96)).astype(np.float32)
    y = rng.integers(0, 2, (20, 64))
    data = list(zip(x, y))

    t1 = HeadTrainer(layer_dim=32, seed=0)
    t1.train_model(iter(data), max_steps=20, warmup_steps=4, hold_steps=4, lr=1e-3)

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    t2 = HeadTrainer(layer_dim=32, seed=0, mesh=mesh)
    assert t2._batch_sharding is not None
    t2.train_model(iter(data), max_steps=20, warmup_steps=4, hold_steps=4, lr=1e-3)

    for k in t1.params:
        if k == "__meta__":
            continue
        for leaf in t1.params[k]:
            np.testing.assert_allclose(
                np.asarray(t1.params[k][leaf]), np.asarray(t2.params[k][leaf]),
                atol=5e-5, err_msg=f"{k}/{leaf}")


def test_mesh_rejects_indivisible_batch(rng):
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    t = HeadTrainer(layer_dim=32, seed=0, mesh=mesh)
    with pytest.raises(ValueError, match="divisible"):
        t.train_model(iter([(rng.normal(0, 1, (33, 16, 96)).astype(np.float32),
                             rng.integers(0, 2, 33))]),
                      max_steps=1, warmup_steps=0, hold_steps=0, lr=1e-3)


def test_true_accumulation_differs_from_reference_parity(rng):
    """true_accumulation sums gradients across the accumulation window; the
    default reproduces the reference's final-batch-only backward. With
    batches small enough to force accumulation the two must diverge."""
    from openwakeword_tpu.training.trainer import HeadTrainer

    def batches():
        while True:
            x = rng.normal(0, 1, (48, 16, 96)).astype(np.float32)
            y = (rng.uniform(size=48) > 0.5).astype(np.float32)
            yield x, y

    outs = []
    for flag in (False, True):
        rng_local = np.random.default_rng(0)
        def batches_seeded():
            while True:
                x = rng_local.normal(0, 1, (48, 16, 96)).astype(np.float32)
                y = (rng_local.uniform(size=48) > 0.5).astype(np.float32)
                yield x, y
        t = HeadTrainer(n_classes=1, input_shape=(16, 96), model_type="dnn",
                        layer_dim=32, seed=0)
        t.train_model(batches_seeded(), max_steps=12, warmup_steps=2,
                      hold_steps=2, lr=1e-3, true_accumulation=flag)
        outs.append(np.asarray(t.params["layer1"]["w"]))
        assert np.isfinite(outs[-1]).all()
    assert not np.allclose(outs[0], outs[1])


def test_feed_chunk_matches_per_step(rng):
    """The scanned multi-step feed (_train_scan) must be step-for-step
    identical to per-step dispatch: same final params, same loss history,
    same validation step indices."""
    x = rng.normal(0, 1, (30, 64, 16, 96)).astype(np.float32)
    y = rng.integers(0, 2, (30, 64))
    data = list(zip(x, y))
    xv, yv = data[0]

    t1 = HeadTrainer(layer_dim=32, seed=0)
    t1.train_model(iter(data), max_steps=30, warmup_steps=5, hold_steps=5,
                   lr=1e-3, X_val=[(xv, yv)], val_steps=(10, 20),
                   feed_chunk=1)
    t2 = HeadTrainer(layer_dim=32, seed=0)
    t2.train_model(iter(data), max_steps=30, warmup_steps=5, hold_steps=5,
                   lr=1e-3, X_val=[(xv, yv)], val_steps=(10, 20),
                   feed_chunk=8)

    for k in t1.params:
        if k == "__meta__":
            continue
        for leaf in t1.params[k]:
            np.testing.assert_allclose(
                np.asarray(t1.params[k][leaf]), np.asarray(t2.params[k][leaf]),
                atol=1e-6, err_msg=f"{k}/{leaf}")
    np.testing.assert_allclose(t1.history["loss"], t2.history["loss"], atol=1e-5)
    assert len(t1.history["val_accuracy"]) == len(t2.history["val_accuracy"]) == 2


def test_feed_chunk_nonuniform_batches_fall_back(rng):
    """Mixed batch sizes cannot stack: the group runs per-step and training
    still completes over every batch."""
    data = [(rng.normal(0, 1, (n, 16, 96)).astype(np.float32),
             rng.integers(0, 2, n)) for n in (32, 32, 16, 32)]
    t = HeadTrainer(layer_dim=32, seed=0)
    t.train_model(iter(data), max_steps=4, warmup_steps=1, hold_steps=1,
                  lr=1e-3, feed_chunk=4)
    # all four batches consumed (loss history flushes at loop end)
    assert len(t.history["loss"]) <= 4


def test_auto_train_neg_weight_doubling(rng):
    """The 3-sequence auto-train must actually double max_negative_weight
    between sequences while FP/hr misses the target (the reference's
    doubling never fires — its best_val_fp is never updated; ours must)."""
    t = HeadTrainer(layer_dim=16, seed=0)
    xv, yv = next(make_gen(rng, 1, 64))
    # impossible target: every sequence doubles
    t.auto_train(X_train=make_gen(rng, 10000), X_val=[(xv, yv)],
                 false_positive_val_data=[(xv, yv)], steps=30,
                 max_negative_weight=5, target_fp_per_hour=-1.0, lr=1e-3,
                 val_set_hrs=0.01)
    assert t.history["max_negative_weight"] == [5, 10, 20]


@pytest.mark.parametrize("feed_chunk", [1, 5])
def test_feed_dtype_bf16_transfer(rng, feed_chunk):
    """Compressed bf16 feed: math stays f32 on device; results track the
    f32-feed run within input-quantization tolerance but are NOT identical
    (proving the narrowed transfer actually happened). feed_chunk=1 drives
    the per-step dispatch path, 5 the scanned-chunk path (10 steps = two
    full chunks, so every batch goes through _device_chunk)."""
    import jax.numpy as jnp
    x = rng.normal(0, 1, (10, 64, 16, 96)).astype(np.float32)
    y = rng.integers(0, 2, (10, 64))
    data = list(zip(x, y))
    t1 = HeadTrainer(layer_dim=32, seed=0)
    t1.train_model(iter(data), max_steps=10, warmup_steps=2, hold_steps=2,
                   lr=1e-3, feed_chunk=feed_chunk)
    t2 = HeadTrainer(layer_dim=32, seed=0)
    t2.train_model(iter(data), max_steps=10, warmup_steps=2, hold_steps=2,
                   lr=1e-3, feed_chunk=feed_chunk, feed_dtype=jnp.bfloat16)
    w1 = np.asarray(t1.params["layer1"]["w"])
    w2 = np.asarray(t2.params["layer1"]["w"])
    assert np.isfinite(w2).all()
    np.testing.assert_allclose(w1, w2, atol=1e-2)  # masking flips near thresholds
    # bf16 input quantization must leave a trace; exact equality would mean
    # the feed_dtype option silently did nothing on this path
    assert not np.array_equal(w1, w2)


def test_reference_method_surface(tmp_path, rng):
    """The reference's trainable-Model methods the shim must carry:
    summary(), export_to_onnx(path, class_mapping) (class_mapping names the
    output tensor), and the schedule exposed as a method."""
    import jax

    from openwakeword_tpu.io.onnx_import import import_head_onnx
    from openwakeword_tpu.models import heads as heads_lib

    t = HeadTrainer(layer_dim=32, seed=0)
    assert t.summary() == sum(int(np.asarray(v).size)
                              for v in jax.tree.leaves(t._leaf(t.params)))

    p = str(tmp_path / "head.onnx")
    t.export_to_onnx(p, class_mapping="alexa")
    params, meta = import_head_onnx(p)
    x = rng.normal(0, 1, (4, 16, 96)).astype(np.float32)
    want = t.forward(x)
    got = np.asarray(heads_lib.forward(params, x, params["__meta__"],
                                       inference=True)).reshape(want.shape)
    np.testing.assert_allclose(want, got, atol=1e-5)

    # method alias must match the module-level schedule
    from openwakeword_tpu.training.trainer import lr_warmup_cosine_decay
    assert t.lr_warmup_cosine_decay(
        10, warmup_steps=20, total_steps=100, target_lr=1e-3) == \
        lr_warmup_cosine_decay(10, warmup_steps=20, total_steps=100,
                               target_lr=1e-3)

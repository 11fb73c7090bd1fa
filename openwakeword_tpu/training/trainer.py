"""Classifier-head training stack (optax), with the reference's training
semantics re-expressed as fixed-shape, jitted XLA programs.

Reference behaviors preserved (reference train.py:25-366, 434-570):
  * warmup -> hold -> cosine LR schedule (train.py:167-190)
  * online hard-example selection -- keep negatives with pred >= 0.001 and
    positives with pred < 0.999 (train.py:463-468) -- done here by masking,
    not by dynamic-shape filtering (TPU-friendly)
  * linear negative-weight schedule 1 -> max_negative_weight (train.py:470-481)
  * gradient accumulation gate: update only when >= 128 samples survive the
    hard-example mask, scaling by the number of skipped steps (train.py:483-500)
  * periodic validation: FP/hr on a false-positive set, recall on positive
    test clips via sliding windows, accuracy/recall/FP on balanced val
  * checkpoint snapshots when val FP <= median and recall >= 5th percentile
    (train.py:555-567); auto_train's 3-sequence schedule with negative-weight
    doubling and percentile-filtered weight averaging (train.py:261-343)

The reference never updates ``best_val_fp`` (train.py:37 stays 1000 -- a
latent bug making the doubling unconditional); here the documented intent is
implemented: the best observed val FP/hr is tracked and compared to target.
"""

import itertools
import logging
from collections import defaultdict
from functools import partial
from typing import Dict, Iterable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from openwakeword_tpu.models import heads as heads_lib


def lr_warmup_cosine_decay(global_step, warmup_steps=0, hold=0, total_steps=0,
                           start_lr=0.0, target_lr=1e-3):
    """Warmup -> hold -> cosine decay (reference train.py:167-190)."""
    learning_rate = 0.5 * target_lr * (1 + np.cos(np.pi * (global_step - warmup_steps - hold)
                                                  / float(total_steps - warmup_steps - hold)))
    warmup_lr = target_lr * (global_step / max(warmup_steps, 1))
    if hold > 0:
        learning_rate = np.where(global_step > warmup_steps + hold, learning_rate, target_lr)
    learning_rate = np.where(global_step < warmup_steps, warmup_lr, learning_rate)
    return float(learning_rate)


# ---------------------------------------------------------------------------
# Jitted programs (built once per head architecture)
# ---------------------------------------------------------------------------

def _step_impl(params, opt_state, acc, x, y, neg_weight, lr,
               meta_items, accum_target=128, true_acc=False):
    """One fused training step with masked hard-example selection and the
    reference's accumulate-until-128 update gate.

    acc: dict(n_acc, acc_steps) int32 scalars carried across steps (plus a
    grad_sum pytree when ``true_acc``).

    ``true_acc=False`` reproduces the reference exactly: its accumulation
    path only ever calls loss.backward() on the step that crosses the
    128-survivor gate (train.py:483-500 — earlier batches contribute to the
    metrics concat and the 1/accumulation_steps divisor, but their gradients
    are never computed), so the update applies just the gating batch's
    gradient scaled by 1/acc_steps. ``true_acc=True`` implements the
    documented intent instead: gradients are summed across the window and
    the update applies their mean.
    Returns (params', opt_state', acc', stats).
    """
    meta = dict(meta_items)
    n_classes = meta["n_classes"]
    # accept compressed-feed batches (feed_dtype): all training math stays f32
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    def loss_fn(p):
        out = heads_lib.forward(p, x, meta, inference=False)
        if n_classes == 1:
            probs = out[:, 0]
            mask = jnp.where(y == 0, probs >= 0.001, probs < 0.999)
            w = jnp.where(y == 1, 1.0, neg_weight) * mask
            eps = 1e-7
            probs_c = jnp.clip(probs, eps, 1 - eps)
            bce = -(y * jnp.log(probs_c) + (1 - y) * jnp.log(1 - probs_c))
            n_sel = jnp.maximum(jnp.sum(mask), 1.0)
            loss = jnp.sum(w * bce) / n_sel
            preds_for_metrics = probs
        else:
            probs = jax.nn.softmax(out, axis=-1)
            pred_cls = jnp.argmax(probs, axis=-1)
            conf = jnp.max(probs, axis=-1)
            correct_conf = probs[jnp.arange(y.shape[0]), y.astype(jnp.int32)]
            mask = jnp.where(y == 0, conf >= 0.001, correct_conf < 0.999)
            w = jnp.where(y != 0, 1.0, neg_weight) * mask
            ce = -jax.nn.log_softmax(out, axis=-1)[jnp.arange(y.shape[0]), y.astype(jnp.int32)]
            n_sel = jnp.maximum(jnp.sum(mask), 1.0)
            loss = jnp.sum(w * ce) / n_sel
            preds_for_metrics = pred_cls.astype(jnp.float32)
        return loss, (mask, preds_for_metrics)

    (loss, (mask, preds)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    n_survivors = jnp.sum(mask).astype(jnp.int32)

    # Zero-survivor batches are no-ops (reference train.py:483 guards the
    # whole accumulate/update block on predictions.shape[0] != 0): they must
    # neither trigger an update nor inflate the accumulation divisor.
    nonzero = n_survivors > 0
    do_update = ((acc["n_acc"] + n_survivors) >= accum_target) & nonzero
    if true_acc:
        # zero-survivor batches produce all-zero grads (every weight is
        # masked), so unconditional summing is safe
        grads = jax.tree.map(lambda s, g: s + g, acc["grad_sum"], grads)
    scaled = jax.tree.map(lambda g: g / acc["acc_steps"].astype(jnp.float32), grads)

    def apply(_):
        updates, new_opt = _OPT.update(scaled, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        return optax.apply_updates(params, updates), new_opt
    def skip(_):
        return params, opt_state

    new_params, new_opt_state = jax.lax.cond(do_update, apply, skip, None)
    new_acc = {
        "n_acc": jnp.where(do_update, 0, acc["n_acc"] + n_survivors),
        "acc_steps": jnp.where(do_update, 1,
                               acc["acc_steps"] + nonzero.astype(jnp.int32)),
    }
    if true_acc:
        new_acc["grad_sum"] = jax.tree.map(
            lambda g: jnp.where(do_update, jnp.zeros_like(g), g), grads)
    stats = {"loss": loss, "n_survivors": n_survivors, "updated": do_update}
    return new_params, new_opt_state, new_acc, stats


_train_step = partial(jax.jit, static_argnames=("meta_items", "accum_target",
                                                "true_acc"))(_step_impl)


@partial(jax.jit, static_argnames=("meta_items", "accum_target", "true_acc"))
def _train_scan(params, opt_state, acc, xs, ys, neg_ws, lrs,
                meta_items, accum_target=128, true_acc=False):
    """K fused steps in ONE device dispatch over stacked (K, batch, ...)
    inputs — the multi-step feed path. One host->device transfer and one
    dispatch amortize per-step transfer/dispatch latency over K steps
    (decisive over a high-latency TPU tunnel: ~250x measured, PERF_NOTES
    round 3; also removes K-1 dispatches on a local host). Semantics are
    step-for-step identical to K sequential ``_train_step`` calls."""
    def body(carry, inp):
        p, o, a = carry
        x, y, nw, lr = inp
        p, o, a, stats = _step_impl(p, o, a, x, y, nw, lr,
                                    meta_items, accum_target, true_acc)
        return (p, o, a), stats
    (params, opt_state, acc), stats = jax.lax.scan(
        body, (params, opt_state, acc), (xs, ys, neg_ws, lrs))
    return params, opt_state, acc, stats
# No donate_argnums here: the first call would donate the very arrays still
# referenced by HeadTrainer.params/opt_state, so an exception mid-training
# (ragged batch, KeyboardInterrupt) would leave the trainer holding deleted
# buffers. Head params are tiny; donation buys nothing.


# Scale-free Adam: LR is applied manually per step (the reference mutates the
# torch param-group LR each step, train.py:453-455).
_OPT = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))


@partial(jax.jit, static_argnames=("meta_items",))
def _forward_infer(params, x, meta_items):
    return heads_lib.forward(params, x, dict(meta_items), inference=True)


def _binary_fp(preds, y):
    # reference: (y - pred <= -0.5).sum() (train.py:100)
    return int(np.sum((y - preds) <= -0.5))


def _binary_recall(preds, y, threshold=0.5):
    tp = np.sum((preds >= threshold) & (y == 1))
    fn = np.sum((preds < threshold) & (y == 1))
    return float(tp / max(tp + fn, 1))


def _binary_accuracy(preds, y, threshold=0.5):
    return float(np.mean((preds >= threshold) == (y == 1)))


class HeadTrainer:
    """Trains one wake-word classifier head (the reference's torch Model
    class, re-built on optax). Data enters as numpy (batch, frames, 96)
    feature windows with integer labels."""

    def __init__(self, n_classes: int = 1, input_shape=(16, 96), model_type: str = "dnn",
                 layer_dim: int = 128, n_blocks: int = 1, seconds_per_example=None,
                 seed: int = 0, mesh=None):
        self.n_classes = n_classes
        self.input_shape = tuple(input_shape)
        self.seconds_per_example = seconds_per_example
        self.params = heads_lib.init_params(
            jax.random.PRNGKey(seed), model_type=model_type,
            input_frames=input_shape[0], n_classes=n_classes,
            layer_dim=layer_dim, n_blocks=n_blocks)
        self.meta = dict(self.params["__meta__"])
        self._meta_items = tuple(sorted(self.meta.items()))
        self._leaf = lambda p: {k: v for k, v in p.items() if k != "__meta__"}
        self.opt_state = _OPT.init(self._leaf(self.params))
        self.mesh = None
        self._batch_sharding = None
        if mesh is not None:
            self.shard(mesh)

        self.history: Dict[str, list] = defaultdict(list)
        self.best_models: List[Dict] = []
        self.best_model_scores: List[Dict] = []
        self.best_val_fp = 1000.0
        self.best_val_accuracy = 0.0
        self.best_val_recall = 0.0
        self.n_fp = 0

    def shard(self, mesh):
        """Enable multi-chip data-parallel training over a 1-D device mesh.

        Params and optimizer state replicate to every device; train_model
        then lays each (x, y) batch out over the mesh axis, so the jitted
        ``_train_step`` runs SPMD with XLA inserting one gradient
        all-reduce over ICI per update (the heads are ~100k params -- pure
        data parallelism is the only sharding that pays; SURVEY.md
        section 2.3). Batch sizes must be divisible by the mesh size.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        self.mesh = mesh
        replicated = NamedSharding(mesh, P())
        axis = mesh.axis_names[0]
        self._batch_sharding = NamedSharding(mesh, P(axis))
        leaf = self._leaf(self.params)
        leaf = jax.tree.map(lambda v: jax.device_put(jnp.asarray(v), replicated), leaf)
        self.params = {"__meta__": dict(self.meta), **leaf}
        self.opt_state = jax.tree.map(
            lambda v: jax.device_put(jnp.asarray(v), replicated), self.opt_state)

    def _device_chunk(self, group, dtype=None):
        """Stack K same-shape (x, y) batches into (K, batch, ...) arrays in
        one host->device transfer, sharded over the batch axis on a mesh.
        ``dtype`` narrows the transfer dtype (cast back to f32 on device)."""
        xd = np.dtype(dtype) if dtype is not None else np.float32
        xs = jnp.asarray(np.stack([np.asarray(d[0]) for d in group]).astype(xd))
        ys = jnp.asarray(np.stack([np.asarray(d[1], np.float32) for d in group]))
        if self._batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_dev = self.mesh.devices.size
            if xs.shape[1] % n_dev:
                raise ValueError(
                    f"batch size {xs.shape[1]} must be divisible by the "
                    f"{n_dev}-device mesh for data-parallel training")
            sharding = NamedSharding(self.mesh, P(None, self.mesh.axis_names[0]))
            xs = jax.device_put(xs, sharding)
            ys = jax.device_put(ys, sharding)
        return xs, ys

    def _device_batch(self, x, y, dtype=None):
        """One (x, y) batch to device; ``dtype`` narrows the x transfer
        (the train step casts back to f32 before any math)."""
        xd = np.dtype(dtype) if dtype is not None else np.float32
        x = jnp.asarray(np.asarray(x, np.float32).astype(xd))
        y = jnp.asarray(np.asarray(y, np.float32))
        if self._batch_sharding is not None:
            n_dev = self.mesh.devices.size
            if x.shape[0] % n_dev:
                raise ValueError(
                    f"batch size {x.shape[0]} must be divisible by the "
                    f"{n_dev}-device mesh for data-parallel training")
            x = jax.device_put(x, self._batch_sharding)
            y = jax.device_put(y, self._batch_sharding)
        return x, y

    # -- core API -----------------------------------------------------

    def forward(self, x, params=None) -> np.ndarray:
        p = self._leaf(params or self.params)
        return np.asarray(_forward_infer(p, jnp.asarray(np.asarray(x, np.float32)),
                                         self._meta_items))

    def fp(self, preds, y):
        preds = np.asarray(preds).reshape(len(preds), -1)
        y = np.asarray(y)
        if self.n_classes == 1:
            return _binary_fp(preds[:, 0], y.reshape(-1))
        neg = y == 0
        return int(np.sum((np.argmax(preds[neg], axis=1) != 0)
                          & (np.max(preds[neg], axis=1) > 0.5)))

    def recall(self, preds, y):
        preds = np.asarray(preds).reshape(len(preds), -1)
        y = np.asarray(y).reshape(-1)
        if self.n_classes == 1:
            return _binary_recall(preds[:, 0], y)
        pos = y != 0
        if pos.sum() == 0:
            return 0.0
        return float(np.sum((np.argmax(preds[pos], axis=1) > 0)
                            & (np.max(preds[pos], axis=1) >= 0.5)) / pos.sum())

    def accuracy(self, preds, y):
        preds = np.asarray(preds).reshape(len(preds), -1)
        y = np.asarray(y).reshape(-1)
        if self.n_classes == 1:
            return _binary_accuracy(preds[:, 0], y)
        pred_pos = np.argmax(preds, axis=1) != 0
        if pred_pos.sum() == 0:
            return 0.0
        return float(np.sum(np.argmax(preds[pred_pos], axis=1) == y[pred_pos]) / pred_pos.sum())

    # -- training loop --------------------------------------------------

    def train_model(self, X: Iterable, max_steps: int, warmup_steps: int, hold_steps: int,
                    X_val=None, false_positive_val_data=None, positive_test_clips=None,
                    negative_weight_schedule=(1,), val_steps=(250,), lr: float = 1e-4,
                    val_set_hrs: float = 1.0, true_accumulation: bool = False,
                    feed_chunk: int = 32, feed_dtype=None):
        """Train over an iterable of (x, y) numpy batches (reference
        train.py:434-570 semantics; see module docstring).

        ``true_accumulation=True`` sums gradients across each accumulation
        window instead of reproducing the reference's quirk of only
        backpropagating the gating batch (see _train_step).

        ``feed_chunk``: number of consecutive same-shape batches stacked
        into one host->device transfer and run as one scanned dispatch
        (``_train_scan``). Step-for-step identical numerics to the per-step
        path; chunks are cut at validation boundaries so validation happens
        at the same step indices. Set 1 to force per-step dispatch.

        ``feed_dtype``: optional narrow dtype (e.g. ``jnp.bfloat16``) used
        only for the host->device batch transfer; the device casts back to
        f32 before any math. Applies on both the scanned-chunk and the
        per-step dispatch paths. Halves feed bandwidth on links where the
        feed is the bottleneck (PERF_NOTES round 3: ~29 MB/s TPU tunnel) at
        the cost of quantizing the input features (~0.4% relative)."""
        val_steps = set(int(v) for v in np.asarray(val_steps).tolist())
        # validation inputs are iterated once per validation round; a plain
        # generator would silently exhaust after the first round (the
        # reference takes re-iterable torch DataLoaders), so materialize
        # anything that isn't a re-iterable sequence
        def _reiterable(d):
            return d if d is None or isinstance(d, (list, tuple)) else list(d)
        X_val = _reiterable(X_val)
        false_positive_val_data = _reiterable(false_positive_val_data)
        positive_test_clips = _reiterable(positive_test_clips)
        acc = {"n_acc": jnp.asarray(0, jnp.int32), "acc_steps": jnp.asarray(1, jnp.int32)}
        if true_accumulation:
            acc["grad_sum"] = jax.tree.map(jnp.zeros_like, self._leaf(self.params))
        params = self._leaf(self.params)
        opt_state = self.opt_state

        pending_stats: list = []

        def flush_stats():
            # entries are per-step scalars or (K,)-stacked scan stats
            if not pending_stats:
                return
            updated = np.concatenate(
                [np.atleast_1d(np.asarray(s["updated"])) for s in pending_stats])
            losses = np.concatenate(
                [np.atleast_1d(np.asarray(s["loss"])) for s in pending_stats])
            self.history["loss"].extend(
                float(l) for u, l in zip(updated, losses) if u)
            pending_stats.clear()

        def schedule(s):
            step_lr = lr_warmup_cosine_decay(s, warmup_steps=warmup_steps,
                                             hold=hold_steps, total_steps=max_steps,
                                             target_lr=lr)
            if len(negative_weight_schedule) == 1:
                neg_w = float(negative_weight_schedule[0])
            else:
                neg_w = float(negative_weight_schedule[
                    min(s, len(negative_weight_schedule) - 1)])
            return step_lr, neg_w

        source = iter(X)
        step_ndx = -1
        exhausted = False
        while not exhausted and step_ndx < max_steps - 1:
            s0 = step_ndx + 1
            # a chunk must end exactly at the next validation boundary so
            # chunked runs validate at the same step indices as per-step runs
            upcoming = [v for v in val_steps if v >= s0]
            stop = min(min(upcoming) + 1 if upcoming else max_steps, max_steps)
            k_target = max(1, min(feed_chunk, stop - s0))
            group = list(itertools.islice(source, k_target))
            if not group:
                break
            exhausted = len(group) < k_target
            sched = [schedule(s) for s in range(s0, s0 + len(group))]

            # scan ONLY at the full feed_chunk length: every distinct K would
            # compile its own K-step program (minutes each on a tunneled
            # TPU), so validation-boundary remainders and the exhausted tail
            # take the per-step path instead — K*30 ms of dispatch beats a
            # fresh multi-minute compile every time
            uniform = len(group) == feed_chunk and feed_chunk > 1 and all(
                np.shape(d[0]) == np.shape(group[0][0])
                and np.shape(d[1]) == np.shape(group[0][1]) for d in group[1:])
            if uniform:
                # multi-step feed: one transfer + one scanned dispatch for
                # the whole group (PERF_NOTES round 3: per-step transfers
                # over a high-latency link starve the device)
                xs, ys = self._device_chunk(group, dtype=feed_dtype)
                params, opt_state, acc, stats = _train_scan(
                    params, opt_state, acc, xs, ys,
                    jnp.asarray([s[1] for s in sched], jnp.float32),
                    jnp.asarray([s[0] for s in sched], jnp.float32),
                    self._meta_items, true_acc=true_accumulation)
                pending_stats.append(stats)         # (K,)-stacked
            else:
                for (data, (step_lr, neg_w)) in zip(group, sched):
                    x, y = self._device_batch(data[0], data[1],
                                              dtype=feed_dtype)
                    params, opt_state, acc, stats = _train_step(
                        params, opt_state, acc, x, y,
                        jnp.asarray(neg_w, jnp.float32),
                        jnp.asarray(step_lr, jnp.float32),
                        self._meta_items, true_acc=true_accumulation)
                    # Reading stats here would synchronize on every step
                    # (~30 ms per round-trip over a TPU tunnel, stalling
                    # dispatch pipelining). Buffer the device scalars and
                    # flush in one stacked fetch at validation points.
                    pending_stats.append(stats)
            step_ndx = s0 + len(group) - 1

            run_val = step_ndx in val_steps and step_ndx > 1
            if run_val or len(pending_stats) >= 256:
                flush_stats()
            if run_val and false_positive_val_data is not None:
                val_fp = 0
                for data_val in false_positive_val_data:
                    preds = self.forward(data_val[0], params={"__meta__": self.meta, **params})
                    val_fp += self.fp(preds, np.asarray(data_val[1]))
                self.history["val_fp_per_hr"].append(val_fp / val_set_hrs)
                self.best_val_fp = min(self.best_val_fp, val_fp / val_set_hrs)

            if run_val and positive_test_clips is not None:
                tp = fn = 0
                for data_val in positive_test_clips:
                    x_val = np.asarray(data_val[0], np.float32)
                    F = self.input_shape[0]
                    if x_val.shape[1] < F:
                        continue          # too short to hold one window
                    # inclusive end so a clip with exactly F frames yields
                    # its one window instead of crashing np.concatenate
                    windows = np.concatenate([x_val[:, i:i + F]
                                              for i in range(0, x_val.shape[1] - F + 1)])
                    preds = self.forward(windows, params={"__meta__": self.meta, **params})
                    if np.any(preds >= 0.5):
                        tp += 1
                    else:
                        fn += 1
                self.history["positive_test_clips_recall"].append(tp / max(tp + fn, 1))

            if run_val and X_val is not None:
                # aggregate over ALL val batches (weighted by batch size);
                # an empty val sequence records nothing instead of crashing
                accs, recalls, n_exam = [], [], []
                val_fp = 0
                for data_val in X_val:
                    x_val, y_val = np.asarray(data_val[0], np.float32), np.asarray(data_val[1])
                    preds = self.forward(x_val, params={"__meta__": self.meta, **params})
                    recalls.append(self.recall(preds, y_val))
                    accs.append(self.accuracy(preds, y_val))
                    val_fp += self.fp(preds, y_val)
                    n_exam.append(len(y_val))
                if n_exam:
                    w = np.asarray(n_exam, np.float64) / sum(n_exam)
                    self.history["val_accuracy"].append(float(np.dot(w, accs)))
                    self.history["val_recall"].append(float(np.dot(w, recalls)))
                    self.history["val_n_fp"].append(val_fp)

            if run_val and self.history["val_n_fp"]:
                if self.history["val_n_fp"][-1] <= np.percentile(self.history["val_n_fp"], 50) and \
                   self.history["val_recall"][-1] >= np.percentile(self.history["val_recall"], 5):
                    snap = jax.tree.map(np.asarray, params)
                    self.best_models.append({"__meta__": dict(self.meta), **snap})
                    self.best_model_scores.append({
                        "training_step_ndx": step_ndx,
                        "val_n_fp": self.history["val_n_fp"][-1],
                        "val_recall": self.history["val_recall"][-1],
                        "val_accuracy": self.history["val_accuracy"][-1],
                        "val_fp_per_hr": (self.history["val_fp_per_hr"] or [0])[-1],
                    })
                    self.best_val_recall = self.history["val_recall"][-1]
                    self.best_val_accuracy = self.history["val_accuracy"][-1]

            if step_ndx == max_steps - 1:
                break

        flush_stats()
        self.params = {"__meta__": dict(self.meta), **jax.tree.map(np.asarray, params)}
        self.opt_state = opt_state
        return self.params

    # -- orchestration ---------------------------------------------------

    def average_models(self, models: Optional[List[Dict]] = None) -> Dict:
        """Uniform weight average of checkpoint pytrees (train.py:198-223)."""
        models = models if models is not None else self.best_models
        leaves = [self._leaf(m) for m in models]
        avg = jax.tree.map(lambda *xs: np.mean(np.stack(xs), axis=0), *leaves)
        return {"__meta__": dict(self.meta), **avg}

    def _select_best_model(self, false_positive_validate_data, val_set_hrs=11.3,
                           max_fp_per_hour=0.5, min_recall=0.20):
        """Best snapshot: lowest-FP candidates, then max recall (train.py:225-259)."""
        if not self.best_models:
            return None
        fp_rates = [0.0] * len(self.best_models)
        for batch in false_positive_validate_data:
            x_val, y_val = np.asarray(batch[0], np.float32), np.asarray(batch[1])
            for ndx, model in enumerate(self.best_models):
                preds = self.forward(x_val, params=model)
                fp_rates[ndx] += self.fp(preds, y_val)
        fp_rates = [fp / val_set_hrs for fp in fp_rates]
        candidates = [ndx for ndx, fp in enumerate(fp_rates) if fp <= max_fp_per_hour]
        if not candidates:
            logging.warning("No models with FP/hr <= %s found!", max_fp_per_hour)
            return None
        recalls = [self.best_model_scores[ndx]["val_recall"] for ndx in candidates]
        if max(recalls) <= min_recall:
            logging.warning("No models with recall >= %s found!", min_recall)
            return None
        return self.best_models[candidates[int(np.argmax(recalls))]]

    def auto_train(self, X_train, X_val, false_positive_val_data, steps=50000,
                   max_negative_weight=1000, target_fp_per_hour=0.2, lr=1e-4,
                   val_set_hrs=11.3):
        """3-sequence schedule with negative-weight doubling and percentile
        checkpoint merging (train.py:261-366)."""
        seq_steps = int(steps)
        for sequence in range(3):
            if sequence > 0:
                lr = lr / 10
                if sequence == 1:
                    seq_steps = max(int(steps) // 10, 1)
                if self.best_val_fp > target_fp_per_hour:
                    max_negative_weight *= 2
                    logging.info("Increasing weight on negative examples to reduce false positives...")
            # observability: the effective cap per sequence (tested — the
            # reference's doubling path is dead code due to its unused
            # best_val_fp, COMPATIBILITY.md #19-adjacent fix)
            self.history["max_negative_weight"].append(max_negative_weight)
            weights = np.linspace(1, max_negative_weight, seq_steps).tolist()
            if sequence == 0:
                val_steps = np.linspace(seq_steps - int(seq_steps * 0.25), seq_steps, 20).astype(np.int64)
            else:
                val_steps = np.linspace(1, seq_steps, 20).astype(np.int64)
            logging.info("Starting training sequence %d...", sequence + 1)
            self.train_model(X=X_train, X_val=X_val,
                             false_positive_val_data=false_positive_val_data,
                             max_steps=seq_steps, negative_weight_schedule=weights,
                             val_steps=val_steps, warmup_steps=seq_steps // 5,
                             hold_steps=seq_steps // 3, lr=lr, val_set_hrs=val_set_hrs)

        logging.info("Merging checkpoints above the 90th percentile into single model...")
        combined = self.params
        if self.best_models and self.history["val_accuracy"]:
            accuracy_pct = np.percentile(self.history["val_accuracy"], 90)
            recall_pct = np.percentile(self.history["val_recall"], 90)
            fp_pct = np.percentile(self.history["val_fp_per_hr"], 10) \
                if self.history["val_fp_per_hr"] else 0
            models = [m for m, s in zip(self.best_models, self.best_model_scores)
                      if s["val_accuracy"] >= accuracy_pct and s["val_recall"] >= recall_pct
                      and s["val_fp_per_hr"] <= fp_pct]
            if models:
                combined = self.average_models(models=models)

        # Final combined-model validation report (train.py:345-364),
        # aggregated over ALL val batches (not just the last one)
        if X_val is not None:
            preds_all, y_all = [], []
            for batch in X_val:
                preds_all.append(self.forward(np.asarray(batch[0], np.float32),
                                              params=combined))
                y_all.append(np.asarray(batch[1]))
            if y_all:
                preds = np.concatenate(preds_all)
                y = np.concatenate(y_all)
                logging.info("Final Model Accuracy: %s | Recall: %s",
                             self.accuracy(preds, y), self.recall(preds, y))
        return combined

    # -- prediction / persistence ----------------------------------------

    def predict_on_features(self, features: np.ndarray, model=None) -> np.ndarray:
        """Sliding 16-frame windows, step 1 (80 ms), per clip (train.py:368-396).

        Deliberate fix of a reference off-by-one: the final valid window
        (start = frames - n_in) is included, so a clip with exactly n_in
        frames scores instead of crashing np.stack on an empty list."""
        features = np.asarray(features, np.float32)
        if features.ndim < 3:
            features = features[None]
        n_in = self.input_shape[0]
        out = []
        for clip in features:
            if clip.shape[0] < n_in:
                raise ValueError(
                    f"Clip has {clip.shape[0]} feature frames; the head needs "
                    f"at least {n_in} for one window")
            # inclusive end: a clip with exactly n_in frames is one window
            windows = np.stack([clip[i:i + n_in]
                                for i in range(0, clip.shape[0] - n_in + 1)])
            out.append(self.forward(windows, params=model)[None])
        return np.vstack(out)

    def predict_on_clips(self, clips: np.ndarray, model=None) -> np.ndarray:
        from openwakeword_tpu.features import AudioFeatures
        F = AudioFeatures()
        features = F.embed_clips(np.asarray(clips), batch_size=16)
        return self.predict_on_features(features, model=model)

    def save_model(self, output_path: str, model=None, meta: dict = None):
        """``meta`` rides the checkpoint's file-level metadata — e.g.
        ``{"embedding": "student"}`` records which feature frontend the head
        was trained on, so engines can warn on a frontend mismatch at load."""
        from openwakeword_tpu.io.checkpoints import save_checkpoint
        save_checkpoint(output_path, "head", model or self.params, meta=meta)

    # -- mid-run checkpoint / resume (the reference keeps training state
    # in-memory only, train.py:555-567; this adds crash recovery) ----------

    def save_state(self, path: str):
        """Persist full trainer state: params, optimizer state, history,
        checkpoint snapshots and their scores."""
        import pickle
        state = {
            "params": jax.tree.map(np.asarray, self._leaf(self.params)),
            "meta": dict(self.meta),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "history": {k: list(v) for k, v in self.history.items()},
            "best_models": [jax.tree.map(np.asarray, self._leaf(m))
                            for m in self.best_models],
            "best_model_scores": list(self.best_model_scores),
            "best_val_fp": self.best_val_fp,
            "best_val_accuracy": self.best_val_accuracy,
            "best_val_recall": self.best_val_recall,
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_state(self, path: str):
        """Resume from save_state output."""
        import pickle
        from collections import defaultdict
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.meta = dict(state["meta"])
        self._meta_items = tuple(sorted(self.meta.items()))
        self.params = {"__meta__": dict(self.meta), **state["params"]}
        self.opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        self.history = defaultdict(list, {k: list(v) for k, v in state["history"].items()})
        self.best_models = [{"__meta__": dict(self.meta), **m} for m in state["best_models"]]
        self.best_model_scores = list(state["best_model_scores"])
        self.best_val_fp = state["best_val_fp"]
        self.best_val_accuracy = state["best_val_accuracy"]
        self.best_val_recall = state["best_val_recall"]

    def export_model(self, model, model_name: str, output_dir: str):
        """Persist a trained head as a native checkpoint plus an ONNX file
        loadable by the reference's onnxruntime engine."""
        import os
        from openwakeword_tpu.io.checkpoints import save_checkpoint
        save_checkpoint(os.path.join(output_dir, model_name + ".npz"), "head",
                        model or self.params)
        try:
            from openwakeword_tpu.io.onnx_export import export_head_onnx
            export_head_onnx(model or self.params,
                             os.path.join(output_dir, model_name + ".onnx"))
        except NotImplementedError:
            logging.warning("ONNX export unavailable; native checkpoint saved only.")

    def export_to_onnx(self, output_path: str, class_mapping: str = ""):
        """Write this head as a standalone .onnx file (reference
        train.py:144-165 surface). ``class_mapping`` is, as in the
        reference, the name given to the graph's output tensor; the
        multiclass softmax-at-export wrap is handled by the writer."""
        from openwakeword_tpu.io.onnx_export import export_head_onnx
        export_head_onnx(self.params, output_path, output_name=class_mapping)

    def lr_warmup_cosine_decay(self, global_step, warmup_steps=0, hold=0,
                               total_steps=0, start_lr=0.0, target_lr=1e-3):
        """Method alias of the module-level schedule (the reference exposes
        the schedule as a Model method, train.py:25-40)."""
        return lr_warmup_cosine_decay(global_step, warmup_steps=warmup_steps,
                                      hold=hold, total_steps=total_steps,
                                      start_lr=start_lr, target_lr=target_lr)

    def summary(self):
        """Print a per-layer parameter-count summary (the reference's
        torchinfo-based Model.summary equivalent)."""
        total = 0
        for name, leaves in sorted(self._leaf(self.params).items()):
            n = sum(int(np.asarray(v).size) for v in jax.tree.leaves(leaves))
            total += n
            print(f"{name:<24s} {n:>10,d} params")
        print(f"{'total':<24s} {total:>10,d} params")
        return total

"""Multi-stream wake-word engine: the TPU-native replacement for the
reference's process-pool parallelism.

The reference scales by forking OS processes, each owning a private Model
(reference utils.py:467-539). Here the *entire* per-stream state machine --
PCM look-back, mel ring, embedding ring, score history, VAD state, warm-up /
patience / debounce / VAD-gate logic -- lives in one fixed-shape ``StreamState``
pytree with a leading stream axis. One jitted, donated ``step`` advances every
stream by 80 ms: a fused XLA program (STFT matmul -> mel -> embedding CNN ->
all heads -> post-processing) that is ``vmap``-free by construction (all ops
are written batched) and shards across chips with a 1-D ``Mesh`` over the
stream axis, so scaling is pure data parallelism over ICI with zero
cross-stream collectives (SURVEY.md section 2.3).

Numerics match the single-stream ``Model`` on the fixed-1280-chunk streaming
path (tested in tests/test_parallel.py), including the reference's quirks:
first-call 5-frame mel push, noise-seeded feature ring, 5-call warm-up
zeroing, and the VAD gate over scores 0.4-0.56 s back.
"""


from typing import Dict, List, Optional, Sequence, Tuple

import functools
import logging
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openwakeword_tpu import config, gating, registry
from openwakeword_tpu.models import embedding as embedding_model
from openwakeword_tpu.models import embedding_stream
from openwakeword_tpu.models import embedding_student
from openwakeword_tpu.models import heads as heads_lib
from openwakeword_tpu.models import vad_net
from openwakeword_tpu.ops import melspec as melspec_ops
from openwakeword_tpu.ops import ns_jax

MEL_RING = config.EMB_WINDOW_FRAMES          # 76 frames (chunk=1280 => k=1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _seed_embeddings(emb_params, noise, F, emb_apply=None):
    """Embeddings of a noise clip for feature-ring seeding (reference
    utils.py:169 seeds the feature buffer with 4 s of random noise).
    ``emb_apply`` selects the embedding forward (faithful CNN default;
    the student network passes its own apply)."""
    if emb_apply is None:
        emb_apply = embedding_model.apply_folded
    spec = melspec_ops.melspectrogram(noise, top_db=config.MEL_TOP_DB)
    n_windows = (spec.shape[0] - 76) // 8 + 1
    wins = jnp.stack([spec[i * 8:i * 8 + 76] for i in range(n_windows)])
    emb = emb_apply(emb_params, wins)                                   # (W, 96)
    return emb[-F:, :]
VAD_RING = 7                                 # enough for the [-7:-4] gate window



def _as_device_pcm(chunks) -> jnp.ndarray:
    """Host PCM -> device array, preserving int16.

    int16 input is transferred raw (half the host->device bytes of f32) and
    cast to float32 on device inside the jitted step; any other dtype is cast
    to float32 on host. Each input dtype compiles its own step variant, so
    serving hosts should feed a consistent dtype.
    """
    arr = np.asarray(chunks)
    if arr.dtype != np.int16:
        arr = arr.astype(np.float32, copy=False)
    return jnp.asarray(arr)


def put_sharded(x: np.ndarray, mesh: Mesh, spec) -> jax.Array:
    """Host array -> global sharded device array, assembled from PER-DEVICE
    shards (the multi-host-ready feed path).

    ``jax.device_put(x, NamedSharding(mesh, spec))`` is correct on one host
    but impossible on a multi-host pod: it needs the full global array in
    every process. This helper does what a multi-host feed must do instead:
    each process slices out only the rows its ADDRESSABLE devices own, ships
    those shards device-by-device, and declares the global array with
    ``jax.make_array_from_single_device_arrays`` — a metadata-only assembly,
    no cross-host traffic. On a single host it is numerically identical to
    the device_put form and moves the same bytes.

    ``x`` is indexed with GLOBAL indices: a multi-host caller keeps a
    global-shape staging buffer per host but only has to populate the rows
    its shard covers — rows owned by other hosts are never read (see
    docs/serving.md, multi-host serving).
    """
    sharding = NamedSharding(mesh, spec)
    x = np.asarray(x)
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    shards = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, shards)


def fetch_sharded(arr: jax.Array) -> np.ndarray:
    """Device array -> host numpy without assuming full addressability.

    Single-host arrays fetch whole. On a multi-host pod each process reads
    back only its addressable shards into a global-shape buffer; rows owned
    by other hosts stay zero (a serving host only polls activations for the
    slots its shard serves)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)     # incl. plain numpy (host-only test stubs)
    out = np.zeros(arr.shape, arr.dtype)
    for sh in arr.addressable_shards:
        out[sh.index] = np.asarray(sh.data)
    return out

def _resolve_heads(wakeword_models: Sequence[str],
                   quantized_execution: str = "dequant"
                   ) -> List[Tuple[str, Dict, Dict, Dict]]:
    """(name, params, class_mapping, file_meta) per head, via the shared
    resolver + Model loader."""
    from openwakeword_tpu.model import Model
    resolved, names = registry.resolve_wakeword_models(list(wakeword_models))
    out = []
    for path, name in zip(resolved, names):
        params, meta = Model._load_head(path, name, quantized_execution)
        if meta.get("class_mapping"):
            mapping = dict(meta["class_mapping"])
        elif registry.model_class_mappings.get(name):
            mapping = registry.model_class_mappings[name]
        else:
            mapping = {str(i): str(i) if int(params["__meta__"]["n_classes"]) > 1 else name
                       for i in range(int(params["__meta__"]["n_classes"]))}
        out.append((name, params, mapping, meta))
    return out


class MultiStreamEngine:
    """Scores ``n_streams`` independent 16 kHz streams, one 80 ms frame per
    step, entirely on device.

    Gating options (vad_threshold / patience / threshold / debounce_time) are
    engine-static: they compile into the fused step. Per-call overrides, which
    the single-stream Model supports, would force retraces at 50k-stream scale.

    ``custom_verifier_models`` maps a loaded model name to its speaker-specific
    verifier (a pickle path, a trained sklearn pipeline, or an already-folded
    ``(w, b)`` pair); the second stage fuses into the on-device step as one
    stacked affine+sigmoid over the feature window (host counterpart:
    Model._apply_verifiers; reference model.py:319-328).
    """

    def __init__(self,
                 wakeword_models: Sequence[str] = (),
                 n_streams: int = 256,
                 vad_threshold: float = 0.0,
                 patience: Optional[Dict[str, int]] = None,
                 threshold: Optional[Dict[str, float]] = None,
                 debounce_time: float = 0.0,
                 custom_verifier_models: Optional[Dict[str, object]] = None,
                 custom_verifier_threshold: float = 0.1,
                 enable_noise_suppression: bool = False,
                 noise_suppression_algorithm: str = "spectral",
                 embedding_params=None,
                 embedding: str = "default",
                 vad_params=None,
                 mesh: Optional[Mesh] = None,
                 rng_seed: int = 0,
                 incremental: bool = True,
                 use_pallas_melspec: Optional[bool] = None,
                 mel_dft: str = "direct",
                 precision: str = "high",
                 scan_unroll: int = 2,
                 quantized_execution: str = "dequant",
                 realtime_guard: Optional[str] = None,
                 frame_budget_s: float = 0.08):
        gating.validate_gating_args(patience, threshold, debounce_time)

        self.n_streams = int(n_streams)
        self.vad_threshold = float(vad_threshold)
        # on-device batched noise suppression (ops.ns_jax): same algorithm
        # and 1-LSB-level numerics as the native host-side suppressor the
        # single-stream Model binds (Model(enable_speex_noise_suppression=
        # True) -> native/ns.cpp), but fused into the step so suppression
        # scales with the stream axis instead of running 10 ms frames one at
        # a time on the host. The VAD still hears the RAW audio (host
        # contract: Model.predict suppresses the preprocessor input only).
        # Algorithm: 'spectral' (native ns.cpp twin) or 'mmse' (the SpeexDSP
        # preprocessor's MMSE-STSA update rules — ops/ns_jax._mmse_gain).
        self.enable_noise_suppression = bool(enable_noise_suppression)
        if noise_suppression_algorithm not in ("spectral", "mmse"):
            raise ValueError(
                "noise_suppression_algorithm must be 'spectral' or 'mmse'; "
                f"got {noise_suppression_algorithm!r}")
        self.noise_suppression_algorithm = noise_suppression_algorithm
        self.mesh = mesh
        # incremental: stream the embedding CNN with per-layer activation
        # caches (~8x fewer FLOPs, bit-identical scores -- embedding_stream);
        # False recomputes the full 76-frame window each step like the
        # reference does.
        self.incremental = bool(incremental)
        # use_pallas_melspec: fused VMEM-resident mel frontend kernel
        # (ops.melspec_pallas). Measured with pipelined dispatch it is a ~6%
        # end-to-end engine win at 'high' and ~17% at 'bf16' (v5e 4096x50),
        # at the same
        # score drift as the XLA path (3.5e-5 vs 3.1e-5 at 'high';
        # PERF_NOTES.md). Default (None): on for TPU backends, except in
        # 'highest' mel mode where the XLA path is kept for bit-level parity
        # with the host Model. Off on CPU (Mosaic needs interpret mode there).
        if use_pallas_melspec is None:
            mel_mode = (precision.get("mel", "high")
                        if isinstance(precision, dict) else precision)
            use_pallas_melspec = (jax.default_backend() == "tpu"
                                  and mel_mode != "highest")
        self.use_pallas_melspec = bool(use_pallas_melspec)
        # mel_dft: 'direct' = the (512, 514) windowed-basis matmul;
        # 'factored' = radix-4 factored DFT (four K=128 matmuls + VPU
        # butterfly, ~2.5x fewer padded MACs — ops.melspec.factored_dft_bases).
        # f32-rounding equivalent, not bit-equal: parity paths keep 'direct'.
        if mel_dft not in ("direct", "factored"):
            raise ValueError(f"mel_dft must be 'direct' or 'factored'; got {mel_dft!r}")
        self.mel_dft = mel_dft
        # scan_unroll: unroll factor for the multi-frame scan (predict_frames
        # / predict_clips). 2 software-pipelines consecutive frames so XLA
        # overlaps the many small CNN ops across iterations: measured +15%
        # (69.2k -> 79.7k rt streams, v5e 4096x50, 'high'); 3+ regresses.
        self.scan_unroll = int(scan_unroll)
        # precision modes (measured on v5e, 4096 streams, real audio,
        # pipelined dispatch; PERF_NOTES.md):
        #   'high' (default) -- f32 params, 3-pass-bf16 MXU matmuls:
        #                99,073 rt streams at |dScore| <= 3.5e-5 vs 'highest'
        #                (~30x inside the 1e-3 parity budget).
        #   'highest' -- exact f32 (6-pass); for bit-level debugging against
        #                the host Model path.
        #   'fast'    -- f32 params AND f32 state rings, 1-pass-bf16 MXU
        #                matmuls (Precision.DEFAULT): only the matmul/conv
        #                inputs quantize, every accumulation and all stored
        #                state stay f32. Measured |dScore| <= 7.9e-3 -- over
        #                the 1e-3 parity budget (PERF_NOTES.md ladder).
        #   'bf16'    -- serving mode: weights, mel DFT, AND activation state
        #                rings in bf16: 212,432 streams at |dScore| <= ~4e-3.
        # A dict {'mel': mode, 'cnn': mode, 'heads': mode} (modes from
        # 'highest'/'high'/'fast') sets the MXU precision per stage, f32
        # storage throughout -- for trading per-stage speed against the
        # measured drift contribution of each stage.
        # In student mode (embedding='student') the step is mel-bound and
        # 'fast' is the recommended tier: 266,557 rt streams (1.54x student
        # 'high') at only 1.27e-3 drift vs the student-exact pipeline --
        # the mel DFT dominates 1-pass error, so 'fast' on all stages costs
        # no more drift than {'mel': 'fast'} alone (PERF_NOTES.md round 4).
        _modes = ("highest", "high", "fast", "bf16")

        def _valid_cnn_mode(v):
            # 'cnn' additionally takes a per-conv sequence of modes (mixed
            # precision: HIGH on the drift-dominant layers, 1-pass bf16 on
            # the rest — PERF_NOTES round 5), default embedding only.
            if isinstance(v, (list, tuple)):
                from openwakeword_tpu.models import embedding as _E
                return (embedding == "default"
                        and len(v) == _E.n_convs()
                        and all(m in _modes[:3] for m in v))
            return v in _modes[:3]

        if precision == "mixed":
            # measured mixed-precision parity tier: mel/heads 'high', the
            # per-conv assignment embedding.MIXED_FAST_CONVS at 1-pass —
            # max |dScore| 7.9e-4 vs 'highest', inside the 1e-3 parity
            # budget (PERF_NOTES.md round 5). The assignment is measured
            # for the default CNN; the student's recommended tier is 'fast'.
            if embedding != "default":
                raise ValueError(
                    "precision='mixed' is the measured per-conv assignment "
                    "for the default embedding CNN; with "
                    f"embedding={embedding!r} use 'fast' (recommended "
                    "student tier) or a per-stage dict")
            from openwakeword_tpu.models import embedding as _E_mixed
            precision = {"cnn": _E_mixed.mixed_precision()}
        if isinstance(precision, dict):
            bad = set(precision) - {"mel", "cnn", "heads"}
            if (bad
                    or not all(v in _modes[:3] for k, v in precision.items()
                               if k != "cnn")
                    or not _valid_cnn_mode(precision.get("cnn", "high"))):
                raise ValueError("per-stage precision takes keys mel/cnn/heads "
                                 f"with values {_modes[:3]} ('cnn' also takes "
                                 "a per-conv sequence of those modes, default "
                                 f"embedding only), got {precision!r}")
            self._stage_modes = {k: precision.get(k, "high")
                                 for k in ("mel", "cnn", "heads")}
            if isinstance(self._stage_modes["cnn"], list):
                self._stage_modes["cnn"] = tuple(self._stage_modes["cnn"])
            precision = "high"   # storage/dtype behavior of the f32 modes
        elif precision in _modes:
            self._stage_modes = {k: precision for k in ("mel", "cnn", "heads")}
        else:
            raise ValueError("precision must be 'highest', 'high', 'mixed', "
                             f"'fast', 'bf16', or a per-stage dict; got "
                             f"{precision!r}")
        self.precision = precision

        # ---- heads ----
        heads = _resolve_heads(wakeword_models, quantized_execution)
        self.model_names = [h[0] for h in heads]
        self._head_metas = []
        head_params = {}
        self.labels: List[str] = []
        label_head_slices = []
        head_frontends = {}      # name -> embedding frontend the head was trained on
        for name, params, mapping, file_meta in heads:
            if file_meta.get("embedding"):
                head_frontends[name] = file_meta["embedding"]
            meta = dict(params["__meta__"])
            head_params[name] = {k: v for k, v in params.items() if k != "__meta__"}
            n_cls = int(meta["n_classes"])
            start = len(self.labels)
            if n_cls == 1:
                self.labels.append(name)
                cols = (0,)
            else:
                # label order follows the class mapping's integer keys; the
                # built-in timer map intentionally omits class 0, matching the
                # reference's emitted label set (model.py:313-317)
                keys = sorted(mapping.keys(), key=int)
                cols = tuple(int(k) for k in keys)
                for int_label in keys:
                    self.labels.append(mapping[int_label])
            self._head_metas.append((name, meta, cols))
            label_head_slices.append((start, len(self.labels), name, n_cls, mapping))
        self._label_slices = label_head_slices
        self.max_head_frames = max(int(m["input_frames"]) for _, m, _ in self._head_metas)

        # Execution plan: same-architecture dnn/mlp heads fuse into one
        # stacked einsum program (heads_lib.forward_stacked); the published
        # 5 binary heads collapse from 15 matmuls to 3.
        label_starts = {name: start for start, _, name, _, _ in label_head_slices}
        groups: Dict[tuple, list] = {}
        for name, meta, cols in self._head_metas:
            key = tuple(sorted(meta.items())) if meta["model_type"] in ("dnn", "mlp") \
                else ("single", name)
            groups.setdefault(key, []).append((name, meta, cols))
        self._exec_plan = []
        self._stacked_groups = {}
        for key, members in groups.items():
            if len(members) > 1:
                gid = f"group_{len(self._stacked_groups)}"
                self._stacked_groups[gid] = [m[0] for m in members]
                self._exec_plan.append(("stacked", gid, members[0][1],
                                        [(n, c, label_starts[n]) for n, _, c in members]))
            else:
                n, meta, cols = members[0]
                self._exec_plan.append(("single", n, meta,
                                        [(n, cols, label_starts[n])]))

        # static per-label gating vectors
        n_labels = len(self.labels)
        self._patience_vec = np.zeros(n_labels, dtype=np.int32)
        self._threshold_vec = np.full(n_labels, np.inf, dtype=np.float32)
        # cap at the history depth like the host Model (model.py): an uncapped
        # window would slice history[h - n:] with n > h, silently SHRINKING
        # the debounce window via a negative start
        self._debounce_frames = min(
            int(np.ceil(debounce_time / 0.08)),
            config.PREDICTION_BUFFER_MAX) if debounce_time > 0 else 0
        for start, end, name, n_cls, mapping in label_head_slices:
            if threshold and name in threshold:
                self._threshold_vec[start:end] = threshold[name]
            if patience and name in patience:
                self._patience_vec[start:end] = patience[name]
        if patience:
            # a patience'd model whose threshold is missing would compare
            # against inf and zero its scores FOREVER with no error (host
            # Model raises the same way, model.py)
            missing = sorted(m for m, p in patience.items()
                             if p > 0 and (not threshold or m not in threshold))
            if missing:
                raise ValueError(
                    f"patience is set for {missing} but threshold has no "
                    "entry for them; the patience filter needs a per-model "
                    "threshold")
        self._use_patience = bool(patience)
        self._use_debounce = debounce_time > 0
        # per-label recycle vector for masked (packetized) stepping: binary
        # labels recycle their previous score when a stream has no complete
        # frame; multiclass labels read zero (reference model.py:303-311)
        self._recycle_mask = np.zeros(n_labels, dtype=np.float32)
        for start, end, name, n_cls, mapping in label_head_slices:
            if n_cls == 1:
                self._recycle_mask[start:end] = 1.0

        # ---- fused verifier second stage ----
        # Speaker-specific verifiers (reference model.py:319-328) run fully
        # on device: each trained scaler+logistic-regression pipeline folds
        # into one affine form (custom_verifier_model.fold_verifier), stacked
        # per label into a single (L, F*96) matmul applied wherever the base
        # score reaches custom_verifier_threshold. The host Model runs the
        # same second stage through sklearn, one stream at a time; here it
        # costs one tiny einsum across all streams.
        self.custom_verifier_threshold = float(custom_verifier_threshold)
        # falsy entries mean "no verifier" (host Model load-loop contract)
        provided_verifiers = {k: v for k, v in (custom_verifier_models or {}).items() if v}
        self._use_verifiers = bool(provided_verifiers)
        if self._use_verifiers:
            from openwakeword_tpu.custom_verifier_model import fold_verifier
            unmatched = sorted(set(provided_verifiers) - set(self.model_names))
            if unmatched:
                raise ValueError(
                    f"custom_verifier_models keys {unmatched} do not name any "
                    f"loaded base model (loaded: {sorted(self.model_names)}); "
                    "key every verifier by the model it verifies")
            F = self.max_head_frames
            frames_of = {name: int(meta["input_frames"])
                         for name, meta, _ in self._head_metas}
            ver_w = np.zeros((n_labels, F * config.EMB_DIM), dtype=np.float32)
            ver_b = np.zeros(n_labels, dtype=np.float32)
            self._verifier_mask = np.zeros(n_labels, dtype=bool)
            for start, end, name, n_cls, mapping in label_head_slices:
                spec = provided_verifiers.get(name)
                if not spec:
                    continue
                if isinstance(spec, (tuple, list)) and len(spec) == 2:
                    w, b = np.asarray(spec[0], np.float32), np.float32(spec[1])
                else:
                    if isinstance(spec, (str, os.PathLike)):
                        with open(spec, "rb") as f:
                            spec = pickle.load(f)
                    w, b = fold_verifier(spec)
                fh = frames_of[name]
                if w.shape != (fh * config.EMB_DIM,):
                    raise ValueError(
                        f"verifier for '{name}' covers {w.shape[0] // config.EMB_DIM} "
                        f"feature frames but the head reads {fh}; retrain the "
                        "verifier on the head's own feature windows")
                # heads shorter than the widest read the TRAILING fh frames
                # of the shared feature ring; zero leading coefficients make
                # the full-ring flatten equivalent to the head's own window
                ver_w[start:end, (F - fh) * config.EMB_DIM:] = w
                ver_b[start:end] = b
                self._verifier_mask[start:end] = True

        # ---- shared frontend params ----
        # ``embedding``: "default" = the faithful speech_embedding CNN (with
        # the cached incremental evaluator); "student" = the TPU-shaped
        # distilled network (models/embedding_student.py) — same (76,32)->96
        # contract, 3 MXU-dense matmuls instead of 27 small convolutions.
        if embedding not in ("default", "student"):
            raise ValueError(f"embedding must be 'default' or 'student', got {embedding!r}")
        if embedding_params is None:
            from openwakeword_tpu.features import _load_embedding_params
            embedding_params = _load_embedding_params(embedding=embedding)
        if embedding_student.is_student(embedding_params):
            self.embedding = "student"
            self._emb_apply = embedding_student.apply
            self._emb_init_caches = embedding_student.init_caches
            self._emb_step = embedding_student.step
            emb_folded = embedding_params          # no BN to fold
        else:
            if embedding == "student":
                raise ValueError("embedding='student' but embedding_params is a "
                                 "faithful-CNN pytree; pass student params or omit "
                                 "embedding_params to load/init the student network")
            self.embedding = "default"
            self._emb_apply = embedding_model.apply_folded
            self._emb_init_caches = embedding_stream.init_caches
            self._emb_step = embedding_stream.step
            emb_folded = embedding_model.ensure_folded(embedding_params)

        # heads trained by train_cli record their feature frontend; a
        # frontend mismatch makes scores meaningless — flag it at load time
        for name, trained_on in head_frontends.items():
            if trained_on != self.embedding:
                logging.warning(
                    "Model '%s' was trained on the '%s' embedding frontend but "
                    "this engine runs embedding='%s'; its scores will be "
                    "unreliable. Construct the engine with embedding='%s'.",
                    name, trained_on, self.embedding, trained_on)

        self._vad_apply = vad_net.apply
        if self.vad_threshold > 0:
            if vad_params is None:
                from openwakeword_tpu.vad import load_vad_apply
                self._vad_apply, vad_params, _ = load_vad_apply()
            # an imported Silero program (models.silero) and the trainable
            # vad_net share the (params, x, h, c) -> (score, h', c') contract,
            # so the fused step is implementation-agnostic

        # stack fused-group params once at init
        for gid, names in self._stacked_groups.items():
            head_params[gid] = heads_lib.stack_params([head_params[n] for n in names])
            for n in names:
                del head_params[n]

        self.params = {"embedding": emb_folded, "heads": head_params}
        if self.vad_threshold > 0:
            self.params["vad"] = vad_params
        if self.precision == "bf16":
            # cast matmul/conv weights (>=2-D) to bf16; biases, norms and
            # per-channel affines stay f32 (elementwise, accuracy-critical).
            # Integer leaves (exact-int8 graph heads) must stay integer —
            # their arithmetic is fixed-point, not floating
            self.params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if (getattr(a, "ndim", 0) >= 2
                    and np.issubdtype(np.asarray(a).dtype, np.floating))
                else a,
                self.params)
        if self._use_verifiers:
            # Coefficients match the feature-ring dtype so the fused einsum
            # consumes both operands natively (bf16 inputs would otherwise
            # force a full (S, F*96) f32 promotion of the ring every step);
            # accumulation stays f32 via preferred_element_type, and in bf16
            # mode the ring's own quantization dominates any weight rounding.
            ver_dtype = jnp.bfloat16 if self.precision == "bf16" else jnp.float32
            self.params["verifier"] = {"w": jnp.asarray(ver_w, ver_dtype),
                                       "b": jnp.asarray(ver_b)}

        # ---- compiled programs ----
        self._step_fn = jax.jit(self._build_step(), donate_argnums=(1,))
        self._scan_fn = jax.jit(self._build_scan(), donate_argnums=(1,))

        # ---- state ----
        self._rng_seed = rng_seed
        self._seed_ring_cache: Dict[tuple, jnp.ndarray] = {}
        self.state = self.init_state(self.n_streams)
        if mesh is not None:
            self.shard(mesh)

        # ---- serving-capacity guardrails ----
        self._frame_budget_s = float(frame_budget_s)
        pinned = [n for n, m, _ in self._head_metas
                  if m.get("model_type") == "graph" and m.get("batch1_only")]
        if pinned and self.n_streams > 1:
            # the reference serves arbitrary user graphs at interpreter speed
            # (reference model.py:112-141); here a batch-pinned graph runs
            # per-sample under vmap inside the fused step — XLA batches it,
            # but the imported graph's own cost is unknown a priori and can
            # dominate the step (measured ladder: PERF_NOTES.md, graph-head
            # serving)
            logging.warning(
                "Graph head(s) %s have pinned batch-1 shapes and serve "
                "per-sample under vmap; their step cost is not covered by "
                "the native-head capacity ladder. Verify the configured %d "
                "streams are real-time on this device with "
                "measure_realtime(), or construct with "
                "realtime_guard='warn'|'error'.", pinned, self.n_streams)
        if realtime_guard is not None:
            if realtime_guard not in ("warn", "error"):
                raise ValueError(
                    "realtime_guard must be None, 'warn', or 'error'; got "
                    f"{realtime_guard!r}")
            m = self.measure_realtime()
            if not m["realtime"]:
                msg = (f"engine is NOT real-time at {self.n_streams} "
                       f"streams: measured {m['per_frame_s'] * 1e3:.2f} ms "
                       f"per {self._frame_budget_s * 1e3:.0f} ms frame "
                       f"(capacity ~{m['rt_streams']:,.0f} streams on this "
                       "device)")
                if realtime_guard == "error":
                    raise RuntimeError(msg)
                logging.warning(msg)

    # ------------------------------------------------------------------

    def init_state(self, n_streams: int, rng_seed: Optional[int] = None):
        """Fresh per-stream state, reproducing reference init semantics:
        mel ring of ones (utils.py:165), feature ring seeded with embeddings
        of 4 s of random noise (utils.py:169)."""
        seed = self._rng_seed if rng_seed is None else rng_seed
        rng = np.random.default_rng(seed)
        # One shared noise seed broadcast to all streams: streams are
        # identically initialized (the reference seeds per-instance noise,
        # utils.py:169; at 50k streams per-stream seeding would cost ~2M
        # embedding windows for no behavioral benefit).
        F = self.max_head_frames
        # 4 s of noise yields 41 embedding windows; a head with
        # input_frames > 41 needs a longer seed to fill its ring
        n_samples = 16000 * config.FEATURE_SEED_SECONDS
        need_mel_rows = 76 + 8 * (F - 1)
        n_samples = max(n_samples, (need_mel_rows + 4) * 160)
        noise = rng.integers(-1000, 1000, n_samples).astype(np.float32)

        # memoized per (seed, F): repeated reset()/init_state calls (e.g.
        # predict_clips batches) must not retrace the seeding CNN — a fresh
        # @jax.jit closure per call would recompile every time (jit caches
        # by function identity)
        cache_key = (seed, F, n_samples)
        seed_ring = self._seed_ring_cache.get(cache_key)
        if seed_ring is None:
            seed_ring = _seed_embeddings(self.params["embedding"],
                                         jnp.asarray(noise), F, self._emb_apply)
            self._seed_ring_cache[cache_key] = seed_ring
        feat_ring = jnp.broadcast_to(seed_ring[None], (n_streams, F, config.EMB_DIM))
        feat_ring = jnp.array(feat_ring)  # materialize (broadcast views can't be donated)
        S = n_streams
        state = {
            "pcm_tail": jnp.zeros((S, config.MEL_LOOKBACK_SAMPLES), jnp.float32),
            "mel_ring": jnp.ones((S, MEL_RING, config.N_MELS), jnp.float32),
            "feat_ring": feat_ring,
            "score_hist": jnp.zeros((S, len(self.labels), config.PREDICTION_BUFFER_MAX), jnp.float32),
            "frames_seen": jnp.zeros((S,), jnp.int32),   # processed frames (drives cache priming)
            "ticks": jnp.zeros((S,), jnp.int32),         # predict calls (drives warm-up)
        }
        if self._use_patience:
            # raw (pre-filter) score ring: what the patience filter reads
            state["raw_hist"] = jnp.zeros(
                (S, len(self.labels), config.PREDICTION_BUFFER_MAX), jnp.float32)
        if self.incremental:
            # Shape-correct PLACEHOLDER caches; the values are never read:
            # every stream starts at frames_seen==0, and the first step's
            # prime branch re-derives all caches from mel_ring before the
            # stream branch can consume them. eval_shape + zeros costs no
            # compute and no compile — actually running init_caches here
            # both paid a multi-minute tunnel compile per construction and
            # OOMed at 50k streams (the full-window CNN materialized ~21 GB
            # of intermediates for values that were about to be discarded).
            cache_shapes, _ = jax.eval_shape(
                self._emb_init_caches,
                self.params["embedding"], state["mel_ring"])
            state["conv_caches"] = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)
        if self.precision == "bf16":
            # activation rings in bf16: halves per-step HBM state traffic;
            # the compute path already quantizes to bf16 at every matmul.
            # PCM tail and score history stay f32 (raw audio needs the
            # mantissa; thresholds compare exact scores).
            for key in ("mel_ring", "feat_ring"):
                state[key] = state[key].astype(jnp.bfloat16)
            if "conv_caches" in state:
                state["conv_caches"] = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16), state["conv_caches"])
        if self.vad_threshold > 0:
            state["vad_h"] = jnp.zeros((S, config.VAD_STATE_LAYERS, config.VAD_STATE_DIM), jnp.float32)
            state["vad_c"] = jnp.zeros((S, config.VAD_STATE_LAYERS, config.VAD_STATE_DIM), jnp.float32)
            state["vad_ring"] = jnp.full((S, VAD_RING), -1.0, jnp.float32)
        if self.enable_noise_suppression:
            # suppressor state stays f32 even in bf16 mode: the PSD / noise
            # floor span ~12 orders of magnitude and feed a ratio
            state["ns"] = ns_jax.init_state(
                S, profile=self.noise_suppression_algorithm)
        return state

    def reset(self):
        self.state = self.init_state(self.n_streams)
        if self.mesh is not None:
            self.shard(self.mesh)

    def save_state(self, path: str):
        """Snapshot all per-stream state to disk (serving failover /
        migration). Params are not saved -- they are reproducible from the
        model files; only the stream rings/counters are stateful."""
        flat = {}
        def record(prefix, tree):
            for k, v in tree.items():
                if isinstance(v, dict):
                    record(f"{prefix}{k}/", v)
                else:
                    arr = np.asarray(v)
                    if arr.dtype == jnp.bfloat16:
                        flat[f"bf16:{prefix}{k}"] = arr.astype(np.float32)
                    else:
                        flat[f"{prefix}{k}"] = arr
        record("", self.state)
        with open(path, "wb") as f:
            np.savez(f, **flat)

    def load_state(self, path: str):
        """Restore a save_state snapshot (stream count must match)."""
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        def rebuild(prefix, template):
            out = {}
            for k, v in template.items():
                if isinstance(v, dict):
                    out[k] = rebuild(f"{prefix}{k}/", v)
                else:
                    key, bkey = f"{prefix}{k}", f"bf16:{prefix}{k}"
                    arr = flat[bkey].astype(jnp.bfloat16) if bkey in flat else flat[key]
                    if arr.shape != v.shape:
                        raise ValueError(f"state leaf '{prefix}{k}' shape {arr.shape} "
                                         f"!= engine shape {v.shape}")
                    out[k] = jnp.asarray(arr)
            return out
        self.state = rebuild("", self.state)
        if self.mesh is not None:
            self.shard(self.mesh)

    def shard(self, mesh: Mesh):
        """Lay out state (and replicate params) over a 1-D stream mesh; the
        jitted step then runs SPMD over ICI with no collectives.

        State shards assemble per-device (put_sharded), so sharding works in
        a multi-host process too: each process ships only the slot rows its
        devices own. Params are replicated with plain device_put — replication
        means every device holds the full array, and every host loads the
        same checkpoint, so there is nothing to split."""
        self.mesh = mesh
        replicated = NamedSharding(mesh, P())
        self.state = jax.tree.map(
            lambda x: put_sharded(np.asarray(x), mesh, P("streams")), self.state)
        self.params = jax.tree.map(lambda x: jax.device_put(x, replicated), self.params)

    # ------------------------------------------------------------------

    def _build_step(self, masked: bool = False):
        """The fused per-frame program. With ``masked`` the step takes an
        extra (S,) bool ``valid``: streams without a complete frame keep their
        audio state frozen and recycle their previous score (the reference's
        sub-frame contract, model.py:303-311) while the call-driven state
        (score history, warm-up tick) still advances — matching what the
        single-stream Model does on sub-frame predict calls.

        The multi-frame scan (_build_scan) runs this same body per frame: a
        restructured "steady" body with circular rings and no first-frame
        cond was built and measured strictly slower (dynamic-offset carry
        updates defeat XLA's in-place while-loop aliasing — PERF_NOTES.md
        round-2 negative results), so the full body is the scan body.
        """
        exec_plan = list(self._exec_plan)
        label_slices = list(self._label_slices)
        recycle_mask = jnp.asarray(self._recycle_mask)
        n_labels = len(self.labels)
        F = self.max_head_frames
        vad_on = self.vad_threshold > 0
        vad_threshold = self.vad_threshold
        vad_apply = self._vad_apply
        incremental = self.incremental
        use_pallas = self.use_pallas_melspec
        mel_dft = self.mel_dft
        mel_dtype = jnp.bfloat16 if self.precision == "bf16" else jnp.float32
        # per-stage MXU precision ('bf16' runs on bf16 weights: pass None so
        # the helpers take the native bf16 path)
        _mm = {"highest": None,                # helpers default to HIGHEST for f32
               "high": jax.lax.Precision.HIGH,
               "fast": jax.lax.Precision.DEFAULT,
               "bf16": None}
        cnn_mode = self._stage_modes["cnn"]
        mm_prec = (tuple(_mm[m] for m in cnn_mode)
                   if isinstance(cnn_mode, tuple) else _mm[cnn_mode])
        head_prec = _mm[self._stage_modes["heads"]]
        mel_prec = {"highest": jax.lax.Precision.HIGHEST,
                    "high": jax.lax.Precision.HIGH,
                    "fast": jax.lax.Precision.DEFAULT,
                    "bf16": None}[self._stage_modes["mel"]]
        use_patience, use_debounce = self._use_patience, self._use_debounce
        emb_apply, emb_init_caches, emb_step = (
            self._emb_apply, self._emb_init_caches, self._emb_step)
        ns_on = self.enable_noise_suppression
        ns_profile = self.noise_suppression_algorithm
        use_verifiers = self._use_verifiers
        if use_verifiers:
            verifier_mask = jnp.asarray(self._verifier_mask)
            verifier_threshold = self.custom_verifier_threshold
        patience_vec = jnp.asarray(self._patience_vec)
        threshold_vec = jnp.asarray(self._threshold_vec)
        debounce_frames = self._debounce_frames
        top_db = config.MEL_TOP_DB

        def step(params, state, chunk, valid=None):
            """(params, state, (S, 1280) float32 raw PCM[, (S,) bool]) ->
            (state', (S, L) scores)."""
            chunk = chunk.astype(jnp.float32)
            raw_chunk = chunk   # the VAD hears unsuppressed audio (host contract)
            if ns_on:
                ns_state, chunk = ns_jax.process_chunk(state["ns"], chunk,
                                                       profile=ns_profile)
            window = jnp.concatenate([state["pcm_tail"], chunk], axis=-1)     # (S, 1760)
            if use_pallas:
                from openwakeword_tpu.ops.melspec_pallas import melspectrogram_pallas
                mel_raw = melspectrogram_pallas(window, precision=mel_prec,
                                                dft=mel_dft)                  # (S, 8, 32) dB
            else:
                mel_raw = melspec_ops.melspectrogram(window, apply_transform=False,
                                                     top_db=None,
                                                     compute_dtype=mel_dtype,
                                                     precision=mel_prec,
                                                     dft=mel_dft)             # (S, 8, 32) dB

            # First call after init/reset has no PCM look-back: the reference
            # computes only 5 frames there (utils.py:393-397, window shorter
            # than n+480). Frames 0..2 of our fixed window are fabricated from
            # the zero tail then, so exclude them from the ring AND from the
            # data-dependent top_db peak (clamp scope = the frames the
            # reference's per-call graph invocation actually saw).
            is_first = (state["frames_seen"] == 0)
            frame_valid = jnp.arange(8)[None, :] >= jnp.where(is_first, 3, 0)[:, None]  # (S, 8)
            if top_db is not None:
                peak = jnp.max(jnp.where(frame_valid[:, :, None], mel_raw, -jnp.inf),
                               axis=(-2, -1), keepdims=True)
                mel_raw = jnp.maximum(mel_raw, peak - top_db)
            mel = mel_raw * config.MEL_TRANSFORM_SCALE + config.MEL_TRANSFORM_SHIFT

            ring_dtype = state["mel_ring"].dtype
            mel = mel.astype(ring_dtype)
            ring8 = jnp.concatenate([state["mel_ring"][:, 8:], mel], axis=1)
            ring5 = jnp.concatenate([state["mel_ring"][:, 5:], mel[:, 3:]], axis=1)
            mel_ring = jnp.where(is_first[:, None, None], ring5, ring8)

            if incremental:
                # The prime branch re-derives every stream's activation
                # caches from its 76-row mel_ring (the CNN's receptive field
                # is exactly 76 frames, so the caches are a pure function of
                # the ring — correct for steady streams too); the stream
                # branch advances only the 8 new rows. In the masked step a
                # frozen slot keeps frames_seen==0 indefinitely (unleased
                # server slots), so only VALID first-frames may trigger the
                # prime — otherwise one empty slot would force the ~8x prime
                # path for the whole pool on every serving tick.
                any_first = jnp.any(is_first & valid) if masked else jnp.any(is_first)

                def prime(_):
                    # The full 76-row CNN over ALL S streams materializes an
                    # (S, 74, 32, 24) stem activation — 10.6 GB at 50k
                    # streams, blowing HBM even though the branch runs once
                    # per stream lifetime (XLA allocates cond branches up
                    # front). Chunk the prime over stream blocks with
                    # lax.map so its temps stay bounded; the remainder runs
                    # as one extra static call.
                    S = mel_ring.shape[0]
                    blk = int(config.PRIME_BLOCK_STREAMS)
                    if S <= blk:
                        return emb_init_caches(params["embedding"], mel_ring,
                                               precision=mm_prec)
                    n_full = (S // blk) * blk

                    def one(block_ring):
                        return emb_init_caches(params["embedding"], block_ring,
                                               precision=mm_prec)

                    caches_a, emb_a = jax.lax.map(
                        one, mel_ring[:n_full].reshape(
                            n_full // blk, blk, *mel_ring.shape[1:]))
                    caches_a = jax.tree.map(
                        lambda a: a.reshape(n_full, *a.shape[2:]), caches_a)
                    emb_a = emb_a.reshape(n_full, *emb_a.shape[2:])
                    if n_full == S:
                        return caches_a, emb_a
                    caches_b, emb_b = one(mel_ring[n_full:])
                    caches = jax.tree.map(
                        lambda a, b: jnp.concatenate([a, b], axis=0),
                        caches_a, caches_b)
                    return caches, jnp.concatenate([emb_a, emb_b], axis=0)

                def stream(_):
                    return emb_step(params["embedding"],
                                    state["conv_caches"], mel,
                                    precision=mm_prec)

                conv_caches, emb = jax.lax.cond(any_first, prime, stream, None)
                conv_caches = jax.tree.map(
                    lambda a, ref: a.astype(ref.dtype), conv_caches, state["conv_caches"])
            else:
                emb = emb_apply(params["embedding"], mel_ring,
                                precision=mm_prec)                             # (S, 96)
            feat_ring = jnp.concatenate(
                [state["feat_ring"][:, 1:],
                 emb[:, None, :].astype(state["feat_ring"].dtype)], axis=1)

            # score all heads: fused-group heads run as stacked einsums
            label_cols = [None] * n_labels
            for kind, key, meta, members in exec_plan:
                fh = int(meta["input_frames"])
                w = feat_ring[:, F - fh:, :]
                if kind == "stacked":
                    out = heads_lib.forward_stacked(params["heads"][key], w, meta,
                                                    precision=head_prec)            # (S,H,C)
                    for h, (name, cols, start) in enumerate(members):
                        for j, c in enumerate(cols):
                            label_cols[start + j] = out[:, h, c]
                else:
                    out = heads_lib.forward(params["heads"][key], w, meta,
                                            precision=head_prec)                    # (S,C)
                    name, cols, start = members[0]
                    for j, c in enumerate(cols):
                        label_cols[start + j] = out[:, c]
            scores = jnp.stack(label_cols, axis=-1)                                 # (S, L)

            if masked:
                recycled = state["score_hist"][:, :, -1] * recycle_mask
                scores = jnp.where(valid[:, None], scores, recycled)

            if use_verifiers:
                # Second-stage speaker verification (host contract:
                # model.py._apply_verifiers, reference model.py:319-328):
                # every label at or above the verifier threshold — including
                # a recycled score on a starved masked slot, exactly as the
                # host re-verifies recycle ticks — is replaced by its parent
                # model's folded verifier applied to the same feature window
                # the head saw (a starved slot's window stays frozen).
                ver_ring = feat_ring
                if masked:
                    v = valid[:, None, None]
                    ver_ring = jnp.where(v, feat_ring, state["feat_ring"])
                # Feed the ring at its stored dtype (bf16 in low-precision
                # mode) and accumulate in f32 — avoids materializing a full
                # (S, F*96) f32 transient at 50k-stream scale.
                wflat = ver_ring.reshape(ver_ring.shape[0], -1)
                ver_scores = jax.nn.sigmoid(
                    jnp.einsum("sf,lf->sl", wflat, params["verifier"]["w"],
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
                    + params["verifier"]["b"])
                scores = jnp.where(verifier_mask[None, :]
                                   & (scores >= verifier_threshold),
                                   ver_scores, scores)

            # Shared warm-up / patience / debounce post-processing (gating.py;
            # the host Model runs the same functions with numpy)
            scores = gating.warmup_zero(jnp, scores, state["ticks"])
            raw_scores = scores
            hist = state["score_hist"]                                         # (S, L, HIST)
            if use_patience:
                # patience reads the RAW score history (see patience_filter)
                scores = gating.patience_filter(jnp, scores, state["raw_hist"],
                                                patience_vec, threshold_vec)
            elif use_debounce:
                scores = gating.debounce_filter(jnp, scores, hist,
                                                threshold_vec, debounce_frames)
            hist = gating.push_history(jnp, hist, scores)

            new_state = {
                "pcm_tail": window[:, -config.MEL_LOOKBACK_SAMPLES:],
                "score_hist": hist,
                "frames_seen": state["frames_seen"] + 1,
                "ticks": state["ticks"] + 1,
            }
            if ns_on:
                new_state["ns"] = ns_state
            if use_patience:
                raw_push = raw_scores
                if masked:
                    # a starved stream must not feed its recycled *filtered*
                    # score back into the raw history (a starvation gap could
                    # break — or a recycled activation falsely extend — an
                    # in-progress patience streak); repeat its last raw score
                    # instead, under the same binary-label recycle rule
                    prev_raw = state["raw_hist"][:, :, -1] * recycle_mask
                    raw_push = jnp.where(valid[:, None], raw_scores, prev_raw)
                new_state["raw_hist"] = gating.push_history(
                    jnp, state["raw_hist"], raw_push)
            new_state["mel_ring"] = mel_ring
            new_state["feat_ring"] = feat_ring
            if incremental:
                new_state["conv_caches"] = conv_caches
            if masked:
                # freeze the audio-path state of streams that had no frame;
                # score history / tick advance for every call (as the host
                # Model's sub-frame predict calls do)
                def keep(new, old):
                    v = valid.reshape((-1,) + (1,) * (new.ndim - 1))
                    return jnp.where(v, new, old)
                for key in ("pcm_tail", "mel_ring", "feat_ring"):
                    new_state[key] = keep(new_state[key], state[key])
                new_state["frames_seen"] = jnp.where(valid, new_state["frames_seen"],
                                                     state["frames_seen"])
                if incremental:
                    new_state["conv_caches"] = jax.tree.map(
                        keep, new_state["conv_caches"], state["conv_caches"])
                if ns_on:
                    # a starved slot heard no audio: its suppressor state
                    # (noise floor, overlap tail, frame counter) stays frozen
                    new_state["ns"] = jax.tree.map(
                        keep, new_state["ns"], state["ns"])

            if vad_on:
                # reference VAD call path: two 640-sample chunks per 80 ms
                # frame, scores averaged (vad.py:129 uses frame_size=640);
                # each 640-sample chunk maps to 4 LSTM steps covering samples
                # 0..591 — the 48-sample sub-hop tail of a non-480-multiple
                # chunk is unseen (vad_net.py framing contract)
                h = jnp.swapaxes(state["vad_h"], 0, 1)                         # (2, S, 64)
                c = jnp.swapaxes(state["vad_c"], 0, 1)
                s1, h, c = vad_apply(params["vad"], raw_chunk[:, 0:640] / 32767.0, h, c)
                s2, h, c = vad_apply(params["vad"], raw_chunk[:, 640:1280] / 32767.0, h, c)
                vad_score = (s1 + s2) / 2.0
                vad_ring = jnp.concatenate([state["vad_ring"][:, 1:], vad_score[:, None]], axis=-1)
                new_state["vad_h"] = jnp.swapaxes(h, 0, 1)
                new_state["vad_c"] = jnp.swapaxes(c, 0, 1)
                new_state["vad_ring"] = vad_ring
                if masked:
                    # a starved stream has no audio for the VAD either: its
                    # recurrent state and gate ring stay frozen
                    for key in ("vad_h", "vad_c", "vad_ring"):
                        v = valid.reshape((-1,) + (1,) * (new_state[key].ndim - 1))
                        new_state[key] = jnp.where(v, new_state[key], state[key])
                    vad_ring = new_state["vad_ring"]
                # gate window ring[0:3] == prediction_buffer[-7:-4]
                scores = gating.vad_gate(jnp, scores, vad_ring[:, 0:3], vad_threshold)

            return new_state, scores

        return step

    def _build_scan(self):
        step = self._build_step()
        unroll = self.scan_unroll
        if not self.incremental:
            def scan_clips(params, state, frames):
                """frames: (T, S, 1280) -> (state', (T, S, L) scores)."""
                def body(st, fr):
                    return step(params, st, fr)
                return jax.lax.scan(body, state, frames, unroll=unroll)
            return scan_clips

        n_labels = len(self.labels)

        def scan_clips(params, state, frames):
            """frames: (T, S, 1280) -> (state', (T, S, L) scores).

            A restructured steady-state body (peeled prime frame, circular
            double-buffered rings, no first-frame cond) was built and A/B
            measured strictly slower than scanning the full step -- the
            dynamic-offset carry updates defeat XLA's in-place while-loop
            aliasing, forcing per-frame ring copies that outweigh the
            concat-shift traffic they replace (PERF_NOTES.md round-2
            negative results, 91.2-92.9k vs 98.8k rt streams at 'high').
            The full step is the scan body.
            """
            if frames.shape[0] == 0:
                S = jax.tree.leaves(state)[0].shape[0]
                return state, jnp.zeros((0, S, n_labels), jnp.float32)

            def body(st, fr):
                return step(params, st, fr)
            return jax.lax.scan(body, state, frames, unroll=unroll)
        return scan_clips

    # ------------------------------------------------------------------

    def _feed(self, arr, spec) -> jax.Array:
        """Host array -> device input for the jitted step. Unsharded engines
        transfer whole; mesh engines assemble from per-device shards
        (put_sharded), so the same feed path works on a multi-host pod where
        no process holds remote devices."""
        arr = np.asarray(arr)
        if arr.dtype not in (np.dtype(np.int16), np.dtype(bool),
                             np.dtype(np.int64)):
            arr = arr.astype(np.float32, copy=False)
        if self.mesh is not None:
            return put_sharded(arr, self.mesh, spec)
        return jnp.asarray(arr)

    def predict(self, chunks: np.ndarray) -> np.ndarray:
        """Advance every stream by one 80 ms frame.

        Args:
            chunks: (n_streams, 1280) int16/float PCM.
        Returns:
            (n_streams, n_labels) float32 scores, ordered like ``self.labels``.
        """
        x = self._feed(chunks, P("streams"))
        self.state, scores = self._step_fn(self.params, self.state, x)
        return fetch_sharded(scores)

    def predict_masked(self, chunks: np.ndarray, valid: np.ndarray,
                       sync: bool = True) -> np.ndarray:
        """Advance only the streams with a complete frame (packetized
        serving). Streams with ``valid[i] == False`` keep their audio state
        and recycle their previous score exactly like the single-stream
        Model's sub-frame predict calls.

        Args:
            chunks: (n_streams, 1280) PCM (rows of invalid streams ignored).
            valid: (n_streams,) bool.
            sync: fetch scores to host numpy (default). ``sync=False``
                returns the device array un-synchronized — the pipelined
                serving path (StreamServer.step_async) fetches it on a
                worker thread while the host ingests the next tick.
        Returns:
            (n_streams, n_labels) float32 scores.
        """
        if not hasattr(self, "_step_masked_fn"):
            self._step_masked_fn = jax.jit(self._build_step(masked=True),
                                           donate_argnums=(1,))
        x = self._feed(chunks, P("streams"))
        v = self._feed(np.asarray(valid, dtype=bool), P("streams"))
        self.state, scores = self._step_masked_fn(self.params, self.state, x, v)
        return fetch_sharded(scores) if sync else scores

    def predict_packets(self, stage: np.ndarray, slot_ids: np.ndarray,
                        sync: bool = True) -> np.ndarray:
        """Masked step fed by a *compact staging buffer* instead of a
        slot-ordered chunk matrix: row j of ``stage`` is the frame for slot
        ``slot_ids[j]``; rows with ``slot_ids[j] < 0`` are padding. The
        slot-reorder scatter and the valid mask are built ON DEVICE
        (HBM-bandwidth scatter), so the serving host never pays an
        O(capacity)-row scatter per tick — it appends packets contiguously
        and hands the buffer over (StreamServer's steady fast path).

        Args:
            stage: (n_streams, 1280) PCM; only the rows named by slot_ids
                are read.
            slot_ids: (n_streams,) int64, -1 = unused row.
        Returns:
            (n_streams, n_labels) float32 scores (invalid slots recycle,
            exactly like predict_masked).
        """
        if not hasattr(self, "_step_packets_fn"):
            masked_step = self._build_step(masked=True)

            def packet_step(params, state, stage, ids):
                okay = ids >= 0
                # scatters WRAP negative indices before mode='drop' applies,
                # so a -1 padding row would land on slot capacity-1 and
                # starve it; remap padding to an out-of-bounds-HIGH index,
                # which mode='drop' genuinely discards
                safe = jnp.where(okay, ids, stage.shape[0])
                chunk = jnp.zeros(stage.shape, stage.dtype)
                chunk = chunk.at[safe].set(stage, mode="drop")
                valid = jnp.zeros(stage.shape[0], bool).at[safe].set(
                    okay, mode="drop")
                return masked_step(params, state, chunk, valid)

            self._step_packets_fn = jax.jit(packet_step, donate_argnums=(1,))
        x = self._feed(stage, P("streams"))
        ids = self._feed(np.asarray(slot_ids, np.int64), P("streams"))
        self.state, scores = self._step_packets_fn(self.params, self.state, x, ids)
        return fetch_sharded(scores) if sync else scores

    def measure_realtime(self, n_frames: int = 25, repeats: int = 3,
                         frame_budget_s: Optional[float] = None) -> Dict:
        """Measure the compiled steady-state step cost on the current device
        against the real-time budget (one 80 ms frame per stream per 80 ms
        wall — the reference's bar, reference model.py:237-241).

        Runs the engine's own multi-frame scan program on zero PCM; serving
        state is snapshotted and restored, so the measurement is
        side-effect free. Returns ``{"wall_s", "per_frame_s", "rt_streams",
        "realtime"}`` where ``rt_streams`` is the stream count this device
        sustains in real time at the measured per-stream cost.
        """
        import time as _time
        budget = self._frame_budget_s if frame_budget_s is None \
            else float(frame_budget_s)
        # the scan donates state buffers — keep a real copy, not a reference
        saved = jax.tree.map(jnp.copy, self.state)
        frames = np.zeros((n_frames, self.n_streams, 1280), np.int16)
        try:
            self.predict_frames(frames)               # compile + warm
            best = float("inf")
            for _ in range(repeats):
                t0 = _time.perf_counter()
                self.predict_frames(frames)           # np.asarray = sync fetch
                best = min(best, _time.perf_counter() - t0)
        finally:
            self.state = saved
        per_frame = best / n_frames
        return {"wall_s": best, "per_frame_s": per_frame,
                "rt_streams": self.n_streams * budget / per_frame,
                "realtime": per_frame <= budget}

    def predict_frames(self, frames: np.ndarray) -> np.ndarray:
        """Advance every stream by T frames in one device program.

        Args:
            frames: (T, n_streams, 1280) PCM.
        Returns:
            (T, n_streams, n_labels) scores.
        """
        x = self._feed(frames, P(None, "streams"))
        self.state, scores = self._scan_fn(self.params, self.state, x)
        return fetch_sharded(scores)

    def predict_clips(self, clips: np.ndarray, padding: int = 1) -> np.ndarray:
        """Score a batch of equal-length clips (n_streams, samples), with the
        reference predict_clip's 1 s zero padding. Returns (T, S, L) scores."""
        S, n = clips.shape
        if S != self.n_streams:
            raise ValueError(f"Engine built for {self.n_streams} streams, got {S} clips")
        if padding:
            z = np.zeros((S, 16000 * padding), dtype=clips.dtype)
            clips = np.concatenate([z, clips, z], axis=1)
        n = clips.shape[1]
        # reference predict_clip frame count: len(range(0, n-1280, 1280))
        T = -(-(n - config.CHUNK_SAMPLES) // config.CHUNK_SAMPLES)
        if T <= 0:
            # clips of <= one frame with padding=0: the reference's chunk
            # range is empty and it returns no predictions
            return np.zeros((0, S, len(self.labels)), dtype=np.float32)
        frames = np.stack([clips[:, i * 1280:(i + 1) * 1280] for i in range(T)])
        self.reset()
        return self.predict_frames(frames)

#!/usr/bin/env python
"""One-command verification of the reference's released model artifacts.

The |dScore| < 1e-3 north star (BASELINE.md) needs the real released
``.onnx``/``.tflite`` files, which cannot be fetched in a zero-egress
environment. This script makes the verification a single command the moment
the artifacts are available:

    python verify_artifacts.py --download            # fetch + verify + install
    python verify_artifacts.py --artifacts-dir DIR   # verify files you provide

For every artifact found it runs three layers of checks:

1. **Structural import** (io.onnx_import / io.tflite_import): the fast
   importers parse the graph into native param pytrees.
2. **Independent-path agreement**: for .onnx files the generic graph compiler
   (io.onnx_graph) executes the *actual dataflow graph* and must agree with
   the structural import running through the native modules (and, for
   melspectrogram.onnx, with the analytic ops.melspec) to < 1e-3 on real
   audio from the reference test clips.
3. **onnxruntime oracle** (when installed): graph outputs are compared
   against onnxruntime on the same inputs — the literal north-star check.

With ``--install`` the verified artifacts are converted to native ``.npz``
checkpoints in the package's resources/models/, after which end-to-end
``Model.predict_clip`` scores on the reference clips are checked against the
filename contract (clip must score >= 0.5 on its own model, < 0.5 on others;
reference tests/test_models.py:151-177).

Reference provenance of each artifact: conversion notebook cells 15 (melspec
torchlibrosa export), 18-20 (embedding Keras->TFLite), train.py:419-432
(head torch exports), vad.py:60-96 (silero_vad.onnx usage).
"""

import argparse
import json
import os
import sys
from typing import Dict, List, Optional

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CLIP_DIR_DEFAULT = "/root/reference/tests/data"

HEAD_NAMES = ["alexa_v0.1", "hey_mycroft_v0.1", "hey_jarvis_v0.1",
              "hey_rhasspy_v0.1", "timer_v0.1", "weather_v0.1"]


def _load_clip_audio(clips_dir: str, seconds: float = 2.0) -> np.ndarray:
    """Real test audio (int16-range float32, (1, N)) for comparisons; falls
    back to deterministic noise when no clips are available."""
    import wave
    target = int(16000 * seconds)
    for name in ("alexa_test.wav", "hey_mycroft_test.wav", "hey_jane.wav"):
        path = os.path.join(clips_dir, name)
        if os.path.exists(path):
            with wave.open(path, "rb") as w:
                data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
            if data.size < target:   # loop short clips up to the target length
                data = np.tile(data, -(-target // data.size))
            return data[:target].astype(np.float32)[None]
    rng = np.random.default_rng(0)
    return rng.integers(-8000, 8000, (1, int(16000 * seconds))).astype(np.float32)


def _ort_run(path: str, feeds: Dict[str, np.ndarray]) -> Optional[List[np.ndarray]]:
    """Run through onnxruntime if importable; None otherwise."""
    try:
        import onnxruntime as ort
    except ImportError:
        return None
    sess = ort.InferenceSession(path, providers=["CPUExecutionProvider"])
    names = {i.name for i in sess.get_inputs()}
    return sess.run(None, {k: v for k, v in feeds.items() if k in names})


class Report:
    def __init__(self):
        self.rows: List[Dict] = []

    def add(self, artifact: str, check: str, ok: bool, detail: str = ""):
        self.rows.append({"artifact": artifact, "check": check,
                          "ok": bool(ok), "detail": detail})
        mark = "PASS" if ok else "FAIL"
        print(f"  [{mark}] {artifact:28s} {check:34s} {detail}")

    def skip(self, artifact: str, check: str, detail: str):
        self.rows.append({"artifact": artifact, "check": check,
                          "ok": None, "detail": detail})
        print(f"  [skip] {artifact:28s} {check:34s} {detail}")

    @property
    def failed(self) -> List[Dict]:
        return [r for r in self.rows if r["ok"] is False]


def verify_melspectrogram(path: str, audio: np.ndarray, rep: Report):
    import jax
    from openwakeword_tpu import config
    from openwakeword_tpu.io.onnx_graph import load_program
    from openwakeword_tpu.ops import melspec as ms

    name = os.path.basename(path)
    if path.endswith(".tflite"):
        # no TFLite runtime in this environment: verify structurally -- the
        # graph parses and its DFT/mel constants match the analytic frontend
        # (the op program numerics are pinned via the ONNX twin)
        from openwakeword_tpu.io import tflite_import as TL
        model = TL.load_tflite(path)
        consts = {t["name"]: t["data"] for t in model["tensors"]
                  if t["data"] is not None}
        basis_t = next((v for k, v in consts.items() if "dft" in k.lower()
                        or (v is not None and v.size == 512 * 514)), None)
        mel_t = next((v for k, v in consts.items()
                      if v is not None and v.size == 257 * 32), None)
        ok_b = basis_t is not None and np.array_equal(
            basis_t.reshape(514, 512),
            np.asarray(ms.stft_power_basis(), np.float32).T)
        ok_m = mel_t is not None and np.array_equal(
            mel_t.reshape(-1, 257) if mel_t.shape[0] != 257 else mel_t.T,
            np.asarray(ms.mel_filterbank(), np.float32).T)
        rep.add(name, "parses + DFT basis matches analytic", bool(ok_b),
                f"{len(model['operators'])} ops")
        rep.add(name, "mel filterbank matches analytic", bool(ok_m), "")
        return
    prog = load_program(path)
    feeds = {prog.input_names[0]: audio}
    out = prog.apply(prog.params, feeds)
    graph_db = np.asarray(list(out.values())[0]).squeeze()        # (T, 32)
    rep.add(name, "graph compiles+runs", True,
            f"{len(prog.nodes)} nodes -> {graph_db.shape}")

    analytic = np.asarray(ms.melspectrogram(
        audio, apply_transform=False, top_db=config.MEL_TOP_DB)).squeeze()
    if analytic.shape == graph_db.shape:
        d = np.abs(analytic - graph_db).max()
        rep.add(name, "analytic ops.melspec parity", d < 1e-3, f"max|d|={d:.2e} dB")
    else:
        rep.add(name, "analytic ops.melspec parity", False,
                f"shape mismatch {analytic.shape} vs {graph_db.shape}")

    ort_out = _ort_run(path, feeds)
    if ort_out is None:
        rep.skip(name, "onnxruntime oracle", "onnxruntime not installed")
    else:
        d = np.abs(np.asarray(ort_out[0]).squeeze() - graph_db).max()
        rep.add(name, "onnxruntime oracle", d < 1e-3, f"max|d|={d:.2e} dB")


def verify_embedding(path: str, audio: np.ndarray, rep: Report) -> Optional[Dict]:
    import jax.numpy as jnp
    from openwakeword_tpu.io.loaders import load_model_file
    from openwakeword_tpu.models import embedding
    from openwakeword_tpu.ops import melspec as ms

    name = os.path.basename(path)
    kind, params, meta = load_model_file(path)
    if kind != "embedding":
        rep.add(name, "structural import", False, f"classified as '{kind}'")
        return None
    rep.add(name, "structural import", True,
            f"{sum(1 for k in params if k.startswith('conv'))} convs")

    mel = np.asarray(ms.log_mel_features(audio))[0]               # (T, 32)
    window = mel[:76][None, :, :, None].astype(np.float32)        # (1, 76, 32, 1)
    native = np.asarray(embedding.apply_folded(embedding.ensure_folded(params),
                                               jnp.asarray(window))).reshape(-1)

    if path.endswith(".onnx"):
        from openwakeword_tpu.io.onnx_graph import load_program
        prog = load_program(path)
        out = prog.apply(prog.params, {prog.input_names[0]: window})
        via_graph = np.asarray(list(out.values())[0]).reshape(-1)
        d = np.abs(native - via_graph).max()
        rep.add(name, "structural vs graph-executor", d < 1e-3, f"max|d|={d:.2e}")
        ort_out = _ort_run(path, {prog.input_names[0]: window})
        if ort_out is None:
            rep.skip(name, "onnxruntime oracle", "onnxruntime not installed")
        else:
            d = np.abs(np.asarray(ort_out[0]).reshape(-1) - native).max()
            rep.add(name, "onnxruntime oracle", d < 1e-3, f"max|d|={d:.2e}")
    else:
        rep.add(name, "embedding output sane", np.isfinite(native).all()
                and native.shape == (96,), f"96-dim, |max|={np.abs(native).max():.3f}")
    return params


def verify_head(path: str, rep: Report) -> Optional[Dict]:
    import jax.numpy as jnp
    from openwakeword_tpu.io.loaders import load_model_file
    from openwakeword_tpu.models import heads

    name = os.path.basename(path)
    kind, params, meta = load_model_file(path)
    if kind != "head":
        rep.add(name, "structural import", False, f"classified as '{kind}'")
        return None
    m = params["__meta__"]
    rep.add(name, "structural import", True,
            f"{m['model_type']}, {m['input_frames']}x96 -> {m['n_classes']}")

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (4, m["input_frames"], 96)).astype(np.float32)
    native = np.asarray(heads.apply(params, jnp.asarray(x)))

    if path.endswith(".onnx"):
        from openwakeword_tpu.io.onnx_graph import load_program
        prog = load_program(path)
        out = prog.apply(prog.params, {prog.input_names[0]: x})
        via_graph = np.asarray(list(out.values())[0]).reshape(native.shape)
        d = np.abs(native - via_graph).max()
        rep.add(name, "structural vs graph-executor", d < 1e-3, f"max|d|={d:.2e}")
        ort_out = _ort_run(path, {prog.input_names[0]: x})
        if ort_out is None:
            rep.skip(name, "onnxruntime oracle", "onnxruntime not installed")
        else:
            d = np.abs(np.asarray(ort_out[0]).reshape(native.shape) - native).max()
            rep.add(name, "onnxruntime oracle", d < 1e-3, f"max|d|={d:.2e}")
    return params, meta if kind == "head" else None


def verify_vad(path: str, audio: np.ndarray, rep: Report) -> Optional[Dict]:
    import jax
    from openwakeword_tpu.io.loaders import load_model_file
    from openwakeword_tpu.models import silero

    name = os.path.basename(path)
    kind, params, meta = load_model_file(path)
    if kind != "vad" or meta.get("format") != "onnx_program":
        rep.add(name, "structural import", False, f"classified as '{kind}'")
        return None
    prog = silero.from_meta(meta, params)
    rep.add(name, "structural import", True,
            f"{len(prog.program.nodes)} nodes after If fold")

    x = (audio[:, :640] / 32767.0).astype(np.float32)
    z = np.zeros((2, 1, 64), np.float32)
    score, h, c = jax.jit(prog.apply)(prog.params, x, z, z)
    ok = bool(np.isfinite(score).all() and 0.0 <= float(score[0]) <= 1.0
              and np.abs(np.asarray(h)).max() > 0)
    rep.add(name, "scores+state sane", ok, f"score={float(score[0]):.4f}")

    ort_out = _ort_run(path, {"input": x, "h": z, "c": z,
                              "sr": np.asarray(16000, np.int64)})
    if ort_out is None:
        rep.skip(name, "onnxruntime oracle", "onnxruntime not installed")
    else:
        d = abs(float(np.asarray(ort_out[0]).reshape(-1)[0]) - float(score[0]))
        rep.add(name, "onnxruntime oracle", d < 1e-3, f"|d|={d:.2e}")
    return params, meta


def cross_format_consistency(imported: Dict[str, Dict[str, Dict]], rep: Report):
    """The reference releases every model as BOTH .onnx and .tflite of the
    same weights; when both imported, the recovered params must agree. The
    two embedding layouts differ (ONNX keeps raw BatchNorms, the TFLite
    converter folds them), so the ONNX side is folded before comparing --
    fold-then-compare tolerance is float32 arithmetic, not exactness."""
    import jax
    from openwakeword_tpu.models import embedding

    for stem, by_ext in sorted(imported.items()):
        if len(by_ext) < 2:
            continue
        a, b = by_ext[".onnx"], by_ext[".tflite"]
        if "embedding" in stem:
            a = jax.device_get(embedding.ensure_folded(a))
        a = {k: v for k, v in a.items() if k != "__meta__"}
        b = {k: v for k, v in b.items() if k != "__meta__"}
        if set(a) != set(b):
            rep.add(stem, "onnx/tflite consistency", False,
                    f"param groups differ: {sorted(set(a) ^ set(b))}")
            continue
        problem = None
        worst = 0.0
        for name in sorted(a):
            if set(a[name]) != set(b[name]):
                problem = (f"{name} fields differ: "
                           f"{sorted(set(a[name]) ^ set(b[name]))}")
                break
            for field in a[name]:
                x = np.asarray(a[name][field], np.float32)
                y = np.asarray(b[name][field], np.float32)
                if x.shape != y.shape:
                    problem = f"{name}/{field} shape {x.shape} vs {y.shape}"
                    break
                d = np.abs(x - y)
                if d.size and not np.isfinite(d).all():
                    # NaN would be silently dropped by max(); fail loudly
                    problem = f"{name}/{field} has non-finite differences"
                    break
                worst = max(worst, float(d.max()) if d.size else 0.0)
            if problem:
                break
        if problem:
            rep.add(stem, "onnx/tflite consistency", False, problem)
        else:
            rep.add(stem, "onnx/tflite consistency", worst < 1e-4,
                    f"max|d|={worst:.2e}")


def install_npz(install_dir: str, name: str, kind: str, params: Dict, meta: Dict):
    from openwakeword_tpu.io.checkpoints import save_checkpoint
    out = os.path.join(install_dir, name + ".npz")
    save_checkpoint(out, kind, params, meta)
    return out


def end_to_end(clips_dir: str, install_dir: str, installed_heads: List[str],
               rep: Report, strict_scores: bool = False):
    """Filename contract on the reference clips (reference
    tests/test_models.py:151-177), run against the installed checkpoints.
    Score thresholds are only *enforced* with strict_scores (real released
    weights); otherwise the scores are reported informationally."""
    import openwakeword_tpu as oww
    clips = [f for f in (os.listdir(clips_dir) if os.path.isdir(clips_dir) else [])
             if f.endswith(".wav")]
    head_paths = [os.path.join(install_dir, h + ".npz") for h in installed_heads]
    head_paths = [p for p in head_paths if os.path.exists(p)]
    if not clips or not head_paths:
        rep.skip("end-to-end", "filename score contract", "no clips or heads")
        return
    model = oww.Model(wakeword_models=head_paths)
    for clip in clips:
        preds = model.predict_clip(os.path.join(clips_dir, clip))
        maxes = {k: max(p[k] for p in preds) for k in preds[0]}
        for label, mx in maxes.items():
            parent = model.get_parent_model_from_label(label)
            expected_pos = parent in clip or label in clip
            if strict_scores and expected_pos:
                rep.add("end-to-end", f"{clip} ~ {label} >= 0.5", mx >= 0.5, f"{mx:.3f}")
            elif strict_scores and mx >= 0.5:
                rep.add("end-to-end", f"{clip} ~ {label} < 0.5", False, f"{mx:.3f}")
            else:
                rep.skip("end-to-end", f"{clip} ~ {label}",
                         f"max={mx:.3f} ({'pos' if expected_pos else 'neg'} clip"
                         f"{', strict off' if not strict_scores else ''})")
        model.reset()


def run(artifacts_dir: str, clips_dir: str = CLIP_DIR_DEFAULT,
        download: bool = False, install: bool = False,
        install_dir: Optional[str] = None, strict_scores: bool = False) -> Report:
    import jax
    jax.config.update("jax_platforms", os.environ.get("OWWT_VERIFY_PLATFORM", "cpu"))

    rep = Report()
    if download:
        from openwakeword_tpu.utils.download import download_models
        try:
            download_models(target_directory=artifacts_dir)
        except Exception as e:  # zero-egress environments
            rep.skip("download", "fetch artifacts", f"{type(e).__name__}: {e}")

    if not os.path.isdir(artifacts_dir):
        print(f"No artifacts directory at {artifacts_dir}; nothing to verify.")
        rep.skip("artifacts", "directory present", artifacts_dir)
        return rep

    audio = _load_clip_audio(clips_dir)
    files = sorted(os.listdir(artifacts_dir))
    if install_dir is None:
        from openwakeword_tpu import registry
        install_dir = os.path.dirname(registry.MODELS["alexa"]["model_path"])

    installed_heads: List[str] = []
    imported: Dict[str, Dict[str, Dict]] = {}   # stem -> ext -> params
    for f in files:
        path = os.path.join(artifacts_dir, f)
        stem, ext = os.path.splitext(f)
        if ext not in (".onnx", ".tflite"):
            continue
        try:
            if "melspectrogram" in stem:
                verify_melspectrogram(path, audio, rep)
            elif "embedding" in stem:
                params = verify_embedding(path, audio, rep)
                if params is not None:
                    imported.setdefault(stem, {})[ext] = params
                if install and params is not None and ext == ".tflite":
                    install_npz(install_dir, "embedding_model", "embedding",
                                params, {"format": "folded"})
            elif "silero" in stem or "vad" in stem:
                out = verify_vad(path, audio, rep)
                if install and out is not None:
                    install_npz(install_dir, "silero_vad", "vad", out[0], out[1])
            else:
                out = verify_head(path, rep)
                if out is not None and out[0] is not None:
                    imported.setdefault(stem, {})[ext] = out[0]
                # both formats carry the same weights; install once (.onnx
                # wins by sort order) rather than overwriting + duplicating
                # the stem in installed_heads
                if install and out is not None and out[0] is not None \
                        and stem not in installed_heads:
                    install_npz(install_dir, stem, "head", out[0], out[1])
                    installed_heads.append(stem)
        except Exception as e:
            rep.add(f, "import", False, f"{type(e).__name__}: {e}")

    try:
        cross_format_consistency(imported, rep)
    except Exception as e:
        # the layer must degrade to a FAIL row, not abort install/report
        rep.add("cross-format", "onnx/tflite consistency", False,
                f"{type(e).__name__}: {e}")

    if install:
        end_to_end(clips_dir, install_dir, installed_heads, rep,
                   strict_scores=strict_scores)

    n_fail = len(rep.failed)
    n_pass = sum(1 for r in rep.rows if r["ok"] is True)
    n_skip = sum(1 for r in rep.rows if r["ok"] is None)
    print(f"\n{n_pass} passed, {n_fail} failed, {n_skip} skipped")
    return rep


def build_selftest_artifacts(artifacts_dir: str):
    """Fabricate a reference-shaped replica of every released artifact
    family (same graph structure, ops, and tensor layouts; synthetic
    weights) so the full 3-layer verification pipeline can run with zero
    egress. The builders live with the test fixtures (tests/
    fixture_builders.py) and construct real ONNX protobufs through
    io.onnx_proto — the same bytes-level path real artifacts take."""
    import jax
    # pin the platform BEFORE any jax computation: fabrication must not
    # attach to an accelerator backend (which may be a hanging tunnel)
    jax.config.update("jax_platforms", os.environ.get("OWWT_VERIFY_PLATFORM", "cpu"))
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from fixture_builders import (build_embedding_onnx, build_head_onnx,
                                  build_melspec_onnx, build_silero_onnx)
    from openwakeword_tpu.models import embedding

    os.makedirs(artifacts_dir, exist_ok=True)
    rng = np.random.default_rng(40)
    build_melspec_onnx(os.path.join(artifacts_dir, "melspectrogram.onnx"))
    emb_params = embedding.init_params(jax.random.PRNGKey(8))
    build_embedding_onnx(os.path.join(artifacts_dir, "embedding_model.onnx"),
                         emb_params)
    alexa_onnx = os.path.join(artifacts_dir, "alexa_v0.1.onnx")
    build_head_onnx(alexa_onnx, rng,
                    model_type="dnn", input_frames=16, n_classes=1,
                    layer_dim=64, n_blocks=1, output_name="alexa")
    build_head_onnx(os.path.join(artifacts_dir, "timer_v0.1.onnx"), rng,
                    model_type="mlp", input_frames=34, n_classes=7,
                    layer_dim=128, output_name="timer")
    build_silero_onnx(os.path.join(artifacts_dir, "silero_vad.onnx"), rng)

    # the .tflite variants of the released set (reference ships both formats
    # of every model); the head goes through convert_onnx_to_tflite, so the
    # reference's conversion entry point is exercised too
    from openwakeword_tpu.io import tflite_export
    tflite_export.export_melspectrogram_tflite(
        os.path.join(artifacts_dir, "melspectrogram.tflite"))
    tflite_export.export_embedding_tflite(
        emb_params, os.path.join(artifacts_dir, "embedding_model.tflite"))
    tflite_export.convert_onnx_to_tflite(
        alexa_onnx, os.path.join(artifacts_dir, "alexa_v0.1.tflite"))
    print(f"Fabricated self-test artifacts in {artifacts_dir}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--artifacts-dir", default=os.path.join(REPO, "artifacts"))
    ap.add_argument("--clips-dir", default=CLIP_DIR_DEFAULT)
    ap.add_argument("--download", action="store_true",
                    help="fetch the released artifacts from GitHub first")
    ap.add_argument("--install", action="store_true",
                    help="convert verified artifacts to .npz in resources/models")
    ap.add_argument("--strict-scores", action="store_true",
                    help="enforce the filename score contract end-to-end "
                         "(use with the real released weights)")
    ap.add_argument("--offline-selftest", action="store_true",
                    help="fabricate reference-shaped artifacts and run the "
                         "full verification pipeline on them (CI coverage of "
                         "the artifact path before real egress exists)")
    ap.add_argument("--json", dest="json_out", default="",
                    help="write the report as JSON to this path")
    args = ap.parse_args(argv)

    if args.offline_selftest:
        import tempfile
        selftest_dir = tempfile.mkdtemp(prefix="owwt_selftest_artifacts_")
        build_selftest_artifacts(selftest_dir)
        args.artifacts_dir = selftest_dir

    rep = run(args.artifacts_dir, args.clips_dir,
              download=args.download, install=args.install,
              strict_scores=args.strict_scores)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rep.rows, f, indent=1)
    return 1 if rep.failed else 0


if __name__ == "__main__":
    sys.exit(main())

"""Mocked-form test of verify_artifacts.py: build structurally-exact
synthetic replicas of every released artifact family into an artifacts dir,
run the verification pipeline, and require every executed check to pass.

When the real artifacts exist (repo-root artifacts/), the gated test at the
bottom runs the same pipeline against them — the actual north star.
"""

import importlib.util
import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixture_builders import (build_embedding_onnx, build_head_onnx,  # noqa: E402
                              build_melspec_onnx, build_silero_onnx)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "verify_artifacts", os.path.join(REPO, "verify_artifacts.py"))
va = importlib.util.module_from_spec(spec)
spec.loader.exec_module(va)


@pytest.fixture(scope="module")
def mock_artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("artifacts")
    rng = np.random.default_rng(40)
    build_melspec_onnx(str(d / "melspectrogram.onnx"))
    from openwakeword_tpu.models import embedding
    emb_params = embedding.init_params(jax.random.PRNGKey(8))
    for k in list(emb_params):
        if k.startswith("bn_"):
            n = emb_params[k]["gamma"].shape[0]
            key = jax.random.PRNGKey(hash(k) % 2**31)
            import jax.numpy as jnp
            emb_params[k] = {"gamma": 1 + 0.1 * jax.random.normal(key, (n,)),
                             "beta": 0.1 * jax.random.normal(key, (n,)),
                             "mean": 0.1 * jax.random.normal(key, (n,)),
                             "var": jnp.abs(1 + 0.1 * jax.random.normal(key, (n,)))}
    build_embedding_onnx(str(d / "embedding_model.onnx"), emb_params)
    build_head_onnx(str(d / "alexa_v0.1.onnx"), rng, model_type="dnn",
                    input_frames=16, n_classes=1, layer_dim=64, n_blocks=1,
                    output_name="alexa")
    build_head_onnx(str(d / "timer_v0.1.onnx"), rng, model_type="mlp",
                    input_frames=34, n_classes=7, layer_dim=128,
                    output_name="timer")
    build_silero_onnx(str(d / "silero_vad.onnx"), rng)
    return str(d)


def test_verify_pipeline_all_pass(mock_artifacts, tmp_path):
    rep = va.run(mock_artifacts, clips_dir="/root/reference/tests/data",
                 install=True, install_dir=str(tmp_path / "models"))
    assert not rep.failed, f"failed checks: {rep.failed}"
    executed = [r for r in rep.rows if r["ok"] is True]
    # every artifact family must have produced at least one passing check
    arts = {r["artifact"] for r in executed}
    for expected in ("melspectrogram.onnx", "embedding_model.onnx",
                     "alexa_v0.1.onnx", "timer_v0.1.onnx", "silero_vad.onnx"):
        assert expected in arts, f"no passing check for {expected}"
    # the melspec graph must agree with the analytic frontend
    mel_checks = [r for r in rep.rows if r["artifact"] == "melspectrogram.onnx"
                  and r["check"] == "analytic ops.melspec parity"]
    assert mel_checks and mel_checks[0]["ok"]
    # installs happened
    installed = os.listdir(str(tmp_path / "models"))
    assert "alexa_v0.1.npz" in installed
    assert "silero_vad.npz" in installed


def test_cli_json_report(mock_artifacts, tmp_path):
    out = str(tmp_path / "report.json")
    rc = va.main(["--artifacts-dir", mock_artifacts, "--json", out])
    assert rc == 0
    import json
    rows = json.load(open(out))
    assert any(r["ok"] for r in rows)


def test_offline_selftest_cli(tmp_path):
    """The --offline-selftest mode fabricates reference-shaped artifacts and
    the full 3-layer pipeline passes on them (VERDICT r2 item 10: the
    artifact path is CI-covered before real egress exists)."""
    out = str(tmp_path / "selftest.json")
    rc = va.main(["--offline-selftest", "--json", out])
    assert rc == 0
    import json
    rows = json.load(open(out))
    passed = [r for r in rows if r["ok"] is True]
    arts = {r["artifact"] for r in passed}
    assert {"melspectrogram.onnx", "embedding_model.onnx", "alexa_v0.1.onnx",
            "timer_v0.1.onnx", "silero_vad.onnx"} <= arts
    assert not [r for r in rows if r["ok"] is False]


def test_missing_dir_is_graceful(tmp_path):
    rep = va.run(str(tmp_path / "nope"))
    assert not rep.failed


@pytest.mark.skipif(not os.path.isdir(os.path.join(REPO, "artifacts")),
                    reason="real released artifacts not present (zero egress)")
def test_real_artifacts():
    rep = va.run(os.path.join(REPO, "artifacts"), install=False)
    assert not rep.failed, f"real-artifact failures: {rep.failed}"

"""Full-pipeline ONNX export: mel frontend + embedding CNN.

The reference distributes its entire compute path as frozen artifacts
(melspectrogram.onnx, embedding_model.onnx, head .onnx files -- SURVEY.md
section 2.2); this package must be able to produce the same artifact set so
a trained stack can be deployed on any ONNX runtime. Verification is
offline-complete: each exported graph is re-executed through io.onnx_graph
(itself differentially fuzzed against torch in test_onnx_graph_fuzz.py) and
compared against the native JAX computation, and the embedding export is
round-tripped through the real-artifact importer for exact param equality.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp                                          # noqa: E402

from openwakeword_tpu import config                              # noqa: E402
from openwakeword_tpu.io import onnx_export, onnx_import, onnx_proto  # noqa: E402
from openwakeword_tpu.io.onnx_graph import load_program          # noqa: E402
from openwakeword_tpu.models import embedding                    # noqa: E402
from openwakeword_tpu.ops import melspec                         # noqa: E402


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(11)
    # speech-ish: tones + noise at raw int16 amplitude, 1.58 s
    t = np.arange(25280) / config.SAMPLE_RATE
    x = (6000 * np.sin(2 * np.pi * 440 * t) * np.sin(2 * np.pi * 3 * t)
         + 2000 * rng.normal(size=t.size))
    return x.astype(np.float32)[None]                            # (1, N)


class TestMelspectrogramExport:

    def test_matches_native(self, tmp_path, audio):
        path = str(tmp_path / "melspectrogram.onnx")
        onnx_export.export_melspectrogram_onnx(path)
        prog = load_program(path)
        got = np.asarray(jax.jit(prog.apply)(prog.params,
                                             {"input": audio})["melspectrogram"])
        want = np.asarray(melspec.melspectrogram(audio, apply_transform=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_transform_variant_feeds_embedding(self, tmp_path, audio):
        path = str(tmp_path / "mel_tf.onnx")
        onnx_export.export_melspectrogram_onnx(path, apply_transform=True)
        prog = load_program(path)
        got = np.asarray(prog.apply(prog.params, {"input": audio})["melspectrogram"])
        want = np.asarray(melspec.log_mel_features(audio))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_dynamic_length(self, tmp_path, audio):
        """One exported graph serves any input length (the artifact contract:
        reference utils.py feeds arbitrary chunk sizes)."""
        path = str(tmp_path / "mel_dyn.onnx")
        onnx_export.export_melspectrogram_onnx(path)
        prog = load_program(path)
        for n in (1760, 4000, 12800):
            x = audio[:, :n]
            got = np.asarray(prog.apply(prog.params, {"input": x})["melspectrogram"])
            assert got.shape[1] == melspec.num_frames(n)

    def test_classified_and_rejected_as_analytic(self, tmp_path):
        """io.loaders recognizes the artifact kind and points the user to the
        analytic frontend instead of silently importing a redundant graph."""
        path = str(tmp_path / "mel_cls.onnx")
        onnx_export.export_melspectrogram_onnx(path)
        graph = onnx_proto.load_onnx(path)["graph"]
        assert onnx_import._classify(graph) == "melspectrogram"
        with pytest.raises(ValueError, match="analytic"):
            onnx_import.import_onnx_model(path)


class TestEmbeddingExport:

    @pytest.fixture(scope="class")
    def params(self):
        return jax.device_get(embedding.init_params(jax.random.PRNGKey(3)))

    @pytest.fixture(scope="class")
    def exported(self, params, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("emb") / "embedding_model.onnx")
        onnx_export.export_embedding_onnx(params, path)
        return path

    def test_matches_native(self, exported, params):
        rng = np.random.default_rng(5)
        x = rng.normal(0, 1.5, (3,) + embedding.INPUT_SHAPE).astype(np.float32)
        prog = load_program(exported)
        got = np.asarray(jax.jit(prog.apply)(prog.params,
                                             {"input_window": x})["embedding"])
        assert got.shape == (3, 1, 1, embedding.OUTPUT_DIM)
        want = np.asarray(embedding.apply(params, x[..., 0]))
        np.testing.assert_allclose(got.reshape(3, -1), want, atol=2e-4)

    def test_importer_roundtrip_exact(self, exported, params):
        """The real-artifact importer recovers the exact original params --
        pins both the exporter's layout (OIHW, BN field order, epsilon) and
        the importer against a graph with the artifact's structure."""
        kind, got, _meta = onnx_import.import_onnx_model(exported)
        assert kind == "embedding"
        assert set(got) == set(params)
        for name, group in params.items():
            for field, arr in group.items():
                np.testing.assert_array_equal(
                    np.asarray(got[name][field]), np.asarray(arr),
                    err_msg=f"{name}/{field}")

    def test_folded_params_rejected(self, params, tmp_path):
        folded = jax.device_get(embedding.fold_batchnorm(params))
        with pytest.raises(ValueError, match="UNFOLDED"):
            onnx_export.export_embedding_onnx(folded, str(tmp_path / "x.onnx"))


class TestRnnHeadExport:
    """rnn-family heads (reference train.py:84-96) export as ONNX LSTM
    graphs and import back -- completing export/import coverage of every
    head family the reference can train."""

    @pytest.fixture(scope="class")
    def params(self):
        from openwakeword_tpu.models import heads
        return jax.device_get(heads.init_params(
            jax.random.PRNGKey(7), model_type="rnn", input_frames=16))

    @pytest.fixture(scope="class")
    def exported(self, params, tmp_path_factory):
        from openwakeword_tpu.io import onnx_export as oe
        path = str(tmp_path_factory.mktemp("rnn") / "my_word.onnx")
        oe.export_head_onnx(params, path, output_name="my_word")
        return path

    def test_matches_native(self, exported, params):
        from openwakeword_tpu.models import heads
        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (4, 16, 96)).astype(np.float32)
        prog = load_program(exported)
        got = np.asarray(jax.jit(prog.apply)(prog.params, {"input": x})["my_word"])
        want = np.asarray(heads.apply(params, x))
        assert got.shape == want.shape == (4, 1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_classified_as_head_not_vad(self, exported):
        graph = onnx_proto.load_onnx(exported)["graph"]
        assert onnx_import._classify(graph) == "head"

    def test_importer_roundtrip(self, exported, params):
        from openwakeword_tpu.models import heads
        kind, got, _meta = onnx_import.import_onnx_model(exported)
        assert kind == "head"
        meta = got["__meta__"]
        assert meta["model_type"] == "rnn"
        assert meta["input_frames"] == 16 and meta["n_classes"] == 1
        for name in (k for k in params if k != "__meta__"):
            for field, arr in params[name].items():
                np.testing.assert_allclose(
                    np.asarray(got[name][field]), np.asarray(arr), atol=1e-7,
                    err_msg=f"{name}/{field}")
        rng = np.random.default_rng(4)
        x = rng.normal(0, 1, (2, 16, 96)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(heads.apply(got, x)),
                                   np.asarray(heads.apply(params, x)),
                                   atol=1e-6)


class TestTfliteArtifacts:
    """The reference also ships .tflite variants of the frontend artifacts;
    the embedding export round-trips through the real-artifact importer
    (exact params), and the mel export -- whose numerics are pinned by its
    op-for-op ONNX twin -- is verified structurally (parse + constants)."""

    def test_embedding_tflite_roundtrip_exact(self, tmp_path):
        from openwakeword_tpu.io import tflite_export, tflite_import
        params = jax.device_get(embedding.init_params(jax.random.PRNGKey(6)))
        path = str(tmp_path / "embedding_model.tflite")
        tflite_export.export_embedding_tflite(params, path)
        kind, got, meta = tflite_import.import_tflite_model(path)
        assert kind == "embedding" and meta["format"] == "folded"
        want = {k: {f: np.asarray(a, np.float32) for f, a in g.items()}
                for k, g in jax.device_get(embedding.fold_batchnorm(params)).items()}
        assert set(got) == set(want)
        for name, grp in want.items():
            for field, arr in grp.items():
                np.testing.assert_array_equal(np.asarray(got[name][field]), arr,
                                              err_msg=f"{name}/{field}")
        # imported (folded) params score identically to the original pytree
        rng = np.random.default_rng(8)
        x = rng.normal(0, 1.5, (2,) + embedding.INPUT_SHAPE).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(embedding.apply_folded(got, x[..., 0])),
            np.asarray(embedding.apply(params, x[..., 0])), atol=2e-5)

    def test_mel_tflite_structure_and_constants(self, tmp_path):
        from openwakeword_tpu.io import tflite_export, tflite_import as TL
        path = str(tmp_path / "melspectrogram.tflite")
        tflite_export.export_melspectrogram_tflite(path)
        model = TL.load_tflite(path)
        ops = [o["opcode"] for o in model["operators"]]
        assert ops.count(TL.OP_CONV_2D) == 1
        assert ops.count(TL.OP_STRIDED_SLICE) == 2
        assert TL.OP_LOG in ops and TL.OP_REDUCE_MAX in ops
        consts = {t["name"]: t["data"] for t in model["tensors"]
                  if t["data"] is not None}
        basis = np.asarray(melspec.stft_power_basis(), np.float32)
        np.testing.assert_array_equal(consts["dft_basis"].reshape(514, 512),
                                      basis.T)
        np.testing.assert_array_equal(
            consts["mel_basis"],
            np.asarray(melspec.mel_filterbank(), np.float32).T)
        # the loaders entry point recognizes it as the analytic frontend
        with pytest.raises(ValueError, match="analytic"):
            TL.import_tflite_model(path)

    def test_mel_tflite_nominal_shapes(self, tmp_path):
        from openwakeword_tpu.io import tflite_export, tflite_import as TL
        path = str(tmp_path / "mel_4000.tflite")
        tflite_export.export_melspectrogram_tflite(path, nominal_samples=4000)
        model = TL.load_tflite(path)
        tensors = {t["name"]: t for t in model["tensors"]}
        assert tensors["input"]["shape"] == [1, 4000]
        assert tensors["melspectrogram"]["shape"] == \
            [melspec.num_frames(4000), config.N_MELS]


class TestRnnImportGuards:
    """Graphs outside the rnn family's fixed contract must be rejected
    loudly, not imported into params that crash or silently mis-score."""

    def _graph(self, exported):
        return onnx_proto.load_onnx(exported)["graph"]

    @pytest.fixture()
    def exported(self, tmp_path):
        from openwakeword_tpu.io import onnx_export as oe
        from openwakeword_tpu.models import heads
        p = jax.device_get(heads.init_params(jax.random.PRNGKey(7),
                                             model_type="rnn"))
        path = str(tmp_path / "h.onnx")
        oe.export_head_onnx(p, path, output_name="y")
        return path

    def test_wrong_layer_count_rejected(self, exported):
        graph = self._graph(exported)
        lstms = [n for n in graph["nodes"] if n["op_type"] == "LSTM"]
        graph["nodes"].remove(lstms[1])
        with pytest.raises(ValueError, match="2 stacked"):
            onnx_import.import_head_onnx(exported, graph)
        graph = self._graph(exported)
        graph["nodes"].append([n for n in graph["nodes"]
                               if n["op_type"] == "LSTM"][0])
        with pytest.raises(ValueError, match="2 stacked"):
            onnx_import.import_head_onnx(exported, graph)

    def test_symbolic_frames_rejected(self, exported):
        graph = self._graph(exported)
        graph["inputs"][0]["shape"][1] = "frames"
        with pytest.raises(ValueError, match="concrete window"):
            onnx_import.import_head_onnx(exported, graph)

    def test_hidden_size_mismatch_rejected(self, exported):
        graph = self._graph(exported)
        lstm = next(n for n in graph["nodes"] if n["op_type"] == "LSTM")
        lstm["attributes"]["hidden_size"]["i"] = 99
        with pytest.raises(ValueError, match="hidden_size"):
            onnx_import.import_head_onnx(exported, graph)

    def test_multiclass_relu_logits_threaded(self, tmp_path):
        from openwakeword_tpu.io import onnx_export as oe
        from openwakeword_tpu.models import heads
        for relu in (True, False):
            p = jax.device_get(heads.init_params(
                jax.random.PRNGKey(7), model_type="rnn", n_classes=3))
            p["__meta__"]["relu_logits"] = relu
            path = str(tmp_path / f"mc_{relu}.onnx")
            oe.export_head_onnx(p, path, output_name="y")
            _kind, got, _m = onnx_import.import_onnx_model(path)
            assert got["__meta__"]["relu_logits"] is relu
            rng = np.random.default_rng(3)
            x = rng.normal(0, 1, (2, 16, 96)).astype(np.float32)
            np.testing.assert_allclose(np.asarray(heads.apply(got, x)),
                                       np.asarray(heads.apply(p, x)), atol=1e-6)


class TestVadExport:
    """A trained vad_net exports with the Silero I/O contract (reference
    vad.py:87-127) and round-trips through the same role-mapped importer
    the real silero_vad.onnx artifact takes."""

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        from openwakeword_tpu.io import onnx_export as oe
        from openwakeword_tpu.models import vad_net
        params = jax.device_get(vad_net.init_params(jax.random.PRNGKey(12)))
        path = str(tmp_path_factory.mktemp("vad") / "my_vad.onnx")
        oe.export_vad_onnx(params, path)
        return params, path

    def test_stateful_parity_with_native(self, setup):
        from openwakeword_tpu.models import silero, vad_net
        params, path = setup
        prog = silero.import_onnx(path)
        rng = np.random.default_rng(3)
        B = 2
        h = c = np.zeros((2, B, 64), np.float32)
        hn = cn = h
        for step in range(4):                 # state carries across calls
            x = rng.normal(0, 0.1, (B, 480)).astype(np.float32)
            want_s, h, c = vad_net.apply(params, x, jnp.asarray(h), jnp.asarray(c))
            got_s, hn, cn = prog.apply(prog.params, x, jnp.asarray(hn), jnp.asarray(cn))
            np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                       atol=1e-5, err_msg=f"step {step}")
            np.testing.assert_allclose(np.asarray(hn), np.asarray(h), atol=1e-5)
            np.testing.assert_allclose(np.asarray(cn), np.asarray(c), atol=1e-5)

    def test_classified_and_importable_as_vad(self, setup):
        _params, path = setup
        graph = onnx_proto.load_onnx(path)["graph"]
        assert onnx_import._classify(graph) == "vad"
        kind, _p, meta = onnx_import.import_onnx_model(path)
        assert kind == "vad" and meta["format"] == "onnx_program"

    def test_vad_class_accepts_exported_path(self, setup):
        """Reference parity: VAD(model_path=...) takes the artifact path
        (reference vad.py:61-80); an exported graph drops straight in."""
        from openwakeword_tpu.models import vad_net
        from openwakeword_tpu.vad import VAD
        params, path = setup
        v_onnx = VAD(model_path=path)
        v_native = VAD(params=params)
        rng = np.random.default_rng(0)
        x = rng.integers(-3000, 3000, 1280).astype(np.int16)
        assert abs(v_onnx.predict(x) - v_native.predict(x)) < 1e-5

    def test_frame_size_variants(self, setup, tmp_path):
        from openwakeword_tpu.io import onnx_export as oe
        from openwakeword_tpu.models import silero, vad_net
        params, _ = setup
        path = str(tmp_path / "vad640.onnx")
        oe.export_vad_onnx(params, path, frame_samples=640)
        prog = silero.import_onnx(path)
        rng = np.random.default_rng(5)
        x = rng.normal(0, 0.1, (1, 640)).astype(np.float32)
        z = jnp.zeros((2, 1, 64), jnp.float32)
        want_s, _h, _c = vad_net.apply(params, x, z, z)
        got_s, _hn, _cn = prog.apply(prog.params, x, z, z)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=1e-5)
        with pytest.raises(ValueError, match="minimum"):
            oe.export_vad_onnx(params, str(tmp_path / "bad.onnx"),
                               frame_samples=128)


def test_mel_tflite_no_top_db(tmp_path, monkeypatch):
    """top_db=None skips the clamp stages instead of crashing at export."""
    from openwakeword_tpu import config as cfg
    from openwakeword_tpu.io import tflite_export, tflite_import as TL
    monkeypatch.setattr(cfg, "MEL_TOP_DB", None)
    path = str(tmp_path / "mel_noclamp.tflite")
    tflite_export.export_melspectrogram_tflite(path)
    model = TL.load_tflite(path)
    ops = [o["opcode"] for o in model["operators"]]
    assert TL.OP_REDUCE_MAX not in ops and TL.OP_LOG in ops


def test_rnn_head_serves_through_model(tmp_path):
    """An exported rnn .onnx head loads into Model and scores streaming
    audio through the engine's single-head path (reference Model loads any
    trained head family via onnxruntime; parity for ours)."""
    import openwakeword_tpu as oww
    from openwakeword_tpu.io import onnx_export as oe
    from openwakeword_tpu.models import heads
    p = jax.device_get(heads.init_params(jax.random.PRNGKey(1), model_type="rnn"))
    f = str(tmp_path / "rnn_word.onnx")
    oe.export_head_onnx(p, f, output_name="rnn_word")
    m = oww.Model(wakeword_models=[f])
    rng = np.random.default_rng(0)
    for _ in range(8):
        out = m.predict(rng.integers(-2000, 2000, 1280).astype(np.int16))
    assert set(out) == {"rnn_word"} and 0.0 <= out["rnn_word"] <= 1.0


def test_full_pipeline_composition(tmp_path, audio):
    """mel.onnx -> window -> embedding.onnx chained as a user of the exported
    artifacts would run them, vs the native chain."""
    mel_path = str(tmp_path / "mel.onnx")
    emb_path = str(tmp_path / "emb.onnx")
    onnx_export.export_melspectrogram_onnx(mel_path, apply_transform=True)
    params = jax.device_get(embedding.init_params(jax.random.PRNGKey(9)))
    onnx_export.export_embedding_onnx(params, emb_path)
    mel_prog, emb_prog = load_program(mel_path), load_program(emb_path)

    mels = np.asarray(mel_prog.apply(mel_prog.params, {"input": audio})["melspectrogram"])
    window = mels[:, :config.EMB_WINDOW_FRAMES, :, None]         # (1, 76, 32, 1)
    got = np.asarray(emb_prog.apply(emb_prog.params,
                                    {"input_window": window})["embedding"]).ravel()

    native_mels = melspec.log_mel_features(audio)
    want = np.asarray(embedding.apply(
        params, native_mels[:, :config.EMB_WINDOW_FRAMES])).ravel()
    np.testing.assert_allclose(got, want, atol=5e-4)

"""Evaluation methodology tests (reference performance_metrics.ipynb
cells 0-12 contract): event-grouped FAR/hr, per-clip-max FRR, threshold
sweep, and the end-to-end engine-driven path."""

import numpy as np
import pytest

from openwakeword_tpu import eval as E


class TestFalseAcceptsPerHour:
    def test_event_grouping(self):
        # two activation bursts 100 frames apart -> 2 events
        scores = np.zeros(1000)
        scores[100:110] = 0.9      # one event (grouped)
        scores[400:402] = 0.9      # second event
        fa = E.false_accepts_per_hour(scores, threshold=0.5)
        hours = 1000 * 0.08 / 3600
        assert fa == pytest.approx(2 / hours)

    def test_burst_within_window_is_one_event(self):
        scores = np.zeros(200)
        scores[10] = 0.9
        scores[30] = 0.9           # within the 50-frame suppression window
        hours = 200 * 0.08 / 3600
        assert E.false_accepts_per_hour(scores, 0.5) == pytest.approx(1 / hours)

    def test_empty_stream(self):
        assert E.false_accepts_per_hour(np.zeros(0), 0.5) == 0.0

    def test_event_count_matches_naive_scan(self):
        # the index-jumping implementation must match the frame-by-frame
        # reference scan on random streams at every swept threshold
        from openwakeword_tpu.metrics import get_false_positives
        rng = np.random.default_rng(0)
        scores = rng.random(5000) ** 3          # sparse-ish activations
        for threshold in (0.05, 0.3, 0.5, 0.9, 0.999):
            for window in (1, 5, 50):
                bin_pred = scores >= threshold
                naive, i = 0, 0
                while i < bin_pred.size:
                    if bin_pred[i]:
                        naive += 1
                        i += window
                    else:
                        i += 1
                assert get_false_positives(scores, threshold, window) == naive

    def test_hours_derived_from_frame_count(self):
        scores = np.zeros(45000)   # exactly 1 h at 80 ms/frame
        scores[0] = 1.0
        assert E.false_accepts_per_hour(scores, 0.5) == pytest.approx(1.0)

    def test_no_grouping_across_file_boundaries(self):
        """An activation at the end of file A and one at the start of file
        B are TWO events; concatenation would let the 4 s grouping window
        suppress B's."""
        a = np.zeros(100)
        a[-1] = 1.0
        b = np.zeros(350)
        b[0] = 1.0
        # per-file streams: 2 events over 1 h worth of frames
        total_h = (a.size + b.size) * 0.08 / 3600.0
        assert E.false_accepts_per_hour([a, b], 0.5) == \
            pytest.approx(2 / total_h)
        # the concatenated form shows the boundary-suppression bias
        assert E.false_accepts_per_hour(np.concatenate([a, b]), 0.5) == \
            pytest.approx(1 / total_h)


class TestFalseRejectRate:
    def test_per_clip_max_rule(self):
        clips = [np.array([0.1, 0.9, 0.2]),    # accepted (max >= 0.5)
                 np.array([0.3, 0.4]),          # rejected
                 np.array([0.51])]              # accepted
        assert E.false_reject_rate(clips, 0.5) == pytest.approx(1 / 3)

    def test_empty_clip_counts_as_reject(self):
        assert E.false_reject_rate([np.zeros(0)], 0.5) == 1.0

    def test_no_clips_is_undefined_not_perfect(self):
        # an empty positive set must not report perfect recall
        assert np.isnan(E.false_reject_rate([], 0.5))


class TestCurve:
    def test_far_tar_curve_monotonicity(self, rng):
        neg = rng.random(5000) * 0.8                       # noise scores
        pos = [np.clip(rng.random(20) + 0.3, 0, 1) for _ in range(30)]
        curve = E.far_tar_curve(neg, pos)
        # FAR/hr must be non-increasing and TAR non-increasing in threshold
        assert np.all(np.diff(curve["far_per_hour"]) <= 1e-9)
        assert np.all(np.diff(curve["tar"]) <= 1e-9)
        assert np.allclose(curve["tar"], 1.0 - curve["frr"])
        assert curve["thresholds"].shape == curve["far_per_hour"].shape

    def test_custom_thresholds(self):
        curve = E.far_tar_curve(np.zeros(100), [np.ones(5)],
                                thresholds=[0.25, 0.75])
        assert list(curve["thresholds"]) == [0.25, 0.75]
        assert np.all(curve["tar"] == 1.0)
        assert np.all(curve["far_per_hour"] == 0.0)


class TestEndToEnd:
    def test_evaluate_model_on_wavs(self, tmp_path, rng):
        """Full engine-driven path on synthetic WAVs: shapes, hour
        accounting, and the rejected-clips listing."""
        from openwakeword_tpu.data import write_audio

        neg_files, pos_files = [], []
        for i in range(3):
            p = str(tmp_path / f"neg_{i}.wav")
            write_audio(p, rng.integers(-500, 500, 16000 * 2).astype(np.int16))
            neg_files.append(p)
        for i in range(2):
            p = str(tmp_path / f"pos_{i}.wav")
            write_audio(p, rng.integers(-3000, 3000, 16000).astype(np.int16))
            pos_files.append(p)

        report = E.evaluate_model("alexa", neg_files, pos_files,
                                  threshold=0.5, padding=1)
        assert report["n_positive_clips"] == 2
        # negatives are scored unpadded: 3 clips x 2 s = 6 s of corpus in
        # the FAR denominator, minus at most one boundary frame per clip
        # (padding=1 used to add a full second per side per clip here)
        assert 5.5 / 3600.0 <= report["negative_hours"] <= 6.0 / 3600.0
        assert 0.0 <= report["frr"] <= 1.0
        assert report["far_per_hour"] >= 0.0
        assert set(report["rejected_clips"]) <= set(pos_files)
        curve = report["curve"]
        assert curve["far_per_hour"].shape == curve["tar"].shape

    def test_multiclass_evaluation_one_pass(self, tmp_path, rng):
        """Timer-style multiclass: every label evaluates from ONE pair of
        engine passes (VERDICT r4: the single-label API needed one call per
        label and manual curve-page assembly)."""
        from openwakeword_tpu.data import write_audio

        neg, pos_a, pos_b = [], [], []
        for i in range(2):
            p = str(tmp_path / f"neg_{i}.wav")
            write_audio(p, rng.integers(-500, 500, 16000 * 2).astype(np.int16))
            neg.append(p)
        for name, bucket in (("a", pos_a), ("b", pos_b)):
            p = str(tmp_path / f"pos_{name}.wav")
            write_audio(p, rng.integers(-3000, 3000, 16000).astype(np.int16))
            bucket.append(p)

        from openwakeword_tpu import registry
        timer_labels = sorted(set(registry.model_class_mappings["timer"].values()))
        lbl0, lbl1 = timer_labels[0], timer_labels[1]
        report = E.evaluate_model(
            "timer", neg, {lbl0: pos_a, lbl1: pos_b},
            labels=[lbl0, lbl1], threshold=0.5, segment_seconds=None)
        assert set(report["per_label"]) == {lbl0, lbl1}
        for lbl, fs in ((lbl0, pos_a), (lbl1, pos_b)):
            r = report["per_label"][lbl]
            assert r["n_positive_clips"] == len(fs)
            assert r["far_per_hour"] >= 0.0
            assert r["curve"]["tar"].shape == r["curve"]["thresholds"].shape
        # the flat fields mirror the first requested label (back-compat)
        assert report["frr"] == report["per_label"][lbl0]["frr"]
        # unknown labels fail loudly
        with pytest.raises(KeyError, match="not served"):
            E.evaluate_model("timer", neg, pos_a, labels=["nope"],
                             segment_seconds=None)

    def test_multiclass_matches_single_label_runs(self, tmp_path, rng):
        """One multiclass pass equals N single-label passes."""
        from openwakeword_tpu.data import write_audio
        neg = [str(tmp_path / "neg.wav")]
        write_audio(neg[0], rng.integers(-800, 800, 16000 * 2).astype(np.int16))
        pos = [str(tmp_path / "pos.wav")]
        write_audio(pos[0], rng.integers(-3000, 3000, 16000).astype(np.int16))

        from openwakeword_tpu import registry
        labels = sorted(set(registry.model_class_mappings["timer"].values()))[:2]
        multi = E.evaluate_model("timer", neg, pos, labels=labels,
                                 segment_seconds=None)
        for lbl in labels:
            single = E.evaluate_model("timer", neg, pos, label=lbl,
                                      segment_seconds=None)
            m = multi["per_label"][lbl]
            assert single["far_per_hour"] == m["far_per_hour"]
            np.testing.assert_allclose(single["curve"]["tar"],
                                       m["curve"]["tar"])

    def test_render_model_page(self, tmp_path, rng):
        from openwakeword_tpu.data import write_audio
        neg = [str(tmp_path / "neg.wav")]
        write_audio(neg[0], rng.integers(-800, 800, 16000 * 2).astype(np.int16))
        pos = [str(tmp_path / "pos.wav")]
        write_audio(pos[0], rng.integers(-3000, 3000, 16000).astype(np.int16))
        report = E.evaluate_model("alexa", neg, pos, segment_seconds=None)
        out = str(tmp_path / "alexa_eval.md")
        md = E.render_model_page("alexa", report, path=out)
        assert "# alexa" in md and "false accepts / hour" in md
        assert open(out).read() == md

        from openwakeword_tpu import registry
        labels = sorted(set(registry.model_class_mappings["timer"].values()))[:2]
        multi = E.evaluate_model("timer", neg, pos, labels=labels,
                                 segment_seconds=None)
        md2 = E.render_model_page("timer", multi)
        for lbl in labels:
            assert f"## Performance — {lbl}" in md2

    def test_score_files_label_selection(self, tmp_path, rng):
        from openwakeword_tpu.data import write_audio
        p = str(tmp_path / "clip.wav")
        write_audio(p, rng.integers(-2000, 2000, 16000).astype(np.int16))
        scored = E.score_files([p], ["alexa"], label="alexa")
        assert p in scored and scored[p].ndim == 1
        with pytest.raises(KeyError):
            E.score_files([p], ["alexa"], label="not_a_label")
        with pytest.raises(KeyError):
            E.score_files([p], ["alexa"], label="not_a_label",
                          segment_seconds=1.0)


class TestSegmentedStreaming:
    """Bounded-memory scorer for multi-hour files (the reference's ~5.5 h
    DipCo FAR methodology, reference README.md:178)."""

    def test_streaming_scores_match_one_shot(self, tmp_path, rng):
        """Tiny segments (5 frames) across mixed-length files must produce
        the one-shot batch path's scores (the scan carry IS the engine
        state; the only divergence is XLA fusion-order rounding between
        the different scan-length programs, observed ~3e-8)."""
        from openwakeword_tpu.data import write_audio
        files = []
        for i, n in enumerate([16000, 24000, 7000]):
            p = str(tmp_path / f"clip_{i}.wav")
            write_audio(p, rng.integers(-4000, 4000, n).astype(np.int16))
            files.append(p)
        one_shot = E.score_files(files, ["alexa"], label="alexa", padding=1)
        streamed = E.score_files(files, ["alexa"], label="alexa", padding=1,
                                 segment_seconds=0.4)
        for p in files:
            assert one_shot[p].shape == streamed[p].shape
            np.testing.assert_allclose(one_shot[p], streamed[p], atol=1e-6)

    def test_one_hour_negative_under_memory_budget(self, tmp_path, rng):
        """evaluate_model scores a 1 h negative WAV under a fixed RSS
        budget; the one-shot path would materialize the whole file as f32
        scan input (>=330 MB at S=1, OOM at batch scale)."""
        import resource
        import wave as wave_mod

        path = str(tmp_path / "negative_1h.wav")
        minutes = 60
        with wave_mod.open(path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            for _ in range(minutes):   # write in 1-min chunks: bounded too
                f.writeframes(rng.integers(-300, 300, 16000 * 60)
                              .astype(np.int16).tobytes())

        rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        report = E.evaluate_model("alexa", [path], [], threshold=0.5,
                                  segment_seconds=60.0)
        rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        # ru_maxrss is in KiB on Linux; generous 250 MB budget — far below
        # what materializing the hour would need, far above segment needs
        assert rss_after - rss_before < 250 * 1024, (
            f"RSS grew {(rss_after - rss_before) / 1024:.0f} MB")
        assert report["negative_hours"] == pytest.approx(1.0, rel=1e-3)
        assert report["far_per_hour"] >= 0.0
        assert np.isnan(report["frr"])   # no positive clips given


def test_streaming_stream_cap_tracks_segment_length(monkeypatch):
    """The streaming-path stream cap derives from segment_seconds so the
    host segment buffer stays ~128 MB at ANY segment length (a fixed
    two-point threshold let segment_seconds=29 with a big batch_size hold
    ~237 MB)."""
    from openwakeword_tpu import eval as eval_mod
    from openwakeword_tpu.parallel import bulk as bulk_mod

    seen = {}

    def fake_streaming(paths, wakeword_models, padding, batch_size,
                       segment_seconds, **kwargs):
        seen["batch_size"] = batch_size
        seen["segment_seconds"] = segment_seconds
        return {p: np.zeros((0, 1), np.float32) for p in paths}, ["lbl"]

    monkeypatch.setattr(bulk_mod, "bulk_predict_streaming", fake_streaming)
    for seg in (29.0, 60.0, 120.0):
        eval_mod.score_files(["a.wav"], ["m"], batch_size=4096,
                             segment_seconds=seg)
        cap = seen["batch_size"]
        # the actual product is what matters: streams * seg * 16k * 2 bytes
        assert cap * seg * 16000 * 2 <= (128 << 20)
        # and the cap is not needlessly small: one more stream would exceed
        assert (cap + 1) * seg * 16000 * 2 > (128 << 20) or cap == 4096

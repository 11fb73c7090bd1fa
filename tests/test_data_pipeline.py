"""Data pipeline + metrics tests (components the reference leaves untested;
SURVEY.md section 4 notes bulk/training/data paths had no CI coverage)."""

import os
import wave

import numpy as np
import pytest

from openwakeword_tpu import data as D
from openwakeword_tpu import metrics as M


@pytest.fixture()
def wav_dir(tmp_path, rng):
    paths = []
    for i, n in enumerate([8000, 16000, 24000]):
        p = str(tmp_path / f"clip{i}.wav")
        D.write_audio(p, (rng.uniform(-0.4, 0.4, n)).astype(np.float32))
        paths.append(p)
    return paths


class TestIO:
    def test_read_write_round_trip(self, tmp_path, rng):
        x = (rng.uniform(-1, 1, 16000) * 20000).astype(np.int16)
        p = str(tmp_path / "rt.wav")
        D.write_audio(p, x)
        y = D.read_audio(p)
        np.testing.assert_allclose(y * 32768, x, atol=1.0)

    def test_stack_clips(self, rng):
        clips = [rng.uniform(-1, 1, n) for n in (1000, 2500, 700)]
        out = D.stack_clips(clips, clip_size=2000)
        assert out.shape == (3, 2000)
        np.testing.assert_array_equal(out[0], np.hstack(clips)[:2000])

    def test_load_audio_clips(self, wav_dir):
        out = D.load_audio_clips(wav_dir, clip_size=16000)
        assert out.shape == ((8000 + 16000 + 24000) // 16000, 16000)
        assert out.dtype == np.int16

    def test_filter_audio_paths(self, wav_dir):
        d = os.path.dirname(wav_dir[0])
        paths, durations = D.filter_audio_paths([d], 0.6, 1.6, duration_method="header")
        assert len(paths) == 2  # 0.5 s clip excluded
        assert all(0.6 <= x <= 1.6 for x in durations)

    def test_duration_from_filesize(self, wav_dir):
        est = D.get_wav_duration_from_filesize(os.path.getsize(wav_dir[0]))
        assert abs(est - 0.5) < 0.01


class TestMixing:
    def test_mix_clip_snr(self, rng):
        fg = rng.normal(0, 0.1, 8000).astype(np.float32)
        bg = rng.normal(0, 0.1, 16000).astype(np.float32)
        mixed = D.mix_clip(fg, bg, snr=20.0, start=1000)
        assert mixed.shape == (16000,)
        # fg region has much more energy than bg-only region at +20 dB
        assert np.abs(mixed[1000:9000]).mean() > 3 * np.abs(mixed[10000:]).mean()

    def test_truncate_strategies(self, rng):
        x = np.arange(100.0)
        assert (D.truncate_clip(x.copy(), 40, "truncate_start")[0] == 60.0)
        assert (D.truncate_clip(x.copy(), 40, "truncate_end")[-1] == 39.0)
        assert D.truncate_clip(x.copy(), 40, "random").shape == (40,)

    def test_mix_clips_batch_generator(self, wav_dir, tmp_path, rng):
        bg = str(tmp_path / "bg.wav")
        D.write_audio(bg, rng.uniform(-0.2, 0.2, 40000).astype(np.float32))
        gen = D.mix_clips_batch(wav_dir * 4, [bg], combined_size=32000,
                                labels=[1] * 12, batch_size=4, snr_low=5,
                                snr_high=10, seed=7)
        batch, labels, _ = next(gen)
        assert batch.shape == (4, 32000)
        assert batch.dtype == np.int16
        assert (labels == 1).all()

    def test_mix_clips_batch_sequence_labels_and_bg(self, wav_dir, tmp_path, rng):
        bg = str(tmp_path / "bg.wav")
        D.write_audio(bg, rng.uniform(-0.2, 0.2, 40000).astype(np.float32))
        gen = D.mix_clips_batch(wav_dir, [bg], combined_size=32000, batch_size=3,
                                return_sequence_labels=True,
                                return_background_clips=True,
                                return_background_clips_delay=(5, 10), seed=3)
        batch, seq_labels, bgs = next(gen)
        assert seq_labels.shape == (batch.shape[0], int(np.ceil((32000 - 12400) / 1280)))
        assert bgs.shape == (batch.shape[0], 32000)

    def test_mix_clips_batch_rir_draws_are_per_clip(self, tmp_path, rng):
        """Reverb must be drawn independently per clip: within ONE batch some
        rows carry the echo RIR and some do not (a per-batch draw — the
        reference's behavior — makes every row identical in this respect)."""
        lag = 800
        fg_paths = []
        for i in range(48):
            p = str(tmp_path / f"fg{i}.wav")
            D.write_audio(p, rng.uniform(-0.5, 0.5, 32000).astype(np.float32))
            fg_paths.append(p)
        bg = str(tmp_path / "bg.wav")
        D.write_audio(bg, rng.uniform(-0.005, 0.005, 40000).astype(np.float32))
        identity = np.zeros(4000, np.float32); identity[0] = 1.0
        echo = np.zeros(4000, np.float32); echo[0] = 1.0; echo[lag] = 0.9
        rir_i = str(tmp_path / "rir_identity.wav")
        rir_e = str(tmp_path / "rir_echo.wav")
        D.write_audio(rir_i, identity)
        D.write_audio(rir_e, echo)

        gen = D.mix_clips_batch(fg_paths, [bg], combined_size=32000,
                                batch_size=48, snr_low=30, snr_high=30,
                                rirs=[rir_i, rir_e], rir_probability=0.5,
                                volume_augmentation=False, seed=11)
        batch, _, _ = next(gen)
        y = batch.astype(np.float64)
        # normalized lag-`lag` autocorrelation: ~0.5 for echoed white noise
        # (1 + 0.9-delayed copy), ~0 otherwise
        c = (np.einsum("bt,bt->b", y[:, lag:], y[:, :-lag])
             / np.einsum("bt,bt->b", y, y))
        assert (c > 0.25).any(), "no clip in the batch got the echo RIR"
        assert (c < 0.25).any(), "every clip in the batch was reverberated identically"

    def test_frame_labels(self):
        lbl = D.get_frame_labels(32000, 2000, 10000)
        assert lbl.shape == (int(np.ceil((32000 - 12400) / 1280)),)
        assert lbl.sum() >= 2


class TestAugmentation:
    def test_augment_clips_shapes_and_probabilities(self, wav_dir, tmp_path, rng):
        bg = str(tmp_path / "bg.wav")
        rir = str(tmp_path / "rir.wav")
        D.write_audio(bg, rng.uniform(-0.2, 0.2, 40000).astype(np.float32))
        ir = np.zeros(4000, dtype=np.float32)
        ir[0] = 1.0
        ir[800] = 0.4
        D.write_audio(rir, ir)
        gen = D.augment_clips(wav_dir * 2, total_length=32000, batch_size=6,
                              background_clip_paths=[bg], RIR_paths=[rir], seed=5)
        batch = next(gen)
        assert batch.shape == (6, 32000)
        assert batch.dtype == np.int16
        assert np.abs(batch).max() > 0

    def test_augment_clips_seed_reproducible(self, wav_dir, tmp_path, rng):
        bg = str(tmp_path / "bg.wav")
        D.write_audio(bg, rng.uniform(-0.2, 0.2, 40000).astype(np.float32))
        runs = []
        for _ in range(2):
            gen = D.augment_clips(wav_dir * 2, total_length=32000,
                                  batch_size=6, background_clip_paths=[bg],
                                  seed=9)
            runs.append(np.concatenate([b for b in gen]))
        np.testing.assert_array_equal(runs[0], runs[1])

    def test_augment_zero_probabilities_is_padding_only(self, wav_dir):
        probs = {k: 0.0 for k in D.DEFAULT_AUGMENTATION_PROBABILITIES}
        gen = D.augment_clips(wav_dir, total_length=32000, batch_size=3,
                              augmentation_probabilities=probs, seed=5)
        batch = next(gen)
        # clips are placed near the end with only zero-padding added
        orig = D.read_audio(wav_dir[0])
        row = batch[0] / 32767.0
        assert np.abs(row).max() > 0
        corr = np.correlate(row, orig[:4000], mode="valid")
        assert corr.max() > 0.5 * np.dot(orig[:4000], orig[:4000])

    def test_reverb_preserves_shape(self, rng, tmp_path):
        rir = str(tmp_path / "rir.wav")
        ir = np.zeros(2000, dtype=np.float32)
        ir[0] = 1.0
        D.write_audio(rir, ir)
        x = rng.normal(0, 0.1, (2, 16000)).astype(np.float32)
        y = D.apply_reverb(x, [rir])
        assert y.shape == x.shape
        # identity RIR (delta) keeps the signal roughly intact
        np.testing.assert_allclose(y[0], x[0], atol=0.02)


class TestMemmap:
    def test_mmap_batch_generator(self, tmp_path, rng):
        p0 = str(tmp_path / "neg.npy")
        p1 = str(tmp_path / "pos.npy")
        np.save(p0, rng.normal(0, 1, (300, 16, 96)).astype(np.float32))
        np.save(p1, rng.normal(0, 1, (100, 16, 96)).astype(np.float32))
        gen = D.mmap_batch_generator({"0": p0, "1": p1}, batch_size=40)
        x, y = next(gen)
        assert x.shape[1:] == (16, 96)
        assert set(np.unique(y)) == {"0", "1"}
        # quotas proportional to array sizes
        assert (y == "0").sum() == 30 and (y == "1").sum() == 10
        # wrap-around works
        for _ in range(20):
            x, y = next(gen)
        assert x.shape[0] == 40

    def test_trim_mmap(self, tmp_path, rng):
        p = str(tmp_path / "padded.npy")
        arr = np.zeros((50, 4, 8), dtype=np.float32)
        arr[:30] = rng.normal(0, 1, (30, 4, 8))
        np.save(p, arr)
        D.trim_mmap(p)
        out = np.load(p)
        assert out.shape == (30, 4, 8)

    def test_compute_features_from_generator(self, tmp_path, rng):
        from openwakeword_tpu.features import compute_features_from_generator

        def gen():
            for _ in range(3):
                yield (rng.uniform(-1, 1, (4, 32000)) * 20000).astype(np.int16)

        out = str(tmp_path / "features.npy")
        compute_features_from_generator(gen(), n_total=12, clip_duration=32000,
                                        output_file=out)
        feats = np.load(out)
        n_windows = ((32000 // 160 - 3) - 76) // 8 + 1
        assert feats.shape == (12, n_windows, 96)
        assert np.abs(feats).max() > 0


class TestAdversarialTexts:
    def test_generates_nonidentical_texts(self):
        texts = D.generate_adversarial_texts("hey computer", N=20,
                                             include_partial_phrase=0.3,
                                             include_input_words=0.2)
        assert len(texts) > 0
        assert all(t != "hey computer" for t in texts)

    def test_phoneme_replacement(self):
        out = D.phoneme_replacement(["HH", "EY"], max_replace=1, replace_char="X")
        assert out == ["X EY", "HH X"]


class TestMetrics:
    def test_false_positive_grouping(self):
        scores = np.zeros(200)
        scores[10:15] = 0.9   # one event
        scores[100:103] = 0.9  # second event (> 50 frames later)
        assert M.get_false_positives(scores, threshold=0.5) == 2
        scores[40] = 0.9       # within 50 frames of the first event
        assert M.get_false_positives(scores, threshold=0.5) == 2

    def test_roc_curves(self):
        rng = np.random.default_rng(0)
        neg = rng.uniform(0, 0.4, 45000)
        fprs = M.generate_roc_curve_fprs(neg, n_points=5)
        assert len(fprs) == 5
        assert fprs[-1] == 0.0          # nothing above 0.99
        pos = rng.uniform(0.6, 1.0, 100)
        tprs = M.generate_roc_curve_tprs(pos, n_points=5)
        assert tprs[0] == 1.0


class TestBulkGenericPath:
    def test_bulk_predict_generic_prediction_function(self, tmp_path, rng):
        """Non-predict_clip prediction functions route through the generic
        single-model path (reference utils.py:516-523 behavior)."""
        from openwakeword_tpu.parallel import bulk_predict
        p = str(tmp_path / "clip.wav")
        D.write_audio(p, rng.uniform(-0.3, 0.3, 32000).astype(np.float32))
        out = bulk_predict([p], wakeword_models=["alexa"],
                           prediction_function="_get_positive_prediction_frames",
                           threshold=0.0)
        assert p in out and "alexa" in out[p]


class TestReviewRegressions:
    def test_truncate_both_one_sample_overage(self, rng):
        """Reference quirk fixed: max_size+1 used to yield an EMPTY clip
        (x[0:-0]); now truncates symmetrically to max_size."""
        import openwakeword_tpu.data as D
        x = np.arange(41, dtype=np.float32)
        out = D.truncate_clip(x, 40, "truncate_both")
        assert out.shape == (40,)
        out2 = D.truncate_clip(np.arange(50, dtype=np.float32), 40, "truncate_both")
        assert out2.shape == (40,) and out2[0] == 5.0

    def test_mmap_scale_factor_per_label(self, tmp_path, rng):
        """A label WITHOUT a transform must not inherit the previous
        label's transform scale factor (reference data.py:800-816 quirk)."""
        import openwakeword_tpu.data as D
        p0 = str(tmp_path / "a.npy")
        p1 = str(tmp_path / "b.npy")
        np.save(p0, rng.normal(0, 1, (100, 16, 96)).astype(np.float32))
        np.save(p1, rng.normal(0, 1, (100, 16, 96)).astype(np.float32))
        tripler = lambda x: np.concatenate([x, x, x])
        gen = D.mmap_batch_generator({"expand": p0, "plain": p1}, batch_size=60,
                                     data_transform_funcs={"expand": tripler})
        # equal array sizes: each label gets batch_size*0.5 rows pre-transform
        # quota; 'expand' divides its quota by 3, 'plain' must NOT
        assert gen.n_per_class["expand"] == 10
        assert gen.n_per_class["plain"] == 30

    def test_mmap_labels_track_input_rows_under_expanding_transform(
            self, tmp_path, rng):
        """Label files index INPUT rows; a row-count-changing data transform
        must not shift which label rows are sliced (they are remapped by the
        label transform, not by the post-transform count)."""
        import openwakeword_tpu.data as D
        p = str(tmp_path / "x.npy")
        lp = str(tmp_path / "y.npy")
        data = np.arange(40, dtype=np.float32).reshape(40, 1, 1)
        np.save(p, np.tile(data, (1, 16, 96)))
        np.save(lp, np.arange(40, dtype=np.float32))    # label == row index
        doubler = lambda x: np.concatenate([x, x])
        gen = D.mmap_batch_generator(
            {"c": p}, label_files={"c": lp}, n_per_class={"c": 4},
            data_transform_funcs={"c": doubler},
            label_transform_funcs={"c": lambda y: np.concatenate([y, y])})
        x1, y1 = next(gen)
        np.testing.assert_array_equal(np.sort(np.unique(y1)), [0, 1, 2, 3])
        x2, y2 = next(gen)
        # second batch continues at input row 4 (pre-transform counter)
        np.testing.assert_array_equal(np.sort(np.unique(y2)), [4, 5, 6, 7])
        # labels still describe their rows after the transform
        np.testing.assert_array_equal(x2[:, 0, 0], y2)

    def test_filter_audio_paths_rejects_unknown_method(self, tmp_path):
        import openwakeword_tpu.data as D
        with pytest.raises(ValueError, match="duration_method"):
            D.filter_audio_paths([str(tmp_path)], 0, 10, duration_method="sizes")

    def test_reverberate_batched_rirs(self, rng):
        """Per-example (B, L) RIRs align each row to its own direct path
        (round-3 review: the flattened argmax applied one wrong shift)."""
        import jax.numpy as jnp
        from openwakeword_tpu.ops import augment
        B, n, L = 3, 2000, 400
        x = jnp.asarray(rng.normal(0, 0.3, (B, n)).astype(np.float32))
        rirs = np.zeros((B, L), np.float32)
        delays = [10, 150, 300]
        for i, d in enumerate(delays):
            rirs[i, d] = 1.0          # pure delay: reverberate(x) == x
        out = np.asarray(augment.reverberate(x, jnp.asarray(rirs)))
        np.testing.assert_allclose(out, np.asarray(x), atol=1e-3)
        # shared 1-D RIR path unchanged
        rir1 = np.zeros(L, np.float32); rir1[42] = 1.0
        out1 = np.asarray(augment.reverberate(x, jnp.asarray(rir1)))
        np.testing.assert_allclose(out1, np.asarray(x), atol=1e-3)

    def test_pitch_shift_rejects_short_input(self, rng):
        import jax
        from openwakeword_tpu.ops import augment
        with pytest.raises(ValueError, match="analysis frames"):
            augment.pitch_shift(jax.random.PRNGKey(0),
                                np.zeros((2, 800), np.float32))

    def test_bulk_read_wav_stereo(self, tmp_path, rng):
        import wave
        from openwakeword_tpu.parallel.bulk import _read_wav
        stereo = rng.integers(-5000, 5000, (1000, 2)).astype(np.int16)
        p = str(tmp_path / "st.wav")
        with wave.open(p, "wb") as f:
            f.setnchannels(2); f.setsampwidth(2); f.setframerate(16000)
            f.writeframes(stereo.tobytes())
        mono = _read_wav(p)
        np.testing.assert_array_equal(mono, stereo[:, 0])


class TestBatchedMixOps:
    def test_mix_at_snr_matches_per_clip_mix(self, rng):
        """The batched device mix must equal the scalar mix_clip loop."""
        from openwakeword_tpu.ops import augment as A
        n, size = 5, 12000
        bgs = rng.normal(0, 0.1, (n, size)).astype(np.float32)
        fgs = [rng.normal(0, 0.2, int(l)).astype(np.float32)
               for l in rng.integers(2000, 8000, n)]
        starts = [int(s) for s in rng.integers(0, 3000, n)]
        snrs = rng.uniform(-5, 15, n)

        expected = np.stack([D.mix_clip(fg, bg, snr, s)
                             for fg, bg, snr, s in zip(fgs, bgs, snrs, starts)])
        fg_mat = np.zeros((n, size), np.float32)
        for j, (fg, s) in enumerate(zip(fgs, starts)):
            fg_mat[j, s:s + fg.shape[0]] = fg
        got = np.asarray(A.mix_at_snr(bgs, fg_mat, snrs))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_generated_noise_augmentation_batched(self, wav_dir, tmp_path, rng):
        bg = str(tmp_path / "bg.wav")
        D.write_audio(bg, rng.uniform(-0.2, 0.2, 40000).astype(np.float32))
        gen = D.mix_clips_batch(wav_dir * 4, [bg], combined_size=32000,
                                labels=[1] * 12, batch_size=6, snr_low=5,
                                snr_high=10, generated_noise_augmentation=1.0,
                                seed=11)
        batch, labels, _ = next(gen)
        assert batch.shape[1] == 32000 and batch.dtype == np.int16
        assert np.abs(batch).max() > 0

    def test_generated_noise_sits_below_the_speech(self, tmp_path, rng):
        """The second mix scales the SPEECH snr dB above the generated
        noise (reference data.py:436 roles), not the other way around."""
        fg = str(tmp_path / "tone.wav")
        t = np.arange(16000) / 16000.0
        D.write_audio(fg, (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
        bg = str(tmp_path / "quiet.wav")
        D.write_audio(bg, rng.uniform(-0.01, 0.01, 40000).astype(np.float32))
        kw = dict(combined_size=32000, labels=[1] * 4, batch_size=4,
                  snr_low=20, snr_high=20, volume_augmentation=False, seed=13)
        base, _, _ = next(D.mix_clips_batch([fg] * 4, [bg], **kw))
        noisy, _, _ = next(D.mix_clips_batch([fg] * 4, [bg],
                                             generated_noise_augmentation=1.0,
                                             **kw))
        for b, n in zip(base.astype(np.float64), noisy.astype(np.float64)):
            corr = np.dot(b, n) / max(np.linalg.norm(b) * np.linalg.norm(n), 1e-9)
            # at 20 dB SNR the speech dominates: corr ~ 10/sqrt(101) ~ 0.995;
            # with the roles swapped it would be ~0.1
            assert corr > 0.9

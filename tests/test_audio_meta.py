"""Pure-Python audio header probing (utils.audio_meta) and the format-aware
duration estimation built on it (data.estimate_clip_duration /
get_clip_duration / filter_audio_paths), replacing the reference's
torchaudio+mutagen pipeline (reference data.py:153-290)."""

import os
import struct
import wave

import numpy as np
import pytest

from openwakeword_tpu import data as D
from openwakeword_tpu.utils.audio_meta import probe


def make_wav(path, seconds=1.0, sr=16000, channels=1):
    n = int(seconds * sr)
    with wave.open(path, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(np.zeros(n * channels, np.int16).tobytes())
    return path


def make_flac(path, total_samples=48000, sr=16000, channels=1, body_bytes=9000):
    """Header-only synthetic FLAC (STREAMINFO + dummy frame payload)."""
    streaminfo = struct.pack(">HH", 4096, 4096) + b"\x00" * 6  # block/frame sizes
    packed = (sr << 44) | ((channels - 1) << 41) | (15 << 36) | total_samples
    streaminfo += packed.to_bytes(8, "big") + b"\x00" * 16     # + md5
    header = b"fLaC" + struct.pack(">I", (1 << 31) | len(streaminfo))[0:4]
    # block header: last-block flag set, type 0, 24-bit length
    header = b"fLaC" + bytes([0x80, 0, 0, len(streaminfo)]) + streaminfo
    with open(path, "wb") as f:
        f.write(header + b"\x00" * body_bytes)
    return path


def mp3_frame(bitrate_idx=4, rate_idx=2, mono=True, payload=None):
    """One MPEG2 Layer-III frame (16 kHz family)."""
    b1 = 0b11110011                       # sync + MPEG2 + Layer III + no CRC
    b2 = (bitrate_idx << 4) | (rate_idx << 2)
    b3 = 0xC0 if mono else 0x00
    bitrate = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160][bitrate_idx] * 1000
    sr = [22050, 24000, 16000][rate_idx]
    frame_len = 576 // 8 * bitrate // sr
    body = payload if payload is not None else b"\x00" * (frame_len - 4)
    return (bytes([0xFF, b1, b2, b3]) + body)[:frame_len].ljust(frame_len, b"\x00")


def make_mp3(path, n_frames=50, id3_pad=0, xing_frames=0):
    data = b""
    if id3_pad:
        size = id3_pad
        data += b"ID3\x03\x00\x00" + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                                            (size >> 7) & 0x7F, size & 0x7F])
        data += b"\x00" * id3_pad
    if xing_frames:
        # side info for MPEG2 mono = 9 bytes, then the Xing tag
        payload = b"\x00" * 9 + b"Xing" + struct.pack(">II", 1, xing_frames)
        data += mp3_frame(payload=payload.ljust(140, b"\x00"))
        n_frames -= 1
    data += b"".join(mp3_frame() for _ in range(n_frames))
    with open(path, "wb") as f:
        f.write(data)
    return path


class TestProbe:
    def test_wav(self, tmp_path):
        p = make_wav(str(tmp_path / "a.wav"), seconds=1.25)
        info = probe(p)
        assert (info.format, info.sample_rate, info.channels) == ("wav", 16000, 1)
        assert info.duration == pytest.approx(1.25)
        assert info.bitrate == 16000 * 16

    def test_wav_stereo(self, tmp_path):
        p = make_wav(str(tmp_path / "s.wav"), seconds=0.5, channels=2)
        info = probe(p)
        assert info.channels == 2
        assert info.duration == pytest.approx(0.5)

    def test_flac(self, tmp_path):
        p = make_flac(str(tmp_path / "a.flac"), total_samples=40000)
        info = probe(p)
        assert info.format == "flac"
        assert info.sample_rate == 16000
        assert info.duration == pytest.approx(2.5)
        assert info.bitrate > 0

    def test_mp3_cbr(self, tmp_path):
        p = make_mp3(str(tmp_path / "a.mp3"), n_frames=50)
        info = probe(p)
        assert info.format == "mp3"
        assert info.sample_rate == 16000
        assert info.channels == 1
        assert info.duration == pytest.approx(50 * 576 / 16000, rel=0.05)

    def test_mp3_id3_skip(self, tmp_path):
        p = make_mp3(str(tmp_path / "t.mp3"), n_frames=25, id3_pad=512)
        info = probe(p)
        assert info.sample_rate == 16000
        assert info.duration == pytest.approx(25 * 576 / 16000, rel=0.05)

    def test_mp3_xing_exact(self, tmp_path):
        p = make_mp3(str(tmp_path / "v.mp3"), n_frames=10, xing_frames=200)
        info = probe(p)
        # Xing frame count wins over the size estimate
        assert info.duration == pytest.approx(200 * 576 / 16000)

    def test_unsupported_raises(self, tmp_path):
        p = str(tmp_path / "x.bin")
        with open(p, "wb") as f:
            f.write(b"\x01\x02" * 100)
        with pytest.raises(ValueError):
            probe(p)


class TestDurationEstimation:
    def test_estimate_clip_duration_wav(self, tmp_path):
        paths = [make_wav(str(tmp_path / f"{i}.wav"), seconds=0.5 + 0.25 * i)
                 for i in range(4)]
        sizes = [os.path.getsize(p) for p in paths]
        durs = D.estimate_clip_duration(paths, sizes)
        for d, want in zip(durs, [0.5, 0.75, 1.0, 1.25]):
            assert d == pytest.approx(want, abs=0.01)

    def test_estimate_clip_duration_mp3(self, tmp_path):
        paths = [make_mp3(str(tmp_path / f"{i}.mp3"), n_frames=25 * (i + 1))
                 for i in range(3)]
        sizes = [os.path.getsize(p) for p in paths]
        durs = D.estimate_clip_duration(paths, sizes)
        for i, d in enumerate(durs):
            assert d == pytest.approx(25 * (i + 1) * 576 / 16000, rel=0.1)

    def test_estimate_mp3_duration(self, tmp_path):
        p = make_mp3(str(tmp_path / "m.mp3"), n_frames=50)
        d = D.estimate_mp3_duration(p)
        # exact header-derived duration: 50 MPEG-2 layer-III frames of 576
        # samples at 16 kHz
        assert d == pytest.approx(50 * 576 / 16000, rel=1e-6)

    def test_estimate_mp3_duration_rejects_other_rates(self, tmp_path):
        p = make_wav(str(tmp_path / "w.wav"), seconds=1.0, sr=8000)
        assert D.estimate_mp3_duration(p) == 0.0

    def test_get_clip_duration_flac(self, tmp_path):
        p = make_flac(str(tmp_path / "f.flac"), total_samples=32000)
        assert D.get_clip_duration(p) == pytest.approx(2.0)

    def test_filter_audio_paths_mp3_corpus(self, tmp_path):
        d = tmp_path / "corpus"
        d.mkdir()
        make_mp3(str(d / "short.mp3"), n_frames=10)    # 0.36 s
        make_mp3(str(d / "mid.mp3"), n_frames=50)      # 1.8 s
        make_mp3(str(d / "long.mp3"), n_frames=200)    # 7.2 s
        paths, durs = D.filter_audio_paths([str(d)], 1.0, 3.0,
                                           duration_method="size")
        assert [os.path.basename(p) for p in paths] == ["mid.mp3"]
        assert durs[0] == pytest.approx(1.8, rel=0.1)

    def test_filter_audio_paths_header_mixed(self, tmp_path):
        d = tmp_path / "mixed"
        d.mkdir()
        make_wav(str(d / "a.wav"), seconds=2.0)
        make_flac(str(d / "b.flac"), total_samples=8000)   # 0.5 s
        make_mp3(str(d / "c.mp3"), n_frames=50)            # 1.8 s
        paths, durs = D.filter_audio_paths([str(d)], 1.0, 3.0,
                                           duration_method="header")
        names = sorted(os.path.basename(p) for p in paths)
        assert names == ["a.wav", "c.mp3"]


class TestPhonemizerHook:
    def test_oov_uses_injected_phonemizer(self, monkeypatch):
        monkeypatch.setattr(D, "_PHONEMIZER", lambda w: "Z AO R B L AE K S")
        assert D._phonemize_oov("zorblax") == "Z AO R B L AE K S"

    def test_missing_dp_returns_empty(self, monkeypatch):
        monkeypatch.setattr(D, "_PHONEMIZER", None)
        import builtins
        real_import = builtins.__import__

        def no_dp(name, *a, **k):
            if name.startswith("dp"):
                raise ImportError(name)
            return real_import(name, *a, **k)
        monkeypatch.setattr(builtins, "__import__", no_dp)
        assert D._phonemize_oov("zorblax") == ""
        monkeypatch.setattr(builtins, "__import__", real_import)
        # cache reset so other tests see a clean module state
        monkeypatch.setattr(D, "_PHONEMIZER", None)

    def test_generate_adversarial_texts_still_works(self):
        out = D.generate_adversarial_texts("hey zorblax", 8,
                                           include_partial_phrase=0.3,
                                           include_input_words=0.2)
        assert 0 < len(out) <= 8
        assert all(t != "hey zorblax" for t in out)


def test_mp3_large_id3_tag(tmp_path):
    """An ID3v2 tag bigger than the base probe window (cover art) must not
    hide the MP3 sync frame (round-2 review)."""
    from openwakeword_tpu.utils.audio_meta import probe
    tag_body = b"\x00" * 60000                      # 60 KB of tag payload
    sz = len(tag_body)
    id3 = b"ID3\x04\x00\x00" + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                                      (sz >> 7) & 0x7F, sz & 0x7F]) + tag_body
    # minimal MPEG1 Layer III frame header: 0xFFFB = sync + v1 + L3,
    # 0x90 = 128 kbps @ 44.1 kHz, stereo
    frame = b"\xff\xfb\x90\x00" + b"\x00" * 413
    p = tmp_path / "tagged.mp3"
    p.write_bytes(id3 + frame * 4)
    info = probe(str(p))
    assert info.format == "mp3" and info.sample_rate == 44100


def test_truncated_wav_raises_valueerror(tmp_path):
    """Truncated headers must surface as the documented ValueError, not
    struct.error/IndexError (round-2 review)."""
    from openwakeword_tpu.utils.audio_meta import probe
    p = tmp_path / "trunc.wav"
    p.write_bytes(b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00")
    with pytest.raises(ValueError):
        probe(str(p))
    p2 = tmp_path / "tiny.mp3"
    p2.write_bytes(b"ID3\x04\x00")                  # <10 bytes
    with pytest.raises(ValueError):
        probe(str(p2))

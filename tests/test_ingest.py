"""Native ingest-copy library: correctness vs numpy, fallback behavior,
and the zero-copy acquire/commit serving path."""

import numpy as np
import pytest

from openwakeword_tpu.parallel import ingest
from openwakeword_tpu.parallel.server import StreamServer


class TestNativeCopies:
    def test_copy_rows_matches_numpy(self, rng):
        # above the native threshold (4 MB): 4096 x 1280 int16 = 10 MB
        src = rng.integers(-30000, 30000, (4096, 1280)).astype(np.int16)
        dst = np.zeros_like(src)
        ingest.copy_rows(dst, src)
        np.testing.assert_array_equal(dst, src)
        # below the threshold (numpy path)
        small_src = src[:4].copy()
        small_dst = np.zeros_like(small_src)
        ingest.copy_rows(small_dst, small_src)
        np.testing.assert_array_equal(small_dst, small_src)

    def test_gather_rows_matches_numpy(self, rng):
        src = rng.integers(-30000, 30000, (4096, 1280)).astype(np.int16)
        idx = rng.permutation(4096).astype(np.int64)[:3000]
        dst = np.zeros((3000, 1280), np.int16)
        ingest.gather_rows(dst, src, idx)
        np.testing.assert_array_equal(dst, src[idx])
        # empty gather is a no-op
        ingest.gather_rows(np.zeros((0, 1280), np.int16), src,
                           np.zeros(0, np.int64))

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            ingest.copy_rows(np.zeros((2, 8), np.int16),
                             np.zeros((3, 8), np.int16))
        with pytest.raises(ValueError):
            ingest.gather_rows(np.zeros((2, 8), np.int16),
                               np.zeros((4, 9), np.int16),
                               np.zeros(2, np.int64))

    def test_fallback_when_library_unavailable(self, rng, monkeypatch):
        monkeypatch.setattr(ingest, "_lib", None)
        monkeypatch.setattr(ingest, "_lib_failed", True)   # force numpy path
        src = rng.integers(-100, 100, (4096, 1280)).astype(np.int16)
        dst = np.zeros_like(src)
        ingest.copy_rows(dst, src)
        np.testing.assert_array_equal(dst, src)

    def test_gather_rejects_out_of_range_indices(self, rng):
        """The native loop would read arbitrary memory on a bad index; both
        paths must raise IndexError instead (numpy-fallback parity)."""
        src = rng.integers(-100, 100, (4096, 1280)).astype(np.int16)
        dst = np.zeros((2, 1280), np.int16)
        for bad in ([-1, 0], [0, 4096], [0, 10 ** 9]):
            with pytest.raises(IndexError):
                ingest.gather_rows(dst, src, np.array(bad, np.int64))

    def test_3d_arrays_fall_back_correctly(self, rng):
        """A contiguous int16 array with >2 dims must not take the native
        path (it would copy only shape[0]*shape[1] elements); results must
        equal numpy regardless."""
        src = rng.integers(-100, 100, (2048, 2, 1280)).astype(np.int16)
        dst = np.zeros_like(src)
        ingest.copy_rows(dst, src)
        np.testing.assert_array_equal(dst, src)

    def test_noncontiguous_falls_back(self, rng):
        src = rng.integers(-100, 100, (4096, 2560)).astype(np.int16)[:, ::2]
        assert not src.flags.c_contiguous
        dst = np.zeros((4096, 1280), np.int16)
        ingest.copy_rows(dst, src)
        np.testing.assert_array_equal(dst, src)


class TestZeroCopyIngest:
    def _servers(self):
        kw = dict(wakeword_models=["alexa"], capacity=6, threshold=2.0,
                  rng_seed=0)
        return StreamServer(**kw), StreamServer(**kw)

    def test_acquire_commit_matches_push_block(self, rng):
        srv_z, srv_p = self._servers()
        za = [srv_z.add_stream() for _ in range(5)]
        pa = [srv_p.add_stream() for _ in range(5)]
        for _ in range(8):
            pkts = rng.integers(-2000, 2000, (5, 1280)).astype(np.int16)
            view = srv_z.acquire_block(5)
            view[...] = pkts           # the "network stack" writes in place
            srv_z.commit_block(np.array(za))
            srv_p.push_block(np.array(pa), pkts)
            np.testing.assert_allclose(srv_z.step(), srv_p.step(), atol=1e-6)

    def test_commit_routes_ineligible_rows_through_queue(self, rng):
        """Slots with backlog and duplicate ids cannot take the zero-copy
        fast path; their rows must drain through the per-slot queue with
        scores identical to plain per-slot push."""
        srv_z, srv_p = self._servers()
        za = [srv_z.add_stream() for _ in range(3)]
        pa = [srv_p.add_stream() for _ in range(3)]
        # give slot 0 a backlog so it is queue-backed at commit time
        backlog = rng.integers(-2000, 2000, 1280 * 2).astype(np.int16)
        srv_z.push(za[0], backlog)
        srv_p.push(pa[0], backlog)
        # rows: backlogged slot, a clean slot, and a duplicate pair
        pkts = rng.integers(-2000, 2000, (4, 1280)).astype(np.int16)
        view = srv_z.acquire_block(4)
        view[...] = pkts
        srv_z.commit_block(np.array([za[0], za[1], za[2], za[2]]))
        for sid, row in zip([pa[0], pa[1], pa[2], pa[2]], pkts):
            srv_p.push(sid, row)
        for z, p in zip(za, pa):
            assert srv_z.pending_frames(z) == srv_p.pending_frames(p)
        while any(srv_z.pending_frames(s) for s in za):
            np.testing.assert_allclose(srv_z.step(), srv_p.step(), atol=1e-6)

    def test_commit_respects_partial_tails(self, rng):
        """A slot holding tail samples (a partial frame) must queue its
        committed packet BEHIND the tail — staging it would reorder the
        stream's audio forever (review finding, round 3)."""
        srv_z, srv_p = self._servers()
        z = srv_z.add_stream()
        p = srv_p.add_stream()
        half = rng.integers(-2000, 2000, 640).astype(np.int16)
        srv_z.push(z, half)
        srv_p.push(p, half)
        pkts = rng.integers(-2000, 2000, (1, 1280)).astype(np.int16)
        view = srv_z.acquire_block(1)
        view[...] = pkts
        srv_z.commit_block(np.array([z]))
        srv_p.push(p, pkts[0])
        assert srv_z.pending_frames(z) == srv_p.pending_frames(p) == 1
        np.testing.assert_allclose(srv_z.step(), srv_p.step(), atol=1e-6)

    def test_reservation_blocks_other_calls(self, rng):
        srv, _ = self._servers()
        a = srv.add_stream()
        srv.acquire_block(1)
        for call in (lambda: srv.push(a, np.zeros(1280, np.int16)),
                     lambda: srv.push_block(np.array([a]),
                                            np.zeros((1, 1280), np.int16)),
                     srv.step,
                     lambda: srv.remove_stream(a),
                     lambda: srv.acquire_block(1)):
            with pytest.raises(RuntimeError, match="reservation"):
                call()
        srv.commit_block(np.array([a]))     # unblocks
        assert srv.pending_frames(a) == 1
        srv.step()

    def test_commit_validates_ids_and_shape(self, rng):
        srv, _ = self._servers()
        a = srv.add_stream()
        with pytest.raises(RuntimeError, match="no open"):
            srv.commit_block(np.array([a]))
        srv.acquire_block(2)
        with pytest.raises(ValueError, match="expected 2"):
            srv.commit_block(np.array([a]))
        # reservation was consumed by the failed commit; server is usable
        view = srv.acquire_block(1)
        view[...] = 7
        with pytest.raises(KeyError):
            srv.commit_block(np.array([a + 1]))   # inactive slot
        srv.acquire_block(1)
        with pytest.raises(KeyError):
            srv.commit_block(np.array([-1]))

    def test_acquire_respects_stage_capacity(self):
        srv = StreamServer(wakeword_models=["alexa"], capacity=2,
                           threshold=2.0, rng_seed=0)
        a = srv.add_stream()
        view = srv.acquire_block(1)
        view[...] = 1
        srv.commit_block(np.array([a]))
        with pytest.raises(RuntimeError, match="stage full"):
            srv.acquire_block(2)

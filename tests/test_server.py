"""StreamServer serving-runtime tests: slot lifecycle, buffered audio,
per-slot reset exactness, activation polling."""

import numpy as np
import pytest

from openwakeword_tpu.parallel import MultiStreamEngine
from openwakeword_tpu.parallel.server import StreamServer


@pytest.fixture(scope="module")
def server():
    return StreamServer(wakeword_models=["alexa"], capacity=4, threshold=0.3)


def test_slot_lifecycle(server):
    sids = [server.add_stream() for _ in range(4)]
    with pytest.raises(RuntimeError):
        server.add_stream()
    for sid in sids:
        server.remove_stream(sid)
    assert len(server._free) == 4


def test_push_step_poll(server, rng):
    a = server.add_stream()
    b = server.add_stream()
    audio = rng.integers(-2000, 2000, 1280 * 10).astype(np.int16)
    server.push(a, audio)
    server.push(b, audio[:1280 * 3])
    assert server.pending_frames(a) == 10
    steps = server.run_pending()
    assert steps == 10
    acts_a = server.poll(a)
    # random head on noise scores ~0.4 > 0.3 after warm-up
    assert all(lbl == "alexa" for lbl, _, _ in acts_a)
    assert server.poll(a) == []   # drained
    server.remove_stream(a)
    server.remove_stream(b)


def test_slot_reset_matches_fresh_engine(rng):
    """A re-leased slot must behave exactly like a freshly built engine
    stream (per-slot reset through the prime branch)."""
    server = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0,
                          rng_seed=0)
    audio = rng.integers(-3000, 3000, 1280 * 12).astype(np.int16)

    # pollute slot 0 with other audio, then re-lease it
    s0 = server.add_stream()
    server.push(s0, rng.integers(-500, 500, 1280 * 6).astype(np.int16))
    server.run_pending()
    server.remove_stream(s0)
    server.add_stream()          # occupy the other slot
    s0b = server.add_stream()    # re-lease the polluted slot
    assert s0b == s0
    server.push(s0b, audio)
    server.run_pending()
    scores_server = np.asarray(server.engine.state["score_hist"][s0b, 0, -12:])

    fresh = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2, rng_seed=0)
    for t in range(12):
        s = fresh.predict(np.stack([audio[t * 1280:(t + 1) * 1280]] * 2))
    scores_fresh = np.asarray(fresh.state["score_hist"][0, 0, -12:])
    np.testing.assert_allclose(scores_server, scores_fresh, atol=1e-5)


def test_engine_state_save_restore(tmp_path, rng):
    """Serving snapshot/restore: a restored engine continues the stream
    exactly where the original left off."""
    audio = rng.integers(-3000, 3000, 1280 * 12).astype(np.int16)
    e1 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2, rng_seed=0)
    for t in range(6):
        e1.predict(np.tile(audio[t * 1280:(t + 1) * 1280], (2, 1)))
    path = str(tmp_path / "engine_state.npz")
    e1.save_state(path)

    e2 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2, rng_seed=1)
    e2.load_state(path)
    for t in range(6, 12):
        chunk = np.tile(audio[t * 1280:(t + 1) * 1280], (2, 1))
        s1 = e1.predict(chunk)
        s2 = e2.predict(chunk)
        np.testing.assert_allclose(s1, s2, atol=1e-6)

    e3 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=3)
    with pytest.raises(ValueError):
        e3.load_state(path)


def test_engine_state_save_restore_bf16(tmp_path, rng):
    e1 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2, rng_seed=0,
                           precision="bf16")
    e1.predict(rng.integers(-1000, 1000, (2, 1280)).astype(np.int16))
    path = str(tmp_path / "bf16_state.npz")
    e1.save_state(path)
    e2 = MultiStreamEngine(wakeword_models=["alexa"], n_streams=2, rng_seed=1,
                           precision="bf16")
    e2.load_state(path)
    import jax.numpy as jnp
    assert e2.state["feat_ring"].dtype == jnp.bfloat16
    chunk = rng.integers(-1000, 1000, (2, 1280)).astype(np.int16)
    np.testing.assert_allclose(e1.predict(chunk), e2.predict(chunk), atol=1e-6)


def test_packetized_stream_matches_model(rng, test_clips):
    """The VERDICT #6 contract: a stream receiving 640-sample packets at half
    rate through the server produces, tick for tick, the same scores as the
    single-stream Model fed the same packets call for call."""
    import wave
    from openwakeword_tpu.model import Model

    with wave.open(test_clips["alexa"], "rb") as f:
        data = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
    packets = [data[i:i + 640] for i in range(0, 640 * 40, 640)]

    model = Model(wakeword_models=["alexa"])
    model_scores = [model.predict(p)["alexa"] for p in packets]

    srv = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0)
    sid = srv.add_stream()
    server_scores = []
    k = srv.labels.index("alexa")
    for p in packets:
        srv.push(sid, p)
        server_scores.append(float(srv.step()[sid, k]))

    np.testing.assert_allclose(server_scores, model_scores, atol=2e-4)


def test_starved_slot_state_frozen(rng):
    """A slot with no complete frame must not advance its audio state: its
    next real frame scores the same whether or not empty ticks happened."""
    audio = rng.integers(-2000, 2000, (6, 1280)).astype(np.int16)

    srv1 = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0)
    a = srv1.add_stream()
    scores1 = []
    for i in range(6):
        srv1.push(a, audio[i])
        scores1.append(float(srv1.step()[a, 0]))

    srv2 = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0)
    b = srv2.add_stream()
    scores2 = []
    for i in range(6):
        for _ in range(3):
            srv2.step()            # starved ticks: no audio pushed
        srv2.push(b, audio[i])
        scores2.append(float(srv2.step()[b, 0]))

    # audio-path state identical => the processed frames' embeddings agree;
    # scores differ only through warm-up tick counts, so compare after warm-up
    np.testing.assert_allclose(scores1[5], scores2[5], atol=2e-4)


def test_random_arrival_parity_with_model(rng, test_clips):
    """Vectorized host path vs ground truth: four slots receiving random-size
    packets on random ticks must score, slot for slot, exactly like four
    independent single-stream Models fed the same packet sequences."""
    import wave
    from openwakeword_tpu.model import Model

    with wave.open(test_clips["alexa"], "rb") as f:
        data = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)

    n_slots, n_ticks = 4, 24
    # per-slot random packet schedule: None = starved tick
    schedules = []
    for s in range(n_slots):
        cursor, sched = 1280 * s, []
        for _ in range(n_ticks):
            if rng.random() < 0.3:
                sched.append(None)
            else:
                size = int(rng.integers(320, 2100))
                sched.append(data[cursor:cursor + size])
                cursor += size
        schedules.append(sched)

    srv = StreamServer(wakeword_models=["alexa"], capacity=n_slots,
                       threshold=2.0, rng_seed=0)
    sids = [srv.add_stream() for _ in range(n_slots)]
    server_scores = [[] for _ in range(n_slots)]
    for t in range(n_ticks):
        for s in range(n_slots):
            if schedules[s][t] is not None:
                srv.push(sids[s], schedules[s][t])
        tick = srv.step()
        for s in range(n_slots):
            server_scores[s].append(float(tick[sids[s], 0]))

    for s in range(n_slots):
        model = Model(wakeword_models=["alexa"])
        # the server consumes at most one queued frame per tick; replay the
        # same queue semantics against the single-stream Model
        q, tail = [], np.empty(0, np.int16)
        expect = []
        for t in range(n_ticks):
            pkt = schedules[s][t]
            if pkt is not None:
                buf = np.concatenate([tail, pkt])
                n = buf.shape[0] // 1280
                q.extend(buf[:n * 1280].reshape(n, 1280))
                tail = buf[n * 1280:]
            if q:
                expect.append(model.predict(q.pop(0))["alexa"])
            else:
                expect.append(model.predict(np.empty(0, np.int16))["alexa"])
        np.testing.assert_allclose(server_scores[s], expect, atol=2e-4,
                                   err_msg=f"slot {s}")


def test_push_block_matches_per_slot_push(rng):
    """The vectorized block ingest must land the same frames as per-slot
    pushes, including ring wrap-around and overflow drops."""
    srv1 = StreamServer(wakeword_models=["alexa"], capacity=4, threshold=2.0,
                        queue_frames=8, rng_seed=0)
    srv2 = StreamServer(wakeword_models=["alexa"], capacity=4, threshold=2.0,
                        queue_frames=8, rng_seed=0)
    for srv in (srv1, srv2):
        for _ in range(3):
            srv.add_stream()
    pkts = rng.integers(-2000, 2000, (3, 1280 * 3)).astype(np.int16)
    sids = np.array([0, 1, 2])
    srv1.push_block(sids, pkts)
    for i in range(3):
        srv2.push(i, pkts[i])
    np.testing.assert_array_equal(srv1._queue, srv2._queue)
    np.testing.assert_array_equal(srv1._q_len, srv2._q_len)
    # drive both to overflow: 8-frame ring, 3 queued + 6 more
    more = rng.integers(-2000, 2000, (3, 1280 * 6)).astype(np.int16)
    srv1.push_block(sids, more)
    for i in range(3):
        srv2.push(i, more[i])
    assert srv1.overflow_drops == srv2.overflow_drops == 3
    s1, s2 = srv1.step(), srv2.step()
    np.testing.assert_allclose(s1, s2, atol=0)
    # non-frame-multiple packets take the fallback path and must still agree
    odd = rng.integers(-2000, 2000, (3, 700)).astype(np.int16)
    srv1.push_block(sids, odd)
    for i in range(3):
        srv2.push(i, odd[i])
    np.testing.assert_array_equal(srv1._tail_len, srv2._tail_len)
    np.testing.assert_array_equal(srv1._tail[:, :700], srv2._tail[:, :700])


def test_push_block_rejects_inactive_and_float(rng):
    srv = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0)
    srv.add_stream()
    with pytest.raises(KeyError):
        srv.push_block(np.array([0, 1]), np.zeros((2, 1280), np.int16))
    with pytest.raises(ValueError, match="int16"):
        srv.push_block(np.array([0]), np.zeros((1, 1280), np.float32))
    # out-of-bounds ids must honor the same KeyError contract as push():
    # a negative sid would otherwise wrap through the active-mask fancy
    # indexing and die deep in numpy, and sid >= capacity as IndexError
    with pytest.raises(KeyError, match="-1"):
        srv.push_block(np.array([-1]), np.zeros((1, 1280), np.int16))
    with pytest.raises(KeyError, match="2"):
        srv.push_block(np.array([2]), np.zeros((1, 1280), np.int16))


def test_accumulator_copies_client_buffer(rng):
    """Clients commonly reuse one receive buffer; stored views would be
    silently overwritten before the engine consumes them (round-2 review)."""
    from openwakeword_tpu.streaming import ChunkAccumulator
    acc = ChunkAccumulator(frame_samples=8)
    buf = np.arange(6, dtype=np.int16)          # 6 < 8: all pending
    assert acc.push(buf) is None
    buf[:] = -1                                  # client refills its buffer
    ready = acc.push(np.arange(6, 12, dtype=np.int16))
    np.testing.assert_array_equal(ready[:6], np.arange(6, dtype=np.int16))
    # the returned frame must also be immune to later pushes
    snapshot = ready.copy()
    acc.push(np.full(16, 7, np.int16))
    np.testing.assert_array_equal(ready, snapshot)


def test_accumulator_rejects_float_audio():
    """Normalized float PCM would truncate to all zeros under an int16
    cast — reject it loudly like AudioFeatures._check_pcm does."""
    from openwakeword_tpu.streaming import ChunkAccumulator
    acc = ChunkAccumulator(frame_samples=4)
    with pytest.raises(ValueError, match="int16"):
        acc.push(np.asarray([0.1, -0.5, 0.9, 0.2], np.float32))


def test_staged_packet_path_matches_queue_path(rng):
    """The zero-scatter staged path (push_block k=1 -> device scatter via
    engine.predict_packets) must score identically to the per-slot queue
    path, including mixed staged+queued ticks and slot churn."""
    pkts = rng.integers(-2000, 2000, (6, 3, 1280)).astype(np.int16)

    srv1 = StreamServer(wakeword_models=["alexa"], capacity=3, threshold=2.0,
                        rng_seed=0)
    srv2 = StreamServer(wakeword_models=["alexa"], capacity=3, threshold=2.0,
                        rng_seed=0)
    s1 = [srv1.add_stream() for _ in range(3)]
    s2 = [srv2.add_stream() for _ in range(3)]
    for t in range(6):
        # srv1: block push (staged fast path); srv2: per-slot push (ring)
        srv1.push_block(np.array(s1), pkts[t])
        for i, sid in enumerate(s2):
            srv2.push(sid, pkts[t, i])
        np.testing.assert_allclose(srv1.step(), srv2.step(), atol=1e-6,
                                   err_msg=f"tick {t}")

    # mixed tick: one slot gets an extra queued frame before the block push
    extra = rng.integers(-2000, 2000, 1280).astype(np.int16)
    srv1.push(s1[0], extra)
    srv2.push(s2[0], extra)
    srv1.push_block(np.array(s1), pkts[0])
    for i, sid in enumerate(s2):
        srv2.push(sid, pkts[0, i])
    for _ in range(2):   # drain both the queued and staged/queued frames
        np.testing.assert_allclose(srv1.step(), srv2.step(), atol=1e-6)
    assert srv1.pending_frames(s1[0]) == srv2.pending_frames(s2[0]) == 0


def test_staged_slot_removed_before_step(rng):
    """Removing a slot whose packet is staged must drop the packet."""
    srv = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0)
    a = srv.add_stream()
    b = srv.add_stream()
    srv.push_block(np.array([a, b]),
                   rng.integers(-1000, 1000, (2, 1280)).astype(np.int16))
    srv.remove_stream(a)
    scores = srv.step()
    assert scores.shape[0] == 2
    # slot b advanced; slot a is inactive and must not have been scored as valid
    assert srv.pending_frames(b) == 0


def test_predict_packets_padding_rows_dropped(rng):
    """JAX scatters wrap negative indices BEFORE mode='drop' applies, so -1
    padding rows must be remapped out-of-bounds-high or they overwrite (and
    starve) the highest slot."""
    eng = MultiStreamEngine(wakeword_models=["alexa"], n_streams=3)
    stage = rng.integers(-1000, 1000, (3, 1280)).astype(np.int16)
    eng.predict_packets(stage, np.array([0, 2, -1]))
    seen = np.asarray(eng.state["frames_seen"])
    assert seen.tolist() == [1, 0, 1]


def test_partial_stage_matches_per_push(rng):
    """A partially-filled stage (padding rows present) must score exactly
    like per-slot pushes, with no slot starved."""
    srv1 = StreamServer(wakeword_models=["alexa"], capacity=3, threshold=2.0,
                        rng_seed=0)
    srv2 = StreamServer(wakeword_models=["alexa"], capacity=3, threshold=2.0,
                        rng_seed=0)
    s1 = [srv1.add_stream() for _ in range(3)]
    s2 = [srv2.add_stream() for _ in range(3)]
    for t in range(3):
        pkts = rng.integers(-2000, 2000, (2, 1280)).astype(np.int16)
        # only slots 0 and 2 deliver this tick -> stage rows [p0, p2, pad]
        srv1.push_block(np.array([s1[0], s1[2]]), pkts)
        srv2.push(s2[0], pkts[0])
        srv2.push(s2[2], pkts[1])
        np.testing.assert_allclose(srv1.step(), srv2.step(), atol=1e-6,
                                   err_msg=f"tick {t}")


def test_remove_stream_compacts_stage(rng):
    """Slot churn while packets are staged must not run the stage cursor
    past capacity (crash) or strand staged flags (run_pending livelock)."""
    srv = StreamServer(wakeword_models=["alexa"], capacity=3, threshold=2.0)
    sids = [srv.add_stream() for _ in range(3)]
    srv.push_block(np.array(sids),
                   rng.integers(-1000, 1000, (3, 1280)).astype(np.int16))
    srv.remove_stream(sids[0])
    srv.remove_stream(sids[2])
    new = [srv.add_stream() for _ in range(2)]
    srv.push_block(np.array(new),
                   rng.integers(-1000, 1000, (2, 1280)).astype(np.int16))
    assert srv.run_pending() >= 1
    for sid in new:
        assert srv.pending_frames(sid) == 0


def test_push_block_duplicate_sids(rng):
    """Duplicate slot ids in one block must coalesce like sequential
    pushes (the vectorized scatters would silently drop frames)."""
    pkts = rng.integers(-1000, 1000, (2, 1280)).astype(np.int16)
    srv1 = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0,
                        rng_seed=0)
    srv2 = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0,
                        rng_seed=0)
    a1 = srv1.add_stream()
    a2 = srv2.add_stream()
    srv1.push_block(np.array([a1, a1]), pkts)
    srv2.push(a2, pkts[0])
    srv2.push(a2, pkts[1])
    assert srv1.pending_frames(a1) == srv2.pending_frames(a2) == 2
    # multi-frame packets with duplicates as well
    wide = rng.integers(-1000, 1000, (2, 2560)).astype(np.int16)
    srv1.push_block(np.array([a1, a1]), wide)
    srv2.push(a2, wide[0])
    srv2.push(a2, wide[1])
    assert srv1.pending_frames(a1) == srv2.pending_frames(a2)
    while srv1.pending_frames(a1):
        np.testing.assert_allclose(srv1.step(), srv2.step(), atol=1e-6)


def test_random_churn_parity_with_plain_push(rng):
    """Property test: under a random interleaving of add/remove/push_block/
    push/step, the staged fast-path server must match a twin that only ever
    uses plain per-slot push. Covers stage compaction, padding scatter,
    duplicate coalescing, and cursor alignment in combination.

    queue_frames is sized past the worst-case backlog one slot can reach
    (60 ops x <= 8 frames/op) so queue overflow never fires: a staged packet
    is exempt from overflow drops while the twin's plain-push copy is not
    (test_staged_packet_survives_queue_overflow pins that semantic), so
    under overflow the two servers legitimately diverge."""
    cap = 4
    srv1 = StreamServer(wakeword_models=["alexa"], capacity=cap,
                        threshold=2.0, rng_seed=0, queue_frames=512)
    srv2 = StreamServer(wakeword_models=["alexa"], capacity=cap,
                        threshold=2.0, rng_seed=0, queue_frames=512)
    live1, live2 = [], []
    for opi in range(60):
        op = rng.choice(["add", "remove", "block", "push", "step", "zero"])
        if op == "zero" and live1:
            # zero-copy ingest interleaved with everything else: fill the
            # acquired rows in place, commit to random (possibly duplicate,
            # possibly tailed/backlogged) slots
            n = int(rng.integers(1, len(live1) + 1))
            rows = rng.choice(len(live1), n, replace=True)
            pkts = rng.integers(-2000, 2000, (n, 1280)).astype(np.int16)
            try:
                view = srv1.acquire_block(n)
            except RuntimeError:      # stage full this tick: skip op
                continue
            view[...] = pkts
            srv1.commit_block(np.array([live1[r] for r in rows]))
            for r, p in zip(rows, pkts):
                srv2.push(live2[r], p)
        elif op == "add" and len(live1) < cap:
            live1.append(srv1.add_stream())
            live2.append(srv2.add_stream())
        elif op == "remove" and live1:
            k = int(rng.integers(len(live1)))
            srv1.remove_stream(live1.pop(k))
            srv2.remove_stream(live2.pop(k))
        elif op == "block" and live1:
            n = int(rng.integers(1, len(live1) + 1))
            rows = rng.choice(len(live1), n, replace=True)  # may duplicate
            frames = int(rng.integers(1, 3))
            pkts = rng.integers(-2000, 2000,
                                (n, 1280 * frames)).astype(np.int16)
            srv1.push_block(np.array([live1[r] for r in rows]), pkts)
            for r, p in zip(rows, pkts):
                srv2.push(live2[r], p)
        elif op == "push" and live1:
            k = int(rng.integers(len(live1)))
            # odd lengths exercise the tail path
            pcm = rng.integers(-2000, 2000,
                               int(rng.integers(1, 3000))).astype(np.int16)
            srv1.push(live1[k], pcm)
            srv2.push(live2[k], pcm)
        elif op == "step":
            np.testing.assert_allclose(srv1.step(), srv2.step(), atol=1e-5,
                                       err_msg=f"op {opi}")
        for s1, s2 in zip(live1, live2):
            assert srv1.pending_frames(s1) == srv2.pending_frames(s2), \
                f"op {opi}: pending mismatch slot {s1}/{s2}"
    while any(srv1.pending_frames(s) for s in live1):
        np.testing.assert_allclose(srv1.step(), srv2.step(), atol=1e-5)


def test_staged_packet_survives_queue_overflow(rng):
    """A zero-copy staged packet is accepted for the *current* tick and sits
    outside the per-slot queue, so a client outrunning the server drops the
    QUEUE's oldest frames but never the staged packet, and overflow_drops
    counts only queued frames (server.py overflow_drops contract)."""
    srv = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0,
                       queue_frames=2, rng_seed=0)
    # the twin queues plainly (no staging), so it needs one extra queue slot
    # to hold the same 3 surviving frames without overflowing itself
    twin = StreamServer(wakeword_models=["alexa"], capacity=2, threshold=2.0,
                        queue_frames=3, rng_seed=0)
    a, b = srv.add_stream(), twin.add_stream()
    pkts = rng.integers(-2000, 2000, (4, 1280)).astype(np.int16)
    view = srv.acquire_block(1)
    view[...] = pkts[0]
    srv.commit_block(np.array([a]))
    # three more packets overrun the 2-deep queue: pkts[1] (the queue's
    # oldest) is dropped; the staged pkts[0] survives
    for p in pkts[1:]:
        srv.push(a, p)
    assert srv.overflow_drops == 1
    assert srv.pending_frames(a) == 3            # staged + 2 queued
    # the audio the server will actually score, in consumption order
    for p in (pkts[0], pkts[2], pkts[3]):
        twin.push(b, p)
    while srv.pending_frames(a):
        np.testing.assert_allclose(srv.step(), twin.step(), atol=1e-6)
    assert twin.overflow_drops == 0


def test_server_composes_with_stream_mesh(rng):
    """Serving over a sharded engine: StreamServer(mesh=...) must behave
    identically to the unsharded server under slot churn — per-slot resets,
    staged pushes, and masked steps all run on mesh-sharded state (the
    multi-chip serving path, one host driving N chips over ICI)."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("streams",))
    srv_m = StreamServer(wakeword_models=["alexa"], capacity=16,
                         threshold=2.0, rng_seed=0, mesh=mesh)
    srv_1 = StreamServer(wakeword_models=["alexa"], capacity=16,
                         threshold=2.0, rng_seed=0)
    live_m, live_1 = [], []
    for opi in range(30):
        op = rng.choice(["add", "remove", "block", "push", "step"])
        if op == "add" and len(live_m) < 16:
            live_m.append(srv_m.add_stream())
            live_1.append(srv_1.add_stream())
        elif op == "remove" and live_m:
            k = int(rng.integers(len(live_m)))
            srv_m.remove_stream(live_m.pop(k))
            srv_1.remove_stream(live_1.pop(k))
        elif op == "block" and live_m:
            pkts = rng.integers(-2000, 2000,
                                (len(live_m), 1280)).astype(np.int16)
            srv_m.push_block(np.array(live_m), pkts)
            srv_1.push_block(np.array(live_1), pkts)
        elif op == "push" and live_m:
            k = int(rng.integers(len(live_m)))
            pcm = rng.integers(-2000, 2000,
                               int(rng.integers(1, 2000))).astype(np.int16)
            srv_m.push(live_m[k], pcm)
            srv_1.push(live_1[k], pcm)
        elif op == "step":
            np.testing.assert_allclose(srv_m.step(), srv_1.step(),
                                       atol=1e-5, err_msg=f"op {opi}")
    while any(srv_m.pending_frames(s) for s in live_m):
        np.testing.assert_allclose(srv_m.step(), srv_1.step(), atol=1e-5)


def test_poll_all_drains_only_activated_slots(rng):
    """poll_all must return exactly the per-slot activations poll() would,
    draining them, touching only slots that fired, and surviving
    remove_stream of a dirty slot."""
    srv = StreamServer(wakeword_models=["alexa"], capacity=4, threshold=0.0)
    sids = [srv.add_stream() for _ in range(3)]
    audio = rng.integers(-2000, 2000, (3, 1280 * 4)).astype(np.int16)
    for sid, pcm in zip(sids, audio):
        srv.push(sid, pcm)
    srv.run_pending()

    # twin expectation via per-slot poll on an identical server
    srv2 = StreamServer(wakeword_models=["alexa"], capacity=4, threshold=0.0)
    sids2 = [srv2.add_stream() for _ in range(3)]
    for sid, pcm in zip(sids2, audio):
        srv2.push(sid, pcm)
    srv2.run_pending()
    expected = {s1: srv2.poll(s2) for s1, s2 in zip(sids, sids2)}
    expected = {k: v for k, v in expected.items() if v}

    got = srv.poll_all()
    assert got == expected
    assert srv.poll_all() == {}                 # drained
    for sid in sids:
        assert srv.poll(sid) == []              # nothing left per-slot

    # a dirty slot removed before draining must not leak into poll_all
    srv.push(sids[0], audio[0])
    srv.run_pending()
    # only the slot that received frames can have fired (threshold 0.0
    # makes every valid step an activation, so it MUST have fired)
    assert srv.poll_all().keys() == {sids[0]}
    srv.push(sids[1], audio[1])
    srv.run_pending()
    srv.remove_stream(sids[1])
    assert sids[1] not in srv.poll_all()


class TestAsyncStepping:
    """step_async pipelined ticks: identical verdicts to sync step(),
    bounded in-flight depth, safe interleave with slot churn."""

    def test_async_matches_sync(self, rng):
        audio = rng.integers(-4000, 4000, (4, 8, 1280)).astype(np.int16)
        results = []
        for mode in ("sync", "async"):
            srv = StreamServer(wakeword_models=["alexa"], capacity=4,
                               threshold=0.3, rng_seed=0)
            sids = np.array([srv.add_stream() for _ in range(4)])
            acts = []
            for t in range(8):
                srv.push_block(sids, audio[:, t])
                if mode == "sync":
                    srv.step()
                else:
                    srv.step_async()
            srv.drain()
            for sid in sids:
                acts.append(srv.poll(int(sid)))
            results.append(acts)
        assert results[0] == results[1]

    def test_pipeline_depth_bounded(self, rng):
        srv = StreamServer(wakeword_models=["alexa"], capacity=2,
                           threshold=0.3, rng_seed=0)
        sids = np.array([srv.add_stream() for _ in range(2)])
        for t in range(6):   # more ticks than PIPELINE_DEPTH
            srv.push_block(sids, rng.integers(-2000, 2000, (2, 1280))
                           .astype(np.int16))
            srv.step_async()
            assert len(srv._inflight) <= srv.PIPELINE_DEPTH
        srv.drain()
        assert len(srv._inflight) == 0
        assert len(srv.fetch_log) == 6

    def test_remove_stream_settles_inflight(self, rng):
        srv = StreamServer(wakeword_models=["alexa"], capacity=2,
                           threshold=0.0, rng_seed=0)
        a = srv.add_stream()
        b = srv.add_stream()
        pkt = rng.integers(-2000, 2000, (2, 1280)).astype(np.int16)
        for _ in range(6):   # past warm-up zeroing so scores activate
            srv.push_block(np.array([a, b]), pkt)
            srv.step_async()
        srv.remove_stream(a)            # drains in-flight fetches first
        assert len(srv._inflight) == 0
        a2 = srv.add_stream()           # re-lease
        assert a2 == a
        assert srv.poll(a2) == []       # no stale activations on the new lease

    def test_sync_step_after_async_keeps_order(self, rng):
        srv = StreamServer(wakeword_models=["alexa"], capacity=2,
                           threshold=0.0, rng_seed=0)
        sids = np.array([srv.add_stream() for _ in range(2)])
        pkt = rng.integers(-2000, 2000, (2, 1280)).astype(np.int16)
        srv.push_block(sids, pkt)
        srv.step_async()
        srv.push_block(sids, pkt)
        srv.step()                      # implicit drain keeps frame order
        acts = srv.poll(int(sids[0]))
        frames = [f for _lbl, f, _s in acts]
        assert frames == sorted(frames)

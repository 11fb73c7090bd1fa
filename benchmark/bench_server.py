"""StreamServer host-path benchmark: serving ticks/sec at large slot counts.

Measures the *host* cost of one serving tick (queue gather, cursor updates,
activation extraction) separately from the device step, at 4k/16k/50k slots
with random packet arrival, answering: is the server wrapper able to keep a
50k-stream engine fed inside the 80 ms real-time budget?

The device step is measured by timing full ticks and empty-host ticks; the
host overhead is the difference between a full tick and the engine's own
masked-step wall time. Run on real TPU:  python benchmark/bench_server.py
(or JAX_PLATFORMS=cpu for a host-only smoke run with --slots 1024).
"""

import argparse
import os
import sys
import time

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--slots", type=int, nargs="*", default=[4096, 16384, 50176])
parser.add_argument("--ticks", type=int, default=20)
parser.add_argument("--occupancy", type=float, default=0.95,
                    help="fraction of slots that receive a packet each tick")
parser.add_argument("--host-only", action="store_true",
                    help="replace the device step with a host stub to "
                         "isolate the server's own per-tick cost (queue "
                         "gather, cursor updates, activation extraction) at "
                         "slot counts whose engine cannot compile here")
parser.add_argument("--ingest", choices=["push", "zero"], default="push",
                    help="'push': push_block hands the server a packet "
                         "matrix to copy (threaded native copy when "
                         "native/libowwingest.so is available); 'zero': the "
                         "client writes acquire_block rows in place and "
                         "commit_block only does bookkeeping")
parser.add_argument("--latency", action="store_true",
                    help="tail-latency SLO mode: pace ticks at the 80 ms "
                         "real-time period, draw Poisson-jittered packet "
                         "arrival times inside each window, and report "
                         "p50/p95/p99 packet-arrival -> activation-poll "
                         "latency (the serving claim's missing half: "
                         "throughput says the device keeps up on average, "
                         "this says WHEN a packet's verdict is available)")
parser.add_argument("--period", type=float, default=0.080,
                    help="tick period in seconds for --latency (default: "
                         "the 80 ms real-time frame)")
parser.add_argument("--pipelined", action="store_true",
                    help="with --latency: use step_async (overlapped "
                         "stepping — the fetcher thread materializes scores "
                         "while the host ingests the next window), so a "
                         "packet's verdict lands at arrival + device step "
                         "instead of at the next synchronous tick's end")
parser.add_argument("--device-ms", type=float, default=0.0,
                    help="with --host-only: simulate an asynchronous device "
                         "step of this many ms — predict returns instantly "
                         "(dispatch) and the scores only materialize "
                         "(np.asarray, as fetch_sharded does) once the "
                         "simulated step completes, queued FIFO behind "
                         "earlier steps like a real device. This is how the "
                         "sync-vs-pipelined comparison isolates the overlap "
                         "win: sync pays host + device serially per tick, "
                         "step_async pays max(host, device)")
args = parser.parse_args()


class _DelayedScores:
    """Async-device stand-in: the object returns from dispatch immediately,
    and materialization (``np.asarray``, the only thing ``fetch_sharded``
    does to a fully-addressable array) blocks until the simulated device
    step completes — exactly a jax.Array's sync=False contract."""

    def __init__(self, data, ready_at):
        self._data = data
        self._ready_at = ready_at
        self.shape = data.shape
        self.dtype = data.dtype
        self.size = data.size
        self.is_fully_addressable = True

    def __array__(self, dtype=None, copy=None):
        wait = self._ready_at - time.perf_counter()
        if wait > 0:
            time.sleep(wait)
        return self._data if dtype is None else self._data.astype(dtype)


class _StubEngine:
    """Engine stand-in for --host-only: same predict_masked surface, no
    device. Scores are a deterministic random matrix so the activation-
    extraction path does real work. ``device_ms > 0`` adds a simulated
    FIFO device queue (see --device-ms)."""

    def __init__(self, capacity, n_labels=6, device_ms=0.0):
        self.n_streams = capacity
        self.labels = [f"label_{i}" for i in range(n_labels)]
        self.state = {"ticks": np.zeros(capacity)}
        self._rng = np.random.default_rng(0)
        self._device_s = device_ms * 1e-3
        self._busy_until = 0.0
        # sparse activations (the wake-word reality): ~0.1% of scores cross
        # a 0.5 threshold; a dense score matrix would measure the Python
        # activation loop instead of the data path
        self._scores = self._rng.random((capacity, n_labels), np.float32) * 0.45
        flip = self._rng.random((capacity, n_labels)) < 1e-3
        self._scores[flip] = 0.9

    def init_state(self, n):
        return {"ticks": np.zeros(n)}

    def _result(self):
        if self._device_s <= 0:
            return self._scores
        # one device: step k+1 starts when step k finishes
        start = max(time.perf_counter(), self._busy_until)
        self._busy_until = start + self._device_s
        return _DelayedScores(self._scores, self._busy_until)

    def predict_masked(self, chunks, valid, sync=True):
        # touch the chunk matrix like a transfer would, without a device
        _ = chunks[0, 0]
        return self._result()

    def predict_packets(self, stage, slot_ids, sync=True):
        _ = stage[0, 0], slot_ids[0]
        return self._result()


def bench_capacity(capacity: int, n_ticks: int, occupancy: float,
                   host_only: bool = False, ingest_mode: str = "push"):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/owwt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from openwakeword_tpu.parallel.server import StreamServer

    if host_only:
        srv = StreamServer(engine=_StubEngine(capacity), threshold=0.5)
    else:
        srv = StreamServer(wakeword_models=[], capacity=capacity, threshold=0.5)
    sids = np.array([srv.add_stream() for _ in range(capacity)])
    rng = np.random.default_rng(0)

    # steady serving shape: one 80 ms packet per active client per tick, a
    # fixed fraction starved. The receive loop hands the server a contiguous
    # packet buffer + slot ids (what a network stack produces), so the
    # harness does not charge the server for a scatter it never performs.
    packet = rng.integers(-2000, 2000, (capacity, 1280)).astype(np.int16)
    n_arrive = int(capacity * occupancy)

    fill_s = []

    def one_tick(sync=False):
        t0 = time.perf_counter()
        if ingest_mode == "zero":
            # zero-copy path: the receive loop writes packets straight into
            # the staging rows, so the fill replaces the client's own buffer
            # write (not a server cost — tracked separately); the server-side
            # ingest cost is commit_block bookkeeping only.
            view = srv.acquire_block(n_arrive)
            view[...] = packet[:n_arrive]
            fill_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            srv.commit_block(sids[:n_arrive])
        else:
            srv.push_block(sids[:n_arrive], packet[:n_arrive])
        t_push = time.perf_counter() - t0
        t0 = time.perf_counter()
        scores = srv.step()
        if sync:
            float(scores[0, 0] if scores.size else 0.0)
        t_step = time.perf_counter() - t0
        return t_push, t_step

    # warm-up: compile the masked step + transfer programs
    one_tick(sync=True)
    one_tick(sync=True)

    # (a) full ticks, synchronized: total serving cost
    push_s, step_s = [], []
    for _ in range(n_ticks):
        p, s = one_tick(sync=True)
        push_s.append(p)
        step_s.append(s)

    if host_only:
        # the engine's canonical per-stream-frame device cost ('high',
        # PERF_NOTES canonical numbers: 0.1654 s / 50 frames / 4096 streams)
        dev_tick = capacity * (0.1654 / 50 / 4096)
    else:
        # (b) device-only masked step (same chunk shape, no host
        # bookkeeping): chained dispatches amortize the tunnel sync
        chunk = packet
        valid = np.ones(capacity, bool)
        srv.engine.predict_masked(chunk, valid)   # warm
        t0 = time.perf_counter()
        for _ in range(n_ticks):
            out = srv.engine.predict_masked(chunk, valid)
        np.asarray(out)
        dev_tick = (time.perf_counter() - t0) / n_ticks

    med_push = float(np.median(push_s))
    med_step = float(np.median(step_s))
    host = (med_push + med_step) if host_only \
        else max(med_step - dev_tick, 0.0) + med_push
    return {
        "mode": "host_only" if host_only else "full",
        "capacity": capacity,
        "tick_ms": round((med_push + med_step) * 1e3, 2),
        "push_ms": round(med_push * 1e3, 2),
        "step_ms": round(med_step * 1e3, 2),
        "device_step_ms": round(dev_tick * 1e3, 2),
        "host_overhead_ms": round(host * 1e3, 2),
        "ticks_per_sec": round(1.0 / (med_push + med_step), 1),
        "realtime_ok": (med_push + med_step) < 0.080,
        "host_below_device": host < dev_tick,
        "ingest": ingest_mode,
        **({"fill_ms": round(float(np.median(fill_s)) * 1e3, 2)}
           if fill_s else {}),
    }


def bench_latency(capacity: int, n_ticks: int, occupancy: float,
                  host_only: bool = False, ingest_mode: str = "push",
                  period: float = 0.080, seed: int = 0,
                  pipelined: bool = False, device_ms: float = 0.0):
    """Packet-arrival -> activation-poll latency under jittered arrival.

    Clients send one 80 ms packet per period with uniform jitter inside the
    window (Poisson-thinned count at the given occupancy); the serving loop
    runs at the real-time cadence: sleep to the tick boundary, ingest the
    window's packets, step the engine, drain activations. A packet's latency
    is (poll-complete wall time) - (its arrival time on the IDEAL schedule):
    if a tick overruns the period the loop falls behind and the backlog
    shows up in the tail — exactly what an SLO measures. Arrivals never slow
    down to match a slow server.
    """
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/owwt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from openwakeword_tpu.parallel.server import StreamServer

    if host_only:
        srv = StreamServer(engine=_StubEngine(capacity, device_ms=device_ms),
                           threshold=0.5)
    else:
        srv = StreamServer(wakeword_models=[], capacity=capacity,
                           threshold=0.5)
    sids = np.array([srv.add_stream() for _ in range(capacity)])
    rng = np.random.default_rng(seed)
    packet = rng.integers(-2000, 2000, (capacity, 1280)).astype(np.int16)

    def ingest(n_k):
        if ingest_mode == "zero":
            view = srv.acquire_block(n_k)
            view[...] = packet[:n_k]
            srv.commit_block(sids[:n_k])
        else:
            srv.push_block(sids[:n_k], packet[:n_k])

    def one_tick(n_k):
        ingest(n_k)
        scores = srv.step()
        acts = srv.poll_all()
        # sync: activation extraction inside step() already fetched scores;
        # touch both so neither is dead code
        return float(scores[0, 0] if scores.size else 0.0), len(acts)

    # each client sends one 80 ms packet per 80 ms regardless of the tick
    # period: sub-period ticking (the latency lever — the masked step scores
    # whichever slots completed a frame) sees proportionally fewer packets
    # per tick
    rate = capacity * occupancy * period / 0.080

    # warm-up outside the paced loop: compile the masked step + transfer
    one_tick(int(rate))
    one_tick(int(rate))

    lat_ms: list = []
    overruns = 0
    if pipelined:
        # overlapped stepping: the loop dispatches at each boundary and never
        # waits for the device; a packet's verdict is available when the
        # fetcher thread finishes that tick's score fetch + extraction. The
        # server logs that moment (fetch_log) — latency is measured against
        # it, not against the loop's position.
        tick_arrivals = {}
        t0 = time.perf_counter()
        for k in range(n_ticks):
            window_start = t0 + k * period
            boundary = window_start + period
            n_k = max(min(capacity, int(rng.poisson(rate))), 1)
            arrivals = window_start + rng.random(n_k) * period
            now = time.perf_counter()
            if now < boundary:
                time.sleep(boundary - now)
            ingest(n_k)
            frame = srv.step_async()
            tick_arrivals[frame] = arrivals
            srv.poll_all()       # drain whatever completed; cost is real
            if time.perf_counter() > boundary + period:
                overruns += 1
        srv.drain()
        done_times = dict(srv.fetch_log)
        for frame, arrivals in tick_arrivals.items():
            done = done_times.get(frame)
            if done is None:     # evicted from the bounded log (huge runs)
                continue
            lat_ms.extend(((done - arrivals) * 1e3).tolist())
    else:
        t0 = time.perf_counter()
        for k in range(n_ticks):
            window_start = t0 + k * period
            boundary = window_start + period
            n_k = min(capacity, int(rng.poisson(rate)))
            n_k = max(n_k, 1)
            arrivals = window_start + rng.random(n_k) * period
            now = time.perf_counter()
            if now < boundary:
                time.sleep(boundary - now)
            one_tick(n_k)
            done = time.perf_counter()
            lat_ms.extend(((done - arrivals) * 1e3).tolist())
            if done > boundary + period:
                overruns += 1
    lat = np.asarray(lat_ms)
    return {
        "mode": "latency",
        "capacity": capacity,
        "occupancy": occupancy,
        "period_ms": period * 1e3,
        "ticks": n_ticks,
        "packets": int(lat.size),
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p95_ms": round(float(np.percentile(lat, 95)), 2),
        "p99_ms": round(float(np.percentile(lat, 99)), 2),
        "max_ms": round(float(lat.max()), 2),
        "overrun_ticks": overruns,
        "ingest": ingest_mode,
        "host_only": host_only,
        "pipelined": pipelined,
        "device_ms": device_ms,
    }


def main():
    for cap in args.slots:
        if args.latency:
            r = bench_latency(cap, args.ticks, args.occupancy,
                              host_only=args.host_only,
                              ingest_mode=args.ingest, period=args.period,
                              pipelined=args.pipelined,
                              device_ms=args.device_ms)
        else:
            r = bench_capacity(cap, args.ticks, args.occupancy,
                               host_only=args.host_only,
                               ingest_mode=args.ingest)
        print(r)


if __name__ == "__main__":
    main()

"""bench.py watchdog tests: the headline benchmark must survive a hung or
crashed child (the observed poisoned-compile-cache wedge) and still honor
the one-JSON-line output contract. Uses bench.py's BENCH_TEST_MODE hook so
no device is involved."""

import json
import os
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def _run(tmp_path, mode, watchdog_s="15", probe_s=None):
    # watchdog_s must comfortably exceed interpreter startup (~2.6 s on
    # this host: heavy sitecustomize) or healthy children get killed
    cache = tmp_path / "cache"
    cache.mkdir(exist_ok=True)
    (cache / "entry").write_text("poisoned")
    env = dict(os.environ, BENCH_TEST_MODE=mode,
               BENCH_WATCHDOG_S=watchdog_s, BENCH_CACHE_DIR=str(cache))
    if probe_s is not None:
        env["BENCH_PROBE_S"] = probe_s
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, BENCH], env=env, timeout=120,
                       capture_output=True, text=True)
    return r, time.perf_counter() - t0, cache


def test_healthy_child_forwards_one_json_line(tmp_path):
    r, _, cache = _run(tmp_path, "ok")
    assert r.returncode == 0
    lines = r.stdout.strip().splitlines()
    assert len(lines) == 1                      # the output contract
    assert json.loads(lines[0])["metric"] == "watchdog_selftest"
    assert cache.is_dir()                       # healthy run keeps the cache


def test_hung_child_is_killed_and_cache_moved(tmp_path):
    r, wall, cache = _run(tmp_path, "hang")
    assert r.returncode == 1
    assert "hung past" in r.stderr
    # first hang moves the cache aside and retries once
    assert not cache.exists()
    assert any(p.name.startswith("cache.poisoned")
               for p in tmp_path.iterdir())
    # two 15 s watchdog windows + kill/reap, nowhere near the 10000 s sleep
    assert wall < 110


def test_crashed_child_retries_then_fails(tmp_path):
    r, _, cache = _run(tmp_path, "crash")
    assert r.returncode == 1
    assert "exited 3" in r.stderr
    assert not cache.exists()                   # retry went cold


def _assert_failure_json(r):
    """A failed bench keeps the one-JSON-line contract with value 0 and an
    explicit error detail, so the driver records a parseable zero instead
    of an empty file (and cannot mistake it for a real measurement)."""
    line = r.stdout.strip()
    assert line and "\n" not in line
    rec = json.loads(line)
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert rec["detail"]["error"]


@pytest.mark.parametrize("mode", ["hang", "crash"])
def test_failure_prints_zero_metric_json(tmp_path, mode):
    r, _, _ = _run(tmp_path, mode)
    assert r.returncode == 1
    _assert_failure_json(r)


def test_hung_attach_probe_fails_fast(tmp_path):
    """A backend attach that hangs (dead device tunnel) must fail within
    the probe leash, not burn both full watchdog windows — and must not
    blame (or discard) the compile cache."""
    r, wall, cache = _run(tmp_path, "probe_hang", probe_s="10")
    assert r.returncode == 1
    assert "attach probe hung" in r.stderr
    _assert_failure_json(r)
    assert wall < 50                    # probe leash + kill, not 2x15 s + retries
    assert cache.is_dir()               # an unreachable device is not a cache bug


def test_probe_can_be_skipped(tmp_path):
    r, _, _ = _run(tmp_path, "ok", probe_s="0")
    assert r.returncode == 0
    assert json.loads(r.stdout.strip())["metric"] == "watchdog_selftest"

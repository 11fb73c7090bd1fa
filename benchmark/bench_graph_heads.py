"""Generic graph-head serving capacity: rt streams with imported graphs vs
the native-head baseline.

The reference serves arbitrary user .onnx/.tflite classifiers at interpreter
speed (reference model.py:112-141); here they compile through the general
graph executors (io.onnx_graph / io.tflite_graph) into the fused engine
step. This measures what that costs at serving scale, for the configs the
round-4 ladder left unmeasured:

  native    — one pretrained dnn head (the PERF_NOTES baseline config)
  onnx-cnn  — conv-tower ONNX graph head (batch-flexible)
  tfl-pinned— depthwise-CNN TFLite head with pinned batch-1 shapes, served
              per-sample under vmap inside the step
  tfl-int8  — the same graph quantized, dequantized-float emulation
  tfl-exact — the same graph quantized, exact integer kernels
              (quantized_execution='exact')

Run on real TPU:  python benchmark/bench_graph_heads.py
(CPU smoke: JAX_PLATFORMS=cpu BENCH_STREAMS=64 BENCH_FRAMES=5 ...)
Methodology matches bench.py: one scanned program, chained dispatches,
scalar-fetch sync (axon block_until_ready is a no-op).
"""

import json
import logging
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.disable(logging.WARNING)

S = int(os.environ.get("BENCH_STREAMS", 4096))
T = int(os.environ.get("BENCH_FRAMES", 50))
CHAIN = int(os.environ.get("BENCH_CHAIN", "5"))
PRECISION = os.environ.get("BENCH_PRECISION", "high")


def _build_fixtures(tmp):
    from tests import fixture_builders
    rng = np.random.default_rng(0)
    onnx_path = os.path.join(tmp, "cnn_head.onnx")
    fixture_builders.build_cnn_graph_head_onnx(onnx_path, {
        "conv1.weight": rng.normal(0, .2, (32, 96, 3)).astype(np.float32),
        "conv1.bias": rng.normal(0, .1, 32).astype(np.float32),
        "conv2.weight": rng.normal(0, .2, (32, 32, 3)).astype(np.float32),
        "conv2.bias": rng.normal(0, .1, 32).astype(np.float32),
        "fc.weight": rng.normal(0, .2, (1, 32)).astype(np.float32),
        "fc.bias": rng.normal(0, .1, 1).astype(np.float32)})
    z = {"conv.weight": rng.normal(0, .5, (8, 1, 3, 3)).astype(np.float32),
         "conv.bias": rng.normal(0, .1, 8).astype(np.float32),
         "dw.weight": rng.normal(0, .5, (8, 1, 3, 3)).astype(np.float32),
         "dw.bias": rng.normal(0, .1, 8).astype(np.float32),
         "fc.weight": rng.normal(0, .5, (1, 8)).astype(np.float32),
         "fc.bias": rng.normal(0, .1, 1).astype(np.float32)}
    tfl_path = os.path.join(tmp, "cnn2d_head.tflite")
    fixture_builders.build_cnn2d_graph_head_tflite(tfl_path, z)
    q_path = os.path.join(tmp, "cnn2d_int8.tflite")
    fixture_builders.build_quantized_cnn2d_graph_head_tflite(q_path, z)
    return onnx_path, tfl_path, q_path


def bench(name, wakeword_models, **engine_kwargs):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE_DIR", "/tmp/owwt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from openwakeword_tpu.parallel.engine import MultiStreamEngine

    eng = MultiStreamEngine(wakeword_models=wakeword_models, n_streams=S,
                            precision=PRECISION, **engine_kwargs)
    scan = eng._build_scan()

    def run(params, state, frames):
        state, scores = scan(params, state, frames)
        return state, jnp.mean(scores)

    run_jit = jax.jit(run, donate_argnums=(1,))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(-2000, 2000, (T, S, 1280)).astype(np.int16))

    t0 = time.perf_counter()
    state, mean = run_jit(eng.params, eng.state, frames)
    _ = float(mean)
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            state, mean = run_jit(eng.params, state, frames)
        _ = float(mean)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    rt = S * T * 0.08 / best
    print(f"{name:11s} wall={best:.4f}s  compile={compile_s:.1f}s  "
          f"rt-streams={rt:,.0f}", flush=True)
    return {"config": name, "wall_s": round(best, 4),
            "rt_streams": round(rt, 1), "compile_s": round(compile_s, 1)}


def main():
    results = []
    with tempfile.TemporaryDirectory() as tmp:
        onnx_path, tfl_path, q_path = _build_fixtures(tmp)
        results.append(bench("native", ["alexa"]))
        results.append(bench("onnx-cnn", [onnx_path]))
        results.append(bench("tfl-pinned", [tfl_path]))
        results.append(bench("tfl-int8", [q_path]))
        results.append(bench("tfl-exact", [q_path],
                             quantized_execution="exact"))
    print(json.dumps({"streams": S, "frames": T, "precision": PRECISION,
                      "results": results}))


if __name__ == "__main__":
    main()

"""Headline benchmark: concurrent real-time 16 kHz NS+AEC+AGC+VAD streams
per chip (the BASELINE.json north star; the C reference runs ONE such
chain and already strains a Raspberry Pi 4B at 16 kHz, README.md:143-151).

Runs the batched record chain (wmix_tpu/engine/chain.py) in its
production shape — chunked lax.scan execution, one dispatch per K
packages — and reports how many streams fit in real time:
streams = B * (audio_seconds / wall_seconds).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "streams", "vs_baseline": N/4096,
   "ladder": [per-batch measurements], "mfu": ..., "stages_ms": {...}}

Budget discipline (VERDICT r3 weak #1: the round-3 bench burned its
whole wall clock compiling the B>=4096 ladder points and the driver
killed it with NOTHING recorded):

  * ONE worker subprocess measures ladder points in priority order
    (headline batch first) and STREAMS each result as a flushed JSON
    line the moment it lands;
  * the parent enforces a TOTAL wall budget (BENCH_WALL, default 540 s):
    when the budget expires it kills the worker and assembles the final
    line from whatever points already streamed out;
  * the worker also self-checks the deadline between points and skips
    remaining points as {"error": "budget"} instead of starting a
    compile it cannot finish.

So the headline number lands within the first few minutes and nothing
the driver does afterwards can erase it.  Hardened against a wedged TPU
plugin as before: the parent never imports jax; on total failure it
reports last-known-good from bench_lastgood.json (marked degraded).
"""
import json
import os
import signal
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
_LASTGOOD = os.path.join(_REPO, "bench_lastgood.json")
_METRIC = "concurrent_16k_ns_aec_agc_vad_streams_per_chip"

# v5e single-chip peak: 197 TFLOP/s bf16, f32 matmul at half rate.  The
# chain is float32 throughout (parity), so f32 peak is the honest
# denominator.
_PEAK_F32 = 98.5e12


def _pallas_flops_per_pkg_per_stream() -> float:
    """Analytic FLOPs of the pallas AEC package kernel (cost analysis
    reports 0 for pallas custom calls).  Per _block_math: matmuls +
    elementwise, x5 blocks per package."""
    mm = lambda m, k, n: 2.0 * m * k * n
    per_block = (
        mm(1, 128, 260)        # near fft (windowed + plain)
        + mm(1, 64, 130)       # error fft
        + mm(1, 130, 64)       # echo-estimate inverse
        + 2 * mm(12, 65, 64)   # adaptation hop 1 (re+im)
        + mm(12, 64, 130)      # adaptation hop 2
        + 2 * mm(1, 128, 130)  # windowed near/error ffts
        + 2 * mm(1, 65, 128)   # output inverse fft
        + 12 * 65 * 16         # FilterFar/gradient/energy elementwise
        + 65 * 120)            # NLP/coherence/suppress elementwise
    return 5.0 * per_block


# ----------------------------------------------------------------- worker

def _emit(obj) -> None:
    sys.stdout.write(json.dumps(obj) + "\n")
    sys.stdout.flush()


def _measure(chain_kw: dict, batch: int, k_pkgs: int, n_chunks: int):
    """One timed measurement; returns dict."""
    import numpy as np
    import jax
    from wmix_tpu.engine.chain import RecordChain, ShardedRecordChain

    freq = 16000
    pkg = freq // 1000 * 20
    # Above the shard width, the monolithic program exceeds the TPU
    # compile helper (round-3 ladder failure at B>=4096); serve the
    # batch as shard-width dispatches that all hit ONE compiled
    # executable (bitwise-identical streams,
    # tests/test_engine_chain.py::test_sharded_chain_matches_monolithic)
    shard_w = int(os.environ.get("BENCH_SHARD_W", "2048"))
    if batch > shard_w and batch % shard_w == 0:
        chain = ShardedRecordChain(batch, freq, shards=batch // shard_w,
                                   **chain_kw)
    else:
        chain = RecordChain(batch, freq, **chain_kw)
    rng = np.random.RandomState(0)

    # advance the host planner past the AEC startup phase (3 packages of
    # passthrough) WITHOUT running device steps: startup device work is
    # irrelevant to steady-state throughput, and skipping it avoids three
    # expensive one-off per-package compiles at large batch
    if chain.planner is not None:
        for _ in range(3):
            chain._plan_tick()

    mic_c = (rng.randn(k_pkgs, batch, pkg) * 3000).astype(np.int16)
    play_c = (rng.randn(k_pkgs, batch, pkg) * 5000).astype(np.int16)
    # audio resides in HBM before the timed region: the metric is DSP
    # streams per chip; ingest rides PCIe in deployment, but this test
    # rig reaches the chip through a debug tunnel whose bandwidth would
    # otherwise dominate the measurement
    mic_c = jax.device_put(mic_c)
    play_c = jax.device_put(play_c)

    # compile + first runs (not timed).  TWO warm chunks: the first
    # covers the startup/fallback program, the second the steady-state
    # cycle program (which contains the pallas kernel and costs minutes
    # to compile cold — timing it once turned a 9k-stream run into a
    # recorded 27)
    for _ in range(2):
        o, p8, v = chain.run_chunk(mic_c, play_c)
    jax.block_until_ready(o)

    t0 = time.perf_counter()
    for _ in range(n_chunks):
        o, p8, v = chain.run_chunk(mic_c, play_c)
    jax.block_until_ready(o)
    dt = time.perf_counter() - t0

    audio_s = n_chunks * k_pkgs * 0.02
    streams = batch * audio_s / dt
    out = {"batch": batch, "streams": round(float(streams), 1),
           "chunk_ms": round(dt / n_chunks * 1000, 2),
           "budget_ms": k_pkgs * 20}

    # host planning cost (the per-chunk _plan_tick python loop)
    if chain.planner is not None:
        t0 = time.perf_counter()
        for _ in range(k_pkgs):
            chain._plan_tick()
        out["plan_ms_per_chunk"] = round(
            (time.perf_counter() - t0) * 1000, 2)
    return out


def _worker(batches, k_pkgs: int, n_chunks: int, stages: bool,
            deadline: float) -> None:
    """Runs inside the subprocess; STREAMS one JSON line per result."""
    import jax
    # smoke-test hook: the ambient sitecustomize pins JAX_PLATFORMS=axon,
    # so a CPU run needs the config update before first backend use
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    # persist compiled executables across bench runs: the pallas AEC
    # kernel costs minutes to compile and the shapes repeat per round
    try:
        from wmix_tpu.engine.aec_pallas import _ensure_compile_cache
        _ensure_compile_cache()
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    _emit({"event": "backend", "backend": jax.default_backend()})

    full = dict(ns_enable=True, aec_enable=True, agc_enable=True,
                vad_enable=True)
    first_done = False
    for b in batches:
        if first_done and time.time() > deadline - 30:
            _emit({"event": "point", "batch": b, "error": "budget"})
            continue
        try:
            pt = _measure(full, b, k_pkgs, n_chunks)
            _emit({"event": "point", **pt})
            print(f"  B={b}: {pt['streams']} streams", file=sys.stderr)
        except Exception as e:  # OOM etc.: record and continue
            _emit({"event": "point", "batch": b, "error": str(e)[:300]})
            print(f"  B={b}: FAILED {e}", file=sys.stderr)
            continue
        if not first_done and stages:
            # per-stage isolation right after the headline point so it
            # survives a budget kill during the bigger batches
            first_done = True
            iso = {
                "ns": dict(ns_enable=True, aec_enable=False,
                           agc_enable=False, vad_enable=False),
                "aec": dict(ns_enable=False, aec_enable=True,
                            agc_enable=True, vad_enable=False),
                "agc_vad": dict(ns_enable=False, aec_enable=False,
                                agc_enable=True, vad_enable=True),
            }
            # NB "aec" keeps AGC on: the AEC-only chain's int16 recast
            # path matches either way; AGC is cheap and keeping it
            # avoids an extra compiled variant.
            stages_ms = {"full": pt["chunk_ms"],
                         "host_plan": pt.get("plan_ms_per_chunk", 0.0)}
            for name, kw in iso.items():
                if time.time() > deadline - 60:
                    stages_ms[name] = "skipped: budget"
                    continue
                try:
                    m = _measure(kw, pt["batch"], k_pkgs,
                                 max(2, n_chunks // 2))
                    stages_ms[name] = m["chunk_ms"]
                except Exception as e:
                    stages_ms[name] = f"failed: {str(e)[:100]}"
            _emit({"event": "stages", "stages_ms": stages_ms})
        first_done = True


# ----------------------------------------------------------------- parent

def _run_streaming(batches, k_pkgs: int, n_chunks: int,
                   deadline: float, stages: bool):
    """Launch the worker, collect streamed events until the deadline."""
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           ",".join(str(b) for b in batches), str(k_pkgs), str(n_chunks),
           "1" if stages else "0", str(deadline)]
    proc = subprocess.Popen(cmd, cwd=_REPO, stdout=subprocess.PIPE,
                            stderr=sys.stderr, text=True,
                            start_new_session=True)
    events = []
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    buf = ""
    try:
        while True:
            left = deadline - time.time()
            if left <= 0:
                print("bench: wall budget exhausted, stopping worker",
                      file=sys.stderr)
                break
            if not sel.select(timeout=min(left, 5.0)):
                if proc.poll() is not None:
                    break
                continue
            chunk = proc.stdout.read1(65536) if hasattr(
                proc.stdout, "read1") else proc.stdout.readline()
            if not chunk:
                break
            buf += chunk
            while "\n" in buf:
                line, buf = buf.split("\n", 1)
                line = line.strip()
                if not line:
                    continue
                try:
                    d = json.loads(line)
                    if isinstance(d, dict) and "event" in d:
                        events.append(d)
                except ValueError:
                    continue
    finally:
        sel.close()
        if proc.poll() is None:
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            except (OSError, ProcessLookupError):
                pass
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            pass
    return events


def main() -> None:
    t_start = time.time()
    k_pkgs = int(os.environ.get("BENCH_K", "25"))       # 0.5 s per dispatch
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "8"))
    # TOTAL wall budget for the whole bench (compile + run, all points).
    wall_s = int(os.environ.get("BENCH_WALL", "540"))
    stages = os.environ.get("BENCH_STAGES", "1") != "0"
    if os.environ.get("BENCH_BATCH"):
        ladder = [int(b) for b in os.environ["BENCH_BATCH"].split(",")]
    else:
        # headline batch first; then the batches that REUSE its
        # shard-width executable (4096/8192 dispatch as 2048-wide
        # shards, so they are compile-free once 2048 is built), and
        # only then 1024, whose monolithic program is a fresh
        # multi-minute compile — in round 4 it sat before 8192 and ate
        # the wall budget, which is why BENCH_r04 recorded
        # {"batch": 8192, "error": "budget"}
        ladder = [2048, 4096, 8192, 1024]

    deadline = t_start + wall_s
    events = _run_streaming(ladder, k_pkgs, n_chunks, deadline, stages)

    points = [e for e in events if e.get("event") == "point"]
    ladder_out = [{k: v for k, v in e.items() if k != "event"}
                  for e in points]
    # points the worker never reached before the kill
    seen = {e.get("batch") for e in points}
    for b in ladder:
        if b not in seen:
            ladder_out.append({"batch": b, "error": "budget"})
    ok = [d for d in ladder_out if "streams" in d]
    stages_ms = {}
    for e in events:
        if e.get("event") == "stages":
            stages_ms = e.get("stages_ms", {})
    backend = next((e["backend"] for e in events
                    if e.get("event") == "backend"), "unknown")

    if ok:
        best = max(ok, key=lambda d: d["streams"])
        streams = best["streams"]
        flops_per_s = (_pallas_flops_per_pkg_per_stream() * 50.0 *
                       streams)
        mfu = flops_per_s / _PEAK_F32
        result = {
            "metric": _METRIC,
            "value": best["streams"],
            "unit": "streams",
            "vs_baseline": round(best["streams"] / 4096.0, 4),
            "batch": best["batch"],
            "backend": backend,
            "ladder": ladder_out,
            "mfu_f32": round(mfu, 5),
            "pallas_tflops": round(flops_per_s / 1e12, 3),
            "stages_chunk_ms": stages_ms,
            "wall_s": round(time.time() - t_start, 1),
        }
        # last-good is the degraded-fallback record for future runs:
        # only real-chip results qualify (a CPU smoke run must not
        # shadow the production number)
        if backend == "tpu" and not os.environ.get("BENCH_PLATFORM"):
            try:
                with open(_LASTGOOD, "w") as f:
                    json.dump(result, f)
            except OSError:
                pass
    else:
        # degraded: report last-known-good if available, else zero
        result = {"metric": _METRIC, "value": 0.0, "unit": "streams",
                  "vs_baseline": 0.0}
        try:
            with open(_LASTGOOD) as f:
                result = json.load(f)
        except (OSError, ValueError):
            pass
        result["degraded"] = True

    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker([int(b) for b in sys.argv[2].split(",")],
                int(sys.argv[3]), int(sys.argv[4]), sys.argv[5] == "1",
                float(sys.argv[6]))
    else:
        main()

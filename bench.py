"""Headline benchmark: concurrent real-time 16 kHz NS+AEC+AGC+VAD streams
per chip (the BASELINE.json north star; the C reference runs ONE such
chain and already strains a Raspberry Pi 4B at 16 kHz, README.md:143-151).

Runs the batched record chain (wmix_tpu/engine/chain.py) in its
production shape — chunked lax.scan execution, one dispatch per K
packages — and reports how many streams fit in real time:
streams = B * (audio_seconds / wall_seconds).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "streams", "vs_baseline": N/4096}

Hardened against a wedged TPU plugin (round-1 BENCH_r01.json recorded
nothing because the plugin's import-time connection loop hangs forever
when the TPU service is down): every measurement attempt runs in a
SUBPROCESS with a hard timeout, the attempt ladder is bounded, and on
total failure the parent still prints a JSON line — the last-known-good
value from bench_lastgood.json if present (marked "degraded": true),
else a zero-value degraded record.  The parent process never imports
jax.
"""
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
_LASTGOOD = os.path.join(_REPO, "bench_lastgood.json")
_METRIC = "concurrent_16k_ns_aec_agc_vad_streams_per_chip"


# ----------------------------------------------------------------- worker

def _worker(batch: int, k_pkgs: int, n_chunks: int) -> None:
    """Runs inside the subprocess; prints one JSON line on success."""
    import numpy as np
    import jax
    # persist compiled executables across bench runs: the pallas AEC
    # kernel costs minutes to compile and the shapes repeat per round
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    from wmix_tpu.engine.chain import RecordChain

    freq = 16000
    pkg = freq // 1000 * 20
    chain = RecordChain(batch, freq)
    rng = np.random.RandomState(0)

    # advance the host planner past the AEC startup phase (3 packages of
    # passthrough) WITHOUT running device steps: startup device work is
    # irrelevant to steady-state throughput, and skipping it avoids three
    # expensive one-off per-package compiles at large batch
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
    print(json.dumps({
        "metric": _METRIC,
        "value": round(float(streams), 1),
        "unit": "streams",
        "vs_baseline": round(float(streams) / 4096.0, 4),
        "batch": batch,
        "backend": jax.default_backend(),
    }))


# ----------------------------------------------------------------- parent

def _try_attempt(batch: int, k_pkgs: int, n_chunks: int,
                 timeout_s: int) -> dict | None:
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           str(batch), str(k_pkgs), str(n_chunks)]
    try:
        proc = subprocess.run(cmd, cwd=_REPO, timeout=timeout_s,
                              capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"bench attempt B={batch} timed out after {timeout_s}s",
              file=sys.stderr)
        return None
    if proc.stderr:
        sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        print(f"bench attempt B={batch} rc={proc.returncode}",
              file=sys.stderr)
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if isinstance(d, dict) and d.get("metric") == _METRIC:
                return d
        except ValueError:
            continue
    print(f"bench attempt B={batch} produced no JSON line",
          file=sys.stderr)
    return None


def main() -> None:
    k_pkgs = int(os.environ.get("BENCH_K", "25"))       # 0.5 s per dispatch
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "8"))
    # the pallas AEC kernel takes ~5 min to compile cold (cached in
    # .jax_cache afterwards); the timeout must cover compile + run
    timeout_s = int(os.environ.get("BENCH_TIMEOUT", "900"))
    if os.environ.get("BENCH_BATCH"):
        ladder = [int(os.environ["BENCH_BATCH"])]
    else:
        ladder = [2048, 1024, 4096]

    result = None
    for batch in ladder:
        result = _try_attempt(batch, k_pkgs, n_chunks, timeout_s)
        if result is not None:
            break

    if result is not None:
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
        _worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()

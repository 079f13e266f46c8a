"""Real-time-mode evidence (VERDICT r2 missing #5): per-tick dispatch
latency of the multi-stream engine vs the daemon's 20 ms heartbeat
(src/wmixConf.h:112, src/wmix.c:1336-1345).

Runs StreamServer.tick() — one 20 ms package across B admitted streams
per device dispatch — at production batch sizes on the real chip and
records p50/p95/max tick latency plus overrun counts vs the 20 ms
budget.  Client feeds happen outside the timed region (they run in
client threads in production; the pump thread owns only the device
step).  Writes REALTIME_r0N.json.

Usage: python realtime_bench.py [--round N] [--batches 256,1024]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def bench_ticks(batch: int, n_ticks: int, warmup: int) -> dict:
    import jax
    try:
        from wmix_tpu.engine.aec_pallas import _ensure_compile_cache
        _ensure_compile_cache()
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    from wmix_tpu.service.stream_server import StreamServer
    from wmix_tpu.utils.trace import StepTimer

    freq = 16000
    pkg = freq // 1000 * 20
    srv = StreamServer(batch, freq)
    handles = [srv.open_stream() for _ in range(batch)]
    rng = np.random.RandomState(0)
    mics = (rng.randn(8, batch, pkg) * 3000).astype(np.int16)
    plays = (rng.randn(8, batch, pkg) * 5000).astype(np.int16)

    def feed_all(i):
        m, p = mics[i % 8], plays[i % 8]
        for b, h in enumerate(handles):
            srv.feed(h, m[b], p[b])

    t0 = time.time()
    for i in range(warmup):
        feed_all(i)
        srv.tick()
    warm_s = time.time() - t0

    timer = StepTimer(budget_ms=20.0)
    feed_ms = []
    for i in range(n_ticks):
        tf = time.perf_counter()
        feed_all(i)
        feed_ms.append((time.perf_counter() - tf) * 1e3)
        with timer.step():
            srv.tick()
    out = timer.summary()
    out["batch"] = batch
    out["warmup_ticks"] = warmup
    out["warmup_s"] = round(warm_s, 1)
    fs = sorted(feed_ms)
    out["feed_p50_ms"] = round(fs[len(fs) // 2], 3)
    out["feed_p95_ms"] = round(fs[int(len(fs) * 0.95)], 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--batches", default="256,1024")
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=12)
    args = ap.parse_args()

    import jax
    out = os.path.join(_REPO, f"REALTIME_r{args.round:02d}.json")
    points = []
    result = {
        "metric": "stream_server_tick_latency_vs_20ms_budget",
        "backend": jax.default_backend(),
        "freq": 16000,
        "points": points,
    }

    def save() -> None:
        # stream the artifact point by point so a wall-clock kill keeps
        # completed batches (the round-3 parity lesson)
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=1)
        os.replace(tmp, out)

    for b in (int(x) for x in args.batches.split(",")):
        print(f"[realtime] batch {b}...", file=sys.stderr)
        points.append(bench_ticks(b, args.ticks, args.warmup))
        save()
    print(json.dumps({"points": [
        {k: p[k] for k in ("batch", "p50_ms", "p95_ms", "max_ms",
                           "overruns")} for p in points],
        "out": out}))


if __name__ == "__main__":
    main()

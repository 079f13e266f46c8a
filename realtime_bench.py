"""Real-time-mode evidence (VERDICT r2 missing #5, r4 next #3): per-tick
pump cost of the multi-stream engine vs the daemon's 20 ms heartbeat
(src/wmixConf.h:112, src/wmix.c:1336-1345), plus end-to-end output
latency.

The serving shape measured is StreamServer.tick_pipelined(): the pump
issues one 20 ms package of work per heartbeat (gather + async device
dispatch + async device->host copy + drain of completed ticks) and
delivers outputs `depth` ticks later.  What the 20 ms budget governs is
the PUMP work — the reference daemon likewise runs behind its DMA ring
and 400 ms AEC far-end FIFO (platform/alsa/plat.h:19), so a bounded,
recorded output latency is the honest realtime metric, not a blocking
device round trip per tick (which on a tunneled TPU costs ~200 ms
regardless of batch, REALTIME diag r5).

The pump is PACED: each tick waits for its 20 ms boundary, then does
its work; an overrun = pump work exceeding the 20 ms slot.  Output
latency = feed(tick j) -> read_batch(tick j) wall time, measured per
delivered tick.

Usage: python realtime_bench.py --round N [--batches 256,1024,4096]
       [--ticks 300] [--depth 12]
Writes REALTIME_r0N.json.
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

TICK_S = 0.02


def bench_ticks(batch: int, n_ticks: int, warmup: int,
                depth: int, drain: str = "thread") -> dict:
    import jax
    try:
        from wmix_tpu.engine.aec_pallas import _ensure_compile_cache
        _ensure_compile_cache()
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    from wmix_tpu.service.stream_server import StreamServer

    freq = 16000
    pkg = freq // 1000 * 20
    srv = StreamServer(batch, freq)
    if drain == "thread":
        srv.start_drain_thread()
    handles = [srv.open_stream() for _ in range(batch)]
    rng = np.random.RandomState(0)
    mics = (rng.randn(8, batch, pkg) * 3000).astype(np.int16)
    plays = (rng.randn(8, batch, pkg) * 5000).astype(np.int16)

    t0 = time.time()
    for i in range(warmup):
        srv.feed_batch(handles, mics[i % 8], plays[i % 8])
        srv.tick_pipelined(depth)
    srv.flush_pipeline()
    while srv.read_batch(handles) is not None:
        pass
    warm_s = time.time() - t0

    pump_ms, out_lat_ms = [], []
    feed_t = []          # feed wall time per issued tick
    delivered = 0
    overruns = 0
    next_t = time.perf_counter() + TICK_S
    for i in range(n_ticks):
        # paced heartbeat: wait for the tick boundary
        now = time.perf_counter()
        if now < next_t:
            time.sleep(next_t - now)
        next_t += TICK_S

        feed_t.append(time.perf_counter())
        srv.feed_batch(handles, mics[i % 8], plays[i % 8])
        t1 = time.perf_counter()
        srv.tick_pipelined(depth)
        got = srv.read_batch(handles)
        t2 = time.perf_counter()
        work = (t2 - feed_t[-1]) * 1e3
        pump_ms.append(work)
        if work > TICK_S * 1e3:
            overruns += 1
        if got is not None:
            out_lat_ms.append((t2 - feed_t[delivered]) * 1e3)
            delivered += 1
    # drain the tail so every issued tick is accounted for
    srv.flush_pipeline()
    while delivered < n_ticks:
        got = srv.read_batch(handles)
        if got is None:
            break
        out_lat_ms.append((time.perf_counter() -
                           feed_t[delivered]) * 1e3)
        delivered += 1

    def pct(v, q):
        s = sorted(v)
        return round(s[min(len(s) - 1, int(len(s) * q))], 3)

    return {
        "batch": batch,
        "depth": depth,
        "n": n_ticks,
        "budget_ms": TICK_S * 1e3,
        "pump_p50_ms": pct(pump_ms, 0.5),
        "pump_p95_ms": pct(pump_ms, 0.95),
        "pump_max_ms": round(max(pump_ms), 3),
        "overruns": overruns,
        "delivered": delivered,
        "output_latency_p50_ms": pct(out_lat_ms, 0.5) if out_lat_ms
        else None,
        "output_latency_p95_ms": pct(out_lat_ms, 0.95) if out_lat_ms
        else None,
        "output_latency_max_ms": round(max(out_lat_ms), 3)
        if out_lat_ms else None,
        "warmup_ticks": warmup,
        "warmup_s": round(warm_s, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--batches", default="256,1024,4096")
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=30)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--drain", default="thread",
                    choices=("thread", "inline"))
    args = ap.parse_args()

    import jax
    out = os.path.join(_REPO, f"REALTIME_r{args.round:02d}.json")
    points = []
    result = {
        "metric": "stream_server_pump_latency_vs_20ms_budget",
        "mode": "tick_pipelined",
        "drain": args.drain,
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
        points.append(bench_ticks(b, args.ticks, args.warmup,
                                  args.depth, args.drain))
        save()
    print(json.dumps({"points": [
        {k: p[k] for k in ("batch", "pump_p50_ms", "pump_p95_ms",
                           "pump_max_ms", "overruns",
                           "output_latency_p50_ms")} for p in points],
        "out": out}))


if __name__ == "__main__":
    main()

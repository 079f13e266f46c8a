"""Batched play/mix engine bench (MIX_r0N.json): concurrent mixed play
streams per chip through the device mix bus (engine/mixbus.py).

The reference's corresponding hot loop is `wmix_load_data` +
`wmix_play_thread` (src/wmix.c:1639-1957, 1304-1516): one engine, a
handful of play tasks, 20 ms packages.  Here: B engines x S sources per
tick mix into [B, R, chn] HBM rings in S device dispatches, then one
drain dispatch pulls the tick's package per engine.

streams = B * S * audio_seconds / wall_seconds (real-time capacity).

Usage: python mix_bench.py [--round N] [--batches 256,1024]
       [--sources 4] [--ticks 100] [--platform cpu]
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


def bench(batch: int, sources: int, n_ticks: int, warmup: int = 4,
          depth: int = 8) -> dict:
    from collections import deque

    from wmix_tpu.config import EngineConfig
    from wmix_tpu.engine.mixbus import MixBus

    cfg = EngineConfig(chn=1, freq=16000)
    bus = MixBus(batch, cfg)
    rng = np.random.RandomState(0)

    # pre-build per-source package contributions (host conversion is
    # data-independent per geometry; the bench measures the DEVICE bus).
    # Dense [S, B, T, chn] waves = the per-tick shape of a full
    # deployment: every engine's j-th source grouped into wave j.
    pkg = cfg.frame_num
    waves = rng.randint(-8000, 8000,
                        (sources, batch, pkg, cfg.chn)).astype(np.int16)
    lens = np.full((sources, batch), pkg, np.int32)
    rdces = np.broadcast_to(1 + (np.arange(batch, dtype=np.int32) % 3),
                            (sources, batch))

    heads = np.zeros(batch, np.int64)
    pending: deque = deque()

    def tick(i):
        # one fused mix dispatch + one drain dispatch per tick; the
        # drain's device->host copy completes while later ticks run
        # (the realtime pump pattern) instead of blocking each tick on
        # a tunnel round trip
        base = (i * pkg) % cfg.ring_frames
        hf = np.broadcast_to((heads + base) % cfg.ring_frames,
                             (sources, batch))
        bus.mix_waves(hf, waves, lens, rdces)
        pending.append(bus.drain_async(1))
        if len(pending) > depth:
            return np.asarray(pending.popleft())
        return None

    for i in range(warmup):
        tick(i)
    while pending:
        np.asarray(pending.popleft())

    t0 = time.perf_counter()
    for i in range(n_ticks):
        tick(warmup + i)
    while pending:
        np.asarray(pending.popleft())
    dt = time.perf_counter() - t0

    audio_s = n_ticks * 0.02
    return {
        "batch": batch,
        "depth": depth,
        "sources": sources,
        "ticks": n_ticks,
        "wall_s": round(dt, 3),
        "tick_ms": round(dt / n_ticks * 1e3, 3),
        "mixed_streams": round(batch * sources * audio_s / dt, 1),
        "engines_realtime": round(batch * audio_s / dt, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--batches", default="256,1024")
    ap.add_argument("--sources", type=int, default=4)
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    points = []
    for b in (int(x) for x in args.batches.split(",")):
        print(f"[mix] batch {b}...", file=sys.stderr)
        points.append(bench(b, args.sources, args.ticks,
                            depth=args.depth))
    result = {
        "metric": "mixed_play_streams_per_chip",
        "backend": jax.default_backend(),
        "points": points,
    }
    out = os.path.join(_REPO, f"MIX_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"points": points, "out": out}))


if __name__ == "__main__":
    main()

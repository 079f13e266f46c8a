"""Headline benchmark: concurrent real-time 16 kHz NS+AEC+AGC+VAD streams
per chip (the BASELINE.json north star; the C reference runs ONE such
chain and already strains a Raspberry Pi 4B at 16 kHz, README.md:143-151).

Runs the batched record chain (wmix_tpu/engine/chain.py) in its
production shape — chunked lax.scan execution, one dispatch per K
packages — on the default JAX device and reports how many streams fit in
real time: streams = B * (audio_seconds / wall_seconds).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "streams", "vs_baseline": N/4096}
"""
import json
import os
import sys
import time

import numpy as np


def _bench(batch: int, k_pkgs: int, n_chunks: int):
    import jax
    from wmix_tpu.engine.chain import RecordChain

    freq = 16000
    pkg = freq // 1000 * 20
    chain = RecordChain(batch, freq)
    rng = np.random.RandomState(0)

    # warm through the AEC startup phase (3 packages, separate signature)
    for _ in range(3):
        mic = (rng.randn(batch, pkg) * 3000).astype(np.int16)
        play = (rng.randn(batch, pkg) * 5000).astype(np.int16)
        chain.step(mic, play)

    mic_c = (rng.randn(k_pkgs, batch, pkg) * 3000).astype(np.int16)
    play_c = (rng.randn(k_pkgs, batch, pkg) * 5000).astype(np.int16)

    # compile + first run (not timed)
    o, p8, v = chain.run_chunk(mic_c, play_c)
    jax.block_until_ready(o)

    t0 = time.perf_counter()
    for _ in range(n_chunks):
        o, p8, v = chain.run_chunk(mic_c, play_c)
    jax.block_until_ready(o)
    dt = time.perf_counter() - t0

    audio_s = n_chunks * k_pkgs * 0.02
    return batch * audio_s / dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    k_pkgs = int(os.environ.get("BENCH_K", "25"))       # 0.5 s per dispatch
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "4"))
    try:
        streams = _bench(batch, k_pkgs, n_chunks)
    except Exception as e:  # OOM etc: retry at quarter batch
        print(f"bench retry at smaller batch after: {e!r}", file=sys.stderr)
        batch //= 4
        streams = _bench(batch, k_pkgs, n_chunks)
    result = {
        "metric": "concurrent_16k_ns_aec_agc_vad_streams_per_chip",
        "value": round(float(streams), 1),
        "unit": "streams",
        "vs_baseline": round(float(streams) / 4096.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

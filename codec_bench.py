"""Codec throughput benchmark (VERDICT r2 next-round #2): N concurrent
MP3 play-task decodes per chip, with the transform math (polyphase
synthesis) device-resident and batched (codecs/mp3_batch.py).

Two numbers, honestly separated:
  * mp3_synth_streams_per_chip — the DEVICE side alone: batched dct32 +
    windowing MACs + mad_scale over B streams, real-time streams =
    B * audio_s / wall_s.  This is the array math SURVEY §7 step 5 puts
    on the TPU.
  * mp3_e2e_streams — end-to-end Mp3BatchDecoder: per-stream host
    bitstream front-end (sync/huffman/requantize/IMDCT, Python) + one
    batched device synth per frame tick.  Host parsing dominates — the
    reference's own libmad front-end is also serial C per stream; the
    honest per-process capacity is recorded as measured.

Writes CODEC_r0N.json and prints one JSON line.
Usage: python codec_bench.py [--round N] [--quick]
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
FIXTURE = "/root/reference/audio/2x44100.mp3"


def bench_synth(batch: int, n_frames: int) -> dict:
    """Device-side batched synthesis throughput."""
    import jax
    try:
        from wmix_tpu.engine.aec_pallas import _ensure_compile_cache
        _ensure_compile_cache()
    except Exception:
        pass
    from wmix_tpu.codecs.mp3_batch import BatchedSynth
    rng = np.random.RandomState(0)
    ns, nch, sr = 36, 2, 44100
    sb = rng.randint(-(1 << 28), 1 << 28,
                     size=(batch, 2, ns, 32)).astype(np.int32)
    synth = BatchedSynth(batch)
    out = synth.frame(sb, nch, ns)   # compile
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_frames):
        out = synth.frame(sb, nch, ns)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    audio_s = n_frames * (32 * ns) / sr
    return {
        "batch": batch,
        "frames": n_frames,
        "wall_s": round(dt, 3),
        "streams": round(batch * audio_s / dt, 1),
    }


def bench_e2e(batch: int, n_frames: int) -> dict:
    """End-to-end: host front-ends + device synth."""
    from wmix_tpu.codecs.mp3_batch import Mp3BatchDecoder
    with open(FIXTURE, "rb") as f:
        data = f.read()
    dec = Mp3BatchDecoder(batch)
    for b in range(batch):
        dec.start(b, data)
    pcm, _ = dec.tick()      # compile + warm
    sr = 44100
    t0 = time.perf_counter()
    done_frames = 0
    for _ in range(n_frames):
        pcm, done = dec.tick()
        if pcm is None:
            break
        done_frames += 1
    dt = time.perf_counter() - t0
    audio_s = done_frames * (pcm.shape[-1] / 2 if pcm is not None
                             else 1152) / sr
    audio_s = done_frames * 1152 / sr
    return {
        "batch": batch,
        "frames": done_frames,
        "wall_s": round(dt, 3),
        "streams": round(batch * audio_s / dt, 1),
    }


AAC_FIXTURE = "/root/reference/audio/2x44100.aac"


def bench_aac_fb(batch: int, n_frames: int) -> dict:
    """Device-side batched AAC inverse filterbank throughput
    (codecs/aac_batch.py): ONLY_LONG frames, B channel slots."""
    import jax
    from wmix_tpu.codecs.aac_batch import BatchedFilterbank
    rng = np.random.RandomState(0)
    fb = BatchedFilterbank(batch)
    spec = jnp_spec = None
    import jax.numpy as jnp
    jnp_spec = jnp.asarray((rng.randn(batch, 1024) * 50)
                           .astype(np.float32))
    idx = np.arange(batch, dtype=np.int32)
    fb.frame_stacked(idx, 0, 0, jnp_spec)     # compile
    jax.block_until_ready(fb.overlap)
    t0 = time.perf_counter()
    for _ in range(n_frames):
        out = fb.frame_stacked(idx, 0, 0, jnp_spec)
    jax.block_until_ready(fb.overlap)
    dt = time.perf_counter() - t0
    sr = 44100
    audio_s = n_frames * 1024 / sr
    return {
        "batch": batch,
        "frames": n_frames,
        "wall_s": round(dt, 3),
        "streams": round(batch * audio_s / dt, 1),
    }


def bench_aac_e2e(batch: int, n_frames: int) -> dict:
    """End-to-end AacBatchDecoder: host front-ends + device filterbank."""
    from wmix_tpu.codecs.aac_batch import AacBatchDecoder
    with open(AAC_FIXTURE, "rb") as f:
        data = f.read()
    dec = AacBatchDecoder(batch)
    for b in range(batch):
        dec.start(b, data)
    dec.tick()                   # compile + warm
    sr = 44100
    t0 = time.perf_counter()
    done_frames = 0
    for _ in range(n_frames):
        pcms, _done = dec.tick()
        if not pcms:
            break
        done_frames += 1
    dt = time.perf_counter() - t0
    audio_s = done_frames * 1024 / sr
    return {
        "batch": batch,
        "frames": done_frames,
        "wall_s": round(dt, 3),
        "streams": round(batch * audio_s / dt, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        synth_b, synth_f, e2e_b, e2e_f = 64, 40, 4, 40
    else:
        synth_b, synth_f, e2e_b, e2e_f = 512, 80, 8, 120

    import jax
    result = {
        "metric": "concurrent_codec_decode_streams_per_chip",
        "backend": jax.default_backend(),
        "mp3": {
            "synth_device": bench_synth(synth_b, synth_f),
            "e2e_host_plus_device": bench_e2e(e2e_b, e2e_f),
        },
        "aac": {
            "filterbank_device": bench_aac_fb(synth_b, synth_f),
            "e2e_host_plus_device": bench_aac_e2e(e2e_b, e2e_f),
        },
        "note": ("*_device = the batched TPU transform math alone "
                 "(MP3 polyphase synthesis / AAC IMDCT+filterbank); "
                 "e2e = one python host front-end process feeding it "
                 "(bitstream parsing is host work by design, SURVEY "
                 "§7.5)"),
    }
    out = os.path.join(_REPO, f"CODEC_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({
        "mp3_synth_streams": result["mp3"]["synth_device"]["streams"],
        "mp3_e2e_streams":
            result["mp3"]["e2e_host_plus_device"]["streams"],
        "aac_fb_streams": result["aac"]["filterbank_device"]["streams"],
        "aac_e2e_streams":
            result["aac"]["e2e_host_plus_device"]["streams"],
        "out": out}))


if __name__ == "__main__":
    main()

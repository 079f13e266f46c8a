"""Codec throughput benchmark (VERDICT r2 next-round #2): N concurrent
MP3 play-task decodes per chip, with the transform math (polyphase
synthesis) device-resident and batched (codecs/mp3_batch.py).

Two numbers, honestly separated:
  * mp3_synth_streams_per_chip — the DEVICE side alone: batched dct32 +
    windowing MACs + mad_scale over B streams, real-time streams =
    B * audio_s / wall_s.  This is the array math SURVEY §7 step 5 puts
    on the TPU.
  * mp3_e2e_streams — end-to-end Mp3BatchDecoder: per-stream host
    bitstream front-ends (native C, codecs/mp3fe.py ~1100x realtime per
    core; AAC via codecs/aacfe.py ~200x) + one batched device transform
    per frame tick.

Writes CODEC_r0N.json and prints one JSON line.
Usage: python codec_bench.py [--round N] [--quick] [--platform cpu]
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
    for _ in range(8):       # compile + warm
        pcm, _ = dec.tick()
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
    # warm enough ticks to compile every (window sequence, shape, prev)
    # filterbank variant the stream mixes (LONG_START/SHORT/STOP blocks
    # appear within the first seconds of the fixture)
    for _ in range(30):
        dec.tick()
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
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.quick:
        synth_b, synth_f, e2e_b, e2e_f = 64, 40, 16, 40
    else:
        # e2e batch 128: the native front-ends moved the host feed from
        # 0.16x to 200-1100x realtime/core, so the e2e measurement can
        # exercise a production-sized batch
        synth_b, synth_f, e2e_b, e2e_f = 512, 80, 128, 120

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
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
                 "e2e = the native C bitstream front-ends feeding it "
                 "from one core (host parsing is host work by design, "
                 "SURVEY §7.5)"),
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

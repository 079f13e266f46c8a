"""The mix bus: bit-exact rebuild of wmix_load_data (src/wmix.c:1639-1957).

The reference mixes each playing stream into a 1-second ring buffer with a
saturating int16 add, converting sample-rate/channels on the fly with a
float32 "div-step" pacer and a linear-interpolation "repair" buffer for
inserted frames.  Here that becomes:

  1. `build_contrib` (host, numpy): turn a source buffer into the exact
     sequence of engine frames the reference would emit — using the cached
     stepper patterns (data-independent) plus vectorized interpolation
     arithmetic that reproduces the C float32/int16 rounding bit-for-bit.
  2. `device_mix` (JAX): saturating scatter-add of those frames into the
     HBM-resident ring at (head + t) mod R — the only part that runs per
     device step, and the part that batches across streams/engines.

`load_data_host` wires both together with the reference's head-placement and
tick bookkeeping so parity tests can drive it exactly like the C function.

Quirks reproduced: background streams are attenuated with a *truncating*
integer divide by reduceMode (src/wmix.c:1685); the divide applies to repair
frames at emission, not at interpolation time (src/wmix.c:1823,1881);
volumeAdd's zero shortcuts are equivalent to a plain saturating add
(src/wmix.c:1617-1636); non-16-bit sources mix nothing because the 8/32-bit
switch arms are empty (src/wmix.c:1713-1718,1790-1795,1806-1811,1931-1937).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wmix_tpu.config import EngineConfig
from wmix_tpu.ops import stepper

I16_MIN, I16_MAX = -32768, 32767


# --------------------------------------------------------------------------
# host side: exact contribution stream
# --------------------------------------------------------------------------

def _trunc_div(v: np.ndarray, d: int) -> np.ndarray:
    """C integer division (truncate toward zero) on int32."""
    v = v.astype(np.int64)
    return np.where(v < 0, -((-v) // d), v // d)


def _copy_frames(src: np.ndarray, idx: np.ndarray, src_chn: int,
                 eng_chn: int) -> np.ndarray:
    """Channel-map gathered source frames [n, src_chn] -> [n, eng_chn].

    wmix_load_data writes the left sample to every engine channel for mono
    sources, and left/right (or left only) for stereo sources
    (src/wmix.c:1736-1745,1770-1779,1839-1848,1897-1905)."""
    g = src[idx]
    if src_chn == 1:
        return np.repeat(g, eng_chn, axis=1)
    return g[:, :eng_chn]


def build_contrib(cfg: EngineConfig, src: bytes | np.ndarray, freq: int,
                  chn: int, sample: int = 16) -> np.ndarray:
    """The exact engine frames wmix_load_data would emit for this source.

    Returns int16 [T, cfg.chn] — raw values, before the reduce divide."""
    raw = np.frombuffer(bytes(src), np.uint8) if isinstance(
        src, (bytes, bytearray)) else np.asarray(src, np.uint8)
    src_len = raw.size
    if src_len < 1:
        return np.zeros((0, cfg.chn), np.int16)
    if sample != 16:
        # the 8-bit / 32-bit switch arms are empty in the reference
        if freq == cfg.freq and chn == cfg.chn and sample == cfg.sample:
            pass  # unreachable: cfg.sample is always 16
        return np.zeros((0, cfg.chn), np.int16)

    frame_bytes = 2 * chn
    n_frames = -(-src_len // frame_bytes)
    # pad so the repair interpolation's read past the final sample is 0,
    # matching the padded oracle harness
    pcm = np.zeros((n_frames + 1) * chn, np.int16)
    usable = src_len // 2
    pcm[:usable] = raw[:usable * 2].view(np.int16)
    frames = pcm.reshape(n_frames + 1, chn)

    if freq == cfg.freq and chn == cfg.chn:
        # fast path: straight copy (src/wmix.c:1678-1702).  NB it walks in
        # engine-channel strides regardless of src length parity.
        out_samples = -(-src_len // 2)
        vals = np.zeros(((out_samples + cfg.chn - 1) // cfg.chn) * cfg.chn,
                        np.int16)
        vals[:usable] = pcm[:usable]
        return vals.reshape(-1, cfg.chn)

    if freq > cfg.freq:
        # skip direction: drop source frames (src/wmix.c:1707-1797)
        kept = stepper.load_skip_pattern(freq, cfg.freq, n_frames)
        return np.ascontiguousarray(
            _copy_frames(frames, kept, chn, cfg.chn), np.int16)

    # insert direction: interpolated repair frames (src/wmix.c:1799-1939)
    kind, si, k, dc2 = stepper.load_insert_pattern(freq, cfg.freq, n_frames)
    out = np.zeros((kind.size, cfg.chn), np.int16)
    is_copy = kind == stepper._COPY
    out[is_copy] = _copy_frames(frames, si[is_copy], chn, cfg.chn)

    ins = np.nonzero(~is_copy)[0]
    if ins.size:
        i = si[ins]
        kk = k[ins]
        d2 = dc2[ins]
        prev = frames[i - 1, 0].astype(np.int32)
        nxt = frames[i, 0].astype(np.int32)
        step = ((nxt - prev).astype(np.float32) /
                d2.astype(np.float32)).astype(np.float32)
        # repairStepSum accumulates one step per slot (src/wmix.c:1859-1864);
        # replicate the sequential float32 adds up to each slot's k
        acc = step.copy()
        val = np.where(kk == 0, acc, np.float32(0))
        for j in range(1, int(kk.max()) + 1 if kk.size else 1):
            acc = (acc + step).astype(np.float32)
            val = np.where(kk == j, acc, val)
        rep = (prev.astype(np.float32) + val).astype(np.int16)  # C trunc
        out[ins] = rep[:, None]
    return out


# --------------------------------------------------------------------------
# device side: saturating scatter-mix into the ring
# --------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=(0,))
def device_mix(ring: jax.Array, head_frame: jax.Array, contrib: jax.Array,
               rdce: jax.Array) -> jax.Array:
    """Saturating add of contrib [T, chn] into ring [R, chn] at
    (head_frame + t) mod R, with the truncating reduce divide.

    T must be <= R (the host chunks longer loads, as the daemon's pacing
    does naturally)."""
    T = contrib.shape[0]
    R = ring.shape[0]
    pos = (head_frame + jnp.arange(T, dtype=jnp.int32)) % R
    c = contrib.astype(jnp.int32)
    q = jnp.where(c < 0, -((-c) // rdce), c // rdce)
    cur = ring[pos].astype(jnp.int32)
    mixed = jnp.clip(cur + q, I16_MIN, I16_MAX).astype(jnp.int16)
    return ring.at[pos].set(mixed)


# --------------------------------------------------------------------------
# the full wmix_load_data contract (host orchestration, device mixing)
# --------------------------------------------------------------------------

def load_data(cfg: EngineConfig, ring: np.ndarray, head_off: int,
              wmix_head_off: int, wmix_tick: int, reduce_mode: int,
              src, freq: int, chn: int, sample: int = 16, reduce: int = 0,
              tick: int = 0, use_device: bool = False):
    """Bit-exact wmix_load_data against a numpy int16 ring [R, chn].

    Returns (new_head_off_bytes, new_tick).  Mutates `ring` in place.
    With use_device=True the saturating mix runs through the jitted
    device kernel (identical semantics)."""
    raw = bytes(src) if isinstance(src, (bytes, bytearray)) else \
        np.asarray(src, np.uint8).tobytes()
    if len(raw) < 1:
        return head_off, tick

    frame_size = cfg.frame_size
    buff_size = cfg.buff_size

    # head placement (src/wmix.c:1666-1673)
    if head_off < 0 or tick < wmix_tick:
        head_off = wmix_head_off + cfg.play_correct
        tick = wmix_tick + cfg.play_correct
        if head_off >= buff_size:
            head_off = 0

    rdce = 1 if reduce == reduce_mode else reduce_mode
    contrib = build_contrib(cfg, raw, freq, chn, sample)
    tick_add = contrib.size * 2  # bytes written

    if contrib.size:
        head_frame = head_off // frame_size
        R = cfg.ring_frames
        if use_device:
            dring = jnp.asarray(ring)
            for s in range(0, contrib.shape[0], R):
                blk = contrib[s:s + R]
                dring = device_mix(dring, jnp.int32((head_frame + s) % R),
                                   jnp.asarray(blk), jnp.int32(rdce))
            ring[...] = np.asarray(dring)
        else:
            for s in range(0, contrib.shape[0], R):
                blk = contrib[s:s + R]
                pos = (head_frame + s + np.arange(blk.shape[0])) % R
                q = _trunc_div(blk, rdce)
                ring[pos] = np.clip(ring[pos].astype(np.int64) + q,
                                    I16_MIN, I16_MAX).astype(np.int16)
        head_off = ((head_frame + contrib.shape[0]) % R) * frame_size

    # final tick bookkeeping (src/wmix.c:1942-1955)
    if tick < wmix_tick:
        head_off = wmix_head_off + tick_add
        tick_add += wmix_tick
        if head_off >= buff_size:
            head_off -= buff_size
    else:
        tick_add += tick
    return head_off, tick_add

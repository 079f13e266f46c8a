"""Batched play/mix engine: a [B_engines, R, chn] HBM-resident mix bus.

The reference's mixer hot loop #3 (`wmix_load_data`, src/wmix.c:1639-1957)
mixes each playing stream into a 1-second int16 ring with a saturating
add and a truncating background-attenuation divide, and the play thread
(`wmix_play_thread`, src/wmix.c:1304-1516) drains up to 4 packages per
20 ms tick, zeroing the drained region.  This module batches BOTH over
B concurrent engines as single device dispatches:

  * ``mix``: one source-wave across all engines — saturating scatter-add
    of [B, T, chn] contributions at per-engine cursors, with per-engine
    reduce divides and a per-engine valid length (engines with no source
    this wave ride along with len 0).  An engine serving k sources runs
    k waves; the host groups the j-th source of every engine into wave j.
  * ``drain``: the play heartbeat — copy + zero K packages per engine at
    the per-engine play cursor (``wmix->head``), advance the cursor and
    the tick counter.

Contribution frames come from ``ops.mixer.build_contrib`` (the bit-exact
rate/channel conversion of the C mixer); this module is the ring
arithmetic, bit-parity-gated against the single-engine host mixer at
B > 1 (tests/test_mixbus.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wmix_tpu.config import EngineConfig

I16 = jnp.int16
I32 = jnp.int32
I16_MIN, I16_MAX = -32768, 32767


def _mix_wave(ring, heads, contrib, lens, rdce):
    """ring [B,R,chn] i16; heads [B] i32 (frame cursor); contrib
    [B,T,chn] i16; lens [B] i32 (valid frames); rdce [B] i32."""
    B, R, chn = ring.shape
    T = contrib.shape[1]

    def one(ring_b, head_b, c_b, len_b, r_b):
        pos = (head_b + jnp.arange(T, dtype=I32)) % R
        c = c_b.astype(I32)
        # truncating background-attenuation divide (src/wmix.c:1685)
        q = jnp.where(c < 0, -((-c) // r_b), c // r_b)
        cur = ring_b[pos].astype(I32)
        mixed = jnp.clip(cur + q, I16_MIN, I16_MAX).astype(I16)
        valid = (jnp.arange(T, dtype=I32) < len_b)[:, None]
        mixed = jnp.where(valid, mixed, cur.astype(I16))
        return ring_b.at[pos].set(mixed)

    return jax.vmap(one)(ring, heads, contrib, lens, rdce)


_mix_kernel = partial(jax.jit, donate_argnums=(0,))(_mix_wave)


@partial(jax.jit, donate_argnums=(0,))
def _mix_many_kernel(ring, heads, contribs, lens, rdces):
    """S source-waves in ONE dispatch: contribs [S,B,T,chn], the rest
    [S,B].  lax.scan preserves the per-wave sequential saturating
    semantics (each wave saturates against the ring state the previous
    wave left, src/wmix.c:1683-1691) while paying one launch instead of
    S — the tunneled-TPU dispatch overhead is what bounds MIX_r05's
    per-tick latency, not the arithmetic."""
    def step(r, inputs):
        h, c, ln, rd = inputs
        return _mix_wave(r, h, c, ln, rd), None

    ring, _ = jax.lax.scan(step, ring, (heads, contribs, lens, rdces))
    return ring


@partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _drain_kernel(ring, tails, n_frames: int):
    """Copy + zero n_frames per engine at the play cursor.  Returns
    (ring, pcm [B, n_frames, chn])."""
    B, R, chn = ring.shape

    def one(ring_b, tail_b):
        pos = (tail_b + jnp.arange(n_frames, dtype=I32)) % R
        out = ring_b[pos]
        return ring_b.at[pos].set(jnp.zeros_like(out)), out

    return jax.vmap(one)(ring, tails)


@jax.jit
def _any_kernel(ring):
    """Per-engine 'ring has data' flags (the playRun arbitration input,
    src/wmix.c:1229-1280)."""
    return jnp.any(ring != 0, axis=(1, 2))


class MixBus:
    """B concurrent engines' mix rings + play cursors on device.

    Host-mirrored state: the play cursor (``wmix->head``) and tick per
    engine; per-task writer cursors live with the tasks, exactly as the
    reference keeps them in each task thread's locals."""

    def __init__(self, batch: int, cfg: EngineConfig = EngineConfig()):
        self.batch = batch
        self.cfg = cfg
        self.R = cfg.ring_frames
        self.ring = jnp.zeros((batch, self.R, cfg.chn), I16)
        self.head_off = np.zeros(batch, np.int64)   # play cursor, bytes
        self.tick = np.zeros(batch, np.int64)       # bytes played

    # ------------------------------------------------------------- mix

    def mix(self, slots, head_frames, contribs, rdces) -> np.ndarray:
        """One source-wave: contribs[i] (int16 [T_i, chn]) mixes into
        engine slots[i] at frame cursor head_frames[i] with reduce
        divisor rdces[i].  Returns the new per-source frame cursors.

        Contributions longer than the ring are chunked exactly like the
        host mixer (ops/mixer.py load_data)."""
        slots = np.asarray(slots, np.int32)
        head_frames = np.asarray(head_frames, np.int64).copy()
        rdces = np.asarray(rdces, np.int32)
        R = self.R
        remaining = [np.asarray(c, np.int16).reshape(-1, self.cfg.chn)
                     for c in contribs]
        offs = np.zeros(len(remaining), np.int64)
        while True:
            lens = np.array([min(c.shape[0] - o, R)
                             for c, o in zip(remaining, offs)], np.int32)
            if not (lens > 0).any():
                break
            T = int(lens.max())
            wave = np.zeros((self.batch, T, self.cfg.chn), np.int16)
            heads = np.zeros(self.batch, np.int32)
            wlens = np.zeros(self.batch, np.int32)
            wrd = np.ones(self.batch, np.int32)
            for i, s in enumerate(slots):
                if lens[i] <= 0:
                    continue
                o = offs[i]
                wave[s, :lens[i]] = remaining[i][o:o + lens[i]]
                heads[s] = (head_frames[i] + o) % R
                wlens[s] = lens[i]
                wrd[s] = rdces[i]
            self.ring = _mix_kernel(self.ring, jnp.asarray(heads),
                                    jnp.asarray(wave), jnp.asarray(wlens),
                                    jnp.asarray(wrd))
            offs += np.maximum(lens, 0)
        return (head_frames + offs) % R

    def mix_waves(self, head_frames: np.ndarray, waves: np.ndarray,
                  lens: np.ndarray, rdces: np.ndarray) -> None:
        """Dense fast lane: S source-waves for ALL engines in ONE
        device dispatch (the per-tick shape of a full deployment — every
        engine's j-th source grouped into wave j, engines without one
        riding along with len 0).

        head_frames/lens/rdces: [S, B] int32; waves: [S, B, T, chn]
        int16 with T <= ring frames.  Wave order is the mix order (the
        saturating add sequence per engine)."""
        waves = np.asarray(waves, np.int16)
        assert waves.shape[2] <= self.R
        self.ring = _mix_many_kernel(
            self.ring,
            jnp.asarray(np.asarray(head_frames, np.int32) % self.R),
            jnp.asarray(waves),
            jnp.asarray(lens, np.int32),
            jnp.asarray(rdces, np.int32))

    # ----------------------------------------------------------- drain

    def drain_async(self, n_pkgs: int = 1):
        """The play heartbeat without the device round trip: dispatches
        the copy+zero and STARTS the device->host copy, returning the
        device array — np.asarray() it a few ticks later (the realtime
        pump pattern, service/stream_server.py tick_pipelined)."""
        cfg = self.cfg
        n_frames = n_pkgs * cfg.frame_num
        tails = (self.head_off % cfg.buff_size) // cfg.frame_size
        self.ring, pcm = _drain_kernel(
            self.ring, jnp.asarray(tails.astype(np.int32)), n_frames)
        f0 = tails + n_frames
        self.head_off = (f0 % self.R) * cfg.frame_size
        self.tick = (self.tick + n_pkgs * cfg.pkg_size) & 0xFFFFFFFF
        copy = getattr(pcm, "copy_to_host_async", None)
        if copy is not None:
            copy()
        return pcm

    def drain(self, n_pkgs: int = 1) -> np.ndarray:
        """The play heartbeat: n_pkgs packages per engine, copied and
        zeroed at the play cursor; cursors/ticks advance.  Returns
        int16 [B, n_pkgs * frame_num, chn] (blocking form of
        drain_async)."""
        return np.asarray(self.drain_async(n_pkgs))

    def has_data(self) -> np.ndarray:
        """[B] bool — per-engine idle detection input."""
        return np.asarray(_any_kernel(self.ring))

    def reset_slots(self, slots) -> None:
        """Idle reset (src/wmix.c:1246-1259): zero the ring and rewind
        the cursors of the given engines."""
        idx = np.atleast_1d(np.asarray(slots, np.int32))
        self.ring = self.ring.at[idx].set(0)
        self.head_off[idx] = 0
        self.tick[idx] = 0


class TaskCursor:
    """Per play-task writer bookkeeping: the head-placement and tick
    rules of wmix_load_data (src/wmix.c:1666-1673,1942-1955), vectorized
    over nothing — one instance per (engine, task), as the reference
    keeps these in task-thread locals."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.head_off = -1
        self.tick = 0

    def place(self, engine_head_off: int, engine_tick: int) -> int:
        """Returns the frame cursor to write at; updates local state."""
        cfg = self.cfg
        if self.head_off < 0 or self.tick < engine_tick:
            self.head_off = engine_head_off + cfg.play_correct
            self.tick = engine_tick + cfg.play_correct
            if self.head_off >= cfg.buff_size:
                self.head_off = 0
        return self.head_off // cfg.frame_size

    def advance(self, new_head_frame: int, bytes_written: int,
                engine_head_off: int, engine_tick: int) -> None:
        cfg = self.cfg
        self.head_off = (new_head_frame * cfg.frame_size) % cfg.buff_size
        if self.tick < engine_tick:
            self.head_off = engine_head_off + bytes_written
            self.tick = bytes_written + engine_tick
            if self.head_off >= cfg.buff_size:
                self.head_off -= cfg.buff_size
        else:
            self.tick += bytes_written

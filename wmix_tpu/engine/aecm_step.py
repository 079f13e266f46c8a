"""Host planner + batched package step for the AECM backend
(``RecordChain(aec_backend="aecm")``, VERDICT r2 next-round #5).

The AECM wrapper (echo_control_mobile.c) and the core's frame/block
scheduling (aecm_core.c ProcessFrame) are CALL-PATTERN-deterministic in
the daemon: one package per 20 ms tick, reported delay 0.  As with the
float AEC (engine/aec_plan.py), the cursor state machine is therefore
shared across the whole stream batch: ``AecmPlanner`` advances it once
per package and emits a plan — a static signature (startup passthrough
flags, frame underruns, blocks per frame) plus traced offsets (ring
positions, far-history slots, startup counters, comfort-noise randoms).
``build_pkg_body`` compiles one batched program per signature; all
DATA-dependent control flow (VAD, delay candidates, Q domains) lives in
dsp/aecm_jnp.process_block, bit-exact vs the compiled C reference.

Ring model: the wrapper farendBuf (50 frames), the core far delay
buffer (256), the far/near block queues, and the output ring all become
device arrays indexed mod-capacity at host-planned absolute offsets —
MoveReadPtr stuffing (re-exposing previously read samples) falls out of
the representation for free.

Reference: echo_control_mobile.c:Process/BufferFarend, aecm_core.c
ProcessFrame/BufferFarFrame/FetchFarFrame; daemon wiring
src/webrtc.c:172-191 (aec_process2, AECM branch).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from wmix_tpu.dsp.aec import _rand_u_array
from wmix_tpu.dsp.aecm import (BUF_SIZE_FRAMES, FAR_BUF_LEN, FRAME_LEN,
                               K_SAMP_MS_NB, MAX_DELAY, PART_LEN)
from wmix_tpu.dsp import aecm_jnp
from wmix_tpu.engine.aec_plan import _AbsRing
from wmix_tpu.engine.aec_step import _ring_read, _ring_write

I32 = jnp.int32

WRAP_BUF = BUF_SIZE_FRAMES * FRAME_LEN    # 4000, wrapper farendBuf
QUEUE_BUF = 256                           # far/near block queues
OUT_BUF = FRAME_LEN + PART_LEN            # 144


class BlockPlan(NamedTuple):
    q_read: int
    out_write: int
    hist_pos: int
    tot_count: int
    noise_lt100: int
    rand: np.ndarray          # [64] int32


class FramePlan(NamedTuple):
    use_old: int              # underrun: reuse far_end_old[slot]
    slot: int                 # 0|1 within the process call
    far_read: int             # wrapper ring read pos (if not use_old)
    cfar_write: int           # core far_buf write pos
    cfar_read: int            # core far_buf read pos
    q_write: int              # queue write pos (far + near)
    near_off: int             # near offset within the package
    blocks: Tuple[BlockPlan, ...]
    out_read: int


class SubPlan(NamedTuple):
    far_write: int            # wrapper ring write pos
    far_off: int              # far offset within the package
    startup: bool
    frames: Tuple[FramePlan, ...]


class AecmPkgPlan(NamedTuple):
    subs: Tuple[SubPlan, ...]

    def signature(self):
        return tuple(
            (s.startup,
             tuple((f.use_old, f.slot, len(f.blocks))
                   for f in s.frames))
            for s in self.subs)


class AecmPlanner:
    """Counter mirror of AecMobile + AecmCore scheduling (dsp/aecm.py),
    one shared instance per stream batch."""

    def __init__(self, samp_freq: int):
        if samp_freq not in (8000, 16000):
            raise ValueError("AECM supports 8000/16000 only")
        self.freq = samp_freq
        self.mult = samp_freq // 8000
        # wrapper (echo_control_mobile.c)
        self.farend = _AbsRing(WRAP_BUF)
        self.ec_startup = 1
        self.check_buff_size = 1
        self.check_buf_size_ctr = 0
        self.counter = 0
        self.sum = 0
        self.first_val = 0
        self.buf_size_start = 0
        self.filt_delay = 0
        self.known_delay = 0
        self.last_delay_diff = 0
        self.time_for_delay_change = 0
        self.ms_in_snd_card_buf = 0
        # core (aecm_core.c)
        self.core_known_delay = 0      # core.known_delay
        self.last_known_delay = 0
        self.cfar_w = 0                # core far_buf write abs pos
        self.cfar_r = 0                # core far_buf read abs pos
        self.queue = _AbsRing(QUEUE_BUF)
        self.out_ring = _AbsRing(OUT_BUF)
        self.far_history_pos = MAX_DELAY
        self.tot_count = 0
        self.noise_est_ctr = 0
        self.seed = 666

    # -- wrapper -------------------------------------------------------

    def _delay_comp(self):
        n_samp_far = self.farend.available_read()
        n_samp_snd = self.ms_in_snd_card_buf * K_SAMP_MS_NB * self.mult
        delay_new = n_samp_snd - n_samp_far
        if delay_new > FAR_BUF_LEN - FRAME_LEN * self.mult:
            n_add = max((n_samp_snd >> 1) - n_samp_far, FRAME_LEN)
            n_add = min(n_add, 10 * FRAME_LEN)
            self.farend.move_read(-n_add)

    def _est_buf_delay(self):
        n_samp_far = self.farend.available_read()
        n_samp_snd = self.ms_in_snd_card_buf * K_SAMP_MS_NB * self.mult
        delay_new = n_samp_snd - n_samp_far
        if delay_new < FRAME_LEN:
            self.farend.move_read(FRAME_LEN)
            delay_new += FRAME_LEN
        t = 8 * self.filt_delay + 2 * delay_new
        t = -((-t) // 10) if t < 0 else t // 10
        self.filt_delay = max(0, ((t + 0x8000) & 0xFFFF) - 0x8000)
        diff = self.filt_delay - self.known_delay
        if diff > 224:
            if self.last_delay_diff < 96:
                self.time_for_delay_change = 0
            else:
                self.time_for_delay_change += 1
        elif diff < 96 and self.known_delay > 0:
            if self.last_delay_diff > 224:
                self.time_for_delay_change = 0
            else:
                self.time_for_delay_change += 1
        else:
            self.time_for_delay_change = 0
        self.last_delay_diff = diff
        if self.time_for_delay_change > 25:
            self.known_delay = max(int(self.filt_delay) - 160, 0)
            self.core_known_delay = self.known_delay

    # -- core ----------------------------------------------------------

    def _plan_frame(self, slot: int, near_off: int) -> FramePlan:
        # fetch wrapper far frame (or reuse far_end_old on underrun)
        n_filled = self.farend.available_read() // FRAME_LEN
        if n_filled > 0:
            far_read, got = self.farend.read(FRAME_LEN)
            assert got == FRAME_LEN
            use_old = 0
        else:
            far_read, use_old = 0, 1

        if (slot == 0 and self.freq == 8000) or \
                (slot == 1 and self.freq == 16000):
            self._est_buf_delay()

        # core.buffer_far_frame + fetch_far_frame
        cfar_write = self.cfar_w
        self.cfar_w += FRAME_LEN
        delay_change = self.core_known_delay - self.last_known_delay
        self.cfar_r -= delay_change
        self.last_known_delay = self.core_known_delay
        cfar_read = self.cfar_r
        self.cfar_r += FRAME_LEN

        q_write, wrote = self.queue.write(FRAME_LEN)
        assert wrote == FRAME_LEN

        blocks = []
        while self.queue.available_read() >= PART_LEN:
            q_read, got = self.queue.read(PART_LEN)
            assert got == PART_LEN
            out_write, w = self.out_ring.write(PART_LEN)
            assert w == PART_LEN
            self.far_history_pos += 1
            if self.far_history_pos >= MAX_DELAY:
                self.far_history_pos = 0
            rand, seed2 = _rand_u_array(self.seed, PART_LEN)
            blocks.append(BlockPlan(
                q_read, out_write, self.far_history_pos,
                self.tot_count, int(self.noise_est_ctr < 100),
                np.asarray(rand, np.int32)))
            self.seed = seed2
            self.tot_count += 1
            if self.noise_est_ctr < 100:
                self.noise_est_ctr += 1

        avail = self.out_ring.available_read()
        if avail < FRAME_LEN:
            self.out_ring.move_read(avail - FRAME_LEN)
        out_read, got = self.out_ring.read(FRAME_LEN)
        assert got == FRAME_LEN
        return FramePlan(use_old, slot, far_read, cfar_write, cfar_read,
                         q_write, near_off, tuple(blocks), out_read)

    # -- one daemon package (aec_process2, AECM branch) ---------------

    def plan_pkg(self) -> AecmPkgPlan:
        freq = self.freq
        interval = 20 if freq <= 8000 else 10
        sub_len = freq // 1000 * interval       # samples per process call
        pkg_len = freq // 1000 * 20
        subs = []
        for off in range(0, pkg_len, sub_len):
            # BufferFarend
            if not self.ec_startup:
                self._delay_comp()
            far_write, wrote = self.farend.write(sub_len)
            # (overflow drops samples; the daemon pacing never hits it)

            # Process
            self.ms_in_snd_card_buf = 10        # clamp(0)+10
            n_frames = sub_len // FRAME_LEN
            n_blocks_10ms = n_frames // self.mult
            if self.ec_startup:
                n_filled = self.farend.available_read() // FRAME_LEN
                if self.check_buff_size:
                    self.check_buf_size_ctr += 1
                    if self.counter == 0:
                        self.first_val = self.ms_in_snd_card_buf
                        self.sum = 0
                    if abs(self.first_val - self.ms_in_snd_card_buf) < \
                            max(0.2 * self.ms_in_snd_card_buf,
                                K_SAMP_MS_NB):
                        self.sum += self.ms_in_snd_card_buf
                        self.counter += 1
                    else:
                        self.counter = 0
                    if self.counter * n_blocks_10ms >= 6:
                        self.buf_size_start = min(
                            (3 * self.sum * self.mult) //
                            (self.counter * 40), BUF_SIZE_FRAMES)
                        self.check_buff_size = 0
                    if self.check_buf_size_ctr * n_blocks_10ms > 50:
                        self.buf_size_start = min(
                            (3 * self.ms_in_snd_card_buf * self.mult)
                            // 40, BUF_SIZE_FRAMES)
                        self.check_buff_size = 0
                if not self.check_buff_size:
                    if n_filled == self.buf_size_start:
                        self.ec_startup = 0
                    elif n_filled > self.buf_size_start:
                        self.farend.move_read(
                            self.farend.available_read() -
                            self.buf_size_start * FRAME_LEN)
                        self.ec_startup = 0
                subs.append(SubPlan(far_write, off, True, ()))
            else:
                frames = tuple(
                    self._plan_frame(i, off + i * FRAME_LEN)
                    for i in range(n_frames))
                subs.append(SubPlan(far_write, off, False, frames))
        return AecmPkgPlan(tuple(subs))


def pack_dyn(plan: AecmPkgPlan) -> dict:
    """Traced per-package scalars, stacked per plan site."""
    frames = [f for s in plan.subs for f in s.frames]
    blocks = [b for f in frames for b in f.blocks]
    d = {
        "far_writes": np.asarray([s.far_write for s in plan.subs],
                                 np.int32),
        "f_far_read": np.asarray([f.far_read for f in frames], np.int32),
        "f_cfar_w": np.asarray([f.cfar_write for f in frames], np.int32),
        "f_cfar_r": np.asarray([f.cfar_read for f in frames], np.int32),
        "f_q_w": np.asarray([f.q_write for f in frames], np.int32),
        "f_out_r": np.asarray([f.out_read for f in frames], np.int32),
        "b_q_r": np.asarray([b.q_read for b in blocks], np.int32),
        "b_out_w": np.asarray([b.out_write for b in blocks], np.int32),
        "b_hist": np.asarray([b.hist_pos for b in blocks], np.int32),
        "b_tot": np.asarray([b.tot_count for b in blocks], np.int32),
        "b_noise": np.asarray([b.noise_lt100 for b in blocks], np.int32),
        "b_rand": (np.stack([b.rand for b in blocks])
                   if blocks else np.zeros((0, PART_LEN), np.int32)),
    }
    return d


class AecmEngState(NamedTuple):
    """Device state for the batched AECM backend."""
    core: dict               # aecm_jnp.make_init_state leaves
    farend: jax.Array        # [B, 4000] wrapper ring, int32
    far_old: jax.Array       # [B, 2, 80] farendOld
    cfar: jax.Array          # [B, 256] core far delay buffer
    qfar: jax.Array          # [B, 256]
    qnear: jax.Array         # [B, 256]
    outr: jax.Array          # [B, 144]


def init_eng_state(batch: int, freq: int) -> AecmEngState:
    z = lambda *s: jnp.zeros((batch,) + s, I32)
    return AecmEngState(
        core=aecm_jnp.make_init_state(batch, freq),
        farend=z(WRAP_BUF), far_old=z(2, FRAME_LEN), cfar=z(FAR_BUF_LEN),
        qfar=z(QUEUE_BUF), qnear=z(QUEUE_BUF), outr=z(OUT_BUF))


def build_pkg_body(signature, sub_len: int, mult: int):
    """Untraced builder: fn(AecmEngState, far_pkg [B,n] i32,
    near_pkg [B,n] i32, dyn) -> (state, out [B,n] i32)."""

    def fn(st: AecmEngState, far_pkg, near_pkg, dyn):
        outs = []
        fi = 0   # frame index across subs
        bi = 0   # block index across subs
        farend, far_old, cfar = st.farend, st.far_old, st.cfar
        qfar, qnear, outr = st.qfar, st.qnear, st.outr
        core = st.core
        for si, (startup, frame_sigs) in enumerate(signature):
            far_sub = far_pkg[:, si * sub_len:(si + 1) * sub_len]
            near_sub = near_pkg[:, si * sub_len:(si + 1) * sub_len]
            farend = _ring_write(farend, dyn["far_writes"][si], far_sub)
            if startup:
                outs.append(near_sub)
                continue
            sub_out = []
            for (use_old, slot, n_blocks) in frame_sigs:
                near80 = near_sub[:, slot * FRAME_LEN:
                                  (slot + 1) * FRAME_LEN]
                if use_old:
                    far80 = far_old[:, slot]
                else:
                    far80 = _ring_read(farend, dyn["f_far_read"][fi],
                                       FRAME_LEN)
                    far_old = far_old.at[:, slot].set(far80)
                cfar = _ring_write(cfar, dyn["f_cfar_w"][fi], far80)
                far_frame = _ring_read(cfar, dyn["f_cfar_r"][fi],
                                       FRAME_LEN)
                qfar = _ring_write(qfar, dyn["f_q_w"][fi], far_frame)
                qnear = _ring_write(qnear, dyn["f_q_w"][fi], near80)
                for _ in range(n_blocks):
                    far64 = _ring_read(qfar, dyn["b_q_r"][bi], PART_LEN)
                    near64 = _ring_read(qnear, dyn["b_q_r"][bi],
                                        PART_LEN)
                    core, out64 = aecm_jnp.process_block(
                        core, far64, near64, dyn["b_rand"][bi],
                        dyn["b_hist"][bi], dyn["b_tot"][bi],
                        dyn["b_noise"][bi] != 0, mult)
                    outr = _ring_write(outr, dyn["b_out_w"][bi], out64)
                    bi += 1
                sub_out.append(_ring_read(outr, dyn["f_out_r"][fi],
                                          FRAME_LEN))
                fi += 1
            outs.append(jnp.concatenate(sub_out, axis=1))
        out = jnp.concatenate(outs, axis=1)
        return AecmEngState(core, farend, far_old, cfar, qfar, qnear,
                            outr), out

    return fn


@functools.lru_cache(maxsize=16)
def build_pkg_fn(signature, sub_len: int, mult: int):
    return jax.jit(build_pkg_body(signature, sub_len, mult),
                   donate_argnums=(0,))


class AecmBatch:
    """Batched AECM processor: B concurrent streams of the daemon's
    aec_process2 (AECM branch) — the engine-servable counterpart of
    dsp/aecm.AecmProcessor (mono; the wrapper's left-channel-only
    behavior makes chn>1 a host-side reshape)."""

    def __init__(self, batch: int, freq: int):
        self.batch = batch
        self.freq = freq
        self.planner = AecmPlanner(freq)
        self.interval = 20 if freq <= 8000 else 10
        self.sub_len = freq // 1000 * self.interval
        self.state = init_eng_state(batch, freq)

    def step(self, far_pkg, near_pkg):
        """One 20 ms package: far/near [B, pkg] int-valued."""
        plan = self.planner.plan_pkg()
        sig = plan.signature()
        dyn = {k: jnp.asarray(v) for k, v in pack_dyn(plan).items()}
        fn = build_pkg_fn(sig, self.sub_len, self.planner.mult)
        self.state, out = fn(self.state,
                             jnp.asarray(far_pkg, I32),
                             jnp.asarray(near_pkg, I32), dyn)
        return out

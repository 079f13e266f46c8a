"""Device-side batched AEC package step.

Replays an ``AecPlanner`` plan as one traced program over a batch of
stream slots.  All ring storage lives in HBM as flat per-stream arrays;
positions arrive as traced scalars (mod-reduced on the host), so one
compiled program per static plan signature serves every package in that
phase of the cursor cycle.

The per-block math is exactly `wmix_tpu.dsp.aec.process_block_kernel`
(bit-exact vs aec_core.c) vmapped over the batch; the gate flags ride as
traced scalars shared by every stream.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wmix_tpu.dsp.aec import (
    AecDev,
    FRAME_LEN,
    PART_LEN,
    PART_LEN1,
    PART_LEN2,
    init_dev,
    process_block_kernel,
    time_to_frequency_pair,
)
from wmix_tpu.engine.aec_plan import (
    FAR_PRE_BUF_SIZE,
    NEAR_FR_SIZE,
    AecPlanner,
    PkgPlan,
)

F32 = jnp.float32
I32 = jnp.int32

DEFAULT_PART_CAP = 64   # device far-partition slots (see AecBatch._check)


class AecEngState(NamedTuple):
    dev: AecDev           # batched leaves [B, ...]
    far_parts: jax.Array  # [B, part_cap, 130]  plain far spectra
    farw_parts: jax.Array  # [B, part_cap, 130] windowed far spectra
    far_pre: jax.Array    # [B, FAR_PRE_BUF_SIZE] time-domain far
    near_fr: jax.Array    # [B, NEAR_FR_SIZE]
    out_fr: jax.Array     # [B, NEAR_FR_SIZE]


def init_eng_state(batch: int, part_cap: int = DEFAULT_PART_CAP
                   ) -> AecEngState:
    dev1 = init_dev()
    dev = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), dev1)
    z = lambda *shape: jnp.zeros(shape, F32)
    return AecEngState(
        dev=dev,
        far_parts=z(batch, part_cap, 2 * PART_LEN1),
        farw_parts=z(batch, part_cap, 2 * PART_LEN1),
        far_pre=z(batch, FAR_PRE_BUF_SIZE),
        near_fr=z(batch, NEAR_FR_SIZE),
        out_fr=z(batch, NEAR_FR_SIZE),
    )


def _ring_idx(start, n, cap):
    return (start + jnp.arange(n, dtype=I32)) % cap


def _ring_read(buf, start, n):
    """buf[:, (start+t) % cap] via a dynamic roll: the gather form
    lowers to a serialized TPU gather per call."""
    return jnp.roll(buf, -start, axis=1)[:, :n]


def _ring_write(buf, start, data):
    """Masked-select ring write at (start+t) % cap — value-identical to
    the traced-index scatter, without the scatter."""
    B, cap = buf.shape
    L = data.shape[1]
    if L == cap:
        return jnp.roll(data, start, axis=1)
    padded = jnp.concatenate(
        [data, jnp.zeros((B, cap - L), data.dtype)], axis=1)
    shifted = jnp.roll(padded, start, axis=1)
    mask = jnp.roll(jnp.concatenate(
        [jnp.ones((1, L), jnp.bool_),
         jnp.zeros((1, cap - L), jnp.bool_)], axis=1), start, axis=1)
    return jnp.where(mask, shifted, buf)


def build_pkg_body(signature, sub_len: int, mult: int, nlp_mode: int,
                   traced_upd: bool = False):
    """Untraced builder: returns
    fn(state, far_pkg[B,n] f32, near_pkg[B,n] f32, dyn) -> (state, out),
    for composition into larger traced programs (the full record chain).

    traced_upd: take update_delay_idx from dyn (blk_flags[:,2]) instead of
    the static signature — the chunked path uses this so one compiled
    program covers every phase of the delay-estimation counter cycle (the
    partition-energy fold then runs every block and is masked by a
    where; the static variant DCEs it in 19 of 20 blocks but multiplies
    compiled variants, which dominates at chunk scale)."""

    def vblock(dev, xf, xfw, near, rand, pos, f0, f1, upd):
        return jax.vmap(
            lambda d, a, b, c:
            process_block_kernel(d, a, b, c, rand, pos, mult, nlp_mode,
                                 f0, f1, upd),
            in_axes=(0, 0, 0, 0))(dev, xf, xfw, near)
    vttf = jax.vmap(time_to_frequency_pair)

    def fn(st: AecEngState, far_pkg, near_pkg, dyn):
        ei = fi = bi = 0
        outs = []
        for si, (n_extr, startup, blk_counts) in enumerate(signature):
            farsub = far_pkg[:, si * sub_len:(si + 1) * sub_len]
            nearsub = near_pkg[:, si * sub_len:(si + 1) * sub_len]

            # BufferFarend: far_pre write + partition extractions
            st = st._replace(
                far_pre=_ring_write(st.far_pre, dyn["pre_writes"][si],
                                    farsub))
            for _ in range(n_extr):
                seg = _ring_read(st.far_pre, dyn["extr_pre"][ei], PART_LEN2)
                xf, xfw = vttf(seg)
                slot = dyn["extr_slots"][ei]
                st = st._replace(
                    far_parts=jax.lax.dynamic_update_slice_in_dim(
                        st.far_parts, xf[:, None], slot, axis=1),
                    farw_parts=jax.lax.dynamic_update_slice_in_dim(
                        st.farw_parts, xfw[:, None], slot, axis=1))
                ei += 1

            if startup:
                outs.append(nearsub)
                continue

            sub_out = []
            for fj, blocks_sig in enumerate(blk_counts):
                st = st._replace(near_fr=_ring_write(
                    st.near_fr, dyn["frame_near"][fi],
                    nearsub[:, fj * FRAME_LEN:(fj + 1) * FRAME_LEN]))
                for _nb, upd_static in blocks_sig:
                    xf = st.far_parts[:, dyn["blk_far"][bi]]
                    xfw = st.farw_parts[:, dyn["blk_far"][bi]]
                    near64 = _ring_read(st.near_fr, dyn["blk_near"][bi],
                                        PART_LEN)
                    upd = (dyn["blk_flags"][bi, 2] != 0) if traced_upd \
                        else bool(upd_static)
                    dev, out64 = vblock(
                        st.dev, xf, xfw, near64, dyn["blk_rand"][bi],
                        dyn["blk_xf"][bi],
                        dyn["blk_flags"][bi, 0] != 0,
                        dyn["blk_flags"][bi, 1] != 0,
                        upd)
                    st = st._replace(
                        dev=dev,
                        out_fr=_ring_write(st.out_fr, dyn["blk_out"][bi],
                                           out64))
                    bi += 1
                sub_out.append(_ring_read(st.out_fr, dyn["frame_out"][fi],
                                          FRAME_LEN))
                fi += 1
            outs.append(jnp.concatenate(sub_out, axis=1))
        return st, jnp.concatenate(outs, axis=1)

    return fn


def build_pkg_fn(signature, sub_len: int, mult: int, nlp_mode: int):
    """Jitted variant of build_pkg_body (standalone batched AEC)."""
    from wmix_tpu.dsp import floatops
    return _build_pkg_fn_cached(signature, sub_len, mult, nlp_mode,
                                floatops.fast_mode())


@functools.lru_cache(maxsize=None)
def _build_pkg_fn_cached(signature, sub_len: int, mult: int, nlp_mode: int,
                         fast: bool):
    return jax.jit(build_pkg_body(signature, sub_len, mult, nlp_mode))


def pack_dyn(plan: PkgPlan, part_cap: int):
    """Plan -> dict of mod-reduced numpy arrays (traced inputs)."""
    pre_writes, extr_pre, extr_slots = [], [], []
    frame_near, frame_out = [], []
    blk_far, blk_near, blk_out, blk_xf, blk_flags, blk_rand = \
        [], [], [], [], [], []
    for s in plan.subs:
        pre_writes.append(s.pre_write % FAR_PRE_BUF_SIZE)
        for pre_read, slot in s.extractions:
            extr_pre.append(pre_read % FAR_PRE_BUF_SIZE)
            extr_slots.append(slot % part_cap)
        for f in s.frames:
            frame_near.append(f.near_write % NEAR_FR_SIZE)
            frame_out.append(f.out_read % NEAR_FR_SIZE)
            for b in f.blocks:
                blk_far.append(b.far_slot % part_cap)
                blk_near.append(b.near_start % NEAR_FR_SIZE)
                blk_out.append(b.out_start % NEAR_FR_SIZE)
                blk_xf.append(b.xf_pos)
                blk_flags.append((b.noise_sel_init, b.noise_gate_open,
                                  b.update_delay_idx))
                blk_rand.append(b.rand)
    a = lambda x: np.asarray(x, np.int32)
    return {
        "pre_writes": a(pre_writes),
        "extr_pre": a(extr_pre),
        "extr_slots": a(extr_slots),
        "frame_near": a(frame_near),
        "frame_out": a(frame_out),
        "blk_far": a(blk_far),
        "blk_near": a(blk_near),
        "blk_out": a(blk_out),
        "blk_xf": a(blk_xf),
        "blk_flags": a(blk_flags).reshape(-1, 3),
        "blk_rand": (np.stack(blk_rand).astype(np.int32)
                     if blk_rand else np.zeros((0, PART_LEN), np.int32)),
    }


class AecBatch:
    """Batched AEC over B stream slots: planner + device state + jit cache.

    Mirrors the daemon handle semantics of `dsp.aec.AecProcessor` for a
    whole batch at once (mono chain; the daemon extracts the left channel
    before the AEC and duplicates after, which the caller handles)."""

    def __init__(self, batch: int, freq: int,
                 part_cap: int = DEFAULT_PART_CAP):
        assert freq <= 16000 and freq % 8000 == 0
        self.batch = batch
        self.freq = freq
        self.part_cap = part_cap
        interval = 20 if freq <= 8000 else 10
        self.sub_len = freq // 1000 * interval
        self.pkg_len = freq // 1000 * 20
        self.planner = AecPlanner(freq)
        self.state = init_eng_state(batch, part_cap)

    def _check(self, plan: PkgPlan):
        # Device far-partition storage is smaller than the C ring (250):
        # valid while the live window (written but still reachable via
        # rewinds of at most mult+1 slots) fits in part_cap.
        w = self.planner.far_buf.w
        r = self.planner.far_buf.r
        assert w - (r - (self.planner.mult + 2)) <= self.part_cap, \
            "far partition window exceeded device capacity; raise part_cap"

    def step(self, far_pkg, near_pkg):
        """One 20 ms package for the whole batch.

        far_pkg/near_pkg: [B, pkg_len] float32 (int16-valued).
        Returns [B, pkg_len] float32 AEC output (pre int16 cast)."""
        plan = self.planner.plan_pkg()
        self._check(plan)
        fn = build_pkg_fn(plan.signature(), self.sub_len,
                          self.planner.mult, self.planner.nlp_mode)
        dyn = pack_dyn(plan, self.part_cap)
        self.state, out = fn(self.state, far_pkg, near_pkg, dyn)
        return out


def cast_out_int16(out_f32: np.ndarray) -> np.ndarray:
    """(int16_t) cast of the float output: truncate toward zero, NaN -> 0
    (x86 cvttss2si semantics via the daemon's cast), wrap to int16."""
    with np.errstate(invalid="ignore"):
        res = np.where(np.isnan(out_f32), np.int64(0),
                       np.trunc(np.asarray(out_f32, np.float64))
                       .astype(np.int64))
    return (((res + 0x8000) & 0xFFFF) - 0x8000).astype(np.int16)

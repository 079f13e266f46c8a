"""Batched record-path chain: NS -> AEC -> AGC -> VAD -> shm outputs.

Re-expresses the daemon's per-package record heartbeat
(`wmix_shmem_write_circle`, src/wmix.c:528-872) as one jitted device
program over B stream slots:

  mic package --NS--> --AEC(far = play delayed ~400 ms)--> --AGC-->
  --VAD (progressive mute)--> origin package  +  1x8000 zoomed package

The AEC far-end comes from the playPkgBuff FIFO quirk
(src/wmix.c:487-526 + call order at :1461-1466): `playPkgBuff_add` runs
before the record chain each tick, and `playPkgBuff_get(400)` with the
22-slot FIFO returns the package from 21 ticks ago — except every 22nd
tick, when it returns the package added *this* tick.  The FIFO lives on
device as a [B, 22, pkg] ring; the slot index is host-mirrored.

Every DSP module is the bit-exact single-stream implementation vmapped
over the batch; chain order and the int16 casts between stages follow
the daemon source exactly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wmix_tpu.dsp import agc as agc_mod
from wmix_tpu.dsp import floatops
from wmix_tpu.dsp import ns as ns_mod
from wmix_tpu.dsp import vad as vad_mod
from wmix_tpu.engine import aec_step
from wmix_tpu.engine.aec_plan import AecPlanner
from wmix_tpu.ops import stepper

F32 = jnp.float32
I32 = jnp.int32

AEC_FIFO_PKG_NUM = 22     # AEC_INTERVALMS/20+2 (src/wmixConf.h:141)
AEC_INTERVALMS = 400      # platform/alsa/plat.h:19


class ChainState(NamedTuple):
    ns: object                 # NsState, leaves [B, ...]
    aec: aec_step.AecEngState
    agc: object                # AgcState
    vad: object                # VadState
    play_fifo: jax.Array       # [B, 22, pkg_len] f32 (int16-valued)


class RecordChain:
    """B concurrent streams of the daemon record chain (mono geometry).

    Enable flags mirror wmix->webrtcEnable[]; AGC gain mirrors
    wmix->volumeAgc (default 5, src/wmix.c:1596)."""

    def __init__(self, batch: int, freq: int, interval_ms: int = 20,
                 ns_enable: bool = True, aec_enable: bool = True,
                 agc_enable: bool = True, vad_enable: bool = True,
                 agc_gain_db: int = 5,
                 part_cap: int = aec_step.DEFAULT_PART_CAP,
                 aec_backend: str = "aec", chn: int = 1,
                 ns_backend: str = "ns",
                 aec_interval_ms: int = AEC_INTERVALMS):
        # the daemon's module rate guards (src/wmix.c:615-699): AEC only
        # to 16 kHz; NS/AGC/VAD to 32 kHz
        if freq > 16000:
            aec_enable = False
        assert freq % 8000 == 0 and freq <= 32000
        assert aec_backend in ("aec", "aecm")
        assert ns_backend in ("ns", "nsx")
        assert chn in (1, 2)
        self.batch = batch
        self.freq = freq
        self.chn = chn
        self.interval_ms = interval_ms
        # frames per package; interleaved package length is pkg_len*chn
        self.pkg_len = freq // 1000 * interval_ms
        self.flags = (ns_enable, aec_enable, agc_enable, vad_enable)
        self.agc_gain_db = agc_gain_db
        self.part_cap = part_cap
        self.aec_backend = aec_backend if aec_enable else "aec"
        self.ns_backend = ns_backend if ns_enable else "ns"
        # per-platform echo-path delay (alsa 400 ms; t31 0 — hardware
        # AEC, platform/t31/plat.h:14); FIFO depth per src/wmixConf.h:141
        self.aec_interval_ms = aec_interval_ms
        self.fifo_pkgs = aec_interval_ms // interval_ms + 2

        if not aec_enable:
            self.planner = None
        elif self.aec_backend == "aecm":
            from wmix_tpu.engine.aecm_step import AecmPlanner
            self.planner = AecmPlanner(freq)
        else:
            self.planner = AecPlanner(freq)
        self.sub_len = freq // 1000 * (20 if freq <= 8000 else 10)
        self.play_count = 0   # _playPkgBuff_count mirror
        self.tick = 0

        if self.aec_backend == "aecm" and aec_enable:
            from wmix_tpu.engine import aecm_step
            aec_init = aecm_step.init_eng_state(batch, freq)
        else:
            aec_init = aec_step.init_eng_state(batch, part_cap)
        bcast = lambda st: jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), st)
        if self.ns_backend == "nsx":
            from wmix_tpu.dsp import nsx_jnp
            ns_init0 = nsx_jnp.init_state(freq)
        else:
            ns_init0 = ns_mod.init_state(freq)
        self.state = ChainState(
            ns=bcast(ns_init0),
            aec=aec_init,
            agc=bcast(agc_mod.init_state()),
            vad=bcast(vad_mod.init_state()),
            play_fifo=jnp.zeros((batch, self.fifo_pkgs,
                                 self.pkg_len * chn), F32),
        )
        # zoom to the 1x8000 shared-memory ring: stateless per package
        # (wmix.c:846-848), fixed gather index per geometry.  For chn=2
        # the zoom takes the LEFT channel (wmix_pcm_zoom mode 0x21,
        # src/wmix.c:205-212): frame index -> interleaved offset.
        if freq != 8000 or chn != 1:
            frame_idx = np.asarray(
                stepper.zoom_src_index(freq, 8000, self.pkg_len),
                np.int64)
            self.zoom_idx = frame_idx * chn
        else:
            self.zoom_idx = None

        # per-chunk dispatch latency accounting (WMIX_TRACE_STEPS=1;
        # SURVEY §5 tracing row) — zero overhead when disabled
        from wmix_tpu.utils import trace as _trace
        self.step_timer = _trace.StepTimer() \
            if _trace.steps_enabled() else None

    def reset_slots(self, slots) -> None:
        """Reinitialize the DSP state of the given stream slots (stream
        admission/reaping — SURVEY §2.3 'async task scheduling': slot
        cancellation/reuse is a state reinit, replacing the reference's
        generation counters).  Host planner phase is batch-shared, so a
        reset slot joins at the CURRENT cursor phase with fresh adaptive
        state (see service/stream_server.py for the semantics)."""
        idx = jnp.asarray(np.asarray(slots, np.int32))
        from wmix_tpu.engine import aec_pallas
        if self.aec_backend == "aecm" and self.flags[1]:
            from wmix_tpu.engine import aecm_step
            aec_init = aecm_step.init_eng_state(1, self.freq)
        elif isinstance(self.state.aec, aec_pallas.PallasAecState):
            aec_init = aec_pallas.init_chain_aec(1, self.part_cap)
        else:
            aec_init = aec_step.init_eng_state(1, self.part_cap)
        if self.ns_backend == "nsx":
            from wmix_tpu.dsp import nsx_jnp
            ns_init1 = nsx_jnp.init_state(self.freq)
        else:
            ns_init1 = ns_mod.init_state(self.freq)
        init1 = ChainState(
            ns=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                ns_init1),
            aec=aec_init,
            agc=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                agc_mod.init_state()),
            vad=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                vad_mod.init_state()),
            play_fifo=jnp.zeros((1, self.fifo_pkgs,
                                 self.pkg_len * self.chn), F32),
        )
        self.state = jax.tree_util.tree_map(
            lambda s, i: s.at[idx].set(
                jnp.broadcast_to(i, (len(np.atleast_1d(slots)),)
                                 + i.shape[1:])),
            self.state, init1)

    def _build_fn(self, aec_sig, use_pallas=False):
        return _build_chain_fn(aec_sig, self.sub_len,
                               self.planner.mult if self.planner else 1,
                               getattr(self.planner, "nlp_mode", 2),
                               self.freq, self.flags, self.agc_gain_db,
                               None if self.zoom_idx is None
                               else tuple(self.zoom_idx.tolist()),
                               use_pallas=use_pallas,
                               aec_backend=self.aec_backend,
                               chn=self.chn,
                               ns_backend=self.ns_backend)

    def _pallas_on(self) -> bool:
        """Pallas AEC package kernel: production default on TPU fast
        mode at 16 kHz (WMIX_PALLAS=0/1 overrides); engages on steady
        plans only — startup runs the exact-layout jax path and the
        state converts once.  The AECM backend is exact-int and has no
        pallas path."""
        if not self.flags[1] or self.aec_backend != "aec":
            return False
        from wmix_tpu.engine import aec_pallas
        return aec_pallas.pallas_enabled(self.freq)

    def _ensure_aec_layout(self, want_pallas: bool, dyn0) -> None:
        from wmix_tpu.engine import aec_pallas
        aec = self.state.aec
        if want_pallas and isinstance(aec, aec_step.AecEngState):
            self.state = self.state._replace(
                aec=aec_pallas.convert_chain_aec(aec, dyn0))
        elif not want_pallas and \
                isinstance(aec, aec_pallas.PallasAecState):
            raise RuntimeError(
                "pallas AEC state cannot serve a non-steady plan; "
                "16 kHz plans stay steady after startup so this "
                "indicates planner state corruption")

    def step(self, mic_pkg: np.ndarray, play_pkg: np.ndarray):
        """One 20 ms tick.

        mic_pkg/play_pkg: [B, pkg_len] int16 (mic capture and the mixed
        output package written to the speaker this tick).
        Returns (origin_pkg int16 [B, pkg_len], pkg_8k int16 [B, n8k],
        vad_flags int32 [B])."""
        add_slot, get_slot, sig, dyn = self._plan_tick()
        up = False
        if self._pallas_on():
            from wmix_tpu.engine.aec_pallas import (is_steady_16k,
                                                    is_steady_dyn)
            up = is_steady_16k(sig) and is_steady_dyn(dyn)
            self._ensure_aec_layout(up, dyn)
        # the pallas body reads update_delay_idx from dyn, so normalize
        # the signature to share ONE compiled pallas program across the
        # 2 steady 16 kHz signatures differing only in that bit
        # (ADVICE r2: the program costs minutes to compile)
        fn = self._build_fn(_normalize_sig(sig) if up else sig,
                            use_pallas=up)
        self.state, origin, pkg8k, vflags = fn(
            self.state, jnp.asarray(mic_pkg, jnp.int16),
            jnp.asarray(play_pkg, jnp.int16),
            jnp.int32(add_slot), jnp.int32(get_slot), dyn)
        return origin, pkg8k, vflags

    def _plan_tick(self):
        """Host bookkeeping for one tick: FIFO slots + AEC plan."""
        n = self.fifo_pkgs
        add_slot = self.play_count
        self.play_count = (self.play_count + 1) % n
        c = self.play_count
        g = c - (self.aec_interval_ms // self.interval_ms)
        g = min(max(g, 0), n)
        g = c - g
        if g >= n:
            g -= n
        elif g < 0:
            g += n
        if self.planner is None:
            sig, dyn = (), {"_": np.zeros(0, np.int32)}
        elif self.aec_backend == "aecm":
            from wmix_tpu.engine import aecm_step
            plan = self.planner.plan_pkg()
            sig = plan.signature()
            dyn = aecm_step.pack_dyn(plan)
        else:
            plan = self.planner.plan_pkg()
            sig = plan.signature()
            dyn = aec_step.pack_dyn(plan, self.part_cap)
        self.tick += 1
        return add_slot, g, sig, dyn

    def run_chunk(self, mic_chunk: np.ndarray, play_chunk: np.ndarray):
        """K packages in one device dispatch (production shape).

        mic_chunk/play_chunk: [K, B, pkg_len] int16.  In steady state
        the plan-signature sequence is periodic (period 1 at 16 kHz once
        update_delay_idx is traced; period 2 at 8 kHz where the package
        structure genuinely alternates), so the chunk runs as ONE
        lax.scan over period-sized super-units — one compiled program
        and one dispatch per chunk regardless of phase.  Non-periodic
        stretches (the AEC startup) fall back to per-run grouping.
        Returns (origin [K, B, pkg_len] int16, pkg8k [K, B, n8k] int16,
        vad_flags [K, B] int32)."""
        if self.step_timer is not None:
            self.step_timer.budget_ms = \
                mic_chunk.shape[0] * self.interval_ms
            with self.step_timer.step():
                return self._run_chunk(mic_chunk, play_chunk)
        return self._run_chunk(mic_chunk, play_chunk)

    def _run_chunk(self, mic_chunk: np.ndarray, play_chunk: np.ndarray):
        K = mic_chunk.shape[0]
        plans = [self._plan_tick() for _ in range(K)]
        # AECM signatures carry no update_delay_idx; they are already
        # normal forms
        norm = (_normalize_sig if self.aec_backend == "aec"
                else (lambda s: s))
        nsigs = [norm(sig) for (_a, _g, sig, _d) in plans]

        period = None
        for P in (1, 2, 4):
            if K % P == 0 and all(nsigs[i] == nsigs[i % P]
                                  for i in range(K)):
                period = P
                break

        common = (self.sub_len,
                  self.planner.mult if self.planner else 1,
                  getattr(self.planner, "nlp_mode", 2),
                  self.freq, self.flags, self.agc_gain_db,
                  None if self.zoom_idx is None
                  else tuple(self.zoom_idx.tolist()))
        extra = dict(aec_backend=self.aec_backend, chn=self.chn,
                     ns_backend=self.ns_backend)

        pallas_on = self._pallas_on()
        if pallas_on:
            from wmix_tpu.engine.aec_pallas import (is_steady_16k,
                                                    is_steady_dyn)
        if period is not None:
            P = period
            up = pallas_on and \
                all(is_steady_16k(ns_) for ns_ in nsigs[:P]) and \
                all(is_steady_dyn(p_[3]) for p_ in plans)
            if pallas_on:
                self._ensure_aec_layout(up, plans[0][3])
            fn = _build_chain_cycle_scan_fn(tuple(nsigs[:P]), *common,
                                            use_pallas=up, **extra)
            n_units = K // P
            dyns = tuple(
                {k: jnp.asarray(np.stack(
                    [plans[i][3][k] for i in range(j, K, P)]))
                 for k in plans[j][3]}
                for j in range(P))
            # jnp reshape: device-resident chunks stay on device (a
            # np.asarray here would round-trip them through the host)
            mic = jnp.asarray(mic_chunk, jnp.int16).reshape(
                n_units, P, *mic_chunk.shape[1:])
            play = jnp.asarray(play_chunk, jnp.int16).reshape(
                n_units, P, *play_chunk.shape[1:])
            adds = np.asarray([p[0] for p in plans],
                              np.int32).reshape(n_units, P)
            gets = np.asarray([p[1] for p in plans],
                              np.int32).reshape(n_units, P)
            self.state, (o, p8, vf) = fn(
                self.state, mic, play, jnp.asarray(adds),
                jnp.asarray(gets), dyns)
            return (o.reshape(K, *o.shape[2:]),
                    p8.reshape(K, *p8.shape[2:]),
                    vf.reshape(K, *vf.shape[2:]))

        # fallback: group consecutive equal normalized signatures;
        # under pallas, the first post-startup package (irregular out
        # ring priming) must not share a run with steady packages
        runs = []
        for i, s in enumerate(nsigs):
            key = (s, pallas_on and is_steady_dyn(plans[i][3]))
            if runs and runs[-1][0] == key:
                runs[-1][1].append(i)
            else:
                runs.append((key, [i]))
        origins, pkg8ks, vflagss = [], [], []
        for (sig, dyn_ok), idxs in runs:
            dyns = [plans[i][3] for i in idxs]
            dyn_stack = {k: np.stack([d[k] for d in dyns])
                         for k in dyns[0]}
            up = pallas_on and dyn_ok and is_steady_16k(sig)
            if pallas_on:
                self._ensure_aec_layout(up, dyns[0])
            n = len(idxs)
            mic_r = jnp.asarray(mic_chunk[idxs], jnp.int16)
            play_r = jnp.asarray(play_chunk[idxs], jnp.int16)
            adds_r = jnp.asarray([plans[i][0] for i in idxs], jnp.int32)
            gets_r = jnp.asarray([plans[i][1] for i in idxs], jnp.int32)
            if up:
                # route steady pallas runs through the SAME cycle-scan
                # program as the period path: each enclosing XLA program
                # containing the pallas kernel costs minutes to compile,
                # so keep it to one
                fn = _build_chain_cycle_scan_fn(
                    (_normalize_sig(sig),), *common, use_pallas=True,
                    **extra)
                self.state, (o, p8, vf) = fn(
                    self.state,
                    mic_r.reshape(n, 1, *mic_r.shape[1:]),
                    play_r.reshape(n, 1, *play_r.shape[1:]),
                    adds_r.reshape(n, 1), gets_r.reshape(n, 1),
                    ({k: jnp.asarray(v) for k, v in dyn_stack.items()},))
                o = o.reshape(n, *o.shape[2:])
                p8 = p8.reshape(n, *p8.shape[2:])
                vf = vf.reshape(n, *vf.shape[2:])
            else:
                fn = _build_chain_scan_fn(sig, *common, use_pallas=up,
                                          **extra)
                self.state, (o, p8, vf) = fn(
                    self.state, mic_r, play_r, adds_r, gets_r, dyn_stack)
            origins.append(o)
            pkg8ks.append(p8)
            vflagss.append(vf)
        origin = jnp.concatenate(origins, axis=0)
        pkg8k = jnp.concatenate(pkg8ks, axis=0)
        vflags = jnp.concatenate(vflagss, axis=0)
        return origin, pkg8k, vflags


class ShardedRecordChain:
    """N independent RecordChain shards serving one [B] stream batch.

    Compile-size escape hatch: the monolithic chain program for
    B >= 4096 exceeds the TPU compile helper (round-3 ladder:
    `tpu_compile_helper subprocess exit code 1` at 4096/8192), so large
    batches run as `shards` half-size dispatches per package chunk.
    All shards share ONE compiled executable (identical shapes hit the
    same jit cache), and dispatches enqueue back-to-back — the device
    pipeline stays full while the host prepares the next shard, so
    throughput matches the monolithic program to within dispatch
    overhead.  Planner phase is deterministic and identical across
    shards (same tick sequence), keeping the signature cycle in
    lockstep.  API mirrors RecordChain.run_chunk/reset_slots."""

    def __init__(self, batch: int, freq: int, shards: int = 2, **kw):
        assert batch % shards == 0
        self.batch = batch
        self.freq = freq
        self.shard_b = batch // shards
        self.chains = [RecordChain(self.shard_b, freq, **kw)
                       for _ in range(shards)]
        self.planner = self.chains[0].planner

    def _plan_tick(self):
        # bench warmup parity with RecordChain: advance every shard
        out = None
        for ch in self.chains:
            out = ch._plan_tick()
        return out

    def reset_slots(self, slots) -> None:
        s = np.atleast_1d(np.asarray(slots, np.int64))
        for i, ch in enumerate(self.chains):
            lo, hi = i * self.shard_b, (i + 1) * self.shard_b
            mine = s[(s >= lo) & (s < hi)] - lo
            if mine.size:
                ch.reset_slots(mine)

    def run_chunk(self, mic_chunk, play_chunk):
        outs = []
        for i, ch in enumerate(self.chains):
            lo, hi = i * self.shard_b, (i + 1) * self.shard_b
            outs.append(ch.run_chunk(mic_chunk[:, lo:hi],
                                     play_chunk[:, lo:hi]))
        return tuple(jnp.concatenate([o[j] for o in outs], axis=1)
                     for j in range(3))

    def step(self, mic_pkg, play_pkg):
        """One 20 ms tick over the full batch as shard-width dispatches
        (realtime mode; same executable-sharing property as run_chunk).
        Mirrors RecordChain.step for StreamServer at B above the shard
        width."""
        outs = []
        for i, ch in enumerate(self.chains):
            lo, hi = i * self.shard_b, (i + 1) * self.shard_b
            outs.append(ch.step(mic_pkg[lo:hi], play_pkg[lo:hi]))
        return tuple(jnp.concatenate([o[j] for o in outs], axis=0)
                     for j in range(3))


def _normalize_sig(sig):
    """Replace per-block update_delay_idx with a placeholder: the chunked
    path takes that flag from dyn (traced), so signatures differing only
    in it share one compiled program."""
    return tuple(
        (ne, st, tuple(tuple((nb, -1) for (nb, _u) in f) for f in frames))
        for (ne, st, frames) in sig)


def _build_chain_body(aec_sig, sub_len, mult, nlp_mode, freq, flags,
                      agc_gain_db, zoom_idx, traced_upd=False,
                      use_pallas=False, aec_backend="aec", chn=1,
                      ns_backend="ns"):
    # cache key includes the floatops fast/exact mode: the traced program
    # differs between the parity (guarded) and production (fast) forms.
    # All builder caches are bounded (LRU 32): a deployment mixing many
    # rates/geometries evicts cold variants instead of accumulating
    # compiled programs without bound; eviction only costs a re-trace.
    return _build_chain_body_cached(aec_sig, sub_len, mult, nlp_mode,
                                    freq, flags, agc_gain_db, zoom_idx,
                                    traced_upd, floatops.fast_mode(),
                                    use_pallas, aec_backend, chn,
                                    ns_backend)


@functools.lru_cache(maxsize=32)
def _build_chain_body_cached(aec_sig, sub_len, mult, nlp_mode, freq, flags,
                             agc_gain_db, zoom_idx, traced_upd, fast,
                             use_pallas=False, aec_backend="aec", chn=1,
                             ns_backend="ns"):
    ns_on, aec_on, agc_on, vad_on = flags
    if aec_on and aec_backend == "aecm":
        from wmix_tpu.engine import aecm_step
        aec_body = aecm_step.build_pkg_body(aec_sig, sub_len, mult)
    elif aec_on and use_pallas:
        from wmix_tpu.engine import aec_pallas
        aec_body = aec_pallas.build_chain_aec_body(
            aec_sig, sub_len, mult, nlp_mode,
            interpret=jax.default_backend() != "tpu")
    elif aec_on:
        aec_body = aec_step.build_pkg_body(aec_sig, sub_len, mult,
                                           nlp_mode,
                                           traced_upd=traced_upd)
    else:
        aec_body = None
    zoom = None if zoom_idx is None else jnp.asarray(zoom_idx, jnp.int32)

    if ns_backend == "nsx":
        from wmix_tpu.dsp import nsx_jnp
        v_ns = jax.vmap(lambda st, pkg: nsx_jnp.process_pkg(
            st, pkg, chn, freq))
    else:
        v_ns = jax.vmap(lambda st, pkg: ns_mod.process_pkg(st, pkg, chn,
                                                           freq))
    v_agc = jax.vmap(lambda st, pkg: agc_mod.process_pkg(
        st, pkg, chn, freq, agc_gain_db))
    v_vad = jax.vmap(lambda st, pkg: vad_mod.process(st, pkg, chn, freq))

    def fn(state: ChainState, mic_pkg, play_pkg, add_slot, get_slot, dyn):
        x = mic_pkg.astype(I32)

        ns_st, aec_st, agc_st, vad_st = (state.ns, state.aec, state.agc,
                                         state.vad)
        if ns_on:
            ns_st, x = v_ns(ns_st, x)

        play_fifo = jax.lax.dynamic_update_slice_in_dim(
            state.play_fifo, play_pkg.astype(F32)[:, None], add_slot,
            axis=1)
        if aec_on:
            far = jax.lax.dynamic_index_in_dim(
                play_fifo, get_slot, axis=1, keepdims=False)
            if chn > 1:
                # aec_process2 stereo quirk: LEFT channel only in,
                # output duplicated to every channel
                # (src/webrtc.c:410-483 reshape/extract loop)
                far = far[:, ::chn]
                near_mono = x[:, ::chn]
            else:
                near_mono = x
        if aec_on and aec_backend == "aecm":
            # the AECM path is exact-int end to end: int16-valued i32
            # in and out (webrtc.c AECM branch has no float stage)
            aec_st, out_mono = aec_body(aec_st, far.astype(I32),
                                        near_mono, dyn)
        elif aec_on:
            aec_st, out_f = aec_body(aec_st, far, near_mono.astype(F32),
                                     dyn)
            # (int16_t) cast: truncate toward zero, NaN -> 0
            out_f = jnp.where(jnp.isnan(out_f), jnp.float32(0), out_f)
            out_mono = jnp.trunc(out_f).astype(I32)
            out_mono = ((out_mono + 0x8000) & 0xFFFF) - 0x8000
        if aec_on:
            x = (jnp.repeat(out_mono, chn, axis=1) if chn > 1
                 else out_mono)

        if agc_on:
            agc_st, x = v_agc(agc_st, x)

        vflags = jnp.zeros((x.shape[0],), I32)
        if vad_on:
            vad_st, x = v_vad(vad_st, x)
            vflags = vad_st.reduce if hasattr(vad_st, "reduce") else vflags

        origin = x.astype(jnp.int16)
        pkg8k = origin if zoom is None else origin[:, zoom]
        return (ChainState(ns_st, aec_st, agc_st, vad_st, play_fifo),
                origin, pkg8k, vflags)

    return fn


def _build_chain_fn(aec_sig, sub_len, mult, nlp_mode, freq, flags,
                    agc_gain_db, zoom_idx, use_pallas=False,
                    aec_backend="aec", chn=1, ns_backend="ns"):
    return _build_chain_fn_cached(aec_sig, sub_len, mult, nlp_mode, freq,
                                  flags, agc_gain_db, zoom_idx,
                                  floatops.fast_mode(), use_pallas,
                                  aec_backend, chn, ns_backend)


@functools.lru_cache(maxsize=32)
def _build_chain_fn_cached(aec_sig, sub_len, mult, nlp_mode, freq, flags,
                           agc_gain_db, zoom_idx, fast,
                           use_pallas=False, aec_backend="aec", chn=1,
                           ns_backend="ns"):
    return jax.jit(_build_chain_body(aec_sig, sub_len, mult, nlp_mode,
                                     freq, flags, agc_gain_db, zoom_idx,
                                     use_pallas=use_pallas,
                                     aec_backend=aec_backend, chn=chn,
                                     ns_backend=ns_backend),
                   donate_argnums=(0,))


def _build_chain_scan_fn(aec_sig, sub_len, mult, nlp_mode, freq, flags,
                         agc_gain_db, zoom_idx, use_pallas=False,
                         aec_backend="aec", chn=1, ns_backend="ns"):
    return _build_chain_scan_fn_cached(aec_sig, sub_len, mult, nlp_mode,
                                       freq, flags, agc_gain_db, zoom_idx,
                                       floatops.fast_mode(), use_pallas,
                                       aec_backend, chn, ns_backend)


@functools.lru_cache(maxsize=32)
def _build_chain_scan_fn_cached(aec_sig, sub_len, mult, nlp_mode, freq,
                                flags, agc_gain_db, zoom_idx, fast,
                                use_pallas=False, aec_backend="aec",
                                chn=1, ns_backend="ns"):
    """Chunked execution: lax.scan over K packages in ONE dispatch.

    Steady state has a fixed plan signature, so a whole chunk of packages
    shares one compiled body; per-package dynamics (ring positions, gate
    flags, comfort-noise randoms, FIFO slots) ride as stacked scan inputs.
    This is the production shape: dispatch overhead amortizes over
    K * 20 ms of audio per device call (SURVEY.md §7 step 7)."""
    inner = _build_chain_body(aec_sig, sub_len, mult, nlp_mode, freq,
                              flags, agc_gain_db, zoom_idx,
                              traced_upd=True, use_pallas=use_pallas,
                              aec_backend=aec_backend, chn=chn,
                              ns_backend=ns_backend)

    def fn(state, mic_chunk, play_chunk, add_slots, get_slots, dyn_stack):
        def body(st, xs):
            mic, play, a, g, dyn = xs
            st, origin, pkg8k, vflags = inner(st, mic, play, a, g, dyn)
            return st, (origin, pkg8k, vflags)
        state, outs = jax.lax.scan(
            body, state, (mic_chunk, play_chunk, add_slots, get_slots,
                          dyn_stack))
        return state, outs

    return jax.jit(fn, donate_argnums=(0,))


def _build_chain_cycle_scan_fn(cycle_sigs, sub_len, mult, nlp_mode, freq,
                               flags, agc_gain_db, zoom_idx,
                               use_pallas=False, aec_backend="aec",
                               chn=1, ns_backend="ns"):
    return _build_chain_cycle_scan_fn_cached(
        cycle_sigs, sub_len, mult, nlp_mode, freq, flags, agc_gain_db,
        zoom_idx, floatops.fast_mode(), use_pallas, aec_backend, chn,
        ns_backend)


@functools.lru_cache(maxsize=32)
def _build_chain_cycle_scan_fn_cached(cycle_sigs, sub_len, mult, nlp_mode,
                                      freq, flags, agc_gain_db, zoom_idx,
                                      fast, use_pallas=False,
                                      aec_backend="aec", chn=1,
                                      ns_backend="ns"):
    """ONE lax.scan over super-units of P packages, where P is the period
    of the (normalized) plan-signature sequence: P=1 at 16 kHz, P=2 at
    8 kHz (the two structurally different package plans alternate,
    src/webrtc.c aec_process2 subpackaging).  One compiled program and
    one dispatch per chunk — the 8 kHz fix of VERDICT round-1 weakness
    #4/#5."""
    inners = [
        _build_chain_body(sig, sub_len, mult, nlp_mode, freq, flags,
                          agc_gain_db, zoom_idx, traced_upd=True,
                          use_pallas=use_pallas, aec_backend=aec_backend,
                          chn=chn, ns_backend=ns_backend)
        for sig in cycle_sigs]

    def fn(state, mic_units, play_units, add_units, get_units, dyn_tuple):
        def body(st, xs):
            mic_p, play_p, a_p, g_p, dyns = xs
            os, p8s, vfs = [], [], []
            for j, inner in enumerate(inners):
                st, origin, pkg8k, vflags = inner(
                    st, mic_p[j], play_p[j], a_p[j], g_p[j], dyns[j])
                os.append(origin)
                p8s.append(pkg8k)
                vfs.append(vflags)
            return st, (jnp.stack(os), jnp.stack(p8s), jnp.stack(vfs))
        state, outs = jax.lax.scan(
            body, state, (mic_units, play_units, add_units, get_units,
                          dyn_tuple))
        return state, outs

    return jax.jit(fn, donate_argnums=(0,))

"""Multi-stream record server: the batched engine behind a daemon-style
stream surface (VERDICT round-1 missing #4; SURVEY §7 design stance).

The reference daemon runs ONE record chain for its one sound card
(wmix_shmem_write_circle, src/wmix.c:528-872).  The TPU rebuild's north
star is thousands of concurrent record chains on one chip; this server
is the product path for that workload: a fixed-capacity batch of stream
SLOTS served by one jitted device step per tick, with a host frontend
that admits/reaps client streams into slots.

Semantics vs the reference (documented deviation): slot admission resets
the slot's DSP state (NS quantiles, AEC partitions, AGC capacitors, VAD
GMM, far-end FIFO) but joins the batch-shared host cursor phase — every
slot advances through the same AEC buffer plan, because the plan is
data-independent and identical for every stream that ticks once per
20 ms (engine/aec_plan.py).  A freshly admitted slot therefore behaves
like a chain whose adaptive state was zeroed mid-stream rather than one
cold-started through the 3-package startup passthrough; outputs are
bit-exact against a dedicated RecordChain at the same tick phase
(tests/test_stream_server.py), which is the per-slot exactness
guarantee the batch architecture provides.  Cancellation (the
reference's generation counters, src/wmixConf.h:186-189) becomes slot
masking + reinit — SURVEY §2.3 'async task scheduling'.

Two serving shapes:
  * tick(): one device dispatch per 20 ms package over all B slots —
    the real-time mode (lowest latency).
  * run_chunk-based batching via `tick_chunk` for throughput-first
    deployments that can afford K*20 ms of latency.
"""
from __future__ import annotations

import os
import threading
from typing import Dict, Optional

import numpy as np

from wmix_tpu.engine.chain import RecordChain, ShardedRecordChain


class SlotClosed(Exception):
    pass


class StreamServer:
    """B-slot record-chain server.

    Thread-safe admission/feed; the device step runs in the caller's
    pump thread (tick()) so tests and embedders control pacing."""

    def __init__(self, capacity: int, freq: int, **chain_kw):
        self.capacity = capacity
        self.freq = freq
        self.pkg_len = freq // 1000 * 20
        # above the shard width the monolithic chain program exceeds the
        # TPU compile helper (round-3 ladder failure at B >= 4096);
        # serve big capacities as shard-width dispatches that share one
        # compiled executable (bitwise-identical streams)
        shard_w = int(os.environ.get("WMIX_SHARD_W", "2048"))
        if capacity > shard_w and capacity % shard_w == 0:
            self.chain = ShardedRecordChain(
                capacity, freq, shards=capacity // shard_w, **chain_kw)
        else:
            self.chain = RecordChain(capacity, freq, **chain_kw)
        self._free = list(range(capacity))[::-1]
        self._gen = [0] * capacity           # per-slot generation counter
        self._active = [False] * capacity
        self._lock = threading.Lock()
        # slots admitted since the last tick; their DSP state resets are
        # applied by the PUMP thread at the next tick — the jitted step
        # donates the state pytree, so concurrent reset_slots from a
        # reader thread would touch deleted buffers
        self._pending_reset: list = []
        # per-slot staging for the next tick and output queues
        self._mic_in: Dict[int, list] = {}
        self._play_in: Dict[int, list] = {}
        self._out: Dict[int, list] = {}
        self._zeros = np.zeros(self.pkg_len, np.int16)

    # -- admission ----------------------------------------------------

    def open_stream(self) -> int:
        """Admit a stream; returns a handle (slot | gen<<16)."""
        with self._lock:
            if not self._free:
                raise RuntimeError("no free stream slots")
            slot = self._free.pop()
            self._gen[slot] += 1
            self._active[slot] = True
            self._mic_in[slot] = []
            self._play_in[slot] = []
            self._out[slot] = []
            self._pending_reset.append(slot)
        return slot | (self._gen[slot] << 16)

    def close_stream(self, handle: int) -> None:
        slot = handle & 0xFFFF
        with self._lock:
            if not self._active[slot] or self._gen[slot] != handle >> 16:
                return
            self._active[slot] = False
            self._mic_in.pop(slot, None)
            self._play_in.pop(slot, None)
            self._out.pop(slot, None)
            self._free.append(slot)

    def _check(self, handle: int) -> int:
        slot = handle & 0xFFFF
        if not self._active[slot] or self._gen[slot] != handle >> 16:
            raise SlotClosed(f"stream {handle:#x} is closed")
        return slot

    # -- data plane ---------------------------------------------------

    def feed(self, handle: int, mic_pkg: np.ndarray,
             play_pkg: Optional[np.ndarray] = None) -> None:
        """Queue one 20 ms package for the stream (mic capture plus the
        far-end/speaker package for AEC; zeros when the client plays
        nothing)."""
        slot = self._check(handle)
        mic = np.asarray(mic_pkg, np.int16)
        assert mic.shape == (self.pkg_len,)
        play = self._zeros if play_pkg is None else \
            np.asarray(play_pkg, np.int16)
        with self._lock:
            self._mic_in[slot].append(mic)
            self._play_in[slot].append(play)

    def read(self, handle: int):
        """Pop one processed package (origin int16 [pkg], pkg8k int16,
        vad int32) or None if none pending."""
        slot = self._check(handle)
        with self._lock:
            if self._out[slot]:
                return self._out[slot].pop(0)
        return None

    # -- device pump ----------------------------------------------------

    def _gather(self, n: int):
        mic = np.zeros((n, self.capacity, self.pkg_len), np.int16)
        play = np.zeros_like(mic)
        fed = []
        with self._lock:
            for slot in range(self.capacity):
                if not self._active[slot]:
                    continue
                q = self._mic_in[slot]
                take = min(len(q), n)
                for k in range(take):
                    mic[k, slot] = q[k]
                    play[k, slot] = self._play_in[slot][k]
                del q[:take], self._play_in[slot][:take]
                fed.append((slot, take))
        return mic, play, fed

    def _scatter(self, fed, origin, pkg8k, vad):
        origin = np.asarray(origin)
        pkg8k = np.asarray(pkg8k)
        vad = np.asarray(vad)
        with self._lock:
            for slot, take in fed:
                if slot not in self._out:
                    continue
                for k in range(take):
                    self._out[slot].append(
                        (origin[k, slot], pkg8k[k, slot], vad[k, slot]))

    def _apply_pending_resets(self) -> None:
        with self._lock:
            slots, self._pending_reset = self._pending_reset, []
        if slots:
            self.chain.reset_slots(slots)

    def tick(self) -> None:
        """One 20 ms batch step over all slots (realtime mode).  Slots
        with no queued input process silence (their state still advances
        in lockstep, as the daemon's record heartbeat does when the mic
        delivers nothing, src/wmix.c:608-611).  Must be called from ONE
        pump thread — the chain state is owned by the caller."""
        self._apply_pending_resets()
        mic, play, fed = self._gather(1)
        origin, pkg8k, vad = self.chain.step(mic[0], play[0])
        self._scatter(fed, np.asarray(origin)[None],
                      np.asarray(pkg8k)[None], np.asarray(vad)[None])

    def tick_chunk(self, k_pkgs: int) -> None:
        """K packages in one dispatch (throughput mode, +K*20 ms
        latency)."""
        self._apply_pending_resets()
        mic, play, fed = self._gather(k_pkgs)
        origin, pkg8k, vad = self.chain.run_chunk(mic, play)
        self._scatter(fed, origin, pkg8k, vad)

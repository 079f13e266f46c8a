"""Daemon-on-batched-engine serving (service/engine_bridge.py): N
WmixDaemon instances' record chains on ONE StreamServer batch, bit-exact
vs the inline per-daemon path, and the -tm self-test (shm fan-out read
through the client API) with DSP running batched."""
import threading
import time

import numpy as np
import pytest

from wmix_tpu.config import EngineConfig
from wmix_tpu.service.core import (WR_AEC, WR_AGC, WR_NS, WR_VAD,
                                   WmixDaemon)
from wmix_tpu.service.engine_bridge import EngineBridge
from wmix_tpu.service.hal import LoopHal
FREQ = 8000
PKG = FREQ // 1000 * 20


def _mk_daemon(seed, bridge=None, **kw):
    hal = LoopHal()
    rng = np.random.RandomState(seed)
    hal.feed_mic((rng.randn(FREQ * 2) * 3000).astype(np.int16).tobytes())
    d = WmixDaemon(EngineConfig(chn=1, freq=FREQ), hal=hal,
                   msg_queue=kw.pop("msg_queue", False),
                   shmem=kw.pop("shmem", False))
    # all four modules on (wmix defaults enable only NS+AGC,
    # src/wmix.c:1580-1584; the -aec/-vad argv switches turn the rest on)
    for i in (WR_AEC, WR_NS, WR_AGC, WR_VAD):
        d.webrtc_enable[i] = 1
    d.shmem_run = 1            # a consumer holds the record path open
    if bridge is not None:
        bridge.attach(d)
    return d, hal


def _capture_outputs(d):
    got = []
    orig = d._record_out

    def wrapper(buf):
        got.append(np.asarray(buf, np.int16).copy())
        orig(buf)

    d._record_out = wrapper
    return got


def test_three_bridged_daemons_equal_inline():
    """3 daemons served by one batch == 3 inline daemons, bitwise, with
    per-daemon distinct mic content."""
    n_ticks = 30
    bridge = EngineBridge(capacity=4, freq=FREQ)

    bridged, inline = [], []
    for seed in (1, 2, 3):
        db, _ = _mk_daemon(seed, bridge=bridge)
        di, _ = _mk_daemon(seed)
        bridged.append((db, _capture_outputs(db)))
        inline.append((di, _capture_outputs(di)))

    for _ in range(n_ticks):
        for db, _ in bridged:
            db.pump(1)
        steps = bridge.tick()
        assert steps <= 4
        for di, _ in inline:
            di.pump(1)

    for k, ((db, got), (di, want)) in enumerate(zip(bridged, inline)):
        assert db.dsp_bridge is bridge and db.dsp_bridge.accepts(db)
        # the record path warms up over the first two ticks (lazy
        # ai_init discards a package) identically on both paths
        assert len(got) == len(want) > 20, k
        for i, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_array_equal(g, w,
                                          err_msg=f"daemon {k} pkg {i}")
    for db, _ in bridged:
        bridge.detach(db)
        db.stop()
    for di, _ in inline:
        di.stop()


def test_switch_divergence_falls_back_inline():
    """A daemon that turns a module off mid-run leaves the batch and
    keeps decoding inline (reference WMT_*_SW semantics preserved)."""
    bridge = EngineBridge(capacity=2, freq=FREQ)
    d, _ = _mk_daemon(5, bridge=bridge)
    got = _capture_outputs(d)
    for _ in range(6):
        d.pump(1)
        bridge.tick()
    n_bridged = len(got)
    d.webrtc_enable[WR_VAD] = 0          # diverge from the batch flags
    assert not bridge.accepts(d)
    for _ in range(6):
        d.pump(1)
        bridge.tick()
    assert len(got) > n_bridged, "inline fallback stopped producing"
    bridge.detach(d)
    d.stop()


def test_tm_selftest_served_by_batch():
    """The -tm self-test (wmix_mem_test, srcMsg/wmixMsg.c:110-139):
    a client reads the 1x8000 shm ring while the daemon's DSP runs
    batched — wmixMsg semantics served by the engine."""
    from wmix_tpu.service import client
    bridge = EngineBridge(capacity=2, freq=FREQ)
    d, hal = _mk_daemon(9, bridge=bridge, msg_queue=True, shmem=True)
    hal.feed_mic((np.random.RandomState(11).randn(FREQ * 6) * 3000)
                 .astype(np.int16).tobytes())
    stop = threading.Event()

    def pump_loop():
        while not stop.is_set():
            d.pump(1)
            bridge.tick()
            time.sleep(0.001)

    t = threading.Thread(target=pump_loop, daemon=True)
    t.start()
    try:
        pcm = client.mem_1x8000(FREQ // 2, wait=True)   # 0.5 s @ 8k
        assert pcm.size == FREQ // 2
        assert np.abs(pcm.astype(np.int64)).max() > 100, \
            "batched record chain produced silence"
    finally:
        stop.set()
        t.join(timeout=5)
        bridge.detach(d)
        d.stop()

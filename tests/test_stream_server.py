"""Multi-stream record server: per-slot outputs are bit-exact against a
dedicated RecordChain at the same tick phase (the admission contract,
service/stream_server.py), including mid-stream admissions and slot
reuse after close."""
import os

import numpy as np
import pytest

from wmix_tpu.engine.chain import RecordChain
from wmix_tpu.service.stream_server import SlotClosed, StreamServer

pytestmark = pytest.mark.heavy


@pytest.fixture(autouse=True)
def _fast_mode():
    os.environ["WMIX_FAST"] = "1"
    yield
    del os.environ["WMIX_FAST"]


def _ref_chain(freq, phase_ticks, mics, plays):
    """Dedicated single-slot chain admitted at the same planner phase."""
    rc = RecordChain(1, freq)
    for _ in range(phase_ticks):
        rc._plan_tick()
    outs = []
    for m, p in zip(mics, plays):
        o, p8, v = rc.step(m[None], p[None])
        outs.append((np.asarray(o)[0], np.asarray(p8)[0],
                     np.asarray(v)[0]))
    return outs


def test_concurrent_slots_bit_exact():
    freq = 16000
    pkg = freq // 1000 * 20
    rng = np.random.RandomState(5)
    srv = StreamServer(4, freq)

    n_ticks = 8
    mics_a = (rng.randn(n_ticks, pkg) * 3000).astype(np.int16)
    plays_a = (rng.randn(n_ticks, pkg) * 5000).astype(np.int16)
    mics_b = (rng.randn(n_ticks, pkg) * 2000).astype(np.int16)
    plays_b = (rng.randn(n_ticks, pkg) * 4000).astype(np.int16)
    mics_c = (rng.randn(n_ticks, pkg) * 1000).astype(np.int16)
    plays_c = np.zeros_like(mics_c)

    a = srv.open_stream()
    b = srv.open_stream()
    got = {a: [], b: []}
    c = None
    admit_c_at = 3
    for t in range(n_ticks):
        if t == admit_c_at:
            c = srv.open_stream()
            got[c] = []
        srv.feed(a, mics_a[t], plays_a[t])
        srv.feed(b, mics_b[t], plays_b[t])
        if c is not None:
            srv.feed(c, mics_c[t - admit_c_at], plays_c[t - admit_c_at])
        srv.tick()
        for h in list(got):
            r = srv.read(h)
            if r is not None:
                got[h].append(r)

    ref_a = _ref_chain(freq, 0, mics_a, plays_a)
    ref_b = _ref_chain(freq, 0, mics_b, plays_b)
    ref_c = _ref_chain(freq, admit_c_at,
                       mics_c[:n_ticks - admit_c_at],
                       plays_c[:n_ticks - admit_c_at])

    for h, ref in ((a, ref_a), (b, ref_b), (c, ref_c)):
        assert len(got[h]) == len(ref)
        for i, ((o, p8, v), (ro, rp8, rv)) in enumerate(zip(got[h], ref)):
            np.testing.assert_array_equal(o, ro, err_msg=f"pkg {i}")
            np.testing.assert_array_equal(p8, rp8)
            np.testing.assert_array_equal(v, rv)


def test_slot_reuse_and_generation_guard():
    freq = 16000
    pkg = freq // 1000 * 20
    srv = StreamServer(1, freq)
    h1 = srv.open_stream()
    srv.close_stream(h1)
    with pytest.raises(SlotClosed):
        srv.feed(h1, np.zeros(pkg, np.int16))
    h2 = srv.open_stream()
    assert h2 != h1  # generation bumped, same slot
    srv.feed(h2, np.zeros(pkg, np.int16))
    srv.tick()
    assert srv.read(h2) is not None
    with pytest.raises(RuntimeError):
        srv.open_stream()  # capacity exhausted


def test_pipelined_fast_lane_matches_sync_tick():
    """tick_pipelined + feed_batch/read_batch (the realtime fast lane)
    must deliver byte-identical outputs, in order, to the blocking
    tick() + feed()/read() path."""
    freq = 16000
    pkg = freq // 1000 * 20
    B, n_ticks, depth = 4, 12, 3
    rng = np.random.RandomState(7)
    mics = (rng.randn(n_ticks, B, pkg) * 2500).astype(np.int16)
    plays = (rng.randn(n_ticks, B, pkg) * 4000).astype(np.int16)

    sync = StreamServer(B, freq)
    hs = [sync.open_stream() for _ in range(B)]
    want = []
    for t in range(n_ticks):
        for b, h in enumerate(hs):
            sync.feed(h, mics[t, b], plays[t, b])
        sync.tick()
        want.append([sync.read(h) for h in hs])

    pipe = StreamServer(B, freq)
    hp = [pipe.open_stream() for _ in range(B)]
    got = []
    for t in range(n_ticks):
        pipe.feed_batch(hp, mics[t], plays[t])
        pipe.tick_pipelined(depth)
        r = pipe.read_batch(hp)
        if r is not None:
            got.append(r)
    assert len(got) == n_ticks - depth  # outputs lag by `depth`
    pipe.flush_pipeline()
    while True:
        r = pipe.read_batch(hp)
        if r is None:
            break
        got.append(r)
    assert len(got) == n_ticks

    for t, (o_blk, p8_blk, v_blk) in enumerate(got):
        for b in range(B):
            o, p8, v = want[t][b]
            np.testing.assert_array_equal(o_blk[b], o, err_msg=f"t{t}b{b}")
            np.testing.assert_array_equal(p8_blk[b], p8)
            np.testing.assert_array_equal(v_blk[b], v)


def test_mixed_feed_batch_and_feed_order_preserved():
    """feed_batch blocks spill into per-slot queues when mixed with
    feed(); package order per slot must survive the demotion."""
    freq = 16000
    pkg = freq // 1000 * 20
    B = 2
    rng = np.random.RandomState(3)
    srv = StreamServer(B, freq)
    hs = [srv.open_stream() for _ in range(B)]
    blocks = (rng.randn(3, B, pkg) * 2000).astype(np.int16)
    srv.feed_batch(hs, blocks[0])          # fast lane
    srv.feed(hs[0], blocks[1][0])          # forces spill of block 0
    srv.feed(hs[1], blocks[1][1])
    srv.feed_batch(hs, blocks[2])          # queues non-empty: slow path

    ref = StreamServer(B, freq)
    hr = [ref.open_stream() for _ in range(B)]
    for t in range(3):
        for b in range(B):
            ref.feed(hr[b], blocks[t][b])

    for t in range(3):
        srv.tick()
        ref.tick()
        for b in range(B):
            got, want = srv.read(hs[b]), ref.read(hr[b])
            np.testing.assert_array_equal(got[0], want[0],
                                          err_msg=f"t{t}b{b}")


def test_drain_thread_matches_inline_drain():
    """start_drain_thread(): outputs must be identical and in order vs
    the inline-drain pipelined path — the drainer only moves the
    device->host fetch off the pump thread."""
    freq = 16000
    pkg = freq // 1000 * 20
    B, n_ticks, depth = 4, 12, 3
    rng = np.random.RandomState(11)
    mics = (rng.randn(n_ticks, B, pkg) * 2500).astype(np.int16)
    plays = (rng.randn(n_ticks, B, pkg) * 4000).astype(np.int16)

    inline = StreamServer(B, freq)
    hi = [inline.open_stream() for _ in range(B)]
    want = []
    for t in range(n_ticks):
        inline.feed_batch(hi, mics[t], plays[t])
        inline.tick_pipelined(depth)
    inline.flush_pipeline()
    while True:
        r = inline.read_batch(hi)
        if r is None:
            break
        want.append(r)
    assert len(want) == n_ticks

    threaded = StreamServer(B, freq)
    ht = [threaded.open_stream() for _ in range(B)]
    threaded.start_drain_thread()
    got = []
    for t in range(n_ticks):
        threaded.feed_batch(ht, mics[t], plays[t])
        threaded.tick_pipelined(depth)
        r = threaded.read_batch(ht)
        if r is not None:
            got.append(r)
    threaded.flush_pipeline()
    while True:
        r = threaded.read_batch(ht)
        if r is None:
            break
        got.append(r)
    threaded.stop_drain_thread()
    assert len(got) == n_ticks

    for t in range(n_ticks):
        for j in range(3):
            np.testing.assert_array_equal(got[t][j], want[t][j],
                                          err_msg=f"tick {t} part {j}")

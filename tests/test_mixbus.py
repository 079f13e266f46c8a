"""Batched mix-bus parity (engine/mixbus.py): the [B, R, chn] device
ring against the single-engine host mixer (ops/mixer.py, itself
oracle-gated vs wmix_load_data in tests/test_mixer.py), at B > 1."""
import numpy as np
import pytest

from wmix_tpu.config import EngineConfig
from wmix_tpu.engine.mixbus import MixBus, TaskCursor
from wmix_tpu.ops import mixer


def _src(seed, n_bytes):
    return np.random.RandomState(seed).randint(
        -3000, 3000, n_bytes // 2).astype(np.int16).tobytes()


def test_mix_batched_vs_host_rings():
    """B=5 engines, mixed rates/channels/reduces/heads: every engine's
    ring equals the numpy reference ring bitwise."""
    cfg = EngineConfig()
    B = 5
    bus = MixBus(B, cfg)
    rings = [np.zeros((cfg.ring_frames, cfg.chn), np.int16)
             for _ in range(B)]

    specs = [  # (engine, src_freq, src_chn, head_frame, reduce)
        (0, cfg.freq, cfg.chn, 0, 1),
        (1, 16000, 1, 37, 2),
        (2, 44100, 2, 100, 1),
        (3, 8000, 2, cfg.ring_frames - 5, 3),   # wraps
        (4, 32000, 1, 9, 4),
    ]
    for wave in range(3):
        slots, heads, contribs, rdces = [], [], [], []
        for i, (e, fr, ch, h0, rd) in enumerate(specs):
            src = _src(wave * 10 + i, 2000 + 400 * i)
            c = mixer.build_contrib(cfg, src, fr, ch)
            slots.append(e)
            h = (h0 + wave * 57) % cfg.ring_frames
            heads.append(h)
            contribs.append(c)
            rdces.append(rd)
            # numpy reference: same scatter arithmetic per engine
            R = cfg.ring_frames
            for s in range(0, c.shape[0], R):
                blk = c[s:s + R]
                pos = (h + s + np.arange(blk.shape[0])) % R
                q = mixer._trunc_div(blk, rd)
                rings[e][pos] = np.clip(
                    rings[e][pos].astype(np.int64) + q,
                    mixer.I16_MIN, mixer.I16_MAX).astype(np.int16)
        bus.mix(slots, heads, contribs, rdces)

    got = np.asarray(bus.ring)
    for e in range(B):
        np.testing.assert_array_equal(got[e], rings[e],
                                      err_msg=f"engine {e}")


def test_drain_copies_and_zeroes():
    cfg = EngineConfig()
    B = 3
    bus = MixBus(B, cfg)
    c = mixer.build_contrib(cfg, _src(7, 4 * cfg.pkg_size), cfg.freq,
                            cfg.chn)
    bus.mix([0, 1, 2], [0, 10, 20], [c, c, c], [1, 1, 1])
    before = np.asarray(bus.ring).copy()
    pcm = bus.drain(n_pkgs=2)
    n = 2 * cfg.frame_num
    for e, h in enumerate((0, 0, 0)):  # play cursors start at 0
        pos = (h + np.arange(n)) % cfg.ring_frames
        np.testing.assert_array_equal(pcm[e], before[e][pos])
    after = np.asarray(bus.ring)
    for e in range(B):
        pos = (np.arange(n)) % cfg.ring_frames
        assert not after[e][pos].any()
    # cursors advanced
    assert (bus.head_off == (n % cfg.ring_frames) * cfg.frame_size).all()
    assert (bus.tick == 2 * cfg.pkg_size).all()


def test_task_cursor_matches_load_data():
    """One engine driven through MixBus + TaskCursor equals
    ops.mixer.load_data (ring bitwise + cursor/tick)."""
    cfg = EngineConfig()
    bus = MixBus(2, cfg)
    cur = TaskCursor(cfg)
    ref_ring = np.zeros((cfg.ring_frames, cfg.chn), np.int16)
    ref_head, ref_tick = -1, 0
    eng_head_off, eng_tick = 0, 0
    for i in range(4):
        src = _src(100 + i, 3000)
        # reference path
        ref_head, ref_tick = mixer.load_data(
            cfg, ref_ring, ref_head, eng_head_off, eng_tick, 1,
            src, 16000, 1, 16, 0, ref_tick)
        # batched path (engine slot 1; slot 0 stays silent)
        c = mixer.build_contrib(cfg, src, 16000, 1)
        h = cur.place(eng_head_off, eng_tick)
        new_h = bus.mix([1], [h], [c], [1])[0]
        cur.advance(int(new_h), c.size * 2, eng_head_off, eng_tick)
        assert (cur.head_off, cur.tick) == (ref_head, ref_tick), i
    got = np.asarray(bus.ring)
    np.testing.assert_array_equal(got[1], ref_ring)
    assert not got[0].any()


def test_has_data_and_reset():
    cfg = EngineConfig()
    bus = MixBus(3, cfg)
    c = mixer.build_contrib(cfg, _src(9, 800), cfg.freq, cfg.chn)
    bus.mix([1], [0], [c], [1])
    flags = bus.has_data()
    assert list(flags) == [False, True, False]
    bus.head_off[:] = 160
    bus.tick[:] = 320
    bus.reset_slots([1])
    assert not bus.has_data().any()
    assert bus.head_off[1] == 0 and bus.tick[1] == 0
    assert bus.head_off[0] == 160  # untouched engines keep cursors


def test_mix_waves_matches_sequential_mix():
    """The fused S-wave dispatch (mix_waves) must leave the ring
    byte-identical to S sequential mix() calls — same saturating add
    order per engine."""
    cfg = EngineConfig()
    B, S = 5, 3
    rng = np.random.RandomState(11)
    pkg = cfg.frame_num
    waves = rng.randint(-30000, 30000, (S, B, pkg, cfg.chn)).astype(
        np.int16)
    heads = rng.randint(0, cfg.ring_frames, (S, B)).astype(np.int64)
    lens = rng.randint(1, pkg + 1, (S, B)).astype(np.int32)
    rdces = rng.randint(1, 4, (S, B)).astype(np.int32)

    seq = MixBus(B, cfg)
    slots = np.arange(B, dtype=np.int32)
    for s in range(S):
        # mask to the per-engine valid length like the dense lane does
        contribs = [waves[s, b, :lens[s, b]] for b in range(B)]
        seq.mix(slots, heads[s], contribs, rdces[s])

    dense = MixBus(B, cfg)
    dense.mix_waves(heads, waves, lens, rdces)

    np.testing.assert_array_equal(np.asarray(dense.ring),
                                  np.asarray(seq.ring))


def test_drain_async_pipeline_matches_blocking_drain():
    cfg = EngineConfig()
    B = 3
    rng = np.random.RandomState(5)
    pkg = cfg.frame_num
    w = rng.randint(-2000, 2000, (1, B, pkg, cfg.chn)).astype(np.int16)
    hd = np.zeros((1, B), np.int64)
    ln = np.full((1, B), pkg, np.int32)
    rd = np.ones((1, B), np.int32)

    a, b = MixBus(B, cfg), MixBus(B, cfg)
    outs_a, pend = [], []
    outs_b = []
    for t in range(6):
        base = (t * pkg) % cfg.ring_frames
        a.mix_waves(hd + base, w, ln, rd)
        pend.append(a.drain_async(1))
        b.mix_waves(hd + base, w, ln, rd)
        outs_b.append(b.drain(1))
    outs_a = [np.asarray(p) for p in pend]
    for x, y in zip(outs_a, outs_b):
        np.testing.assert_array_equal(x, y)

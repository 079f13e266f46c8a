"""t31 platform geometry (platform/t31/plat.{h,c}): hardware-AEC timing
(AEC_INTERVALMS=0), zero write-ahead (PLAY_CORRECT=0) and the x7 volume
mapping — exercised as a config point through the mixer (vs the
t31-geometry C oracle) and the record chain's degenerate delay FIFO."""
import numpy as np
import pytest

from wmix_tpu.config import EngineConfig
from wmix_tpu.service.hal import T31Hal


def _t31_oracle():
    from oracle import bindings
    if not bindings.available(1, 8000, "t31"):
        pytest.skip("t31 oracle not built")
    return bindings.Oracle(1, 8000, "t31")


def test_config_t31_geometry():
    cfg = EngineConfig.t31()
    assert (cfg.chn, cfg.freq) == (1, 8000)
    assert cfg.play_correct == 0          # plat.h:16
    assert cfg.aec_fifo_pkgs == 2         # 0/20 + 2 (wmixConf.h:141)
    # alsa default unchanged
    assert EngineConfig().play_correct == 8000 * 2 // 5


def test_t31_volume_mapping():
    """plat.c:19-26,71-133: set clamps >10 -> 70 and <1 -> 0, else
    vol*7; get floors device units / 7."""
    hal = T31Hal()
    ao = hal.ao_init(1, 8000)
    for vol, dev, back in [(10, 70, 10), (11, 70, 10), (0, 0, 0),
                           (-3, 0, 0), (3, 21, 3), (7, 49, 7)]:
        hal.ao_vol_set(ao, vol)
        assert hal._ao_vol == dev, vol
        assert hal.ao_vol_get(ao) == back, vol
    ai = hal.ai_init(1, 8000)
    hal.ai_vol_set(ai, 5)
    assert hal.ai_vol_get(ai) == 5
    assert hal.ai_read(ai, 320) == bytes(320)


def test_t31_mixer_head_placement_vs_oracle():
    """PLAY_CORRECT=0: a fresh cursor lands AT the play head, not 0.2 s
    ahead — bitwise vs the t31-geometry reference build."""
    from wmix_tpu.ops import mixer
    o = _t31_oracle()
    assert o.play_correct == 0
    cfg = EngineConfig.t31()
    src = np.random.RandomState(3).randint(
        -3000, 3000, 640).astype(np.int16).tobytes()

    for wmix_head, wmix_tick in [(0, 0), (1234, 5000), (15998, 99999)]:
        ring_c = np.zeros(cfg.buff_size + 4, np.uint8)
        ring_py = np.zeros((cfg.ring_frames, cfg.chn), np.int16)
        want_head, want_tick = o.load_data(
            ring_c, -1, wmix_head, wmix_tick, 1, src, 8000, 1, 16, 0, 0)
        got_head, got_tick = mixer.load_data(
            cfg, ring_py, -1, wmix_head, wmix_tick, 1, src,
            8000, 1, 16, 0, 0)
        assert (got_head, got_tick) == (want_head, want_tick), wmix_head
        np.testing.assert_array_equal(
            ring_py.reshape(-1), ring_c[:cfg.buff_size].view(np.int16))


def test_chain_delay0_fifo_vs_reference_quirk():
    """RecordChain with aec_interval_ms=0: the 2-slot FIFO degenerates
    to the C's absolute-slot-0 read (playPkgBuff_get(0),
    src/wmix.c:494-526: pkgCount = count - clamp(count - 0) = 0) — the
    chain's far-end must equal packages added at even ticks."""
    import jax
    from wmix_tpu.engine.chain import RecordChain
    from oracle import bindings
    if not bindings.available(1, 8000, "t31"):
        pytest.skip("t31 oracle not built")
    o = bindings.Oracle(1, 8000, "t31")

    freq, B, n_pkgs = 8000, 2, 24
    pkg = freq // 1000 * 20
    rng = np.random.RandomState(7)
    mics = (rng.randn(n_pkgs, B, pkg) * 2000).astype(np.int16)
    plays = (rng.randn(n_pkgs, B, pkg) * 4000).astype(np.int16)

    # engine: AEC-only chain at delay 0
    chain = RecordChain(B, freq, ns_enable=False, aec_enable=True,
                        agc_enable=False, vad_enable=False,
                        aec_interval_ms=0)
    assert chain.fifo_pkgs == 2
    got = np.stack([np.asarray(chain.step(mics[i], plays[i])[0])
                    for i in range(n_pkgs)])        # [n,B,pkg]

    # reference: per-stream aec_process2 with the C FIFO replicated
    for b in range(B):
        aec = o.aec(chn=1, freq=freq, interval_ms=20)
        fifo = np.zeros((2, pkg), np.int16)
        count = 0
        for i in range(n_pkgs):
            fifo[count] = plays[i, b]
            count = (count + 1) % 2
            far = fifo[0]                            # the delay-0 quirk
            want = aec.process2(far, mics[i, b], 0)
            np.testing.assert_array_equal(
                got[i, b], want, err_msg=f"pkg {i} stream {b}")

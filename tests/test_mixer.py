"""Mixer parity: load_data vs the C reference (wmix_load_data,
src/wmix.c:1639-1957) across geometries, rates, reduce modes and wrap."""
import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.config import EngineConfig
from wmix_tpu.ops import mixer

GEOMS = [(1, 8000), (1, 16000), (2, 16000), (1, 32000)]


def _src(n_frames, chn, seed=0, amp=None):
    r = np.random.RandomState(seed)
    a = amp or 32768
    return r.randint(-a, a, n_frames * chn).astype(np.int16).tobytes()


def _run_both(geo_chn, geo_freq, src, freq, chn, *, reduce=0, reduce_mode=1,
              head_off=-1, wmix_head_off=0, wmix_tick=0, tick=0,
              ring_fill=None, use_device=False):
    from oracle.bindings import Oracle
    o = Oracle(geo_chn, geo_freq)
    cfg = EngineConfig(chn=geo_chn, freq=geo_freq)

    ring_c = np.zeros(cfg.buff_size + 4, np.uint8)
    ring_py = np.zeros((cfg.ring_frames, cfg.chn), np.int16)
    if ring_fill is not None:
        ring_c[:cfg.buff_size] = ring_fill.view(np.uint8)
        ring_py[...] = ring_fill.view(np.int16).reshape(ring_py.shape)

    want_head, want_tick = o.load_data(
        ring_c, head_off, wmix_head_off, wmix_tick, reduce_mode, src,
        freq, chn, 16, reduce, tick)
    got_head, got_tick = mixer.load_data(
        cfg, ring_py, head_off, wmix_head_off, wmix_tick, reduce_mode, src,
        freq, chn, 16, reduce, tick, use_device=use_device)

    want_ring = ring_c[:cfg.buff_size].view(np.int16)
    got_ring = ring_py.reshape(-1)
    return (want_head, want_tick, want_ring), (got_head, got_tick, got_ring)


@requires_oracle
@pytest.mark.parametrize("geo_chn,geo_freq", GEOMS)
def test_fast_path(geo_chn, geo_freq):
    src = _src(320, geo_chn, seed=1)
    want, got = _run_both(geo_chn, geo_freq, src, geo_freq, geo_chn)
    assert want[0] == got[0] and want[1] == got[1]
    assert np.array_equal(want[2], got[2])


@requires_oracle
@pytest.mark.parametrize("geo_chn,geo_freq", [(1, 16000), (2, 16000)])
@pytest.mark.parametrize("src_freq,src_chn", [
    (8000, 1), (8000, 2), (44100, 1), (44100, 2), (32000, 1), (11025, 1),
    (22050, 2), (48000, 1)])
def test_rate_conversion(geo_chn, geo_freq, src_freq, src_chn):
    src = _src(1024, src_chn, seed=2)
    want, got = _run_both(geo_chn, geo_freq, src, src_freq, src_chn)
    assert want[0] == got[0] and want[1] == got[1]
    assert np.array_equal(want[2], got[2])


@requires_oracle
def test_reduce_modes():
    src = _src(640, 1, seed=3)
    for reduce_mode in [1, 2, 4, 15]:
        for reduce in [0, 1, 2, 4]:
            want, got = _run_both(1, 8000, src, 8000, 1, reduce=reduce,
                                  reduce_mode=reduce_mode)
            assert np.array_equal(want[2], got[2]), (reduce_mode, reduce)


@requires_oracle
def test_mix_saturation_and_overlay():
    """Second stream mixed on top of existing ring content saturates."""
    cfg = EngineConfig(1, 8000)
    fill = np.random.RandomState(4).randint(
        -32768, 32768, cfg.buff_size // 2).astype(np.int16)
    src = _src(2000, 1, seed=5)
    want, got = _run_both(1, 8000, src, 8000, 1, ring_fill=fill,
                          head_off=100 * 2, tick=100 * 2)
    assert want[0] == got[0] and want[1] == got[1]
    assert np.array_equal(want[2], got[2])


@requires_oracle
def test_ring_wraparound():
    """Head near the end of the ring wraps to the start mid-load."""
    cfg = EngineConfig(1, 8000)
    src = _src(3000, 1, seed=6)
    head = (cfg.ring_frames - 500) * 2
    want, got = _run_both(1, 8000, src, 8000, 1, head_off=head, tick=head)
    assert want[0] == got[0] and want[1] == got[1]
    assert np.array_equal(want[2], got[2])


@requires_oracle
def test_stale_tick_replacement():
    """tick < wmix->tick repositions the head ahead of the play cursor."""
    src = _src(320, 1, seed=7)
    want, got = _run_both(1, 8000, src, 8000, 1, head_off=64,
                          wmix_head_off=5000, wmix_tick=90000, tick=100)
    assert want[0] == got[0] and want[1] == got[1]
    assert np.array_equal(want[2], got[2])


@requires_oracle
def test_device_kernel_matches():
    """The jitted device mix path is bit-identical to the host path."""
    src = _src(1024, 1, seed=8)
    want, got = _run_both(1, 16000, src, 8000, 1, use_device=True)
    assert want[0] == got[0] and want[1] == got[1]
    assert np.array_equal(want[2], got[2])


@requires_oracle
def test_long_load_wraps_ring_multiple_times():
    cfg = EngineConfig(1, 8000)
    src = _src(20000, 1, seed=9)  # 2.5 s into a 1 s ring
    want, got = _run_both(1, 8000, src, 8000, 1)
    assert want[0] == got[0] and want[1] == got[1]
    assert np.array_equal(want[2], got[2])


@requires_oracle
def test_config1_fixture_two_wav_mix():
    """BASELINE config 1: audio/1x8000.wav + audio/2x16000.wav mixed into
    a 2x16000 engine (resample + channel map + saturating sum), ring
    bit-equal to the reference mixer fed the same streams."""
    from oracle.bindings import Oracle
    from wmix_tpu.codecs import wav as wavc

    h1, pcm1 = wavc.read("/root/reference/audio/1x8000.wav")
    h2, pcm2 = wavc.read("/root/reference/audio/2x16000.wav")

    o = Oracle(2, 16000)
    cfg = EngineConfig(chn=2, freq=16000)
    ring_c = np.zeros(cfg.buff_size + 4, np.uint8)
    ring_py = np.zeros((cfg.ring_frames, cfg.chn), np.int16)

    # two streams interleave chunked loads like two daemon play tasks
    chunk1 = h1.bytes_per_second // 4
    chunk2 = h2.bytes_per_second // 4
    st = {"c_head1": -1, "c_tick1": 0, "p_head1": -1, "p_tick1": 0,
          "c_head2": -1, "c_tick2": 0, "p_head2": -1, "p_tick2": 0}
    for i in range(8):
        for tag, pcm, hdr, chunk in (("1", pcm1, h1, chunk1),
                                     ("2", pcm2, h2, chunk2)):
            seg = pcm[i * chunk:(i + 1) * chunk]
            if not seg:
                continue
            st[f"c_head{tag}"], st[f"c_tick{tag}"] = o.load_data(
                ring_c, st[f"c_head{tag}"], 0, 0, 1, seg,
                hdr.sample_rate, hdr.channels, 16, 0,
                st[f"c_tick{tag}"])
            st[f"p_head{tag}"], st[f"p_tick{tag}"] = mixer.load_data(
                cfg, ring_py, st[f"p_head{tag}"], 0, 0, 1, seg,
                hdr.sample_rate, hdr.channels, 16, 0,
                st[f"p_tick{tag}"])
    want = ring_c[:cfg.buff_size].view(np.int16)
    got = ring_py.reshape(-1)
    bad = np.nonzero(want != got)[0]
    assert bad.size == 0, f"{bad.size} ring mismatches at {bad[:5]}"
    assert np.abs(want.astype(np.int32)).sum() > 0, "silent mix?"

"""Daemon startup argv parity (src/wmix.c main, :2089-2174).

The reference daemon accepts initial volumes, initial WebRTC switches,
a console redirect and a boot-time play file on its command line; these
must reach the fresh core exactly like the C block after wmix_init."""
import time

import numpy as np

from wmix_tpu.codecs import wav as wavc
from wmix_tpu.config import EngineConfig
from wmix_tpu.service.core import (WR_AEC, WR_AGC, WR_NS, WR_NS_PA,
                                   WR_VAD, WmixDaemon)
from wmix_tpu.service.daemon import (apply_startup, make_config,
                                     make_hal, parse_args)
from wmix_tpu.service.hal import LoopHal, T31Hal


def test_parse_full_surface():
    s = parse_args(["-d", "-v", "8", "-vr", "7", "-va", "9",
                    "-vad", "1", "-aec", "0", "-ns", "1",
                    "-ns_pa", "1", "-agc", "1",
                    "-console", "/tmp/w.log", "/tmp/boot.wav"])
    assert s["debug"] and s["volume"] == 8 and s["volume_mic"] == 7
    assert s["volume_agc"] == 9
    assert s["webrtc"] == {WR_VAD: 1, WR_AEC: 0, WR_NS: 1,
                           WR_NS_PA: 1, WR_AGC: 1}
    assert s["console"] == "/tmp/w.log"
    assert s["play"] == "/tmp/boot.wav"


def test_parse_switch_first_char_semantics():
    # reference: argv[++i][0] == '1' enables; anything else disables
    s = parse_args(["-aec", "10", "-ns", "0", "-vad", "x"])
    assert s["webrtc"] == {WR_AEC: 1, WR_NS: 0, WR_VAD: 0}


def test_parse_help():
    assert parse_args(["-?"])["help"]
    assert parse_args(["--help"])["help"]


def test_t31_hal_reachable():
    s = parse_args(["--hal", "t31"])
    cfg = make_config(s)
    # t31 geometry (platform/t31/plat.h): mono 8 kHz, hw AEC (0 ms
    # echo-path delay), no write-ahead
    assert cfg.chn == 1 and cfg.freq == 8000
    assert cfg.aec_interval_ms == 0 and cfg.play_correct == 0
    assert isinstance(make_hal("t31"), T31Hal)


def test_apply_startup_settings():
    d = WmixDaemon(EngineConfig(chn=1, freq=8000), hal=LoopHal())
    try:
        s = parse_args(["-v", "6", "-vr", "4", "-va", "7",
                        "-agc", "1", "-ns", "1"])
        apply_startup(d, s)
        assert d.volume == 6 and d.volume_mic == 4 and d.volume_agc == 7
        assert d.webrtc_enable[WR_AGC] == 1
        assert d.webrtc_enable[WR_NS] == 1
        assert d.webrtc_enable[WR_AEC] == 0
    finally:
        d.stop()


def test_boot_play_reaches_speaker(tmp_path):
    hal = LoopHal()
    d = WmixDaemon(EngineConfig(chn=1, freq=8000), hal=hal)
    try:
        t = np.arange(2000) / 8000
        pcm = (np.sin(2 * np.pi * 440 * t) * 8000).astype(np.int16)
        path = tmp_path / "boot.wav"
        wavc.write(str(path), pcm.tobytes(), 1, 8000)
        s = parse_args([str(path)])
        assert s["play"] == str(path)
        apply_startup(d, s)
        for _ in range(2000):
            d.pump(1)
            if d.thread_play == 0 and not d.tick_has_data():
                break
            time.sleep(0.002)
        out = np.frombuffer(bytes(hal.played), np.int16)
        nz = np.nonzero(out)[0]
        assert nz.size, "boot file never played"
        start = nz[0] - 1
        assert np.array_equal(out[start:start + pcm.size], pcm)
    finally:
        d.stop()

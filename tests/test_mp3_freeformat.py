"""Free-format MP3 (bitrate_index == 0) graceful handling.

The reference's libmad build scans for a free bitrate (frame.c free-rate
scan, built via /root/reference/Makefile:258-266); this rebuild declares
free-format not-planned.  These tests pin the agreed-on contract
(VERDICT r4 missing #3): a free-format stream must fail *gracefully* —
no crash, zero frames — and must not poison decoding of regular frames
that follow in the same buffer, on BOTH the Python decoder and the
native C front-end.
"""
import numpy as np
import pytest

from wmix_tpu.codecs import mp3

FIXTURE = "/root/reference/audio/2x44100.mp3"


def make_freeformat_stream(n_frames: int = 8,
                           payload_len: int = 417) -> bytes:
    """Synthesize a Layer III MPEG-1 stream whose headers carry
    bitrate_index == 0 (free format).  Payload bytes avoid 0xFF so the
    sync scan cannot resync inside a frame body."""
    hdr = bytes([0xFF, 0xFB, 0x00, 0x44])   # 44.1 kHz, joint stereo
    body = bytes([0xAA]) * payload_len
    return (hdr + body) * n_frames


def test_header_parses_as_free_format():
    data = make_freeformat_stream(1)
    h = mp3.decode_header(mp3.Bits(data, 0))
    assert h.layer == 3
    assert h.bitrate == 0               # the free-format marker
    assert h.samplerate == 44100


def test_python_decoder_skips_free_format():
    data = make_freeformat_stream(16)
    pcm, rate, chn = mp3.Mp3Decoder().decode(data)
    assert pcm.size == 0
    assert (rate, chn) == (0, 0)


def test_python_decoder_recovers_after_free_format_prefix():
    """Free-format junk followed by a regular stream: the regular frames
    must decode identically to the clean stream."""
    clean = open(FIXTURE, "rb").read()
    want, wrate, wchn = mp3.Mp3Decoder().decode(clean, max_frames=4)
    dirty = make_freeformat_stream(4) + clean
    got, grate, gchn = mp3.Mp3Decoder().decode(dirty, max_frames=4)
    assert (grate, gchn) == (wrate, wchn) == (44100, 2)
    assert np.array_equal(got, want)


def test_native_frontend_skips_free_format():
    from wmix_tpu.codecs import mp3fe
    if not mp3fe.available():
        pytest.skip("native mp3 front-end unavailable")
    frames = list(mp3fe.frames_sbsample(make_freeformat_stream(16)))
    assert frames == []


def test_native_frontend_recovers_after_free_format_prefix():
    from wmix_tpu.codecs import mp3fe
    if not mp3fe.available():
        pytest.skip("native mp3 front-end unavailable")
    clean = open(FIXTURE, "rb").read()
    dirty = make_freeformat_stream(4) + clean
    want = [(h.samplerate, h.nchannels, sb.copy()) for h, sb in
            _take(mp3fe.frames_sbsample(clean), 4)]
    got = [(h.samplerate, h.nchannels, sb.copy()) for h, sb in
           _take(mp3fe.frames_sbsample(dirty), 4)]
    assert len(want) == len(got) == 4
    for (wr, wc, wsb), (gr, gc, gsb) in zip(want, got):
        assert (gr, gc) == (wr, wc)
        assert np.array_equal(gsb, wsb)


def _take(it, n):
    out = []
    for x in it:
        out.append(x)
        if len(out) >= n:
            break
    return out

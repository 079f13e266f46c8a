"""MP3 Layer I / Layer II decode parity (layer12.c).

libmad decodes all three layers; the rebuild's Layer I/II port shares
the Q28 pipeline and polyphase synthesis with Layer III.  No Layer I/II
fixtures exist (and no encoder is available), so parity runs on
synthesized streams: valid headers with pseudo-random payloads, which
for Layer II are valid frames by construction (every allocation index
maps through the tables) and for Layer I exercise the BADBITALLOC skip
path exactly as the reference does.

The C oracle reads these through the real libmad; corrupt frames make
libmad read past the buffer (no bounds check on sample bits), so the
binding zero-pads the tail — matching a C binary's static buffer and
this port's Bits reader.
"""
import os

import numpy as np
import pytest

from wmix_tpu.codecs import mp3

pytest.importorskip("oracle.bindings")
from oracle.bindings import Oracle, available  # noqa: E402

pytestmark = pytest.mark.skipif(not available(2, 44100),
                                reason="oracle not built")

BIT1 = [[32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
        [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]]
BIT2 = [[32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
        [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]]
SR = [44100, 48000, 32000]


def _stream(layer, br_idx, sr_idx, mode, frames, seed, lsf=False,
            protection=False):
    if lsf:
        br = BIT2[0 if layer == 1 else 1][br_idx - 1] * 1000
        sr = SR[sr_idx] // 2
    else:
        br = BIT1[layer - 1][br_idx - 1] * 1000
        sr = SR[sr_idx]
    n = (12 * br // sr) * 4 if layer == 1 else 144 * br // sr
    rng = np.random.RandomState(seed)
    out = bytearray()
    for _ in range(frames):
        h = (0x7FF << 21) | ((0 if lsf else 1) << 19) | (1 << 20) | \
            ((4 - layer) << 17) | ((0 if protection else 1) << 16) | \
            (br_idx << 12) | (sr_idx << 10) | (mode << 6)
        out += h.to_bytes(4, "big") + \
            bytes(rng.randint(0, 256, n - 4, dtype=np.uint8))
    return bytes(out) + b"\x00" * 16


def _check(data):
    ref, rfreq, rchn = Oracle(2, 44100).mp3_decode(data)
    mine, mfreq, mchn = mp3.decode(data)
    np.testing.assert_array_equal(mine, ref)
    if len(ref):
        assert (mfreq, mchn) == (rfreq, rchn)
    return len(ref)


@pytest.mark.parametrize("br_idx,sr_idx,mode", [
    (14, 0, 3), (8, 1, 0), (12, 0, 1), (3, 0, 0), (10, 1, 1)])
def test_layer1_bit_exact(br_idx, sr_idx, mode):
    """Random payloads: decoded frames and BADBITALLOC skips match."""
    _check(_stream(1, br_idx, sr_idx, mode, 25, 100 + br_idx + sr_idx))


@pytest.mark.parametrize("br_idx,sr_idx,mode", [
    (14, 0, 3), (8, 1, 0), (5, 2, 2), (12, 0, 1), (3, 0, 0), (10, 1, 1)])
def test_layer2_bit_exact(br_idx, sr_idx, mode):
    """Random payloads are valid Layer II frames by construction."""
    n = _check(_stream(2, br_idx, sr_idx, mode, 25, 200 + br_idx + sr_idx))
    if mode != 3:  # single-channel >192 kbps is BADMODE
        assert n > 0


@pytest.mark.parametrize("br_idx,mode", [(8, 0), (5, 3)])
def test_layer2_lsf(br_idx, mode):
    """MPEG-2 LSF Layer II (quantization table index 4)."""
    assert _check(_stream(2, br_idx, 1, mode, 25, 77, lsf=True)) >= 0


def test_crc_mismatch_skips_frames():
    """Random CRC words never match: both sides skip every frame."""
    assert _check(_stream(2, 8, 1, 0, 10, 5, protection=True)) == 0


def test_layer1_valid_crc_roundtrip():
    """Forge correct CRC words (seed over header bits 16-31, then the
    allocation bits, frame.c:155 / layer12.c:120-130) so the protected
    path decodes — validates _bit_crc against the reference."""
    br, sr = 256000, 44100
    n = (12 * br // sr) * 4
    rng = np.random.RandomState(42)
    out = bytearray()
    for _ in range(12):
        h = (0x7FF << 21) | (1 << 20) | (1 << 19) | (3 << 17) | \
            (12 << 12) | (3 << 6)  # layer I, protection ON, single chn
        frame = bytearray(h.to_bytes(4, "big")) + b"\x00\x00"
        body = bytearray(rng.randint(0, 256, n - 6, dtype=np.uint8))
        for i in range(16):  # keep the 32 allocation nibbles != 15
            b0 = body[i]
            if (b0 >> 4) == 15:
                b0 = (b0 & 0x0F) | (14 << 4)
            if (b0 & 0x0F) == 15:
                b0 = (b0 & 0xF0) | 14
            body[i] = b0
        frame += bytes(body)
        seed_crc = mp3._bit_crc(bytes(frame), 16, 16, 0xFFFF)
        crc = mp3._bit_crc(bytes(frame), 48, 128, seed_crc)
        frame[4], frame[5] = crc >> 8, crc & 0xFF
        out += frame
    data = bytes(out) + b"\x00" * 16
    n_samples = _check(data)
    assert n_samples > 0, "valid-CRC frames were rejected"


def test_mixed_layer_stream():
    """Layer switches mid-stream decode like the reference."""
    a = _stream(2, 8, 1, 0, 8, 11)[:-16]
    b = _stream(1, 12, 1, 0, 8, 12)[:-16]
    c = _stream(2, 5, 1, 0, 8, 13)
    _check(a + b + c)

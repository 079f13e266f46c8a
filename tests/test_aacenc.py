"""AAC-LC encoder parity vs the compiled reference (faac 1.29.9.2 via
aacType.c's aac_encode): the gate is BYTE-IDENTICAL ADTS output."""
import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.codecs import aacenc
from wmix_tpu.codecs import wav as wavc

pytestmark = pytest.mark.heavy


def _mine(pcm, chn, freq):
    enc = None
    out = b""
    step = 1024 * chn
    for i in range(0, pcm.size - step + 1, step):
        enc, blob = aacenc.aac_encode(enc, pcm[i:i + step].tobytes(),
                                      chn, freq)
        out += blob
    return out


@requires_oracle
def test_mono_8k_fixture_byte_exact():
    from oracle.bindings import Oracle
    hdr, data = wavc.read("/root/reference/audio/1x8000.wav")
    pcm = np.frombuffer(data, np.int16)[:1024 * 60]
    assert Oracle().aac_encode(pcm, 1, 8000) == _mine(pcm, 1, 8000)


@requires_oracle
def test_stereo_16k_fixture_byte_exact():
    from oracle.bindings import Oracle
    hdr, data = wavc.read("/root/reference/audio/2x16000.wav")
    pcm = np.frombuffer(data, np.int16)
    assert Oracle().aac_encode(pcm, 2, 16000) == _mine(pcm, 2, 16000)


@requires_oracle
def test_silence_and_tones_byte_exact():
    from oracle.bindings import Oracle
    o = Oracle()
    z = np.zeros(1024 * 6 * 2, np.int16)
    assert o.aac_encode(z, 2, 16000) == _mine(z, 2, 16000)

    rng = np.random.RandomState(9)
    t = np.arange(1024 * 12) / 44100.0
    sig = sum(np.sin(2 * np.pi * f * t + p) * a
              for f, p, a in [(440, 0, 9000), (1320, 1, 5000),
                              (3500, 2, 2500)])
    st = np.empty(1024 * 12 * 2, np.int16)
    st[0::2] = sig.astype(np.int16)
    st[1::2] = (sig * 0.7 + rng.randn(t.size) * 200).astype(np.int16)
    assert o.aac_encode(st, 2, 44100) == _mine(st, 2, 44100)


@requires_oracle
def test_transients_force_short_blocks_byte_exact():
    from oracle.bindings import Oracle
    rng = np.random.RandomState(5)
    n = 1024 * 10
    pcm = (rng.randn(n) * 100).astype(np.int16)
    for k in range(2, 9, 2):  # clicks to trigger window switching
        pcm[k * 1024 + 37:k * 1024 + 37 + 64] = 30000
    assert Oracle().aac_encode(pcm, 1, 16000) == _mine(pcm, 1, 16000)

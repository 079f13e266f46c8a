"""G.711 parity: LUT codec vs the C reference (src/g711codec.c)."""
import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.ops import g711

ALL_I16 = np.arange(-32768, 32768, dtype=np.int16)
ALL_U8 = np.arange(256, dtype=np.uint8)


@requires_oracle
def test_encode_alaw_exhaustive():
    from oracle.bindings import Oracle
    o = Oracle()
    assert np.array_equal(g711.np_encode_alaw(ALL_I16),
                          o.g711a_encode(ALL_I16))


@requires_oracle
def test_encode_ulaw_exhaustive():
    from oracle.bindings import Oracle
    o = Oracle()
    assert np.array_equal(g711.np_encode_ulaw(ALL_I16),
                          o.g711u_encode(ALL_I16))


@requires_oracle
def test_decode_alaw_exhaustive():
    from oracle.bindings import Oracle
    o = Oracle()
    assert np.array_equal(g711.np_decode_alaw(ALL_U8),
                          o.g711a_decode(ALL_U8))


@requires_oracle
def test_decode_ulaw_exhaustive():
    from oracle.bindings import Oracle
    o = Oracle()
    assert np.array_equal(g711.np_decode_ulaw(ALL_U8),
                          o.g711u_decode(ALL_U8))


def test_jax_matches_numpy():
    pcm = np.random.RandomState(0).randint(-32768, 32768, 4096).astype(
        np.int16)
    assert np.array_equal(np.asarray(g711.encode_alaw(pcm)),
                          g711.np_encode_alaw(pcm))
    assert np.array_equal(np.asarray(g711.encode_ulaw(pcm)),
                          g711.np_encode_ulaw(pcm))
    assert np.array_equal(np.asarray(g711.decode_alaw(ALL_U8)),
                          g711.np_decode_alaw(ALL_U8))
    assert np.array_equal(np.asarray(g711.decode_ulaw(ALL_U8)),
                          g711.np_decode_ulaw(ALL_U8))


def test_roundtrip_sane():
    """A-law roundtrip error is bounded by segment quantization."""
    dec = g711.np_decode_alaw(g711.np_encode_alaw(ALL_I16))
    err = np.abs(dec.astype(np.int32) - ALL_I16.astype(np.int32))
    assert err.max() <= 1024  # top segment step/2 + bias

"""Resampler parity: pcm_zoom / len_of_* vs the C reference
(src/wmix.c:49-222), across all the rate pairs the daemon encounters."""
import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.ops import resample

RATES = [8000, 16000, 32000, 44100, 22050, 11025, 48000]


def _sig(n, chn, seed=0):
    r = np.random.RandomState(seed)
    return r.randint(-32768, 32768, n * chn).astype(np.int16).tobytes()


@requires_oracle
@pytest.mark.parametrize("in_freq", RATES)
@pytest.mark.parametrize("out_freq", [8000, 16000, 44100])
def test_pcm_zoom_mono(in_freq, out_freq):
    from oracle.bindings import Oracle
    o = Oracle()
    data = _sig(4096, 1)
    got = resample.pcm_zoom(1, in_freq, data, 1, out_freq)
    want = o.pcm_zoom(1, in_freq, data, 1, out_freq)
    assert got == want


@requires_oracle
@pytest.mark.parametrize("in_chn,out_chn", [(1, 2), (2, 1), (2, 2)])
@pytest.mark.parametrize("in_freq,out_freq", [(16000, 8000), (8000, 16000),
                                              (44100, 16000), (16000, 16000)])
def test_pcm_zoom_channels(in_chn, out_chn, in_freq, out_freq):
    from oracle.bindings import Oracle
    o = Oracle()
    data = _sig(2048, in_chn)
    got = resample.pcm_zoom(in_chn, in_freq, data, out_chn, out_freq)
    want = o.pcm_zoom(in_chn, in_freq, data, out_chn, out_freq)
    assert got == want


@requires_oracle
@pytest.mark.parametrize("in_freq", RATES)
@pytest.mark.parametrize("out_freq", RATES)
def test_len_functions(in_freq, out_freq):
    from oracle.bindings import Oracle
    o = Oracle()
    for in_chn, out_chn in [(1, 1), (1, 2), (2, 1), (2, 2)]:
        for n in [320, 642, 4096]:
            assert resample.len_of_out(in_chn, in_freq, n, out_chn,
                                       out_freq) == \
                o.len_of_out(in_chn, in_freq, n, out_chn, out_freq), \
                (in_chn, in_freq, n, out_chn, out_freq)
            assert resample.len_of_in(in_chn, in_freq, out_chn, out_freq,
                                      n) == \
                o.len_of_in(in_chn, in_freq, out_chn, out_freq, n), \
                (in_chn, in_freq, out_chn, out_freq, n)


def test_zoom_identity():
    data = _sig(1000, 1)
    assert resample.pcm_zoom(1, 8000, data, 1, 8000) == data

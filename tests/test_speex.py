"""Speex AEC alternate backend (speex-1.2beta3 mdf.c via speexType.c).

The deployed configuration (spx_aec_init with delayms=0 -> M=0
partitions, src/wmix.c:665) is gated BIT-EXACTLY against the compiled
beta3 library, including the speexType far-end plumbing quirk.  The
M>0 adaptation path uses an rfft-mapped transform and is held to a
behavioral bound.
"""
import ctypes as C
import os

import numpy as np
import pytest

from wmix_tpu.dsp import speex_aec

PROBE = "/root/repo/.oracle/libspeex_probe.so"

pytestmark = pytest.mark.skipif(not os.path.exists(PROBE),
                                reason="speex probe not built")


def _lib():
    lib = C.CDLL(PROBE)
    lib.speex_echo_state_init.restype = C.c_void_p
    lib.speex_echo_cancellation.argtypes = [C.c_void_p] * 4
    return lib


def _ref_quirk_run(sig, pkg, filter_length=0):
    """The speexType call pattern: far_end = previous output."""
    lib = _lib()
    st = lib.speex_echo_state_init(pkg, filter_length)
    outbuf = np.zeros(pkg, np.int16)
    outs = []
    for k in range(len(sig) // pkg):
        near = sig[k * pkg:(k + 1) * pkg].copy()
        far = outbuf.copy()
        out = np.zeros(pkg, np.int16)
        lib.speex_echo_cancellation(
            st, near.ctypes.data_as(C.c_void_p),
            far.ctypes.data_as(C.c_void_p),
            out.ctypes.data_as(C.c_void_p))
        outbuf = out
        outs.append(out.copy())
    return np.concatenate(outs)


@pytest.mark.parametrize("freq,pkg", [(8000, 160), (16000, 160)])
def test_deployed_config_bit_exact(freq, pkg):
    rng = np.random.RandomState(7)
    n = pkg * 40
    sig = (np.sin(2 * np.pi * 440 * np.arange(n) / freq) * 9000 +
           rng.randn(n) * 500).astype(np.int16)
    ref = _ref_quirk_run(sig, pkg)
    proc = speex_aec.SpxAecProcessor(1, freq, 20, 0)
    mine = proc.process2(np.zeros(n, np.int16), sig)
    np.testing.assert_array_equal(mine, ref)


def test_deployed_config_saturation_and_dc():
    pkg = 160
    n = pkg * 10
    sig = np.full(n, 32500, np.int16)  # mic saturation zeroing path
    sig[::2] = -32500
    ref = _ref_quirk_run(sig, pkg)
    proc = speex_aec.SpxAecProcessor(1, 8000, 20, 0)
    mine = proc.process2(np.zeros(n, np.int16), sig)
    np.testing.assert_array_equal(mine, ref)


def test_stereo_left_channel_duplication():
    pkg = 160
    n = pkg * 6
    rng = np.random.RandomState(3)
    left = (rng.randn(n) * 4000).astype(np.int16)
    inter = np.empty(n * 2, np.int16)
    inter[0::2] = left
    inter[1::2] = 12345  # right channel discarded by the wrapper
    ref = _ref_quirk_run(left, pkg)
    proc = speex_aec.SpxAecProcessor(2, 8000, 20, 0)
    out = proc.process2(np.zeros(n * 2, np.int16), inter)
    np.testing.assert_array_equal(out[0::2], ref)
    np.testing.assert_array_equal(out[1::2], ref)  # duplicated


def test_m_positive_behavioral():
    """M>0 (not deployed): the port must act as an echo canceller —
    feeding the same signal as near and far converges to attenuation."""
    pkg = 160
    st = speex_aec.SpeexEchoState(pkg, 1024)
    rng = np.random.RandomState(5)
    atten_in = atten_out = 1e-9
    for k in range(100):
        far = (rng.randn(pkg) * 8000).astype(np.int16)
        near = (far * 0.5).astype(np.int16)  # pure echo
        out = speex_aec.echo_cancellation(st, near, far)
        if k >= 80:
            atten_in += float(np.mean(near.astype(np.float64) ** 2))
            atten_out += float(np.mean(out.astype(np.float64) ** 2))
    assert atten_out < 0.2 * atten_in, \
        f"no echo attenuation: {atten_out / atten_in}"

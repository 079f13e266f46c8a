"""AECM (mobile echo canceller) backend parity.

The port in wmix_tpu/dsp/aecm.py reimplements the reference's vendored
webrtc AECM (aecm_core.c / aecm_core_c.c / echo_control_mobile.c plus
the binary delay estimator, delay_estimator*.c) in exact int16/int32
arithmetic.  These tests gate it BIT-EXACTLY against the compiled
reference probe (.oracle/libaecm_probe.so, built with -Dstatic= so the
per-block internals are callable):

- the spl real FFT pair (complex_fft.c mode 1, order 7)
- WebRtcAecm_ProcessBlock on echoey scenes at 8 k and 16 k
- the full WebRtcAecm_Process wrapper (startup state machine, farend
  ring buffer, buffer-delay estimation)
- the daemon deployment semantics of src/webrtc.c aec_process2 with
  MAKE_WEBRTC_AEC undefined (left channel only, output duplicated)
"""
import ctypes as C
import os

import numpy as np
import pytest

from wmix_tpu.dsp import aecm

PROBE = "/root/repo/.oracle/libaecm_probe.so"

pytestmark = pytest.mark.skipif(not os.path.exists(PROBE),
                                reason="aecm probe not built")


@pytest.fixture(scope="module")
def lib():
    lib = C.CDLL(PROBE)
    lib.WebRtcSpl_Init()
    lib.WebRtcAecm_Create.argtypes = [C.POINTER(C.c_void_p)]
    lib.WebRtcAecm_Init.argtypes = [C.c_void_p, C.c_int32]
    lib.WebRtcAecm_BufferFarend.argtypes = [C.c_void_p, C.c_void_p,
                                            C.c_int16]
    lib.WebRtcAecm_Process.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p,
                                       C.c_void_p, C.c_int16, C.c_int16]
    lib.WebRtcAecm_CreateCore.argtypes = [C.POINTER(C.c_void_p)]
    lib.WebRtcAecm_InitCore.argtypes = [C.c_void_p, C.c_int]
    lib.WebRtcAecm_ProcessBlock.argtypes = [C.c_void_p] + [C.c_void_p] * 4
    return lib


def _clear_farend_old(inst):
    """Zero the reference's farendOld[1]: its Init memsets 160 BYTES
    over the 2x80-int16 array (echo_control_mobile.c:204), leaving
    slot 1 as malloc garbage that leaks into the far signal on buffer
    underrun.  Our port zeroes both slots (the memset's clear intent),
    so the parity baseline must too.  offsetof(AecMobile, farendOld)
    == 16 (sampFreq, scSampFreq, bufSizeStart+pad, knownDelay)."""
    C.memset(inst.value + 16 + 160, 0, 160)


def _scene(freq, blocks, lag, seed=7):
    rng = np.random.RandomState(seed)
    n = blocks * 64
    far = (rng.randn(n) * 6000).astype(np.int16)
    echo = (np.roll(far, lag).astype(np.int32) // 2)
    echo[:lag] = 0
    near = np.clip(echo + (rng.randn(n) * 300).astype(np.int32),
                   -32768, 32767).astype(np.int16)
    return far, near


def test_real_fft_pair_exact(lib):
    """spl RealForward/InverseFFT order 7 vs complex_fft.c mode 1."""
    lib.WebRtcSpl_CreateRealFFT.restype = C.c_void_p
    fft = lib.WebRtcSpl_CreateRealFFT(7)
    rng = np.random.RandomState(3)
    for _ in range(8):
        x = (rng.randn(128) * 8000).astype(np.int16)
        out_c = np.zeros(130, np.int16)
        lib.WebRtcSpl_RealForwardFFT(C.c_void_p(fft),
                                     x.ctypes.data_as(C.c_void_p),
                                     out_c.ctypes.data_as(C.c_void_p))
        mine = aecm.real_forward_fft(x.astype(np.int64))
        np.testing.assert_array_equal(mine, out_c.astype(np.int64))
        back_c = np.zeros(128, np.int16)
        sc = lib.WebRtcSpl_RealInverseFFT(C.c_void_p(fft),
                                          out_c.ctypes.data_as(C.c_void_p),
                                          back_c.ctypes.data_as(C.c_void_p))
        back_m, sm = aecm.real_inverse_fft(out_c.astype(np.int64))
        assert sm == sc
        np.testing.assert_array_equal(back_m, back_c.astype(np.int64))


@pytest.mark.parametrize("freq", [8000, 16000])
def test_process_block_bit_exact(lib, freq):
    """aecm_core_c.c ProcessBlock: 150 echoey 64-sample blocks."""
    far, near = _scene(freq, 150, lag=128)
    core_c = C.c_void_p()
    lib.WebRtcAecm_CreateCore(C.byref(core_c))
    lib.WebRtcAecm_InitCore(core_c, freq)
    core = aecm.AecmCore()
    core.init(freq)
    out_c = np.zeros(80, np.int16)
    for k in range(150):
        fb = far[k * 64:(k + 1) * 64]
        nb = near[k * 64:(k + 1) * 64]
        lib.WebRtcAecm_ProcessBlock(core_c, fb.ctypes.data_as(C.c_void_p),
                                    nb.ctypes.data_as(C.c_void_p), None,
                                    out_c.ctypes.data_as(C.c_void_p))
        mine = core.process_block(fb.astype(np.int64), nb.astype(np.int64))
        np.testing.assert_array_equal(
            np.asarray(mine, np.int64)[:64], out_c[:64].astype(np.int64),
            err_msg=f"block {k}")


@pytest.mark.parametrize("freq,delayms", [(8000, 0), (8000, 40),
                                          (16000, 0), (16000, 25)])
def test_mobile_wrapper_bit_exact(lib, freq, delayms):
    """echo_control_mobile.c Process: startup + steady state."""
    pkg = 80 * (freq // 8000)
    frames = 200
    far, near = _scene(freq, frames * pkg // 64, lag=pkg)
    far, near = far[:frames * pkg], near[:frames * pkg]
    inst = C.c_void_p()
    lib.WebRtcAecm_Create(C.byref(inst))
    lib.WebRtcAecm_Init(inst, freq)
    _clear_farend_old(inst)
    mine = aecm.AecMobile(freq)
    out_c = np.zeros(pkg, np.int16)
    for k in range(frames):
        f = far[k * pkg:(k + 1) * pkg]
        d = near[k * pkg:(k + 1) * pkg]
        lib.WebRtcAecm_BufferFarend(inst, f.ctypes.data_as(C.c_void_p),
                                    pkg)
        lib.WebRtcAecm_Process(inst, d.ctypes.data_as(C.c_void_p), None,
                               out_c.ctypes.data_as(C.c_void_p), pkg,
                               delayms)
        mine.buffer_farend(f.astype(np.int64))
        out_m = mine.process(d.astype(np.int64), delayms)
        np.testing.assert_array_equal(out_m, out_c.astype(np.int64),
                                      err_msg=f"frame {k}")


def test_processor_deployed_semantics(lib):
    """src/webrtc.c aec_process2 (AECM branch): stereo input is reduced
    to the left channel and the mono result duplicated to all channels;
    8 k uses 20 ms packages when interval is a multiple of 20."""
    freq, pkg = 8000, 160  # 20 ms at 8 k
    frames = 60
    far, near = _scene(freq, frames * pkg // 64, lag=128)
    far, near = far[:frames * pkg], near[:frames * pkg]

    inst = C.c_void_p()
    lib.WebRtcAecm_Create(C.byref(inst))
    lib.WebRtcAecm_Init(inst, freq)
    _clear_farend_old(inst)
    ref = np.zeros(frames * pkg, np.int16)
    out_c = np.zeros(pkg, np.int16)
    for k in range(frames):  # webrtc.c drives 160-sample (20 ms) packages
        f = far[k * pkg:(k + 1) * pkg]
        d = near[k * pkg:(k + 1) * pkg]
        lib.WebRtcAecm_BufferFarend(inst, f.ctypes.data_as(C.c_void_p),
                                    pkg)
        lib.WebRtcAecm_Process(inst, d.ctypes.data_as(C.c_void_p), None,
                               out_c.ctypes.data_as(C.c_void_p), pkg, 0)
        ref[k * pkg:(k + 1) * pkg] = out_c

    # interleave stereo: right channel is garbage the wrapper must drop
    far2 = np.empty(frames * pkg * 2, np.int16)
    near2 = np.empty(frames * pkg * 2, np.int16)
    far2[0::2], far2[1::2] = far, 11111
    near2[0::2], near2[1::2] = near, -22222
    proc = aecm.AecmProcessor(2, freq, 20)
    out = proc.process2(far2, near2, 0)
    np.testing.assert_array_equal(out[0::2], ref)
    np.testing.assert_array_equal(out[1::2], ref)


def test_unsupported_rate_raises():
    with pytest.raises(ValueError):
        aecm.AecMobile(32000)
    with pytest.raises(ValueError):
        aecm.AecmProcessor(1, 32000, 20)

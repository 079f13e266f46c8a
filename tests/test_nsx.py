"""NSX (fixed-point noise suppression) backend parity.

The port in wmix_tpu/dsp/nsx.py reimplements the reference's vendored
fixed-point NS (nsx_core.c / nsx_core_c.c / noise_suppression_x.c) in
exact int16/int32/uint32 arithmetic.  Gated BIT-EXACTLY against the
compiled reference probe (.oracle/libnsx_probe.so) across sample rates,
band counts (the wmix wrapper passes CHANNELS as bands), policies, the
zero-input path and both startup boundaries (END_STARTUP_SHORT/LONG)
plus the 512-block feature-threshold update.
"""
import ctypes as C
import os

import numpy as np
import pytest

from wmix_tpu.dsp import nsx

PROBE = "/root/repo/.oracle/libnsx_probe.so"

pytestmark = pytest.mark.skipif(not os.path.exists(PROBE),
                                reason="nsx probe not built")


@pytest.fixture(scope="module")
def lib():
    lib = C.CDLL(PROBE)
    lib.WebRtcSpl_Init()
    lib.WebRtcNsx_Create.argtypes = [C.POINTER(C.c_void_p)]
    lib.WebRtcNsx_Init.argtypes = [C.c_void_p, C.c_uint32]
    lib.WebRtcNsx_set_policy.argtypes = [C.c_void_p, C.c_int]
    lib.WebRtcNsx_Process.argtypes = [C.c_void_p, C.POINTER(C.c_void_p),
                                      C.c_int, C.POINTER(C.c_void_p)]
    return lib


def _sig(freq, frames, blk, band=0, zero_stretch=False):
    rng = np.random.RandomState(5)
    t = np.arange(frames * blk)
    s = (np.sin(2 * np.pi * (440 + band * 220) * t / freq) * 6000 *
         (t % (freq // 2) < freq // 4) +
         rng.randn(frames * blk) * 800).astype(np.int16)
    if zero_stretch:
        s[20 * blk:30 * blk] = 0  # exercise zeroInputSignal
    return s


def _run_parity(lib, freq, nb, policy, frames, zero_stretch=False):
    blk = 160 if freq >= 16000 else 80
    sig = [_sig(freq, frames, blk, b, zero_stretch) for b in range(nb)]
    inst = C.c_void_p()
    lib.WebRtcNsx_Create(C.byref(inst))
    lib.WebRtcNsx_Init(inst, freq)
    lib.WebRtcNsx_set_policy(inst, policy)
    mine = nsx.NoiseSuppressionFixed(freq)
    mine.set_policy(policy)
    out_c = [np.zeros(blk, np.int16) for _ in range(nb)]
    for k in range(frames):
        fins = [sig[b][k * blk:(k + 1) * blk].copy() for b in range(nb)]
        pin = (C.c_void_p * nb)(
            *[C.cast(f.ctypes.data, C.c_void_p) for f in fins])
        pout = (C.c_void_p * nb)(
            *[C.cast(o.ctypes.data, C.c_void_p) for o in out_c])
        lib.WebRtcNsx_Process(inst, pin, nb, pout)
        oms = [np.zeros(blk, np.int64) for _ in range(nb)]
        mine.process([f.astype(np.int64) for f in fins], oms)
        for b in range(nb):
            np.testing.assert_array_equal(
                oms[b], out_c[b].astype(np.int64),
                err_msg=f"frame {k} band {b}")


@pytest.mark.parametrize("freq", [8000, 16000, 32000])
@pytest.mark.parametrize("nb", [1, 2])
def test_bit_exact_rates_and_bands(lib, freq, nb):
    """Deployed policy (NS_AGGRESSIVE=2) across rates and band counts;
    100 frames covers END_STARTUP_SHORT (50)."""
    _run_parity(lib, freq, nb, policy=2, frames=100)


@pytest.mark.parametrize("policy", [0, 1, 3])
def test_bit_exact_policies(lib, policy):
    _run_parity(lib, 16000, 1, policy, frames=80)


def test_zero_input_path(lib):
    _run_parity(lib, 16000, 1, 2, frames=60, zero_stretch=True)


@pytest.mark.heavy
def test_long_run_crosses_model_update(lib):
    """600 frames: END_STARTUP_LONG (200) and the 512-block
    feature-threshold update both land inside the run."""
    _run_parity(lib, 16000, 1, 2, frames=600)


def test_processor_wrapper_semantics(lib):
    """webrtc.c ns_process with MAKE_WEBRTC_NSX: channels become bands;
    at 32 kHz only the first 160 samples of each 320-sample 10 ms
    package are processed, second half of the output is silence."""
    freq, frames = 32000, 30
    pkg = 320
    sig = _sig(freq, frames, pkg)
    inter = np.empty(frames * pkg * 2, np.int16)
    inter[0::2] = sig
    inter[1::2] = sig // 2
    proc = nsx.NsxProcessor(2, freq, 2)
    out = proc.process(inter).reshape(-1, 2)
    # second half of each 10 ms package must be exactly zero
    z = out.reshape(frames, pkg, 2)[:, 160:, :]
    assert not np.any(z), "32 kHz half-silence quirk not reproduced"
    # and the processed halves must carry audio
    assert np.count_nonzero(out.reshape(frames, pkg, 2)[5:, :160, 0])


def test_unsupported_rate_raises():
    with pytest.raises(ValueError):
        nsx.NoiseSuppressionFixed(44100)
    with pytest.raises(ValueError):
        nsx.NsxProcessor(1, 44100)

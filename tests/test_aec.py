"""AEC parity: the JAX echo canceller vs the C reference wrapper
(src/webrtc.c aec_process2 over the portable-C libwebrtcaec build)."""
import numpy as np
import pytest

from tests.conftest import requires_oracle

from wmix_tpu.dsp import aec  # noqa: E402


pytestmark = pytest.mark.heavy


def _echo_scene(n, freq, seed=0, echo_delay=None, echo_gain=0.4):
    """far = playback; near = delayed attenuated far + speech + noise."""
    r = np.random.RandomState(seed)
    t = np.arange(n) / freq
    far = (np.sin(2 * np.pi * 330 * t) * 6000 +
           np.sin(2 * np.pi * 190 * t) * 3000 *
           (np.sin(2 * np.pi * 1.3 * t) > 0)).astype(np.float64)
    if echo_delay is None:
        echo_delay = freq // 100  # 10 ms echo path
    echo = np.zeros(n)
    echo[echo_delay:] = far[:n - echo_delay] * echo_gain
    speech = (np.sin(2 * np.pi * 240 * t) * 4000 *
              (np.sin(2 * np.pi * 0.7 * t + 1.0) > 0.3))
    near = echo + speech + r.randn(n) * 80
    return (np.clip(far, -32768, 32767).astype(np.int16),
            np.clip(near, -32768, 32767).astype(np.int16))


def _run_parity(freq, chn=1, n_pkgs=25, seed=0, **scene_kw):
    from oracle.bindings import Oracle
    o = Oracle()
    oaec = o.aec(chn=chn, freq=freq, interval_ms=20)
    frame_num = freq // 1000 * 20

    proc = aec.AecProcessor(chn, freq, interval_ms=20)
    far, near = _echo_scene(n_pkgs * frame_num, freq, seed=seed, **scene_kw)
    if chn > 1:
        far = np.repeat(far, chn)
        near = np.repeat(near, chn)
    for i in range(n_pkgs):
        sl = slice(i * frame_num * chn, (i + 1) * frame_num * chn)
        want = oaec.process2(far[sl], near[sl], 0)
        got = proc.process2(far[sl], near[sl], 0)
        bad = np.nonzero(got.astype(np.int64) != want.astype(np.int64))[0]
        assert bad.size == 0, (
            f"pkg {i}: {bad.size} mismatches at {bad[:5]}, "
            f"got {got[bad[:3]]} want {want[bad[:3]]}")


@requires_oracle
def test_aec_8k_mono():
    _run_parity(8000)


@requires_oracle
def test_aec_16k_mono():
    _run_parity(16000)


@requires_oracle
def test_aec_16k_long_run():
    """Longer run crosses the noise-estimate gates and delay-idx updates."""
    _run_parity(16000, n_pkgs=80, seed=3)


@requires_oracle
def test_aec_strong_echo():
    _run_parity(16000, seed=5, echo_gain=0.9)


@requires_oracle
def test_aec_stereo():
    """Stereo wrapper extracts the left channel and duplicates output."""
    _run_parity(16000, chn=2, n_pkgs=15, seed=7)


@requires_oracle
def test_aec_split_far_near_api():
    """aec_setFrameFar + aec_process must match the combined process2
    when driven with the same data split (webrtc.c:286-395)."""
    import ctypes as C
    from oracle.bindings import Oracle, _ptr
    freq = 16000
    o = Oracle()
    lib = o.lib
    oaec = o.aec(chn=1, freq=freq, interval_ms=20)
    proc = aec.AecProcessor(1, freq, interval_ms=20)
    frame_num = freq // 1000 * 20
    far, near = _echo_scene(15 * frame_num, freq, seed=1)
    for i in range(15):
        sl = slice(i * frame_num, (i + 1) * frame_num)
        f = np.ascontiguousarray(far[sl])
        n = np.ascontiguousarray(near[sl])
        wout = np.zeros(frame_num, np.int16)
        lib.aec_setFrameFar(C.c_void_p(oaec.handle), _ptr(f, C.c_int16),
                            frame_num)
        lib.aec_process(C.c_void_p(oaec.handle), _ptr(n, C.c_int16),
                        _ptr(wout, C.c_int16), frame_num, 0)
        proc.set_frame_far(f)
        got = proc.process(n, 0)
        bad = np.nonzero(got.astype(np.int64) != wout.astype(np.int64))[0]
        assert bad.size == 0, f"pkg {i}: {bad.size} mism at {bad[:5]}"

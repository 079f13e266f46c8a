"""AGC parity: the JAX digital AGC vs the C reference wrapper
(src/webrtc.c agc_process over libwebrtcagc, adaptive digital mode)."""
import functools

import numpy as np
import pytest

from tests.conftest import requires_oracle

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wmix_tpu.dsp import agc  # noqa: E402


def _signal(n, kind, seed=0, freq=8000):
    r = np.random.RandomState(seed)
    t = np.arange(n) / freq
    if kind == "speech":
        env = (np.sin(2 * np.pi * 2.1 * t) > -0.4).astype(float)
        sig = (np.sin(2 * np.pi * 200 * t) + 0.5 *
               np.sin(2 * np.pi * 400 * t)) * env * 4000
        return (sig + r.randn(n) * 150).astype(np.int16)
    if kind == "quiet":
        return (r.randn(n) * 60).astype(np.int16)
    if kind == "loud":
        return (np.sin(2 * np.pi * 300 * t) * 28000 +
                r.randn(n) * 500).clip(-32768, 32767).astype(np.int16)
    if kind == "silence_then_speech":
        x = (np.sin(2 * np.pi * 250 * t) * 5000 *
             (np.arange(n) > n // 3)).astype(np.int16)
        return x
    raise ValueError(kind)


@functools.lru_cache(maxsize=None)
def _jitted(chn, freq, value):
    return jax.jit(lambda s, p: agc.process_pkg(s, p, chn, freq, value))


def _run_parity(freq, chn, kind, value=9, n_pkgs=40, seed=0):
    from oracle.bindings import Oracle
    o = Oracle()
    oagc = o.agc(chn=chn, freq=freq, interval_ms=20, value=value)
    frame_num = freq // 1000 * 20

    state = agc.init_state()
    step = _jitted(chn, freq, value)
    sig = _signal(n_pkgs * frame_num * chn, kind, seed=seed, freq=freq)
    for i in range(n_pkgs):
        pkg = sig[i * frame_num * chn:(i + 1) * frame_num * chn]
        want = oagc.process(pkg)
        state, got = step(state, jnp.asarray(pkg, jnp.int32))
        got = np.asarray(got, np.int64)
        bad = np.nonzero(got != want.astype(np.int64))[0]
        assert bad.size == 0, (
            f"pkg {i}: {bad.size} mismatches at {bad[:5]}, "
            f"got {got[bad[:3]]} want {want[bad[:3]]}")


@requires_oracle
@pytest.mark.parametrize("kind", ["speech", "quiet", "loud",
                                  "silence_then_speech"])
def test_agc_8k_mono(kind):
    _run_parity(8000, 1, kind)


@requires_oracle
def test_agc_16k_mono():
    _run_parity(16000, 1, "speech")


@requires_oracle
def test_agc_32k_mono():
    """32 kHz runs 5 ms subpackages (wrapper quirk)."""
    _run_parity(32000, 1, "speech", n_pkgs=15)


@requires_oracle
def test_agc_stereo():
    _run_parity(16000, 2, "speech", seed=2)


@requires_oracle
@pytest.mark.parametrize("value", [0, 3, 20])
def test_agc_gain_values(value):
    _run_parity(8000, 1, "speech", value=value, n_pkgs=20)

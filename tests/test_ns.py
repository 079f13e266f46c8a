"""NS parity: the JAX noise suppressor vs the C reference wrapper
(src/webrtc.c ns_process over libwebrtcns, policy 2)."""
import functools

import numpy as np
import pytest

from tests.conftest import requires_oracle

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wmix_tpu.dsp import ns  # noqa: E402


pytestmark = pytest.mark.heavy


def _signal(n, kind, seed=0, freq=8000):
    r = np.random.RandomState(seed)
    t = np.arange(n) / freq
    if kind == "noisy_speech":
        env = (np.sin(2 * np.pi * 1.7 * t) > -0.2).astype(float)
        sig = (np.sin(2 * np.pi * 180 * t) + 0.6 *
               np.sin(2 * np.pi * 360 * t)) * env * 6000
        return (sig + r.randn(n) * 400).astype(np.int16)
    if kind == "noise":
        return (r.randn(n) * 500).astype(np.int16)
    if kind == "silence_then_tone":
        x = np.zeros(n)
        x[n // 3:] = np.sin(2 * np.pi * 440 * t[n // 3:]) * 5000
        return (x + np.where(np.arange(n) > n // 3, r.randn(n), 0) * 200
                ).astype(np.int16)
    raise ValueError(kind)


@functools.lru_cache(maxsize=None)
def _jitted(chn, freq):
    return jax.jit(lambda s, p: ns.process_pkg(s, p, chn, freq))


def _run_parity(freq, chn, kind, n_pkgs=30, seed=0):
    from oracle.bindings import Oracle
    o = Oracle()
    ons = o.ns(chn=chn, freq=freq)
    frame_num = freq // 1000 * 20

    state = ns.init_state(freq, num_high_bands=max(chn - 1, 0))
    step = _jitted(chn, freq)
    sig = _signal(n_pkgs * frame_num * chn, kind, seed=seed, freq=freq)
    for i in range(n_pkgs):
        pkg = sig[i * frame_num * chn:(i + 1) * frame_num * chn]
        want = ons.process(pkg)
        state, got = step(state, jnp.asarray(pkg, jnp.int32))
        got = np.asarray(got, np.int64)
        bad = np.nonzero(got != want.astype(np.int64))[0]
        assert bad.size == 0, (
            f"pkg {i}: {bad.size} mismatches, first at {bad[:5]}, "
            f"got {got[bad[:5]]} want {want[bad[:5]]}")


@requires_oracle
@pytest.mark.parametrize("kind", ["noisy_speech", "noise",
                                  "silence_then_tone"])
def test_ns_8k_mono(kind):
    _run_parity(8000, 1, kind)


@requires_oracle
def test_ns_16k_mono():
    _run_parity(16000, 1, "noisy_speech")


@requires_oracle
def test_ns_16k_stereo_high_band():
    """Stereo: the right channel rides the NS high-band gain path."""
    _run_parity(16000, 2, "noisy_speech", seed=2)


@requires_oracle
def test_ns_32k_half_block_quirk():
    """At 32 kHz only the first 160 of each 320-sample subpackage is
    processed (wrapper/core blockLen mismatch)."""
    _run_parity(32000, 1, "noisy_speech", seed=3, n_pkgs=12)


@requires_oracle
def test_ns_long_run_threshold_update():
    """>500 processed blocks crosses a model-parameter update window."""
    _run_parity(8000, 1, "noisy_speech", n_pkgs=260, seed=4)

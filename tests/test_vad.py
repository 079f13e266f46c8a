"""VAD parity: the JAX GMM VAD vs the C reference wrapper
(src/webrtc.c vad_process over libwebrtcvad)."""
import numpy as np
import pytest

from tests.conftest import requires_oracle

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wmix_tpu.dsp import vad  # noqa: E402


def _signal(n, kind, seed=0, freq=8000):
    r = np.random.RandomState(seed)
    t = np.arange(n) / freq
    if kind == "noise":
        return (r.randn(n) * 300).astype(np.int16)
    if kind == "speech":
        # modulated harmonics, speech-ish energy bursts
        env = (np.sin(2 * np.pi * 2.5 * t) > 0).astype(float)
        sig = (np.sin(2 * np.pi * 220 * t) + 0.5 *
               np.sin(2 * np.pi * 440 * t) + 0.3 *
               np.sin(2 * np.pi * 880 * t))
        return (sig * env * 8000 + r.randn(n) * 120).astype(np.int16)
    if kind == "silence":
        return np.zeros(n, np.int16)
    if kind == "loud":
        return (r.randn(n) * 15000).clip(-32768, 32767).astype(np.int16)
    raise ValueError(kind)


import functools


@functools.lru_cache(maxsize=None)
def _jitted_step(chn, freq):
    return jax.jit(lambda s, p: vad.process(s, p, chn, freq))


def _run_parity(freq, chn, kind, n_pkgs=30, seed=0):
    from oracle.bindings import Oracle
    o = Oracle()
    ovad = o.vad(chn=chn, freq=freq, interval_ms=20)
    frame_num = freq // 1000 * 20  # 20 ms packages like the daemon

    state = vad.init_state()
    step = _jitted_step(chn, freq)

    sig = _signal(n_pkgs * frame_num * chn, kind, seed=seed, freq=freq)
    for i in range(n_pkgs):
        pkg = sig[i * frame_num * chn:(i + 1) * frame_num * chn]
        want = ovad.process(pkg)
        state, got = step(state, jnp.asarray(pkg, jnp.int32))
        got = np.asarray(got, np.int64)
        assert np.array_equal(got, want.astype(np.int64)), \
            f"pkg {i}: max diff {np.abs(got - want).max()}"


@requires_oracle
@pytest.mark.parametrize("kind", ["noise", "speech", "silence", "loud"])
def test_vad_8k_mono(kind):
    _run_parity(8000, 1, kind)


@requires_oracle
@pytest.mark.parametrize("kind", ["noise", "speech"])
def test_vad_16k_mono(kind):
    _run_parity(16000, 1, kind)


@requires_oracle
@pytest.mark.parametrize("kind", ["noise", "speech"])
def test_vad_32k_mono(kind):
    """32 kHz runs two 10 ms subpackages per call, exercising the
    first-subpackage-only mute quirk."""
    _run_parity(32000, 1, kind)


@requires_oracle
def test_vad_stereo_downmix():
    _run_parity(16000, 2, "speech")


@requires_oracle
def test_vad_long_run_minimum_tracking():
    """>100 packages ages out minimum-tracking entries (vad_sp.c:79-89)."""
    _run_parity(8000, 1, "speech", n_pkgs=130, seed=3)

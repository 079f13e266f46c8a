"""Batched AECM backend parity: the vmappable jnp core
(dsp/aecm_jnp.py) and the engine package step (engine/aecm_step.py)
against the host-numpy reference port (dsp/aecm.py), which is itself
gated sample-for-sample against the compiled C reference
(.oracle/libaecm_probe.so) in tests/test_aecm.py.

Reference: aecm_core.c / echo_control_mobile.c, selected by the daemon
via src/webrtc.c:172-191.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wmix_tpu.dsp import aecm as H
from wmix_tpu.dsp import aecm_jnp as J
from wmix_tpu.dsp.aec import _rand_u_array


def test_fft_parity():
    rng = np.random.RandomState(1)
    for _ in range(4):
        x = rng.randint(-32768, 32768, 128).astype(np.int64)
        want = H.real_forward_fft(x.copy())
        re, im = jax.jit(J.real_forward_fft)(
            jnp.asarray(x[None].astype(np.int32)))
        np.testing.assert_array_equal(np.asarray(re)[0], want[0::2])
        np.testing.assert_array_equal(np.asarray(im)[0], want[1::2])
        ci = rng.randint(-3000, 3000, 130).astype(np.int64)
        wr, wsc = H.real_inverse_fft(ci.copy())
        jr, jsc = jax.jit(J.real_inverse_fft)(
            jnp.asarray(ci[0::2][None].astype(np.int32)),
            jnp.asarray(ci[1::2][None].astype(np.int32)))
        np.testing.assert_array_equal(np.asarray(jr)[0], wr)
        assert int(np.asarray(jsc)[0]) == wsc


def _echo_streams(B, n, freq, seed=3):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / freq
    fars, nears = [], []
    for b in range(B):
        far = (np.sin(2 * np.pi * (300 + 50 * b) * t) * 7000)
        echo = np.zeros_like(far)
        d = freq // 100
        echo[d:] = far[:-d] * 0.5
        near = (echo + np.sin(2 * np.pi * 240 * t) * 3000 *
                (np.sin(2 * np.pi * 0.8 * t + b) > 0.3) +
                rng.randn(n) * 70)
        fars.append(np.clip(far, -32768, 32767).astype(np.int16))
        nears.append(np.clip(near, -32768, 32767).astype(np.int16))
    return np.stack(fars), np.stack(nears)


@pytest.mark.heavy
def test_block_parity_vs_host_core():
    """40 blocks, every state leaf + output bit-exact vs AecmCore."""
    freq = 16000
    core = H.AecmCore()
    core.init(freq)
    st = J.make_init_state(1, freq)
    step = jax.jit(lambda st, f, n, r, hp, tc, nc: J.process_block(
        st, f, n, r, hp, tc, nc, mult=2))
    fars, nears = _echo_streams(1, 40 * 64, freq)
    far_sig = fars[0].astype(np.int64)
    near_sig = nears[0].astype(np.int64)
    for b in range(40):
        far = far_sig[b * 64:(b + 1) * 64]
        near = near_sig[b * 64:(b + 1) * 64]
        hist_pos = core.far_history_pos + 1
        if hist_pos >= H.MAX_DELAY:
            hist_pos = 0
        tot = core.tot_count
        nc = core.noise_est_ctr < 100
        rand, _ = _rand_u_array(core.seed, 64)
        want = core.process_block(far, near)
        st, out = step(st, jnp.asarray(far[None].astype(np.int32)),
                       jnp.asarray(near[None].astype(np.int32)),
                       jnp.asarray(rand.astype(np.int32)),
                       jnp.int32(hist_pos), jnp.int32(tot),
                       jnp.bool_(nc))
        np.testing.assert_array_equal(np.asarray(out)[0], want,
                                      err_msg=f"block {b}")
        np.testing.assert_array_equal(
            np.asarray(st["channel_adapt32"])[0], core.channel_adapt32,
            err_msg=f"block {b} channel")
        np.testing.assert_array_equal(
            np.asarray(st["noise_est"])[0], core.noise_est,
            err_msg=f"block {b} noise_est")


@pytest.mark.heavy
@pytest.mark.parametrize("freq", [16000, 8000])
def test_batch_vs_host_wrapper(freq):
    """AecmBatch == AecmProcessor (aec_process2 AECM branch) bit-exact
    over 60 packages x 2 streams, covering wrapper startup, delay
    compensation, and the stored/adaptive channel arbitration."""
    from wmix_tpu.engine.aecm_step import AecmBatch
    pkg = freq // 1000 * 20
    B, n_pkgs = 2, 60
    fars, nears = _echo_streams(B, n_pkgs * pkg, freq)
    refs = [H.AecmProcessor(1, freq, 20) for _ in range(B)]
    eng = AecmBatch(B, freq)
    for i in range(n_pkgs):
        sl = slice(i * pkg, (i + 1) * pkg)
        got = np.asarray(eng.step(fars[:, sl], nears[:, sl]))
        for b in range(B):
            want = refs[b].process2(fars[b, sl], nears[b, sl], 0)
            np.testing.assert_array_equal(
                got[b].astype(np.int64), want.astype(np.int64),
                err_msg=f"pkg {i} stream {b}")


@pytest.mark.heavy
def test_batch_suppressor_engages():
    """Behavioral: with an active far end the batched AECM's far-energy
    VAD fires and the channel adapts away from the prior.

    (An absolute ERLE gate is deliberately NOT used: the deployed
    configuration — the daemon's aec_process2 with reported delay 0,
    src/webrtc.c AECM branch — measures ~0 dB steady-state ERLE on
    synthetic scenes in the COMPILED C REFERENCE as well; the port is
    bit-exact to that behavior, see the parity tests above.)"""
    from wmix_tpu.engine.aecm_step import AecmBatch
    freq, B = 16000, 2
    pkg = 320
    n = 100 * pkg
    rng = np.random.RandomState(7)
    t = np.arange(n) / freq
    # BURSTY far end: the far-energy VAD tracks the energy minimum, so a
    # steady signal never exceeds farEnergyVAD — speech-like on/off
    # bursts are what fires it (aecm_core.c CalcEnergies)
    gate = (np.sin(2 * np.pi * 1.7 * t) > 0).astype(np.float64)
    far = np.clip(rng.randn(n) * 8000 * gate,
                  -32768, 32767).astype(np.int16)
    echo = np.zeros(n)
    echo[160:] = far[:-160] * 0.6
    near = np.clip(echo, -32768, 32767).astype(np.int16)
    eng = AecmBatch(B, freq)
    vad_fired = False
    for i in range(n // pkg):
        sl = slice(i * pkg, (i + 1) * pkg)
        eng.step(np.stack([far[sl]] * B), np.stack([near[sl]] * B))
        if int(np.asarray(eng.state.core["current_vad"])[0]):
            vad_fired = True
    # far-energy VAD saw the bursts
    assert vad_fired, "far-energy VAD never engaged on bursty far end"
    # NLMS moved the adaptive channel away from the stored prior
    from wmix_tpu.dsp.aecm import K_CHANNEL_STORED_16K
    adapt = np.asarray(eng.state.core["channel_adapt16"])[0]
    assert np.abs(adapt - K_CHANNEL_STORED_16K).max() > 100


@pytest.mark.heavy
def test_record_chain_aecm_backend():
    """RecordChain(aec_backend="aecm") == the daemon chain with the AECM
    branch: AECM behind the playPkgBuff 400 ms far-end FIFO, bit-exact
    on both the per-step and the chunked execution paths
    (src/webrtc.c:172-191 + src/wmix.c:631-659)."""
    from wmix_tpu.engine.chain import RecordChain, AEC_FIFO_PKG_NUM
    freq, pkg = 16000, 320
    B, n_pkgs = 2, 40
    rng = np.random.RandomState(9)
    t = np.arange(n_pkgs * pkg) / freq
    plays, mics = [], []
    for b in range(B):
        far = np.clip(rng.randn(t.size) * 5000,
                      -32768, 32767).astype(np.int16)
        echo = np.zeros(t.size)
        echo[160:] = far[:-160] * 0.5
        mic = np.clip(echo + np.sin(2 * np.pi * 250 * t) * 3000 +
                      rng.randn(t.size) * 60,
                      -32768, 32767).astype(np.int16)
        plays.append(far)
        mics.append(mic)
    plays = np.stack(plays)
    mics = np.stack(mics)

    chain = RecordChain(B, freq, ns_enable=False, agc_enable=False,
                        vad_enable=False, aec_backend="aecm")

    class Ref:
        def __init__(self):
            self.p = H.AecmProcessor(1, freq, 20)
            self.fifo = np.zeros((AEC_FIFO_PKG_NUM, pkg), np.int16)
            self.count = 0

        def step(self, mic, play):
            self.fifo[self.count] = play
            self.count = (self.count + 1) % AEC_FIFO_PKG_NUM
            c = self.count
            g = c - 20
            g = min(max(g, 0), AEC_FIFO_PKG_NUM)
            g = c - g
            g = g - AEC_FIFO_PKG_NUM if g >= AEC_FIFO_PKG_NUM else (
                g + AEC_FIFO_PKG_NUM if g < 0 else g)
            return self.p.process2(self.fifo[g], mic, 0)

    refs = [Ref() for _ in range(B)]
    half = n_pkgs // 2
    for i in range(half):
        sl = slice(i * pkg, (i + 1) * pkg)
        origin, _, _ = chain.step(mics[:, sl], plays[:, sl])
        origin = np.asarray(origin)
        for b in range(B):
            want = refs[b].step(mics[b, sl], plays[b, sl])
            np.testing.assert_array_equal(
                origin[b].astype(np.int64), want.astype(np.int64),
                err_msg=f"step pkg {i} stream {b}")
    K = 5
    for j in range(half, n_pkgs - K + 1, K):
        mc = np.stack([mics[:, (j + k) * pkg:(j + k + 1) * pkg]
                       for k in range(K)])
        pc = np.stack([plays[:, (j + k) * pkg:(j + k + 1) * pkg]
                       for k in range(K)])
        o, _, _ = chain.run_chunk(mc, pc)
        o = np.asarray(o)
        for k in range(K):
            for b in range(B):
                want = refs[b].step(
                    mics[b, (j + k) * pkg:(j + k + 1) * pkg],
                    plays[b, (j + k) * pkg:(j + k + 1) * pkg])
                np.testing.assert_array_equal(
                    o[k, b].astype(np.int64), want.astype(np.int64),
                    err_msg=f"chunk pkg {j + k} stream {b}")

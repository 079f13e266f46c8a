"""Batched-chain geometry coverage beyond mono 8k/16k (VERDICT r2
next-round #6): stereo (chn=2) 16 kHz full chain and mono 32 kHz
NS+AGC+VAD chain, bit-exact vs the compiled C reference at B > 1.

Wrapper quirks covered: NS per-channel handling (src/webrtc.c:612-644),
AEC left-channel extraction + output duplication (:410-483), AGC/VAD
downmix/re-expand, and the daemon's 32 kHz AEC rate gate
(src/wmix.c:615-699: NS/AGC/VAD to 32 kHz, AEC only to 16 kHz).
"""
import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.engine.chain import AEC_FIFO_PKG_NUM, RecordChain
from wmix_tpu.ops import resample

pytestmark = pytest.mark.heavy


class _OracleChainC:
    """One stream of the daemon record chain via the C reference, with
    channel count."""

    def __init__(self, o, freq, chn, aec=True, agc_gain=5):
        self.chn = chn
        self.freq = freq
        self.ns = o.ns(chn=chn, freq=freq)
        self.aec = o.aec(chn=chn, freq=freq, interval_ms=20) \
            if aec else None
        self.agc = o.agc(chn=chn, freq=freq, interval_ms=20,
                         value=agc_gain)
        self.vad = o.vad(chn=chn, freq=freq, interval_ms=20)
        self.pkg = freq // 1000 * 20 * chn
        self.fifo = np.zeros((AEC_FIFO_PKG_NUM, self.pkg), np.int16)
        self.count = 0

    def step(self, mic, play):
        self.fifo[self.count] = play
        self.count = (self.count + 1) % AEC_FIFO_PKG_NUM
        c = self.count
        g = c - 400 // 20
        g = min(max(g, 0), AEC_FIFO_PKG_NUM)
        g = c - g
        g = g - AEC_FIFO_PKG_NUM if g >= AEC_FIFO_PKG_NUM else (
            g + AEC_FIFO_PKG_NUM if g < 0 else g)
        far = self.fifo[g]
        x = self.ns.process(mic)
        if self.aec is not None:
            x = self.aec.process2(far, x, 0)
        x = self.agc.process(x)
        x = self.vad.process(x)
        return x


def _scene(n, freq, seed, echo_gain=0.5):
    r = np.random.RandomState(seed)
    t = np.arange(n) / freq
    far = (np.sin(2 * np.pi * 330 * t) * 6000 +
           np.sin(2 * np.pi * 190 * t) * 3000 *
           (np.sin(2 * np.pi * 1.3 * t) > 0))
    delay = freq // 100
    echo = np.zeros(n)
    echo[delay:] = far[:n - delay] * echo_gain
    speech = (np.sin(2 * np.pi * 240 * t) * 4000 *
              (np.sin(2 * np.pi * 0.7 * t + 1.0) > 0.3))
    near = echo + speech + r.randn(n) * 80
    clip = lambda x: np.clip(x, -32768, 32767).astype(np.int16)
    return clip(far), clip(near)


def _run_geometry(freq, chn, n_pkgs=15, B=2):
    from oracle.bindings import Oracle
    o = Oracle()
    frames = freq // 1000 * 20
    pkg = frames * chn
    aec_on = freq <= 16000

    plays, mics = [], []
    for b in range(B):
        far, near = _scene(n_pkgs * frames, freq, seed=2 + 7 * b,
                           echo_gain=0.4 + 0.2 * b)
        if chn > 1:
            # stereo: slightly different right channel
            farR = np.roll(far, 3)
            nearR = np.roll(near, 5)
            far = np.stack([far, farR], 1).reshape(-1)
            near = np.stack([near, nearR], 1).reshape(-1)
        plays.append(far)
        mics.append(near)
    plays = np.stack(plays)
    mics = np.stack(mics)

    eng = RecordChain(B, freq, chn=chn)
    refs = [_OracleChainC(o, freq, chn, aec=aec_on) for _ in range(B)]

    for i in range(n_pkgs):
        sl = slice(i * pkg, (i + 1) * pkg)
        origin, pkg8k, _ = eng.step(mics[:, sl], plays[:, sl])
        origin = np.asarray(origin)
        pkg8k = np.asarray(pkg8k)
        for b in range(B):
            want = refs[b].step(mics[b, sl], plays[b, sl])
            np.testing.assert_array_equal(
                origin[b].astype(np.int64), want.astype(np.int64),
                err_msg=f"pkg {i} stream {b} (freq={freq} chn={chn})")
            want8k = np.frombuffer(
                resample.pcm_zoom(chn, freq, want.tobytes(), 1, 8000),
                np.int16)
            np.testing.assert_array_equal(
                pkg8k[b].astype(np.int64), want8k.astype(np.int64),
                err_msg=f"pkg {i} stream {b} 8k ring")


@requires_oracle
def test_stereo_16k_full_chain():
    _run_geometry(16000, 2)


@requires_oracle
def test_mono_32k_chain():
    # AEC disabled by the daemon's rate gate; NS/AGC/VAD at 32 kHz
    _run_geometry(32000, 1)


@requires_oracle
def test_stereo_8k_chain():
    _run_geometry(8000, 2, n_pkgs=12)

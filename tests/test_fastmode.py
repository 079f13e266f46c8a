"""Fast-mode consistency: the production (fast) float path must stay
close to the C reference chain.

Exact mode reproduces the C reference bit-for-bit (proven by the oracle
parity suites, test_engine_chain.py); fast mode releases float32
ordering to XLA for TPU throughput (dsp/floatops.py fast_mode) and swaps
the unrolled Ooura FFT for one XLA Fft op (ops/rdft._fast_rdft).
Reordered rounding can move int16 outputs by a few LSB and the adaptive
AEC/NS state can amplify isolated flips, so the gate is
distribution-based against the C ORACLE chain directly (exact-mode XLA
compiles cost minutes on CPU; the C chain is instant): high correlation +
small mean deviation catches real fast-path bugs (wrong FFT packing,
broken FilterFar vectorization) while tolerating rounding drift.
"""
import os

import numpy as np
import pytest

import wmix_tpu.dsp.floatops as floatops
from tests.conftest import requires_oracle
from tests.test_aec import _echo_scene

pytestmark = pytest.mark.heavy


@requires_oracle
def test_fast_chain_tracks_oracle():
    os.environ["WMIX_FAST"] = "1"
    try:
        assert floatops.fast_mode()
        from tests.test_engine_chain import _OracleChain
        from oracle.bindings import Oracle
        from wmix_tpu.engine.chain import RecordChain

        freq, B, n_pkgs = 16000, 2, 20
        pkg = freq // 1000 * 20
        scenes = [_echo_scene(n_pkgs * pkg, freq, seed=s, echo_gain=g)
                  for s, g in [(2, 0.5), (9, 0.8)]]
        plays = np.stack([s[0] for s in scenes])
        mics = np.stack([s[1] for s in scenes])

        eng = RecordChain(B, freq)
        o = Oracle()
        refs = [_OracleChain(o, freq) for _ in range(B)]

        got, want = [], []
        for i in range(n_pkgs):
            sl = slice(i * pkg, (i + 1) * pkg)
            origin, _, _ = eng.step(mics[:, sl], plays[:, sl])
            got.append(np.asarray(origin))
            want.append(np.stack([
                refs[b].step(mics[b, sl], plays[b, sl])
                for b in range(B)]))
        got = np.concatenate(got, axis=1).astype(np.float64)
        want = np.concatenate(want, axis=1).astype(np.float64)

        denom = np.sqrt(np.mean(got ** 2) * np.mean(want ** 2)) + 1e-9
        corr = np.mean(got * want) / denom
        assert corr > 0.99, f"fast chain decorrelated from oracle: {corr}"
        mad = np.mean(np.abs(got - want))
        rms = np.sqrt(np.mean(want ** 2)) + 1e-9
        assert mad / rms < 0.05, f"fast chain deviates: mad={mad} rms={rms}"
    finally:
        del os.environ["WMIX_FAST"]


def test_fast_mode_flag_resolution():
    # x64 on (conftest) -> exact unless WMIX_FAST
    assert not floatops.fast_mode()
    os.environ["WMIX_FAST"] = "1"
    try:
        assert floatops.fast_mode()
        os.environ["WMIX_EXACT"] = "1"
        assert not floatops.fast_mode()  # EXACT wins
    finally:
        os.environ.pop("WMIX_FAST", None)
        os.environ.pop("WMIX_EXACT", None)

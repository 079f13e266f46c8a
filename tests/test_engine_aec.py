"""Batched-engine AEC vs the single-stream implementation (which is
itself bit-exact vs the C reference): every stream slot of the batch must
match its own AecProcessor run sample for sample."""
import numpy as np
import pytest

from tests.test_aec import _echo_scene
from wmix_tpu.dsp import aec
from wmix_tpu.engine.aec_step import AecBatch, cast_out_int16


pytestmark = pytest.mark.heavy


def _run(freq, n_pkgs, B=3):
    pkg = freq // 1000 * 20
    scenes = [_echo_scene(n_pkgs * pkg, freq, seed=s, echo_gain=g)
              for s, g in [(0, 0.4), (5, 0.9), (11, 0.2)][:B]]
    fars = np.stack([s[0] for s in scenes]).astype(np.float32)
    nears = np.stack([s[1] for s in scenes]).astype(np.float32)

    batch = AecBatch(B, freq)
    singles = [aec.AecProcessor(1, freq, interval_ms=20) for _ in range(B)]

    for i in range(n_pkgs):
        sl = slice(i * pkg, (i + 1) * pkg)
        out = cast_out_int16(np.asarray(batch.step(fars[:, sl],
                                                   nears[:, sl])))
        for b in range(B):
            want = singles[b].process2(
                fars[b, sl].astype(np.int16), nears[b, sl].astype(np.int16),
                0)
            bad = np.nonzero(out[b].astype(np.int64) !=
                             want.astype(np.int64))[0]
            assert bad.size == 0, (
                f"pkg {i} stream {b}: {bad.size} mismatches at {bad[:5]}, "
                f"got {out[b][bad[:3]]} want {want[bad[:3]]}")


def test_engine_aec_16k():
    _run(16000, n_pkgs=12)


def test_engine_aec_8k():
    _run(8000, n_pkgs=10, B=2)


def test_engine_aec_16k_long():
    """Crosses the noise gate (50 blocks) and several delay-idx updates."""
    _run(16000, n_pkgs=30, B=2)

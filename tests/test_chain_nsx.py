"""RecordChain(ns_backend="nsx") — the batched engine-servable NSX
(VERDICT r2 next-round #5, second half).

Ground truth is the host NsxProcessor (bit-exact vs the compiled C,
tests/test_nsx.py) composed per stream; the chain must match bitwise
through its chunked scan execution.
"""
import os

import numpy as np
import pytest
import jax

from wmix_tpu.dsp.nsx import NsxProcessor
from wmix_tpu.engine.chain import RecordChain

pytestmark = pytest.mark.heavy


@pytest.fixture(autouse=True)
def _fast_mode():
    # NSX is exact-int: float fast mode cannot change its output, and
    # the exact-mode chain program compiles ~10x slower on XLA:CPU.
    # The full-chain test compares chain-vs-chain, so fast mode is
    # deterministic there too.
    os.environ["WMIX_FAST"] = "1"
    yield
    del os.environ["WMIX_FAST"]


def _chunks(rng, B, pkg, K, n_chunks, chn=1):
    return (rng.randn(n_chunks, K, B, pkg * chn) * 2500).astype(np.int16)


@pytest.mark.parametrize("freq,chn", [(16000, 1), (8000, 1),
                                      (16000, 2), (32000, 1)])
def test_nsx_only_chain_matches_processor(freq, chn):
    B, K, n_chunks = 3, 4, 2
    pkg = freq // 1000 * 20
    rng = np.random.RandomState(freq % 89 + chn)
    mics = _chunks(rng, B, pkg, K, n_chunks, chn)
    plays = np.zeros_like(mics)

    procs = [NsxProcessor(chn, freq, 2) for _ in range(B)]
    rc = RecordChain(B, freq, chn=chn, ns_backend="nsx",
                     aec_enable=False, agc_enable=False,
                     vad_enable=False)
    for c in range(n_chunks):
        origin, _p8, _v = rc.run_chunk(mics[c], plays[c])
        origin = np.asarray(origin)
        for k in range(K):
            for b in range(B):
                want = procs[b].process(mics[c, k, b])
                np.testing.assert_array_equal(
                    origin[k, b], want,
                    err_msg=f"chunk {c} pkg {k} stream {b}")


def test_multi_stage_chain_nsx_batch_invariant():
    """NSX + AGC + VAD composed in one chain program: B=3 chunked ==
    per-stream B=1.  (The float AEC is left out: its presence makes
    this one program cost an hour of XLA:CPU compile on the test box,
    and AEC x chain composition is already covered by the float-NS and
    AECM chain suites — NSX composes identically as a drop-in v_ns.)"""
    freq, B, K = 16000, 3, 4
    pkg = freq // 1000 * 20
    rng = np.random.RandomState(7)
    mics = (rng.randn(K, B, pkg) * 2500).astype(np.int16)
    plays = (rng.randn(K, B, pkg) * 4000).astype(np.int16)

    kw = dict(ns_backend="nsx", aec_enable=False)
    rc = RecordChain(B, freq, **kw)
    o_b, p8_b, v_b = map(np.asarray, rc.run_chunk(mics, plays))

    for b in range(B):
        rc1 = RecordChain(1, freq, **kw)
        o1, p81, v1 = map(np.asarray, rc1.run_chunk(
            mics[:, b:b + 1], plays[:, b:b + 1]))
        np.testing.assert_array_equal(o_b[:, b], o1[:, 0])
        np.testing.assert_array_equal(p8_b[:, b], p81[:, 0])
        np.testing.assert_array_equal(v_b[:, b], v1[:, 0])

"""Pallas AEC package-kernel parity (interpret mode, CPU).

The pallas path is production-only float32 (fast mode): the bit-parity
burden vs aec_core.c stays on the exact-mode jax path (test_aec.py).
Here the pallas package kernel must agree with the fast-mode jax engine
to float32 reassociation tolerance — this exercises the whole
re-architecture: newest-first shift rings, the 48-sample output carry
replacing the out frame ring (aec_core.c:1406-1446), the engine-state
converter, and the DFT-matmul transforms."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture()
def fast_mode_env():
    old = os.environ.get("WMIX_FAST")
    os.environ["WMIX_FAST"] = "1"
    yield
    if old is None:
        del os.environ["WMIX_FAST"]
    else:
        os.environ["WMIX_FAST"] = old


def _drive(P, B, seed=42):
    rng = np.random.RandomState(seed)
    far = (rng.randn(P, B, 320) * 4000).astype(np.float32)
    near = (np.roll(far, 2, axis=0) * 0.3 +
            rng.randn(P, B, 320) * 800).astype(np.float32)
    return far, near


def test_pallas_package_matches_jax_engine(fast_mode_env):
    from wmix_tpu.engine.aec_step import AecBatch
    from wmix_tpu.engine.aec_pallas import AecBatchPallas

    B, P = 2, 10
    far, near = _drive(P, B)
    a = AecBatch(B, 16000)
    b = AecBatchPallas(B, 16000, tile=B, interpret=True)
    worst = 0.0
    for p in range(P):
        oa = np.asarray(a.step(jnp.asarray(far[p]), jnp.asarray(near[p])))
        ob = np.asarray(b.step(far[p], near[p]))
        rel = np.abs(oa - ob).max() / max(1.0, np.abs(oa).max())
        worst = max(worst, rel)
        if p < 3:
            # startup passthrough must be identical
            np.testing.assert_array_equal(oa, ob)
    assert worst < 1e-4, worst
    # the echo must actually be getting cancelled by the steady path
    # (behavioral guard: output energy < near energy once adapted)
    near_e = float((near[P - 1] ** 2).mean())
    out_e = float((np.asarray(ob) ** 2).mean())
    assert out_e < near_e


def test_chain_pallas_matches_jax(fast_mode_env, monkeypatch):
    """Full RecordChain with WMIX_PALLAS=1 (interpret mode on CPU) vs
    the jax body: startup identical, the first post-startup package
    (irregular out-ring priming) routed to the jax path, steady
    packages within int16 reassociation noise."""
    import importlib
    import numpy as np

    def run(pallas):
        monkeypatch.setenv("WMIX_PALLAS", "1" if pallas else "0")
        from wmix_tpu.engine.chain import RecordChain
        B, K = 2, 9
        rng = np.random.RandomState(0)
        mic = (rng.randn(2 * K, B, 320) * 3000).astype(np.int16)
        play = (rng.randn(2 * K, B, 320) * 5000).astype(np.int16)
        ch = RecordChain(B, 16000)
        outs = []
        for c in range(2):
            o, _p8, _v = ch.run_chunk(mic[c * K:(c + 1) * K],
                                      play[c * K:(c + 1) * K])
            outs.append(np.asarray(o))
        return np.concatenate(outs)

    a = run(False)
    b = run(True)
    # startup + first steady package run the identical jax path
    np.testing.assert_array_equal(a[:4], b[:4])
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert int(d.max()) <= 4, int(d.max())


def test_steady_signature_detector(fast_mode_env):
    from wmix_tpu.engine.aec_plan import AecPlanner
    from wmix_tpu.engine.aec_pallas import is_steady_16k

    p = AecPlanner(16000)
    sigs = [p.plan_pkg().signature() for _ in range(20)]
    # 3 startup packages, then steady forever
    assert [is_steady_16k(s) for s in sigs[:3]] == [False] * 3
    assert all(is_steady_16k(s) for s in sigs[3:])


def test_dft_matrices_match_fast_rdft(fast_mode_env):
    """The kernel's forward/inverse DFT matrices must match the packed
    transforms of ops/rdft.py `_fast_rdft` (the fast-mode reference)."""
    from wmix_tpu.ops.rdft import _fast_rdft
    from wmix_tpu.engine.aec_pallas import _dft_mats

    m = _dft_mats()
    rng = np.random.RandomState(0)
    x = rng.randn(8, 128).astype(np.float32)
    packed = np.asarray(_fast_rdft(jnp.asarray(x), False))
    re = np.concatenate([packed[:, 0:1], packed[:, 2::2],
                         packed[:, 1:2]], axis=1)
    im = np.concatenate([np.zeros((8, 1), np.float32), packed[:, 3::2],
                         np.zeros((8, 1), np.float32)], axis=1)
    got = x @ m["m128"][:, :130]
    np.testing.assert_allclose(got[:, :65], re, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(got[:, 65:], im, rtol=2e-5, atol=2e-4)

"""Minimal repro of the PARITY_r04 int-chain divergence (VERDICT r4 #1).

Runs ONE failing scene (fartalk gain 0.7 seed 25 by default) through the
engine int chain (nsx+aecm backends) vs the intdsp C oracle and reports
the first diverging package and per-stage attribution.

Usage: python tools/repro_int.py [--seed 25] [--kind fartalk]
       [--gain 0.7] [--seconds 60] [--stage full|nsx|aecm|agc|vad]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

if "--cpu" in sys.argv:
    # the env pre-registers the TPU plugin and pins JAX_PLATFORMS; the
    # config update before backend init wins over both (tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")
if "--x64" in sys.argv:
    import jax
    jax.config.update("jax_enable_x64", True)
if "--cache" in sys.argv:
    # persistent compile cache: the engine programs cost ~3 min each on
    # the single-core XLA:CPU; bisection sweeps reuse them
    from wmix_tpu.engine.aec_pallas import _ensure_compile_cache
    _ensure_compile_cache()

from parity import make_scene, oracle_outputs, engine_outputs  # noqa: E402

STAGE_FLAGS = {
    "full": (True, True, True, True),
    "nsx": (True, False, False, False),
    "aecm": (False, True, False, False),
    "agc": (False, False, True, False),
    "vad": (False, False, False, True),
    "nsx_aecm": (True, True, False, False),
    "nsx_aecm_agc": (True, True, True, False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=25)
    ap.add_argument("--kind", default="fartalk")
    ap.add_argument("--gain", type=float, default=0.7)
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--stage", default="full")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--cache", action="store_true")
    args = ap.parse_args()

    freq = 16000
    pkg = freq // 1000 * 20
    n = args.seconds * freq
    flags = STAGE_FLAGS[args.stage]

    plays = np.zeros((args.batch, n), np.int16)
    mics = np.zeros((args.batch, n), np.int16)
    for b in range(args.batch):
        plays[b], mics[b] = make_scene(n, freq, args.kind, args.seed,
                                       args.gain)

    import jax
    print(f"backend={jax.default_backend()} stage={args.stage} "
          f"kind={args.kind} gain={args.gain} seed={args.seed} "
          f"seconds={args.seconds}", file=sys.stderr)

    want = oracle_outputs(plays, mics, freq, flags, variant="intdsp")
    ns_backend = "nsx" if flags[0] else "ns"
    aec_backend = "aecm" if flags[1] else "aec"
    got = engine_outputs(plays, mics, freq, flags,
                         ns_backend=ns_backend, aec_backend=aec_backend)

    err = np.abs(got.astype(np.int64) - want.astype(np.int64))
    print(f"max_lsb={err.max()} n_diff={int((err > 0).sum())} "
          f"pct_exact={float((err == 0).mean() * 100):.4f}")
    if err.max() > 0:
        b, i = np.unravel_index(err.argmax(), err.shape)
        first = int(np.argmax(err[b] > 0))
        print(f"first divergence: stream {b}, sample {first} "
              f"(package {first // pkg}, t={first / freq:.3f}s)")
        print(f"worst: sample {i} (package {i // pkg}), "
              f"got {got[b, i]} want {want[b, i]}")
        # divergence density per second
        per_sec = (err[b].reshape(args.seconds, freq) > 0).sum(axis=1)
        nz = np.nonzero(per_sec)[0]
        print(f"diverging seconds: {nz[:20].tolist()}"
              f"{'...' if len(nz) > 20 else ''}")
        lo = max(0, first - 4)
        print("context got :", got[b, lo:first + 8].tolist())
        print("context want:", want[b, lo:first + 8].tolist())


if __name__ == "__main__":
    main()

"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware; numeric parity is unaffected (int ops are
exact everywhere, and float32 VPU/CPU ops are IEEE).  Benchmarks (bench.py)
run on the real chip.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The float DSP parity path double-rounds f64 transcendentals to f32 like
# the C reference; keep XLA from re-widening those conversions.
if "xla_allow_excess_precision" not in _flags:
    _flags = (_flags + " --xla_allow_excess_precision=false").strip()
os.environ["XLA_FLAGS"] = _flags

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

# Force the CPU backend with 8 virtual devices.  NB the environment may
# pre-register a TPU plugin and pin JAX_PLATFORMS; the config update (made
# before any backend is initialized) wins over both.
jax.config.update("jax_platforms", "cpu")

# The float NS/AEC chains replicate the C reference's double-precision
# transcendentals (log/exp/tanh/pow); on the CPU test backend this runs in
# float64 for bit-parity.  All framework code uses explicit dtypes, so
# enabling x64 does not change integer-path semantics.
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


# Persist compiled executables across test runs and across the per-file
# processes of tests/run_all.sh: the heavy tier's chain programs cost
# minutes each on XLA:CPU and recompile identically every run without
# this.  The cache is keyed per machine (CPU feature hash) and returns
# identical executables, so parity results are unaffected.
try:
    from wmix_tpu.engine.aec_pallas import _ensure_compile_cache
    _ensure_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: long-running parity suite (minutes); deselect with "
        "-m 'not heavy' for the fast tier")


def _oracle_available() -> bool:
    try:
        from oracle import bindings
        return bindings.available()
    except Exception:
        return False


requires_oracle = pytest.mark.skipif(
    not _oracle_available(),
    reason="C-reference oracle not built (run oracle/build_oracle.sh)")

REFERENCE_AUDIO = "/root/reference/audio"


@pytest.fixture(scope="session")
def fixture_dir():
    if not os.path.isdir(REFERENCE_AUDIO):
        pytest.skip("reference audio fixtures not available")
    return REFERENCE_AUDIO

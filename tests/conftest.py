"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware; numeric parity is unaffected (int ops are
exact everywhere, and float32 VPU/CPU ops are IEEE).  Benchmarks (bench.py)
run on the real chip.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import pytest  # noqa: E402


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

"""Ooura rdft parity: JAX butterflies vs the vendored fft4g.c, bit-exact."""
import numpy as np
import pytest

from tests.conftest import requires_oracle

import jax.numpy as jnp  # noqa: E402

from wmix_tpu.ops import rdft  # noqa: E402


def _bits(x):
    return np.asarray(x, np.float32).view(np.uint32)


@requires_oracle
@pytest.mark.parametrize("n", [128, 256])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_bit_exact(n, seed):
    from oracle.bindings import Oracle
    o = Oracle()
    r = np.random.RandomState(seed)
    x = (r.randn(n) * 1000).astype(np.float32)
    want = o.rdft(x)
    got = np.asarray(rdft.rdft(jnp.asarray(x)))
    assert np.array_equal(_bits(got), _bits(want)), \
        f"max abs diff {np.abs(got - want).max()}"


@requires_oracle
@pytest.mark.parametrize("n", [128, 256])
def test_inverse_bit_exact(n):
    from oracle.bindings import Oracle
    o = Oracle()
    r = np.random.RandomState(7)
    x = (r.randn(n) * 1000).astype(np.float32)
    spec = o.rdft(x)  # start from a real spectrum packing
    want = o.rdft(spec, inverse=True)
    got = np.asarray(rdft.rdft(jnp.asarray(spec), inverse=True))
    assert np.array_equal(_bits(got), _bits(want))


@requires_oracle
def test_batched():
    from oracle.bindings import Oracle
    o = Oracle()
    r = np.random.RandomState(3)
    xs = (r.randn(8, 256) * 500).astype(np.float32)
    got = np.asarray(rdft.rdft(jnp.asarray(xs)))
    for i in range(8):
        want = o.rdft(xs[i])
        assert np.array_equal(_bits(got[i]), _bits(want))


def test_roundtrip():
    r = np.random.RandomState(4)
    x = r.randn(256).astype(np.float32)
    spec = rdft.rdft(jnp.asarray(x))
    back = np.asarray(rdft.rdft(spec, inverse=True)) * (2.0 / 256)
    assert np.allclose(back, x, atol=1e-4)

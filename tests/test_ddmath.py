"""Double-float transcendentals (dsp/ddmath.py): agreement with
(float)(float64 op) — the C reference's libm route — measured as a
mismatch RATE over the chain's operating ranges.

The claim is quantified-residual, not bit-exactness (module docstring):
rates must be ~1000x below the f32-native ops' disagreement rate.
Everything runs through jit in pure f32 (the TPU condition; x64 stays
off inside the jitted functions because all inputs/ops are f32)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wmix_tpu.dsp import ddmath

F64 = np.float64


def _rate(got32, want64):
    want = want64.astype(np.float32)
    return float(np.mean(got32 != want))


def _f32_native_rate(fn_np, x):
    native = fn_np(x.astype(np.float32)).astype(np.float32)
    want = fn_np(x.astype(F64)).astype(np.float32)
    return float(np.mean(native != want))


def _ranges_log():
    r = np.random.RandomState(0)
    vals = [np.exp(r.uniform(-20, 21, 200000)),     # magnitudes 1e-9..1e9
            1.0 + np.abs(r.randn(100000)) * 1e3,    # magn >= 1
            r.uniform(1e-10, 1.0, 100000)]          # NLP h_fb_min range
    return np.concatenate(vals).astype(np.float32)


def test_dd_log_rate():
    x = _ranges_log()
    got = np.asarray(jax.jit(ddmath.dd_log)(x))
    want = np.log(x.astype(F64))
    rate = _rate(got, want)
    native = _f32_native_rate(np.log, x)
    assert rate < 2e-5, rate
    assert rate < native / 100, (rate, native)
    # errors never exceed 1 ulp of f32
    bad = got != want.astype(np.float32)
    if bad.any():
        ulp = np.spacing(want.astype(np.float32)[bad])
        assert np.all(np.abs(got[bad] - want[bad].astype(np.float32))
                      <= np.abs(ulp) + 1e-30)


def test_dd_exp_rate():
    r = np.random.RandomState(1)
    # strict range keeps results in the f32 NORMAL range (subnormal
    # outputs double-round through the scaling — documented corner)
    x = np.concatenate([
        r.uniform(-30, 25, 200000),                  # LRT / gain domain
        r.uniform(-1, 1, 100000),
        r.uniform(-87, 88, 100000)]).astype(np.float32)
    got = np.asarray(jax.jit(ddmath.dd_exp)(x))
    want = np.exp(x.astype(F64))
    rate = _rate(got, want)
    native = _f32_native_rate(np.exp, x)
    assert rate < 2e-5, rate
    assert rate < max(native, 1e-7) / 50, (rate, native)


def test_dd_exp_extremes():
    x = np.asarray([-200.0, 120.0, 0.0], np.float32)
    got = np.asarray(ddmath.dd_exp(x))
    assert got[0] == 0.0 and np.isinf(got[1]) and got[2] == 1.0


def test_dd_tanh_rate():
    r = np.random.RandomState(2)
    x = np.concatenate([
        r.uniform(-12, 12, 200000),
        r.uniform(-0.5, 0.5, 100000)]).astype(np.float32)
    got = np.asarray(jax.jit(ddmath.dd_tanh)(x))
    want = np.tanh(x.astype(F64))
    rate = _rate(got, want)
    native = _f32_native_rate(np.tanh, x)
    assert rate < 5e-5, rate
    assert rate < max(native, 1e-7) / 20, (rate, native)


def test_dd_sqrt_rate():
    r = np.random.RandomState(3)
    x = (np.exp(r.uniform(-20, 20, 300000))).astype(np.float32)
    got = np.asarray(jax.jit(ddmath.dd_sqrt)(x))
    want = np.sqrt(x.astype(F64))
    assert _rate(got, want) < 1e-6


def test_dd_pow_div_rate():
    """ns_core.c:1152-1153: num / pow(i, pexp), i in [5, 129],
    pexp in [0, 1]."""
    r = np.random.RandomState(4)
    n = 100000
    num = np.exp(r.uniform(0, 20, n)).astype(np.float32)
    base = r.randint(5, 130, n).astype(np.float32)
    expo = r.uniform(0, 1, n).astype(np.float32)
    got = np.asarray(jax.jit(ddmath.dd_pow_div)(num, base, expo))
    want = (num.astype(F64) /
            np.power(base.astype(F64), expo.astype(F64)))
    rate = _rate(got, want)
    native = float(np.mean(
        (num / np.power(base, expo)).astype(np.float32)
        != want.astype(np.float32)))
    assert rate < 5e-5, rate
    assert rate < max(native, 1e-7) / 20, (rate, native)


def test_dd_div_rate():
    """Correctly-rounded f32 quotient (the x86 divss form).  The
    operand mix covers the chain's division domains: spectral ratios,
    per-band normalizations, probability odds."""
    r = np.random.RandomState(5)
    n = 300000
    a = ((r.rand(n) * 2 - 1) *
         np.exp(r.uniform(-20, 20, n))).astype(np.float32)
    b = ((r.rand(n) * 2 - 1) *
         np.exp(r.uniform(-20, 20, n))).astype(np.float32)
    got = np.asarray(jax.jit(ddmath.dd_div)(a, b))
    want = a.astype(F64) / b.astype(F64)
    assert _rate(got, want) < 1e-6
    # zero/inf operands fall back to the native op, not NaN garbage
    sp = np.asarray(jax.jit(ddmath.dd_div)(
        np.float32([1.0, 0.0, 1.0, -1.0]),
        np.float32([0.0, 1.0, np.inf, 0.0])))
    assert np.isinf(sp[0]) and sp[1] == 0.0 and sp[2] == 0.0 \
        and np.isinf(sp[3]) and sp[3] < 0


def test_dd_sincos_rate():
    """Comfort-noise angles: [0, 2pi) (aec_core.c:478-489); plus a
    wider band to exercise quadrant selection."""
    r = np.random.RandomState(6)
    x = np.concatenate([
        r.uniform(0, 2 * np.pi, 200000),
        r.uniform(-50, 50, 100000)]).astype(np.float32)
    got_s = np.asarray(jax.jit(ddmath.dd_sin)(x))
    got_c = np.asarray(jax.jit(ddmath.dd_cos)(x))
    rate_s = _rate(got_s, np.sin(x.astype(F64)))
    rate_c = _rate(got_c, np.cos(x.astype(F64)))
    native_s = _f32_native_rate(np.sin, x)
    assert rate_s < 2e-5, rate_s
    assert rate_c < 2e-5, rate_c
    assert rate_s < max(native_s, 1e-7) / 20, (rate_s, native_s)


def test_dd_pow_rate():
    """powf(h_nl, od * curve): base in (0, 1], exponent in [1, 40]
    (aec_core.c:1073-1077 OverdriveAndSuppress)."""
    r = np.random.RandomState(7)
    n = 100000
    base = r.uniform(1e-6, 1.0, n).astype(np.float32)
    expo = r.uniform(1.0, 40.0, n).astype(np.float32)
    got = np.asarray(jax.jit(ddmath.dd_pow)(base, expo))
    want = np.power(base.astype(F64), expo.astype(F64))
    # compare only where the f64 result stays in the f32 normal range
    # (subnormal outputs double-round through the scaling — the
    # documented dd_exp corner)
    ok = want > 2e-38
    rate = float(np.mean(got[ok] != want[ok].astype(np.float32)))
    assert rate < 5e-5, rate

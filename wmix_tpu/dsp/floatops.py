"""Float helpers matching the C reference's mixed float/double arithmetic.

The reference's float DSP (ns_core.c, aec_core.c) stores state in float32
but calls libm's double-precision log/exp/tanh/pow/sqrt and immediately
rounds back to float.  For bit-parity the same double-rounding is applied
here when float64 is available (CPU test backend, x64 enabled); on backends
without float64 (TPU) the float32 approximations are used — quality-
identical, and the int16 outputs stay within the parity budget in practice.

Sequential float32 accumulation (`acc += term` loops) is order-sensitive;
`seq_sum` reproduces the left-to-right fold with a lax.scan so vectorized
reductions cannot reorder the rounding.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

F32 = jnp.float32


def fast_mode() -> bool:
    """True when the bit-parity guards should be dropped for speed.

    Exact parity with the C reference requires float64 transcendentals
    (`_via_double`), so it is only attainable when x64 is enabled — the
    CPU parity-test configuration (tests/conftest.py).  On backends
    without x64 (TPU production) the guards cost real throughput while
    buying nothing, so they collapse to plain float32 ops and XLA is free
    to fuse/reassociate.  `WMIX_EXACT=1` forces the guarded forms anyway;
    `WMIX_FAST=1` forces fast mode even under x64 (perf experiments).

    Checked at TRACE time: callers that cache compiled programs must key
    their caches on this flag (the engine builders do)."""
    if os.environ.get("WMIX_EXACT", "") not in ("", "0"):
        return False
    if os.environ.get("WMIX_FAST", "") not in ("", "0"):
        return True
    return not jax.config.jax_enable_x64


def _wide_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def guard_zero(x):
    """A runtime +0.0f the compiler cannot eliminate.

    The x86 backend under XLA:CPU fuses adjacent fmul/fadd pairs into FMA
    at instruction selection, skipping the product's float32 rounding and
    breaking bit-parity with the reference.  Subtracting this zero from
    each such product forces the rounding: even if `a*b - z` is itself
    contracted to fmsub(a, b, z), z == +0 makes the result exactly
    fl32(a*b), and the following add/sub then sees a non-product operand.

    The zero is built as `x0 - x0` from a raw data element: the compiler
    cannot prove x0 is non-NaN, so the subtraction survives to machine
    code (a cleansed/provably-finite formulation gets folded away, and the
    fusion reappears).  Callers must derive it from finite data — all
    audio-path floats are int16-ranged.  x0 - x0 is +0 for every finite
    x0 including -0, so signed zeros flow through gm() unchanged."""
    if fast_mode():
        return jnp.float32(0.0)
    x0 = jnp.asarray(x).ravel()[0].astype(F32)
    return x0 - x0


# Alias kept for call sites that named the guard before the zero form.
guard_one = guard_zero


def gm(a, b, zero):
    """Guarded float32 product, safe to place adjacent to an add/sub."""
    if fast_mode():
        return a * b
    return a * b - zero


def gq(a, b, zero):
    """Guarded float32 quotient: `a/b` with the simplifier's div<->mul
    reassociation (mul(div(a,b),c) -> div(a*c,b) and friends) blocked by
    the trailing exact subtraction.

    On backends without f64 the native f32 division itself is the parity
    hazard: XLA:TPU lowers `div` through reciprocal+refinement and
    disagrees with the reference's correctly-rounded x86 `divss` on
    ~35% of operands (<= 2 ulp, measured — see ddmath.dd_div).  Exact
    mode therefore routes the quotient through the double-float
    refinement there; on x64 backends the native op is already
    correctly rounded."""
    if fast_mode():
        return a / b
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_div(a, b) - zero
    return a / b - zero


def oc(c, zero):
    """Opaque constant: exactly the float32 value of `c`, but runtime-valued
    so the algebraic simplifier cannot rewrite `x / oc(c)` into a
    reciprocal multiply or fold constant multiply chains (both change
    float32 rounding vs the reference's literal arithmetic)."""
    if fast_mode():
        return jnp.float32(c)
    return jnp.float32(c) - zero


def _via_double(fn, x):
    return fn(x.astype(_wide_dtype())).astype(F32)


def _use_dd() -> bool:
    """Exact mode without hardware f64 (the TPU parity configuration):
    route transcendentals through the double-float emulation
    (dsp/ddmath.py) — (float)(f64 op) up to a measured < 1e-5 per-call
    mismatch rate, ~1000x tighter than native f32 ops.  Fast mode keeps
    plain f32 (throughput)."""
    return not fast_mode() and not jax.config.jax_enable_x64


def flog(x):
    """(float)log((double)x)."""
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_log(x)
    return _via_double(jnp.log, x)


def fexp(x):
    """(float)exp((double)x)."""
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_exp(x)
    return _via_double(jnp.exp, x)


def ftanh(x):
    """(float)tanh((double)x)."""
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_tanh(x)
    return _via_double(jnp.tanh, x)


def fsqrt_d(x):
    """(float)sqrt((double)x) — double sqrt is exactly rounded, so this is
    the correctly-rounded route the C takes via libm sqrt()."""
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_sqrt(x)
    return _via_double(jnp.sqrt, x)


def fsqrtf(x):
    """sqrtf(x): correctly rounded on x86 (sqrtss).  jnp.sqrt matches it
    on x64 backends; TPU f32 sqrt disagrees on ~40% of operands
    (measured), so exact mode routes through the dd refinement.
    Identical result to fsqrt_d for f32 inputs (rounding f64 sqrt of an
    f32 value to f32 is exactly f32 sqrt — sqrt double rounding is
    benign), kept as a separate name to document the C call form."""
    if fast_mode():
        return jnp.sqrt(x)
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_sqrt(x)
    return jnp.sqrt(jnp.asarray(x, F32))


def fcosf(x):
    """cosf(x): glibc computes in double and rounds once
    (sysdeps/ieee754/flt-32), so (float)cos((double)x) is the parity
    form; dd emulation without hardware f64."""
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_cos(x)
    return _via_double(jnp.cos, jnp.asarray(x, F32))


def fsinf(x):
    """sinf(x) — see fcosf."""
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_sin(x)
    return _via_double(jnp.sin, jnp.asarray(x, F32))


def fpowf(base, expo):
    """powf — glibc computes in double internally."""
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_pow(base, expo)
    w = _wide_dtype()
    return jnp.power(jnp.asarray(base, F32).astype(w),
                     jnp.asarray(expo, F32).astype(w)).astype(F32)


def fpow_div(num, base, expo):
    """(float)(num / pow(base, expo)) with the division in double, as in
    ns_core.c:1152-1153."""
    if _use_dd():
        from wmix_tpu.dsp import ddmath
        return ddmath.dd_pow_div(num, base, expo)
    w = _wide_dtype()
    d = num.astype(w) / jnp.power(base.astype(w), expo.astype(w))
    return d.astype(F32)


def seq_sum(x, axis: int = -1):
    """Left-to-right float32 fold, reproducing C `for(...) acc += x[i]`.

    In fast mode the fold order is released to XLA (tree reduction)."""
    if fast_mode():
        return jnp.sum(x.astype(F32), axis=axis)
    x = jnp.moveaxis(x.astype(F32), axis, 0)

    def body(acc, v):
        return acc + v, None

    acc, _ = jax.lax.scan(body, jnp.zeros(x.shape[1:], F32), x)
    return acc


def seq_sum_multi(*terms):
    """Fold several same-length term arrays in one scan (they accumulate in
    the same C loop but into independent accumulators)."""
    if fast_mode():
        return tuple(jnp.sum(t.astype(F32), axis=-1) for t in terms)
    stacked = jnp.stack([jnp.moveaxis(t.astype(F32), -1, 0) for t in terms])

    def body(accs, vs):
        return accs + vs, None

    accs, _ = jax.lax.scan(
        body, jnp.zeros(stacked.shape[:1] + stacked.shape[2:], F32),
        jnp.moveaxis(stacked, 1, 0))
    return tuple(accs[i] for i in range(len(terms)))

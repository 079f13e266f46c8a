"""Double-float (Dekker) transcendentals: (float)f(double x) without
hardware float64.

The C reference computes its NS/AEC transcendentals in double and
rounds to float (ns_core.c, aec_core.c via libm).  On x64 backends the
framework reproduces that exactly (dsp/floatops.py _via_double); the
TPU has no f64, and round-3 parity attributed the float chain's
residual (max 8166 LSB over 60 s, PARITY_r03 analysis) to f32-native
transcendentals rounding differently from (float)(double op) in ~2^-7
of calls, each flip feeding the chain's adaptive state.

This module evaluates log/exp/tanh/sqrt/pow in double-float arithmetic
built from IEEE f32 ops (TwoSum / Dekker TwoProd, ~49 significand
bits), then rounds once to f32.  The result matches (float)(f64 op)
except when the f64 value sits within ~2^-45 relative of an f32
rounding boundary — mismatch rates measured < 1e-5 per call
(tests/test_ddmath.py), ~1000x fewer adaptive-state flips than
f32-native ops.  This is a *quantified residual*, not bit-exactness:
libm itself is only faithfully rounded, so true bit-parity would
require emulating glibc's exact f64 instruction sequence (~2x53-bit
softfloat), far beyond any real-time budget.

Used by floatops when exact mode is requested without x64 (the TPU
parity configuration, WMIX_EXACT=1).  All functions are elementwise
over f32 arrays and fuse on the VPU.
"""
from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

F32 = jnp.float32
_SPLIT = np.float32(4097.0)          # 2^12 + 1 (24-bit significand)


def _two_sum(a, b):
    """Error-free addition.  NOT the branchless Knuth form: XLA's
    algebraic simplifier rewrites `s - (s - a) -> a` (valid in reals,
    invalid in floats), silently degrading it to the |a|>=|b|-only fast
    form.  The magnitude select breaks the literal pattern AND makes
    the fast form's precondition true."""
    s = a + b
    swap = jnp.abs(b) > jnp.abs(a)
    big = jnp.where(swap, b, a)
    small = jnp.where(swap, a, b)
    return s, small - (s - big)


# normalization uses the same fold-proof form ( _fast_two_sum's
# `b - ((a+b) - a)` is a simplifier target too)
_fast_two_sum = _two_sum


def _two_prod(a, b):
    p = a * b
    ah = _SPLIT * a
    ah = ah - (ah - a)
    al = a - ah
    bh = _SPLIT * b
    bh = bh - (bh - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _dd_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    return _fast_two_sum(s, e)


def _dd_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return _fast_two_sum(p, e)


def _dd_div(xh, xl, yh, yl):
    q1 = xh / yh
    ph, pl = _two_prod(q1, yh)
    rh, rl = _dd_add(xh, xl, -ph, -pl)
    q2 = (rh + (rl - q1 * yl)) / yh
    return _fast_two_sum(q1, q2)


def _const(v: float):
    """A float64 constant as an f32 pair."""
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return hi, lo


_LN2 = _const(0.6931471805599453094172321)
_INV_LN2 = np.float32(1.4426950408889634)


def _pow2i(k):
    """Exact 2^k for int32 k in [-126, 127] (exponent-bit construction;
    see _dd_exp_core for why jnp.exp2 won't do)."""
    import jax
    bits = ((k + 127) << 23).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)

# artanh series coefficients 1/(2k+1), k = 1..12 (f32 pairs)
_ATH_COEF = [_const(1.0 / (2 * k + 1)) for k in range(1, 13)]
# exp Taylor 1/k!, k = 2..13
_EXP_COEF = [_const(1.0 / float(math.factorial(k)))
             for k in range(2, 14)]


def dd_log(x):
    """(float)log((double)x) to ~49-bit intermediate precision.

    x > 0 finite (the chain's call sites guarantee it: magnitudes are
    >= 1 or have +1e-10 style floors); x <= 0 returns -inf/nan like
    jnp.log."""
    x = jnp.asarray(x, F32)
    m, e = jnp.frexp(x)                     # m in [0.5, 1)
    # shift to [sqrt(0.5), sqrt(2))
    lo_half = m < np.float32(0.70710678)
    m = jnp.where(lo_half, m * np.float32(2.0), m)
    e = jnp.where(lo_half, e - 1, e).astype(F32)

    # s = (m-1)/(m+1) in dd;  log(m) = 2*artanh(s)
    nh, nl = _two_sum(m, np.float32(-1.0))
    dh, dl = _two_sum(m, np.float32(1.0))
    sh, sl = _dd_div(nh, nl, dh, dl)
    s2h, s2l = _dd_mul(sh, sl, sh, sl)

    # Horner over odd series: artanh(s) = s * (1 + c1 s^2 + c2 s^4 ...)
    ph, pl = _ATH_COEF[-1]
    ph = jnp.broadcast_to(ph, x.shape).astype(F32)
    pl = jnp.broadcast_to(pl, x.shape).astype(F32)
    for ch, cl in reversed(_ATH_COEF[:-1]):
        ph, pl = _dd_mul(ph, pl, s2h, s2l)
        ph, pl = _dd_add(ph, pl, jnp.float32(ch), jnp.float32(cl))
    ph, pl = _dd_mul(ph, pl, s2h, s2l)
    ph, pl = _dd_add(ph, pl, np.float32(1.0), np.float32(0.0))
    ath_h, ath_l = _dd_mul(ph, pl, sh, sl)
    ath_h, ath_l = _dd_add(ath_h, ath_l, ath_h, ath_l)  # *2

    # e*ln2 + log(m)
    t1h, t1l = _two_prod(e, _LN2[0])
    t1l = t1l + e * _LN2[1]
    rh, rl = _dd_add(t1h, t1l, ath_h, ath_l)
    out = rh + rl
    # propagate the boundary cases like jnp.log
    out = jnp.where(x > 0, out, jnp.log(x))
    return out.astype(F32)


def _dd_exp_pair(xh, xl):
    """exp of a dd argument as a dd pair, scaled by the EXACT power of
    two (both words, so no precision is lost to the scaling).  Valid
    for results in the f32 normal range; |xh| <= ~104."""
    k = jnp.round(xh * _INV_LN2)
    # r = xh - k*ln2 in dd
    th, tl = _two_prod(k, _LN2[0])
    tl = tl + k * _LN2[1]
    rh, rl = _dd_add(xh, jnp.zeros_like(xh), -th, -tl)

    # Taylor: 1 + r + r^2/2! + ... + r^13/13!
    ph, pl = _EXP_COEF[-1]
    ph = jnp.broadcast_to(ph, xh.shape).astype(F32)
    pl = jnp.broadcast_to(pl, xh.shape).astype(F32)
    for ch, cl in reversed(_EXP_COEF[:-1]):
        ph, pl = _dd_mul(ph, pl, rh, rl)
        ph, pl = _dd_add(ph, pl, jnp.float32(ch), jnp.float32(cl))
    ph, pl = _dd_mul(ph, pl, rh, rl)
    ph, pl = _dd_add(ph, pl, np.float32(1.0), np.float32(0.0))
    ph, pl = _dd_mul(ph, pl, rh, rl)
    ph, pl = _dd_add(ph, pl, np.float32(1.0), np.float32(0.0))

    # exp(xh+xl) = exp(xh) * exp(xl); |xl| <= 2^-17ish, so
    # exp(xl) ~ 1 + xl*(1 + xl/2) to ~2^-52.  The correction rides as
    # the LOW word of a dd factor (1 + xl collapsed in f32 would
    # quantize the correction at 2^-24)
    fac_lo = xl * (np.float32(1.0) + xl * np.float32(0.5))
    ph, pl = _dd_mul(ph, pl, jnp.ones_like(xl), fac_lo)

    # scale by 2^k: EXACT powers of two via exponent-bit construction
    # (jnp.exp2 lowers through exp and is ~1 ulp off — enough to break
    # the whole emulation); two factors, applied to BOTH words
    ki = k.astype(jnp.int32)
    k1 = jnp.clip(ki, -125, 127)
    k2 = jnp.clip(ki - k1, -125, 127)
    sc1 = _pow2i(k1)
    sc2 = _pow2i(k2)
    return (ph * sc1) * sc2, (pl * sc1) * sc2


def dd_exp(x):
    """(float)exp((double)x); overflow -> inf, underflow -> 0.

    Subnormal results (x in [-104, -87.34)) double-round through the
    two-factor scaling — a documented best-effort corner the chain's
    call sites never exercise with parity-relevant magnitudes."""
    x = jnp.asarray(x, F32)
    yh, yl = _dd_exp_pair(jnp.clip(x, -104.0, 89.0), jnp.zeros_like(x))
    out = yh + yl
    out = jnp.where(x > np.float32(89.0), jnp.float32(np.inf), out)
    out = jnp.where(x < np.float32(-104.0), jnp.float32(0.0), out)
    return out.astype(F32)


def dd_tanh(x):
    """(float)tanh((double)x) via exp(2x) in dd."""
    x = jnp.asarray(x, F32)
    ax = jnp.abs(x)
    # |x| >= 9.011: 1 - tanh < 2^-26 -> rounds to 1.0f in f32
    sat = ax >= np.float32(9.011)
    a = jnp.clip(ax, 0.0, 9.2)
    eh, el = _dd_exp_pair(a + a, jnp.zeros_like(a))
    nh, nl = _dd_add(eh, el, np.float32(-1.0), np.float32(0.0))
    dh, dl = _dd_add(eh, el, np.float32(1.0), np.float32(0.0))
    th, tl = _dd_div(nh, nl, dh, dl)
    t = th + tl
    t = jnp.where(sat, jnp.float32(1.0), t)
    return jnp.where(x < 0, -t, t).astype(F32)


def dd_sqrt(x):
    """(float)sqrt((double)x): one dd Newton refinement of f32 sqrt,
    correcting the rare double-rounding disagreements."""
    x = jnp.asarray(x, F32)
    y0 = jnp.sqrt(x)
    # r = x - y0^2 (exact in dd); y = y0 + r / (2 y0)
    ph, pl = _two_prod(y0, y0)
    rh, rl = _dd_add(x, jnp.zeros_like(x), -ph, -pl)
    corr = (rh + rl) / (y0 + y0)
    y = y0 + corr
    ok = (x > 0) & jnp.isfinite(x)
    return jnp.where(ok, y, jnp.sqrt(x)).astype(F32)


def dd_div(a, b):
    """(float)((double)a / (double)b) — the correctly-rounded f32
    quotient the reference's x86 `divss` produces.

    Measured on this TPU backend: native f32 division disagrees with
    the correctly-rounded result on ~35% of random operands (up to
    2 ulp; XLA lowers it through reciprocal+refinement), which seeds
    adaptive-state divergence in exact mode.  One dd refinement of the
    native quotient brings the disagreement down to dd boundary cases
    (< ~1e-7/call).  Non-finite/zero operands and overflowing
    quotients fall back to the native op."""
    a = jnp.asarray(a, F32)
    b = jnp.asarray(b, F32)
    q1 = a / b
    ph, pl = _two_prod(q1, b)
    rh, rl = _dd_add(a, jnp.zeros_like(a), -ph, -pl)
    q = q1 + (rh + rl) / b
    # |q1| or |b| beyond ~2^115 overflows the Dekker split; audio-path
    # magnitudes never get there, but guard anyway
    big = np.float32(2.0 ** 110)
    ok = (jnp.isfinite(q1) & (jnp.abs(q1) < big) & (jnp.abs(b) < big) &
          (q1 != 0))
    return jnp.where(ok, q, q1).astype(F32)


_PIO2 = _const(1.5707963267948966192313217)
_TWO_OVER_PI = np.float32(0.6366197723675814)
# sin: (-1)^k/(2k+1)!, k=1..8;  cos: (-1)^k/(2k)!, k=1..9
_SIN_COEF = [_const((-1.0) ** k / float(math.factorial(2 * k + 1)))
             for k in range(1, 9)]
_COS_COEF = [_const((-1.0) ** k / float(math.factorial(2 * k)))
             for k in range(1, 10)]


def _dd_sincos(x):
    """sin and cos of f32 x to dd intermediate precision, rounded to
    f32.  Range reduction uses the 2-word pi/2, so the reduced-argument
    error is ~n * 2^-49 where n = round(x/(pi/2)) — full dd accuracy
    for the comfort-noise range [0, 2pi), and still ~2^-35 at |x|=1e4
    (vs ~2^-12 for native f32 there)."""
    x = jnp.asarray(x, F32)
    n = jnp.round(x * _TWO_OVER_PI)
    th, tl = _two_prod(n, _PIO2[0])
    tl = tl + n * _PIO2[1]
    rh, rl = _dd_add(x, jnp.zeros_like(x), -th, -tl)
    r2h, r2l = _dd_mul(rh, rl, rh, rl)

    def series(coefs):
        ph = jnp.broadcast_to(coefs[-1][0], x.shape).astype(F32)
        pl = jnp.broadcast_to(coefs[-1][1], x.shape).astype(F32)
        for ch, cl in reversed(coefs[:-1]):
            ph, pl = _dd_mul(ph, pl, r2h, r2l)
            ph, pl = _dd_add(ph, pl, jnp.float32(ch), jnp.float32(cl))
        ph, pl = _dd_mul(ph, pl, r2h, r2l)
        ph, pl = _dd_add(ph, pl, np.float32(1.0), np.float32(0.0))
        return ph, pl

    sh, sl = _dd_mul(*series(_SIN_COEF), rh, rl)    # sin(r)
    ch_, cl_ = series(_COS_COEF)                    # cos(r)
    sin_r = sh + sl
    cos_r = ch_ + cl_

    q = jnp.mod(n.astype(jnp.int32), 4)
    sin_x = jnp.where(q == 0, sin_r,
                      jnp.where(q == 1, cos_r,
                                jnp.where(q == 2, -sin_r, -cos_r)))
    cos_x = jnp.where(q == 0, cos_r,
                      jnp.where(q == 1, -sin_r,
                                jnp.where(q == 2, -cos_r, sin_r)))
    ok = jnp.isfinite(x)
    return (jnp.where(ok, sin_x, jnp.sin(x)).astype(F32),
            jnp.where(ok, cos_x, jnp.cos(x)).astype(F32))


def dd_sin(x):
    """(float)sin((double)x) (glibc sinf computes in double and rounds
    once, sysdeps/ieee754/flt-32)."""
    return _dd_sincos(x)[0]


def dd_cos(x):
    """(float)cos((double)x)."""
    return _dd_sincos(x)[1]


def _dd_log_pair(base):
    """log(base) as a dd pair (base > 0 finite, the callers guard)."""
    m, e = jnp.frexp(base)
    lo_half = m < np.float32(0.70710678)
    m = jnp.where(lo_half, m * np.float32(2.0), m)
    e = jnp.where(lo_half, e - 1, e).astype(F32)
    nh, nl = _two_sum(m, np.float32(-1.0))
    dh, dl = _two_sum(m, np.float32(1.0))
    sh, sl = _dd_div(nh, nl, dh, dl)
    s2h, s2l = _dd_mul(sh, sl, sh, sl)
    ph, pl = _ATH_COEF[-1]
    ph = jnp.broadcast_to(ph, m.shape).astype(F32)
    pl = jnp.broadcast_to(pl, m.shape).astype(F32)
    for ch, cl in reversed(_ATH_COEF[:-1]):
        ph, pl = _dd_mul(ph, pl, s2h, s2l)
        ph, pl = _dd_add(ph, pl, jnp.float32(ch), jnp.float32(cl))
    ph, pl = _dd_mul(ph, pl, s2h, s2l)
    ph, pl = _dd_add(ph, pl, np.float32(1.0), np.float32(0.0))
    lh, ll = _dd_mul(ph, pl, sh, sl)
    lh, ll = _dd_add(lh, ll, lh, ll)
    t1h, t1l = _two_prod(e, _LN2[0])
    t1l = t1l + e * _LN2[1]
    return _dd_add(t1h, t1l, lh, ll)


def dd_pow(base, expo):
    """(float)pow((double)base, (double)expo) via exp(expo * log base)
    in dd (glibc powf computes in double internally).  base > 0 finite;
    base <= 0 / non-finite falls back to the f32 op.  Subnormal results
    share dd_exp's double-rounding corner."""
    base = jnp.asarray(base, F32)
    expo = jnp.asarray(expo, F32)
    lh, ll = _dd_log_pair(base)
    xh, xl = _dd_mul(lh, ll, expo, jnp.zeros_like(expo))
    under = xh < np.float32(-104.0)
    over = xh > np.float32(89.0)
    eh, el = _dd_exp_pair(jnp.clip(xh, -104.0, 89.0), xl)
    out = eh + el
    out = jnp.where(under, jnp.float32(0.0), out)
    out = jnp.where(over, jnp.float32(np.inf), out)
    ok = (base > 0) & jnp.isfinite(base) & jnp.isfinite(expo)
    return jnp.where(ok, out, jnp.power(base, expo)).astype(F32)


def dd_pow_div(num, base, expo):
    """(float)(num / pow(base, expo)) with pow/div at dd precision
    (ns_core.c:1152-1153's double arithmetic)."""
    num = jnp.asarray(num, F32)
    base = jnp.asarray(base, F32)
    expo = jnp.asarray(expo, F32)
    # pow = exp(expo * log(base)) with the product in dd
    m, e = jnp.frexp(base)
    lo_half = m < np.float32(0.70710678)
    m = jnp.where(lo_half, m * np.float32(2.0), m)
    e = jnp.where(lo_half, e - 1, e).astype(F32)
    nh, nl = _two_sum(m, np.float32(-1.0))
    dh, dl = _two_sum(m, np.float32(1.0))
    sh, sl = _dd_div(nh, nl, dh, dl)
    s2h, s2l = _dd_mul(sh, sl, sh, sl)
    ph, pl = _ATH_COEF[-1]
    ph = jnp.broadcast_to(ph, m.shape).astype(F32)
    pl = jnp.broadcast_to(pl, m.shape).astype(F32)
    for ch, cl in reversed(_ATH_COEF[:-1]):
        ph, pl = _dd_mul(ph, pl, s2h, s2l)
        ph, pl = _dd_add(ph, pl, jnp.float32(ch), jnp.float32(cl))
    ph, pl = _dd_mul(ph, pl, s2h, s2l)
    ph, pl = _dd_add(ph, pl, np.float32(1.0), np.float32(0.0))
    lh, ll = _dd_mul(ph, pl, sh, sl)
    lh, ll = _dd_add(lh, ll, lh, ll)
    t1h, t1l = _two_prod(e, _LN2[0])
    t1l = t1l + e * _LN2[1]
    lh, ll = _dd_add(t1h, t1l, lh, ll)          # log(base) in dd
    # expo * log(base) in dd, then exp as a dd pair
    xh, xl = _dd_mul(lh, ll, expo, jnp.zeros_like(expo))
    xh = jnp.clip(xh, -87.0, 87.0)
    eh, el = _dd_exp_pair(xh, xl)
    # num / pow in dd
    qh, ql = _dd_div(num, jnp.zeros_like(num), eh, el)
    out = qh + ql
    # base == 0/inf etc: fall back to the f32 route
    ok = (base > 0) & jnp.isfinite(base) & jnp.isfinite(eh) & (eh > 0)
    return jnp.where(ok, out,
                     num / jnp.power(base, expo)).astype(F32)

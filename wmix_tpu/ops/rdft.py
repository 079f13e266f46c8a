"""Bit-exact JAX reimplementation of the Ooura fft4g real FFT (WebRtc_rdft).

The reference NS (and AEC) transform blocks with Takuya Ooura's split-radix
FFT (webrtc/common_audio/fft4g.c).  Spectral gains feed hard thresholds
(histogram bins, comparisons), so PCM parity requires the float32 butterfly
arithmetic to match bit-for-bit — a generic jnp.fft would round differently.

Structure exploited here:
  * bitrv2 is a pure permutation -> precomputed index gather;
  * cft1st(n) is exactly cftmdl(n, l=2) unrolled -> one generic stage;
  * every stage section touches disjoint index blocks -> each becomes a
    vectorized gather/compute/scatter with per-item twiddle constants
    (precomputed on host in numpy float32 with the C operation order,
    including the wk3 = wk1 - 2*wk2i*wk1i derivation and the trig tables'
    double-precision cos/sin rounded to float);
  * rftfsub/rftbsub act on disjoint (j, n-j) pairs.

The batched transform vmaps over leading dimensions; all ops are VPU
elementwise + static gathers, so XLA fuses the whole block chain.
Multiplies and adds are kept as separate HLO ops (no FMA contraction), and
tests/test_rdft.py asserts bit-parity against the compiled reference for
both directions at n=128/256.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wmix_tpu.dsp.floatops import gm, guard_one

F32 = np.float32


# --------------------------------------------------------------------------
# host precomputation (numpy, exact C semantics)
# --------------------------------------------------------------------------

def _bitrv2_perm(n: int) -> np.ndarray:
    """The permutation applied by bitrv2 (fft4g.c:693-791): returns perm
    such that new[i] = old[perm[i]]."""
    ip = [0] * (n // 2 + 2)
    a = list(range(n))  # identity "data": values are source indices

    ip[0] = 0
    l = n
    m = 1
    while (m << 3) < l:
        l >>= 1
        for j in range(m):
            ip[m + j] = ip[j] + l
        m <<= 1
    m2 = 2 * m

    def swap(j1, k1):
        a[j1], a[k1] = a[k1], a[j1]
        a[j1 + 1], a[k1 + 1] = a[k1 + 1], a[j1 + 1]

    if (m << 3) == l:
        for k in range(m):
            for j in range(k):
                j1 = 2 * j + ip[k]
                k1 = 2 * k + ip[j]
                swap(j1, k1)
                j1 += m2
                k1 += 2 * m2
                swap(j1, k1)
                j1 += m2
                k1 -= m2
                swap(j1, k1)
                j1 += m2
                k1 += 2 * m2
                swap(j1, k1)
            j1 = 2 * k + m2 + ip[k]
            k1 = j1 + m2
            swap(j1, k1)
    else:
        for k in range(1, m):
            for j in range(k):
                j1 = 2 * j + ip[k]
                k1 = 2 * k + ip[j]
                swap(j1, k1)
                j1 += m2
                k1 += m2
                swap(j1, k1)
    return np.array(a, np.int64)


def _makewt(nw: int) -> np.ndarray:
    """makewt (fft4g.c:642-668): float table, double trig, then bitrv2."""
    w = np.zeros(nw, F32)
    if nw > 2:
        nwh = nw >> 1
        delta = F32(F32(np.arctan(1.0)) / F32(nwh))
        w[0] = 1
        w[1] = 0
        w[nwh] = F32(np.cos(np.float64(F32(delta * nwh))))
        w[nwh + 1] = w[nwh]
        if nwh > 2:
            for j in range(2, nwh, 2):
                x = F32(np.cos(np.float64(F32(delta * j))))
                y = F32(np.sin(np.float64(F32(delta * j))))
                w[j] = x
                w[j + 1] = y
                w[nw - j] = y
                w[nw - j + 1] = x
            w = w[_bitrv2_perm(nw)]
    return w


def _makect(nc: int) -> np.ndarray:
    """makect (fft4g.c:671-687)."""
    c = np.zeros(nc, F32)
    if nc > 1:
        nch = nc >> 1
        delta = F32(F32(np.arctan(1.0)) / F32(nch))
        c[0] = F32(np.cos(np.float64(F32(delta * nch))))
        c[nch] = F32(F32(0.5) * c[0])
        for j in range(1, nch):
            c[j] = F32(F32(0.5) * F32(np.cos(np.float64(F32(delta * j)))))
            c[nc - j] = F32(F32(0.5) * F32(np.sin(np.float64(F32(delta * j)))))
    return c


def _cftmdl_spec(n: int, l: int, w: np.ndarray, wk3_first=None,
                 wk3_second=None):
    """Work spec for one cftmdl stage (fft4g.c:1107-1231; cft1st is the
    l == 2 case).  Returns per-variant (j_base_array, twiddle arrays).

    fft4g derives the third-harmonic twiddles as wk3 = wk1 - 2*wk2*wk1
    in float; the AEC's length-128 variant ships them as tables with
    different last-ulp rounding (aec_rdft.c:52-66) — pass those via
    wk3_first/wk3_second."""
    m = l << 2
    # section A: no twiddle
    jA = np.arange(0, l, 2, np.int64)
    # section B: wk1r = w[2]
    jB = np.arange(m, m + l, 2, np.int64)
    # k loop
    jC, tC = [], []
    jD, tD = [], []
    k1 = 0
    m2 = 2 * m
    for k in range(m2, n, m2):
        k1 += 2
        k2 = 2 * k1
        wk2r, wk2i = w[k1], w[k1 + 1]
        wk1r, wk1i = w[k2], w[k2 + 1]
        if wk3_first is not None:
            wk3r, wk3i = wk3_first[k1], wk3_first[k1 + 1]
        else:
            wk3r = F32(wk1r - F32(F32(F32(2) * wk2i) * wk1i))
            wk3i = F32(F32(F32(F32(2) * wk2i) * wk1r) - wk1i)
        for j in range(k, k + l, 2):
            jC.append(j)
            tC.append((wk1r, wk1i, wk2r, wk2i, wk3r, wk3i))
        wk1r, wk1i = w[k2 + 2], w[k2 + 3]
        if wk3_second is not None:
            wk3r, wk3i = wk3_second[k1], wk3_second[k1 + 1]
        else:
            wk3r = F32(wk1r - F32(F32(F32(2) * wk2r) * wk1i))
            wk3i = F32(F32(F32(F32(2) * wk2r) * wk1r) - wk1i)
        for j in range(k + m, k + m + l, 2):
            jD.append(j)
            tD.append((wk1r, wk1i, wk2r, wk2i, wk3r, wk3i))
    return (jA, jB,
            np.array(jC, np.int64), np.array(tC, F32).reshape(-1, 6),
            np.array(jD, np.int64), np.array(tD, F32).reshape(-1, 6))


@functools.lru_cache(maxsize=None)
def _plan(n: int):
    """All host-side constants for size n."""
    nw = n >> 2
    nc = n >> 2
    w = _makewt(nw)
    c = _makect(nc)
    perm = _bitrv2_perm(n)

    # cftfsub stage schedule: l = 2 (cft1st), then l *= 4 while (l<<2) < n
    stages = []
    l = 2
    if n > 8:
        stages.append(_cftmdl_spec(n, 2, w))
        l = 8
        while (l << 2) < n:
            stages.append(_cftmdl_spec(n, l, w))
            l <<= 2
    final_radix4 = (l << 2) == n
    jF = np.arange(0, l, 2, np.int64)

    # rftfsub/rftbsub twiddles (fft4g.c:1239-1246)
    m = n >> 1
    ks = 2 * nc // m
    jR = np.arange(2, m, 2, np.int64)
    kk = ks * np.arange(1, len(jR) + 1)
    wkr = (F32(0.5) - c[nc - kk]).astype(F32)
    wki = c[kk].astype(F32)

    return dict(n=n, w2=F32(w[2]), perm=perm, stages=stages,
                final_radix4=final_radix4, l_final=l, jF=jF,
                jR=jR, kR=(n - jR), wkr=wkr, wki=wki)


# --------------------------------------------------------------------------
# device stages (jnp, single [n] vector; vmap for batch)
#
# Each cft stage writes every index exactly once (its sections tile [0, n)),
# so a stage is computed as: gather the 8 butterfly inputs per work item,
# compute the 8 outputs, concatenate in a canonical order, and apply one
# host-precomputed inverse permutation — no scatters, tiny HLO graphs.
# --------------------------------------------------------------------------

def _vals_v0(x, j, l):
    """No-twiddle butterfly values (cftmdl section A / final radix-4,
    fft4g.c:1114-1134,916-937) -> outputs for [j,j+1,j1,j1+1,j2,...]."""
    j1, j2, j3 = j + l, j + 2 * l, j + 3 * l
    ar, ai = x[j], x[j + 1]
    br, bi = x[j1], x[j1 + 1]
    cr, ci = x[j2], x[j2 + 1]
    dr, di = x[j3], x[j3 + 1]
    x0r, x0i = ar + br, ai + bi
    x1r, x1i = ar - br, ai - bi
    x2r, x2i = cr + dr, ci + di
    x3r, x3i = cr - dr, ci - di
    return [x0r + x2r, x0i + x2i,
            x1r - x3i, x1i + x3r,
            x0r - x2r, x0i - x2i,
            x1r + x3i, x1i - x3r]


def _vals_v1(x, j, l, w2, one=None):
    """cftmdl section B values (fft4g.c:1136-1160): wk1r = w[2] twiddle."""
    j1, j2, j3 = j + l, j + 2 * l, j + 3 * l
    ar, ai = x[j], x[j + 1]
    br, bi = x[j1], x[j1 + 1]
    cr, ci = x[j2], x[j2 + 1]
    dr, di = x[j3], x[j3 + 1]
    x0r, x0i = ar + br, ai + bi
    x1r, x1i = ar - br, ai - bi
    x2r, x2i = cr + dr, ci + di
    x3r, x3i = cr - dr, ci - di
    y0r = x1r - x3i
    y0i = x1i + x3r
    z0r = x3i + x1r
    z0i = x3r - x1i
    # products guarded: stage outputs feed the next stage's adds through a
    # static gather the backend can fuse across
    return [x0r + x2r, x0i + x2i,
            gm(w2, y0r - y0i, one), gm(w2, y0r + y0i, one),
            x2i - x0i, x0r - x2r,
            gm(w2, z0i - z0r, one), gm(w2, z0i + z0r, one)]


def _vals_v23(x, j, l, tw, second: bool, one=None):
    """cftmdl k-loop butterfly values (fft4g.c:1172-1229)."""
    wk1r, wk1i, wk2r, wk2i, wk3r, wk3i = (tw[:, i] for i in range(6))
    j1, j2, j3 = j + l, j + 2 * l, j + 3 * l
    ar, ai = x[j], x[j + 1]
    br, bi = x[j1], x[j1 + 1]
    cr, ci = x[j2], x[j2 + 1]
    dr, di = x[j3], x[j3 + 1]
    x0r, x0i = ar + br, ai + bi
    x1r, x1i = ar - br, ai - bi
    x2r, x2i = cr + dr, ci + di
    x3r, x3i = cr - dr, ci - di
    u0r = x0r - x2r
    u0i = x0i - x2i
    if second:
        o2r = gm(-wk2i, u0r, one) - gm(wk2r, u0i, one)
        o2i = gm(-wk2i, u0i, one) + gm(wk2r, u0r, one)
    else:
        o2r = gm(wk2r, u0r, one) - gm(wk2i, u0i, one)
        o2i = gm(wk2r, u0i, one) + gm(wk2i, u0r, one)
    v0r = x1r - x3i
    v0i = x1i + x3r
    t0r = x1r + x3i
    t0i = x1i - x3r
    return [x0r + x2r, x0i + x2i,
            gm(wk1r, v0r, one) - gm(wk1i, v0i, one),
            gm(wk1r, v0i, one) + gm(wk1i, v0r, one),
            o2r, o2i,
            gm(wk3r, t0r, one) - gm(wk3i, t0i, one),
            gm(wk3r, t0i, one) + gm(wk3i, t0r, one)]


def _section_targets(j: np.ndarray, l: int) -> np.ndarray:
    """Target indices matching the value order of the _vals_* helpers."""
    cols = [j, j + 1, j + l, j + l + 1, j + 2 * l, j + 2 * l + 1,
            j + 3 * l, j + 3 * l + 1]
    return np.stack(cols, axis=1).reshape(-1)


def _stack_vals(vals):
    return jnp.stack(vals, axis=1).reshape(-1)


@functools.lru_cache(maxsize=None)
def _stage_inv_perm(n: int, l: int) -> np.ndarray:
    """Inverse permutation assembling a cftmdl stage's concatenated section
    outputs back into index order."""
    jA, jB, jC, _, jD, _ = _cftmdl_spec(n, l, _makewt(n >> 2))
    tgt = np.concatenate([
        _section_targets(jA, l), _section_targets(jB, l),
        _section_targets(jC, l) if len(jC) else np.zeros(0, np.int64),
        _section_targets(jD, l) if len(jD) else np.zeros(0, np.int64)])
    inv = np.empty(n, np.int64)
    inv[tgt] = np.arange(n)
    return inv


def _cftmdl(x, spec, n, l, w2, one):
    jA, jB, jC, tC, jD, tD = spec
    parts = [_stack_vals(_vals_v0(x, jnp.asarray(jA), l)),
             _stack_vals(_vals_v1(x, jnp.asarray(jB), l, w2, one))]
    if len(jC):
        parts.append(_stack_vals(_vals_v23(x, jnp.asarray(jC), l,
                                           jnp.asarray(tC), False, one)))
    if len(jD):
        parts.append(_stack_vals(_vals_v23(x, jnp.asarray(jD), l,
                                           jnp.asarray(tD), True, one)))
    vals = jnp.concatenate(parts)
    return vals[jnp.asarray(_stage_inv_perm(n, l))]


@functools.lru_cache(maxsize=None)
def _final_inv_perm(n: int, l: int, radix4: bool) -> np.ndarray:
    j = np.arange(0, l, 2, np.int64)
    if radix4:
        tgt = _section_targets(j, l)
    else:
        tgt = np.stack([j, j + 1, j + l, j + l + 1], axis=1).reshape(-1)
    inv = np.empty(n, np.int64)
    inv[tgt] = np.arange(n)
    return inv


def _cft_sub(x, plan, forward: bool, one=None):
    """cftfsub / cftbsub (fft4g.c:902-999); they share cft1st/cftmdl and
    differ only in the final radix section's conjugation."""
    n = plan["n"]
    l = 2
    if n > 8:
        sl = 2
        for si, spec in enumerate(plan["stages"]):
            x = _cftmdl(x, spec, n, sl, plan["w2"], one)
            sl = 8 if si == 0 else sl << 2
        l = plan["l_final"]
    j = jnp.asarray(plan["jF"])
    if plan["final_radix4"]:
        if forward:
            vals = _vals_v0(x, j, l)
        else:
            j1, j2, j3 = j + l, j + 2 * l, j + 3 * l
            ar, ai = x[j], x[j + 1]
            br, bi = x[j1], x[j1 + 1]
            cr, ci = x[j2], x[j2 + 1]
            dr, di = x[j3], x[j3 + 1]
            x0r, x0i = ar + br, -ai - bi
            x1r, x1i = ar - br, -ai + bi
            x2r, x2i = cr + dr, ci + di
            x3r, x3i = cr - dr, ci - di
            vals = [x0r + x2r, x0i - x2i,
                    x1r - x3i, x1i - x3r,
                    x0r - x2r, x0i + x2i,
                    x1r + x3i, x1i + x3r]
    else:
        j1 = j + l
        ar, ai = x[j], x[j + 1]
        br, bi = x[j1], x[j1 + 1]
        if forward:
            vals = [ar + br, ai + bi, ar - br, ai - bi]
        else:
            vals = [ar + br, -ai - bi, ar - br, -ai + bi]
    flat = _stack_vals(vals)
    return flat[jnp.asarray(_final_inv_perm(n, l, plan["final_radix4"]))]


def _rft_sub(x, plan, forward: bool, one=None):
    """rftfsub / rftbsub (fft4g.c:1234-1283).  The (j, n-j) pairs are
    disjoint and skip indices {0, 1, m, m+1}, so one combined scatter."""
    j = jnp.asarray(plan["jR"])
    k = jnp.asarray(plan["kR"])
    wkr = jnp.asarray(plan["wkr"])
    wki = jnp.asarray(plan["wki"])
    n = plan["n"]
    m = n >> 1
    xr = x[j] - x[k]
    xi = x[j + 1] + x[k + 1]
    if forward:
        yr = gm(wkr, xr, one) - gm(wki, xi, one)
        yi = gm(wkr, xi, one) + gm(wki, xr, one)
        vals = [x[j] - yr, x[j + 1] - yi, x[k] + yr, x[k + 1] - yi]
        idx = jnp.concatenate([j, j + 1, k, k + 1])
        return x.at[idx].set(jnp.concatenate(vals))
    else:
        yr = gm(wkr, xr, one) + gm(wki, xi, one)
        yi = gm(wkr, xi, one) - gm(wki, xr, one)
        vals = [x[j] - yr, yi - x[j + 1], x[k] + yr, yi - x[k + 1],
                jnp.stack([-x[1], -x[m + 1]])]
        idx = jnp.concatenate(
            [j, j + 1, k, k + 1,
             jnp.asarray(np.array([1, m + 1], np.int64))])
        return x.at[idx].set(jnp.concatenate(vals))


def _rdft_one(v, plan, inverse: bool, one=None):
    v = v.astype(jnp.float32)
    if one is None:
        one = guard_one(v)
    if not inverse:
        v = v[jnp.asarray(plan["perm"])]
        v = _cft_sub(v, plan, True, one)
        v = _rft_sub(v, plan, True, one)
        xi = v[0] - v[1]
        v = v.at[0].set(v[0] + v[1])
        v = v.at[1].set(xi)
    else:
        a1 = jnp.float32(0.5) * (v[0] - v[1])
        v = v.at[1].set(a1)
        v = v.at[0].set(v[0] - a1)
        v = _rft_sub(v, plan, False, one)
        v = v[jnp.asarray(plan["perm"])]
        v = _cft_sub(v, plan, False, one)
    return v


@functools.lru_cache(maxsize=None)
def _rdft_jit(n: int, inverse: bool):
    plan = _plan(n)

    @jax.jit
    def f(flat):
        return jax.vmap(lambda v: _rdft_one(v, plan, inverse))(flat)

    return f


def rdft(x: jax.Array, inverse: bool = False) -> jax.Array:
    """WebRtc_rdft (fft4g.c:324-361) on the last axis (length 128 or 256).

    Forward packs the real spectrum Ooura-style: a[0]=DC, a[1]=Nyquist,
    then interleaved re/im.  Inverse expects that packing and returns the
    unscaled time signal (callers apply 2/n as the reference does).
    Standalone calls are jitted per (n, direction); when called inside a
    larger jitted step use rdft_traced to fuse into the caller."""
    n = x.shape[-1]
    flat = x.reshape(-1, n)
    out = _rdft_jit(n, bool(inverse))(flat)
    return out.reshape(x.shape)


def _fast_rdft(x: jax.Array, inverse: bool) -> jax.Array:
    """Fast-mode transform: one XLA Fft op instead of the unrolled Ooura
    gather stages (shrinks the HLO graph ~30x per transform and lets the
    TPU backend lower small FFTs onto the MXU as DFT matmuls).

    Reproduces the Ooura rdft PACKING exactly — a[0]=R[0], a[1]=R[n/2],
    a[2k]=R[k], a[2k+1]=I[k] with I[k] = +sum a[j] sin(2 pi jk/n), i.e.
    the NEGATED numpy imag — up to float32 rounding (fast mode releases
    rounding order by definition; tests/test_rdft.py gates allclose)."""
    n = x.shape[-1]
    x = x.astype(jnp.float32)
    if not inverse:
        X = jnp.fft.rfft(x, axis=-1)
        re = jnp.real(X).astype(jnp.float32)
        im = (-jnp.imag(X)).astype(jnp.float32)
        # interleave+concat packing (the strided .at[..., 2::2].set
        # form lowers to scatter under the engine's vmap)
        pairs = jnp.stack([re[..., 1:n // 2], im[..., 1:n // 2]],
                          axis=-1).reshape(*x.shape[:-1], n - 2)
        return jnp.concatenate(
            [re[..., 0:1], re[..., n // 2:n // 2 + 1], pairs], axis=-1)
    re = jnp.concatenate(
        [x[..., 0:1], x[..., 2::2], x[..., 1:2]], axis=-1)
    im = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), jnp.float32), x[..., 3::2],
         jnp.zeros(x.shape[:-1] + (1,), jnp.float32)], axis=-1)
    X = jax.lax.complex(re, -im)
    t = jnp.fft.irfft(X, n, axis=-1).astype(jnp.float32)
    # Ooura's unscaled inverse: callers multiply by 2/n afterwards
    return t * jnp.float32(n / 2)


def _use_fast_fft() -> bool:
    import os
    from wmix_tpu.dsp import floatops
    if os.environ.get("WMIX_FAST_FFT", "") == "0":
        return False
    return floatops.fast_mode()


def rdft_traced(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Trace-time variant for use inside an enclosing jit/vmap: applies the
    transform along the last axis without its own jit boundary."""
    if _use_fast_fft():
        return _fast_rdft(x, bool(inverse))
    n = x.shape[-1]
    plan = _plan(n)
    flat = x.reshape(-1, n)
    out = jax.vmap(lambda v: _rdft_one(v, plan, bool(inverse)))(flat)
    return out.reshape(x.shape)


# --------------------------------------------------------------------------
# The AEC's length-128 variant (aec_rdft.c): identical structure, shipped
# twiddle tables.
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _plan_aec128():
    from wmix_tpu.ops._aec_rdft_tables import RDFT_W, WK3_FIRST, WK3_SECOND
    n = 128
    w = RDFT_W[:32]
    c = RDFT_W[32:]
    perm = _bitrv2_perm(n)
    stages = [_cftmdl_spec(n, 2, w, WK3_FIRST, WK3_SECOND),
              _cftmdl_spec(n, 8, w, WK3_FIRST, WK3_SECOND)]
    l = 32
    jF = np.arange(0, l, 2, np.int64)
    m = n >> 1
    jR = np.arange(2, m, 2, np.int64)
    kk = np.arange(1, len(jR) + 1)
    wkr = (F32(0.5) - c[32 - kk]).astype(F32)
    wki = c[kk].astype(F32)
    return dict(n=n, w2=F32(w[2]), perm=perm, stages=stages,
                final_radix4=True, l_final=l, jF=jF,
                jR=jR, kR=(n - jR), wkr=wkr, wki=wki)


@functools.lru_cache(maxsize=None)
def _aec_rdft_jit(inverse: bool):
    plan = _plan_aec128()

    @jax.jit
    def f(flat):
        return jax.vmap(lambda v: _rdft_one(v, plan, inverse))(flat)

    return f


def aec_rdft(x: jax.Array, inverse: bool = False) -> jax.Array:
    """aec_rdft_forward_128 / aec_rdft_inverse_128 (aec_rdft.c:539-555)
    on the last axis (length 128)."""
    flat = x.reshape(-1, 128)
    out = _aec_rdft_jit(bool(inverse))(flat)
    return out.reshape(x.shape)


def aec_rdft_traced(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Trace-time variant for use inside an enclosing jit."""
    if _use_fast_fft():
        return _fast_rdft(x, bool(inverse))
    plan = _plan_aec128()
    flat = x.reshape(-1, 128)
    out = jax.vmap(lambda v: _rdft_one(v, plan, bool(inverse)))(flat)
    return out.reshape(x.shape)

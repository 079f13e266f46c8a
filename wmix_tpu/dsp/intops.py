"""Exact fixed-point primitives shared by the DSP kernels.

The reference's VAD/AGC (and the NSX/AECM variants) are Q-format int16/int32
arithmetic built on webrtc's signal-processing library.  These helpers
reproduce those primitives bit-for-bit on int32/uint32 JAX arrays:

  * C int16 stores wrap (gcc two's complement) -> wrap16
  * C signed division truncates toward zero    -> div_trunc
  * norm/clz bit tricks                        -> norm_w32 / norm_u32
  * right shift of negatives is arithmetic     -> jnp's >> already is

Everything is elementwise, so all of it vectorizes over [batch, ...] on the
VPU and fuses into the surrounding kernels.
"""
from __future__ import annotations

import jax.numpy as jnp

I32 = jnp.int32
U32 = jnp.uint32


def wrap16(x):
    """Truncate an int32 value to int16 storage semantics (two's complement
    wrap), keeping int32 dtype for further arithmetic."""
    x = x.astype(I32) if hasattr(x, "astype") else jnp.asarray(x, I32)
    return (x << 16) >> 16


def div_trunc(num, den):
    """C signed integer division: truncation toward zero."""
    num = jnp.asarray(num, I32)
    den = jnp.asarray(den, I32)
    q = jnp.abs(num) // jnp.abs(den)
    return jnp.where((num < 0) ^ (den < 0), -q, q).astype(I32)


def div_w32_w16(num, den):
    """WebRtcSpl_DivW32W16 (division_operations.c): trunc division with a
    zero-guard returning 0x7FFFFFFF.

    Routed through the exact bit-serial core: XLA-TPU lowers full-range
    int32 `//` through an inexact float path (occasional off-by-one for
    numerators beyond ~2^24), which broke VAD/NSX parity on-chip while
    every CPU/x64 test stayed green (PARITY_r04 int-chain spikes)."""
    return div_w32_w16_exact(num, den)


def norm_w32(a):
    """WebRtcSpl_NormW32 (spl_inl.h:103-124): redundant sign bits of an
    int32; 0 for a == 0.  The shift cascade is replicated on the uint32 bit
    pattern because intermediate shifts can set bit 31."""
    a = jnp.asarray(a, I32)
    v = jnp.where(a < 0, ~a, a).astype(U32)
    zeros = jnp.where((v & jnp.uint32(0xFFFF8000)) == 0, 16, 0).astype(U32)
    s = v << zeros
    zeros += jnp.where((s & jnp.uint32(0xFF800000)) == 0, 8, 0).astype(U32)
    s = v << zeros
    zeros += jnp.where((s & jnp.uint32(0xF8000000)) == 0, 4, 0).astype(U32)
    s = v << zeros
    zeros += jnp.where((s & jnp.uint32(0xE0000000)) == 0, 2, 0).astype(U32)
    s = v << zeros
    zeros += jnp.where((s & jnp.uint32(0xC0000000)) == 0, 1, 0).astype(U32)
    return jnp.where(a == 0, 0, zeros.astype(I32))


def norm_u32(a):
    """WebRtcSpl_NormU32 (spl_inl.h:126-147): leading zeros of a uint32;
    0 for a == 0."""
    a = jnp.asarray(a, U32)
    zeros = jnp.where((a & jnp.uint32(0xFFFF0000)) == 0, 16, 0).astype(U32)
    s = a << zeros
    add = jnp.where((s & jnp.uint32(0xFF000000)) == 0, 8, 0).astype(U32)
    zeros += add
    s = a << zeros
    add = jnp.where((s & jnp.uint32(0xF0000000)) == 0, 4, 0).astype(U32)
    zeros += add
    s = a << zeros
    add = jnp.where((s & jnp.uint32(0xC0000000)) == 0, 2, 0).astype(U32)
    zeros += add
    s = a << zeros
    add = jnp.where((s & jnp.uint32(0x80000000)) == 0, 1, 0).astype(U32)
    zeros += add
    return jnp.where(a == 0, 0, zeros).astype(I32)


def shr_u32(x, n):
    """Logical right shift of a uint32 by a (possibly array) count."""
    return (jnp.asarray(x, U32) >> jnp.asarray(n, U32)).astype(U32)


def sat_w16(x):
    """WebRtcSpl_SatW32ToW16: clamp int32 to int16 range."""
    return jnp.clip(jnp.asarray(x, I32), -32768, 32767).astype(I32)


def norm_w16(a):
    """WebRtcSpl_NormW16: redundant sign bits of an int16 value (held in
    int32, wrapped to int16 semantics first); 0 for a == 0."""
    a = wrap16(jnp.asarray(a, I32))
    v = jnp.where(a < 0, ~a, a) & 0x7FFF
    # 15-bit clz chain on the int16 magnitude
    zeros = jnp.where((v & 0x7F80) == 0, 8, 0)
    s = v << zeros
    zeros += jnp.where((s & 0x7800) == 0, 4, 0)
    s = v << zeros
    zeros += jnp.where((s & 0x6000) == 0, 2, 0)
    s = v << zeros
    zeros += jnp.where((s & 0x4000) == 0, 1, 0)
    return jnp.where(a == 0, 0, zeros).astype(I32)


def shift_w32(x, c):
    """WEBRTC_SPL_SHIFT_W32: left shift when c >= 0 (int32 wrap),
    arithmetic right shift otherwise.  `c` may be an array."""
    x = jnp.asarray(x, I32)
    c = jnp.asarray(c, I32)
    cl = jnp.clip(c, 0, 31)
    cr = jnp.clip(-c, 0, 31)
    return jnp.where(c >= 0, x << cl, x >> cr).astype(I32)


def add_sat_w32(a, b):
    """WebRtcSpl_AddSatW32: int32 saturating add (detects overflow from
    the sign pattern; no 64-bit intermediate, TPU has none)."""
    a = jnp.asarray(a, I32)
    b = jnp.asarray(b, I32)
    s = (a.astype(U32) + b.astype(U32)).astype(I32)
    pos_of = (a >= 0) & (b >= 0) & (s < 0)
    neg_of = (a < 0) & (b < 0) & (s >= 0)
    return jnp.where(pos_of, jnp.int32(0x7FFFFFFF),
                     jnp.where(neg_of, jnp.int32(-0x80000000), s))


def add_sat_w16(a, b):
    """WebRtcSpl_AddSatW16 on int16 values held in int32."""
    return jnp.clip(jnp.asarray(a, I32) + jnp.asarray(b, I32),
                    -32768, 32767).astype(I32)


def sqrt_floor(value):
    """WebRtcSpl_SqrtFloor (spl_sqrt_floor.c): exact bitwise integer
    square root of an int32, 16 unrolled restoring steps."""
    value = jnp.asarray(value, I32)
    root = jnp.zeros_like(value)
    for shift in range(15, -1, -1):
        try1 = root + (1 << shift)
        t = (try1.astype(U32) << shift).astype(I32)   # w32 wrap
        take = value >= t
        value = jnp.where(take, value - t, value)
        root = jnp.where(take, root | (2 << shift), root)
    return root >> 1


def div_u32_u16(num, den):
    """WebRtcSpl_DivU32U16: exact unsigned 32/16 division via bit-serial
    restoring long division (32 unrolled steps — TPU integer division of
    full-range uint32 is not trusted to be exact).  Returns 0xFFFFFFFF
    when den == 0."""
    num = jnp.asarray(num, U32)
    den = jnp.asarray(den, U32) & jnp.uint32(0xFFFF)
    rem = jnp.zeros_like(num)
    quo = jnp.zeros_like(num)
    for i in range(31, -1, -1):
        rem = (rem << 1) | ((num >> i) & jnp.uint32(1))
        take = rem >= den
        rem = jnp.where(take, rem - den, rem)
        quo = jnp.where(take, quo | (jnp.uint32(1) << i), quo)
    return jnp.where(den == 0, jnp.uint32(0xFFFFFFFF), quo)


def popcount32(a):
    """Bit count of the low 32 bits (delay-estimator XOR distance)."""
    import jax.lax as lax
    return lax.population_count(jnp.asarray(a, U32)).astype(I32)


def mul_16_u16(a, b):
    """WEBRTC_SPL_MUL_16_U16: int16 * uint16 -> int32 wrap (low 32 bits
    of the exact product)."""
    a = jnp.asarray(a, I32)
    b = jnp.asarray(b, U32) & jnp.uint32(0xFFFF)
    return (a.astype(U32) * b).astype(I32)


def shift_u32(x, c):
    """WEBRTC_SPL_SHIFT_U32 semantics on uint32: left shift when c >= 0
    (mod-2^32 wrap), LOGICAL right shift otherwise."""
    x = jnp.asarray(x, U32)
    c = jnp.asarray(c, I32)
    cl = jnp.clip(c, 0, 31).astype(U32)
    cr = jnp.clip(-c, 0, 31).astype(U32)
    return jnp.where(c >= 0, x << cl, x >> cr).astype(U32)


def div_w32_w16_exact(num, den):
    """WebRtcSpl_DivW32W16 via exact bit-serial division (C truncation
    toward zero; den == 0 -> 0x7FFFFFFF).  Used where the numerator can
    use the full int32 range — TPU's lowering of `//` is not trusted to
    be exact there."""
    num = jnp.asarray(num, I32)
    den = jnp.asarray(den, I32)
    # |int32 min| wraps to itself; the C abs does the same
    na = jnp.abs(num).astype(U32)
    da = (jnp.abs(den) & 0xFFFF).astype(U32)
    q = div_u32_u16(na, da)
    neg = (num < 0) ^ (den < 0)
    qi = jnp.where(neg, -(q.astype(I32)), q.astype(I32))
    return jnp.where(den == 0, jnp.int32(0x7FFFFFFF), qi)


def div_u32_u32(num, den, zero_result=0xFFFFFFFF):
    """Exact unsigned 32/32 division via bit-serial restoring long
    division (NSX needs full-range uint32 denominators — variance,
    energy and SNR ratios).  den == 0 -> `zero_result`.

    The partial remainder can reach 2^32 after the shift-in when den
    has its top bit set; the pre-shift MSB is carried explicitly so all
    arithmetic stays in uint32."""
    num = jnp.asarray(num, U32)
    den = jnp.asarray(den, U32)
    rem = jnp.zeros_like(num)
    quo = jnp.zeros_like(num)
    one = jnp.uint32(1)
    for i in range(31, -1, -1):
        carry = rem >> 31
        rem = (rem << 1) | ((num >> i) & one)
        take = (carry != 0) | (rem >= den)
        rem = jnp.where(take, rem - den, rem)
        quo = jnp.where(take, quo | (one << i), quo)
    return jnp.where(den == 0, jnp.uint32(zero_result & 0xFFFFFFFF), quo)


def div_w32_w32_exact(num, den):
    """C `int32 / int32` truncating division on full-range operands via
    the exact unsigned bit-serial core (den == 0 -> 0x7FFFFFFF to match
    WebRtcSpl_DivW32W16's guard at the NSX call sites)."""
    num = jnp.asarray(num, I32)
    den = jnp.asarray(den, I32)
    na = jnp.abs(num).astype(U32)
    da = jnp.abs(den).astype(U32)
    q = div_u32_u32(na, da).astype(I32)
    neg = (num < 0) ^ (den < 0)
    qi = jnp.where(neg, -q, q)
    return jnp.where(den == 0, jnp.int32(0x7FFFFFFF), qi)

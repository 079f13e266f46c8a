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
    zero-guard returning 0x7FFFFFFF."""
    num = jnp.asarray(num, I32)
    den = jnp.asarray(den, I32)
    safe = jnp.where(den == 0, 1, den)
    return jnp.where(den == 0, jnp.int32(0x7FFFFFFF), div_trunc(num, safe))


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

"""Pallas TPU mega-kernel: one 20 ms AEC package (5 blocks) per launch.

The production profile showed the batched AEC chain is latency-bound on
XLA kernel count: one 16 kHz package lowers to ~750 small fusions plus
~120 dynamic-update-slices, each costing a fixed few microseconds of
launch + HBM round trip, so a package takes ~4 ms at B=1024 regardless
of FLOPs.  This kernel runs the whole package for a tile of streams in
ONE launch with all state resident in VMEM, and maps the FFTs onto the
MXU as DFT matmuls.

Design notes (vs `wmix_tpu/dsp/aec.py` `process_block_kernel`, the
bit-parity port of aec_core.c:1143-1351/911-1141 whose math this
reproduces in fast-mode float32):

* Newest-first shift storage.  The C far-spectrum ring `xfBuf` is
  indexed `(i + xfBufBlockPos) % 12` with the position decremented every
  block (aec_core.c:1263-1280); partition i of the filter always pairs
  with the i-th newest far block.  Storing the history newest-first and
  shift-inserting each block makes every index static - no dynamic
  slicing anywhere in the kernel.  `xfwBuf` already shifts in C
  (memmove, aec_core.c:1138-1140).
* Package-relative ring elimination.  The C near/out frame rings
  (nearFrBuf/outFrBuf, aec_core.c:1406-1446) exist because frames arrive
  at FRAME_LEN=80 granularity while blocks consume 64.  With the whole
  320-sample package in hand, block b simply reads samples
  [64b, 64b+64), and the package output is the output stream delayed by
  48 samples: concat(carry[48], blocks[:272]) with the last 48 carried
  (verified against the host planner's offsets in
  tests/test_aec_pallas.py).
* FFT = DFT matmul.  All Ooura-layout transforms (aec_rdft.c) become
  [*, 128] @ [128, 130] style matmuls in the packed (re[65], im[65])
  domain; windows (sqrtHanning) and the 2/N inverse scale are folded
  into the matrices.  The filter-adaptation round trip
  ifft -> zero-top-half -> fft (aec_core.c:236-263) is linear, so it is
  precomposed into four 65x65 matrices.
* Scalar-state vectors.  Per-stream scalars (overdrive, NLP minimum
  trackers, aec_core.c:962-1050) ride as [B, 8] lanes; per-block gate
  flags (host noise-estimate counters) arrive via SMEM.

This path is production-only (fast-mode float32): bit-parity with the C
reference is owned by the exact-mode jax path; agreement here is gated
by allclose + behavioral (ERLE) tests.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wmix_tpu.dsp.aec import (
    MIN_FAREND_PSD,
    MIN_OVERDRIVE,
    NUM_PARTITIONS,
    PART_LEN,
    PART_LEN1,
    PART_LEN2,
    PREF_BAND_SIZE,
    SMOOTHING,
    TARGET_SUPP,
    _overdrive_curve,
    _sqrt_hanning,
    _weight_curve,
)

F32 = jnp.float32
I32 = jnp.int32

BLOCKS_PER_PKG = 5          # 320-sample 16 kHz package / PART_LEN
OUT_DELAY = 48              # output stream lag vs near stream (samples)
N_VECS = 11                 # packed [B, N_VECS, 65] spectral state rows
(V_XPOW, V_DPOW, V_DMIN, V_DINITMIN, V_SD, V_SE, V_SX,
 V_SDE0, V_SDE1, V_SXD0, V_SXD1) = range(N_VECS)
SCALAR_F = ("fb_min", "fb_local_min", "xd_avg_min", "over_drive",
            "over_drive_sm")        # [B, 1] float32 per-stream scalars
SCALAR_I = ("delay_idx", "new_min", "min_ctr", "st_near", "echo",
            "diverge")              # [B, 1] int32 per-stream scalars


# -------------------------------------------------------------- matrices

@functools.lru_cache(maxsize=None)
def _dft_mats():
    """DFT matrices in the Ooura-packed (re[65], im[65]) domain.

    Convention (matches ops/rdft.py `_fast_rdft`): re[k] = sum_j x_j
    cos(2 pi j k / 128), im[k] = +sum_j x_j sin(...) (negated numpy
    imag); the packing drops im[0] and im[64].  The unscaled inverse is
    t_j = 0.5 re_0 + 0.5 (-1)^j re_64 + sum_{k=1..63} (re_k cos +
    im_k sin); callers of the C rdft multiply by 2/128 afterwards
    (aec_core.c:1300, 255)."""
    n = PART_LEN2
    j = np.arange(n)[:, None]
    k = np.arange(PART_LEN1)[None, :]
    ang = 2.0 * np.pi * j * k / n
    fre = np.cos(ang)
    fim = np.sin(ang)
    fim[:, 0] = 0.0
    fim[:, PART_LEN] = 0.0
    win = _sqrt_hanning().astype(np.float64)
    win128 = np.concatenate([win[:PART_LEN], win[PART_LEN:0:-1]])
    fwre = win128[:, None] * fre
    fwim = win128[:, None] * fim
    # e-fft: input is [zeros(64), e] so only rows 64.. contribute
    f64re = fre[PART_LEN:, :]
    f64im = fim[PART_LEN:, :]
    # unscaled inverse [65(re)->128] and [65(im)->128]
    gre = np.empty((PART_LEN1, n))
    gim = np.zeros((PART_LEN1, n))
    jj = np.arange(n)[None, :]
    kk = np.arange(PART_LEN1)[:, None]
    gre[:] = np.cos(2.0 * np.pi * kk * jj / n)
    gre[0, :] = 0.5
    gre[PART_LEN, :] = 0.5 * ((-1.0) ** np.arange(n))
    gim[1:PART_LEN, :] = np.sin(
        2.0 * np.pi * np.arange(1, PART_LEN)[:, None] * jj / n)
    scale = 2.0 / n
    # echo-estimate inverse: y = t[64:] * (2/128) (aec_core.c:1296-1303)
    gyre = gre[:, PART_LEN:] * scale
    gyim = gim[:, PART_LEN:] * scale
    # output inverse: full 128, scale folded (aec_core.c:1066-1088)
    gore = gre * scale
    goim = gim * scale
    # adaptation round trip: spectrum -> time (*2/128, first 64 samples)
    # -> spectrum (aec_core.c:236-263), precomposed to 65x65
    a = gre[:, :PART_LEN] * scale      # [65, 64]
    b = gim[:, :PART_LEN] * scale
    f64f_re = fre[:PART_LEN, :]        # forward of a 64-support signal
    f64f_im = fim[:PART_LEN, :]
    f = np.float32
    imask = np.ones(PART_LEN1, np.float32)
    imask[0] = 0.0
    imask[PART_LEN] = 0.0
    cn_re_mask = np.ones(PART_LEN1, np.float32)
    cn_re_mask[0] = 0.0
    cn_im_mask = np.ones(PART_LEN1, np.float32)
    cn_im_mask[0] = 0.0
    cn_im_mask[PART_LEN] = 0.0
    w32 = win.astype(np.float32)
    return dict(
        m128=f(np.concatenate([fre, fim, fwre, fwim], axis=1)),
        m64=f(np.concatenate([f64re, f64im], axis=1)),
        mgy=f(np.concatenate([gyre, gyim], axis=0)),   # [130, 64]
        mgo=f(np.concatenate([gore, goim], axis=1)),
        # adaptation round trip in two hops: spectrum -> 64-sample time
        # (mab: [A | B], each [65, 64]) -> spectrum (mf64: [64, 130]);
        # half the flops of the precomposed 65x65 quadruple and both
        # hops are clean 2D MXU matmuls
        mab=f(np.concatenate([a, b], axis=1)),
        mf64=f(np.concatenate([f64f_re, f64f_im], axis=1)),
        # constant vectors as [1, n] rows (pallas kernels cannot
        # capture array constants; TPU prefers >= 2D anyway)
        imask=imask[None, :],
        cn_re_mask=cn_re_mask[None, :],
        cn_im_mask=cn_im_mask[None, :],
        win_a=w32[None, :PART_LEN],
        win_b=w32[None, PART_LEN:0:-1],
        wcurve=_weight_curve().astype(np.float32)[None, :],
        odcurve=_overdrive_curve().astype(np.float32)[None, :],
    )


CONST_FIELDS = ("m128", "m64", "mgy", "mgo", "mab", "mf64",
                "imask", "cn_re_mask", "cn_im_mask", "win_a", "win_b",
                "wcurve", "odcurve")


def _mxu_precision():
    """HIGHEST by default: the MXU's native bf16 multiply (8-bit
    mantissa) costs hundreds of LSB of drift through the AEC adaptation
    loop over seconds of audio (measured: max 822 LSB vs the jax fast
    path at 10 s); full-f32 multi-pass keeps the DFT matmuls
    bit-comparable (3 LSB at 10 s).  WMIX_MXU_PRECISION=default trades
    parity for throughput (mosaic supports only DEFAULT and HIGHEST
    dot precisions in-kernel).  Read at TRACE time: set it before the
    first chain build of the process (the engine's builder caches do
    not key on it)."""
    import os
    v = os.environ.get("WMIX_MXU_PRECISION", "highest").lower()
    return {"default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[v]


def _mm(x, m):
    return jax.lax.dot_general(
        x, m, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision())


# ---------------------------------------------------------------- kernel

def _block_math(consts, st, near64, xf_re_new, xf_im_new,
                xfw_re_new, xfw_im_new, rand65, f_sel,
                f_gate, f_upd, mult: int, nlp_mode: int):
    """One ProcessBlock + NonLinearProcessing (aec_core.c:1143-1351,
    911-1141), batch-first over a [TB] stream tile; returns the updated
    state dict and the [TB, 64] output block."""
    m128, m64, mgy, mgo = (consts["m128"], consts["m64"],
                           consts["mgy"], consts["mgo"])
    mab, mf64 = consts["mab"], consts["mf64"]
    P1 = PART_LEN1
    g0, g1 = SMOOTHING[mult]
    gp0, gp1 = np.float32(0.9), np.float32(0.1)

    # near fft (TimeToFrequency of dBuf, aec_core.c:1180-1205)
    d_buf = jnp.concatenate([st["d_buf"][:, PART_LEN:], near64], axis=1)
    dspec = _mm(d_buf, m128)
    df_re, df_im = dspec[:, :P1], dspec[:, P1:2 * P1]

        # shift-insert the new far partition (newest first)
    xf_re = jnp.concatenate(
        [jnp.expand_dims(xf_re_new, 1), st["xf_re"][:, :-1]], 1)
    xf_im = jnp.concatenate(
        [jnp.expand_dims(xf_im_new, 1), st["xf_im"][:, :-1]], 1)

    vecs = st["vecs"]
    # power smoothing (aec_core.c:1207-1219)
    far_spec = xf_re_new * xf_re_new + xf_im_new * xf_im_new
    x_pow = gp0 * vecs[:, V_XPOW] + \
        np.float32(gp1 * NUM_PARTITIONS) * far_spec
    near_spec = df_re * df_re + df_im * df_im
    d_pow = gp0 * vecs[:, V_DPOW] + gp1 * near_spec

    # noise estimate (aec_core.c:1222-1248); host-counter gates arrive
    # as traced scalars f_sel (ramp phase) / f_gate (ctr > 50)
    step = np.float32(0.1)
    ramp = np.float32(1.0002)
    d_min_prev = vecs[:, V_DMIN]
    lower = (d_pow + step * (d_min_prev - d_pow)) * ramp
    d_min_upd = jnp.where(d_pow < d_min_prev, lower, d_min_prev * ramp)
    d_min_pow = jnp.where(f_gate, d_min_upd, d_min_prev)
    d_init_prev = vecs[:, V_DINITMIN]
    d_init_upd = jnp.where(
        d_min_pow > d_init_prev,
        np.float32(0.999) * d_init_prev + np.float32(0.001) * d_min_pow,
        d_min_pow)
    d_init_min_pow = jnp.where(f_sel, d_init_upd, d_init_prev)
    noise_pow = jnp.where(f_sel, d_init_min_pow, d_min_pow)

    # FilterFar (aec_core.c:148-170) + echo-estimate inverse
    wf_re, wf_im = st["wf_re"], st["wf_im"]
    yf_re = jnp.sum(xf_re * wf_re - xf_im * wf_im, axis=1)
    yf_im = jnp.sum(xf_re * wf_im + xf_im * wf_re, axis=1)
    y64 = _mm(jnp.concatenate([yf_re, yf_im], axis=1), mgy)
    e = near64 - y64
    e_buf = jnp.concatenate([st["e_buf"][:, PART_LEN:], e], axis=1)

    # error fft ([zeros(64), e] input, aec_core.c:1306-1319)
    espec = _mm(e, m64)
    ef_re, ef_im = espec[:, :P1], espec[:, P1:]

    # ScaleErrorSignal (aec_core.c:172-194)
    mu = np.float32(0.6) if mult == 1 else np.float32(0.5)
    err_th = np.float32(2e-6) if mult == 1 else np.float32(1.5e-6)
    denom = x_pow + np.float32(1e-10)
    ef_re = ef_re / denom
    ef_im = ef_im / denom
    abs_ef = jnp.sqrt(ef_re * ef_re + ef_im * ef_im)
    fac = err_th / (abs_ef + np.float32(1e-10))
    big = abs_ef > err_th
    ef_re = jnp.where(big, ef_re * fac, ef_re) * mu
    ef_im = jnp.where(big, ef_im * fac, ef_im) * mu

    # FilterAdaptation (aec_core.c:222-270): gradient spectrum per
    # partition, then the precomposed ifft/zero/fft round trip
    g_re = xf_re * jnp.expand_dims(ef_re, 1) + \
        xf_im * jnp.expand_dims(ef_im, 1)
    g_im = xf_re * jnp.expand_dims(ef_im, 1) - \
        xf_im * jnp.expand_dims(ef_re, 1)
    # flatten [TB, 12, 65] -> [TB*12, 65]: keeps both hops as plain 2D
    # matmuls (a 3D lhs has been seen lowering off the MXU)
    tb = g_re.shape[0]
    g2r = g_re.reshape(tb * NUM_PARTITIONS, P1)
    g2i = g_im.reshape(tb * NUM_PARTITIONS, P1)
    h64 = _mm(g2r, mab[:, :PART_LEN]) + _mm(g2i, mab[:, PART_LEN:])
    d2 = _mm(h64, mf64)
    d4 = d2.reshape(tb, NUM_PARTITIONS, 2 * P1)
    wf_re = wf_re + d4[:, :, :P1]
    wf_im = wf_im + d4[:, :, P1:] * consts["imask"].reshape(1, 1, -1)

    # ---------------- NonLinearProcessing (aec_core.c:911-1141) --------
    xfw_re = jnp.concatenate(
        [jnp.expand_dims(xfw_re_new, 1), st["xfw_re"][:, :-1]], 1)
    xfw_im = jnp.concatenate(
        [jnp.expand_dims(xfw_im_new, 1), st["xfw_im"][:, :-1]], 1)

    # PartitionDelay (aec_core.c:295-319): first-max over partition
    # energies of the updated filter, gated by the host interval counter
    en = jnp.sum(wf_re * wf_re + wf_im * wf_im, axis=2)       # [TB, 12]
    iota12 = jax.lax.broadcasted_iota(I32, en.shape, 1)
    mx = jnp.max(en, axis=1, keepdims=True)
    first_max = jnp.min(jnp.where(en == mx, iota12,
                                  np.int32(NUM_PARTITIONS)),
                        axis=1, keepdims=True)
    delay_idx = jnp.where(f_upd, first_max, st["delay_idx"])
    sel = jnp.expand_dims((iota12 == delay_idx).astype(F32), 2)
    xfw_d_re = jnp.sum(xfw_re * sel, axis=1)
    xfw_d_im = jnp.sum(xfw_im * sel, axis=1)

    # windowed near/error ffts (SubbandCoherence, aec_core.c:412-450)
    dw = _mm(d_buf, m128[:, 2 * P1:])
    dfw_re, dfw_im = dw[:, :P1], dw[:, P1:]
    ew = _mm(e_buf, m128[:, 2 * P1:])
    efw_re, efw_im = ew[:, :P1], ew[:, P1:]

    # SmoothedPSD (aec_core.c:333-386)
    sd = g0 * vecs[:, V_SD] + g1 * (dfw_re * dfw_re + dfw_im * dfw_im)
    se = g0 * vecs[:, V_SE] + g1 * (efw_re * efw_re + efw_im * efw_im)
    sx = g0 * vecs[:, V_SX] + g1 * jnp.maximum(
        xfw_d_re * xfw_d_re + xfw_d_im * xfw_d_im, MIN_FAREND_PSD)
    sde0 = g0 * vecs[:, V_SDE0] + \
        g1 * (dfw_re * efw_re + dfw_im * efw_im)
    sde1 = g0 * vecs[:, V_SDE1] + \
        g1 * (dfw_re * efw_im - dfw_im * efw_re)
    sxd0 = g0 * vecs[:, V_SXD0] + \
        g1 * (dfw_re * xfw_d_re + dfw_im * xfw_d_im)
    sxd1 = g0 * vecs[:, V_SXD1] + \
        g1 * (dfw_re * xfw_d_im - dfw_im * xfw_d_re)
    sd_sum = jnp.sum(sd, axis=1, keepdims=True)
    se_sum = jnp.sum(se, axis=1, keepdims=True)

    diverge = jnp.where(st["diverge"] != 0,
                        np.float32(1.05) * se_sum, se_sum) > sd_sum
    efw_re = jnp.where(diverge, dfw_re, efw_re)
    efw_im = jnp.where(diverge, dfw_im, efw_im)
    reset_wf = jnp.expand_dims(se_sum > np.float32(19.95) * sd_sum, 2)
    wf_re = jnp.where(reset_wf, jnp.zeros_like(wf_re), wf_re)
    wf_im = jnp.where(reset_wf, jnp.zeros_like(wf_im), wf_im)

    cohde = (sde0 * sde0 + sde1 * sde1) / \
        (sd * se + np.float32(1e-10))
    cohxd = (sxd0 * sxd0 + sxd1 * sxd1) / \
        (sx * sd + np.float32(1e-10))

    # NLP decision logic (aec_core.c:962-1050)
    pref_band = PREF_BAND_SIZE // mult
    min_pref = 4 // mult
    inv_pb = np.float32(1.0 / pref_band)
    h_xd_avg = np.float32(1.0) - jnp.sum(
        cohxd[:, min_pref:min_pref + pref_band], axis=1,
        keepdims=True) * inv_pb
    h_de_avg = jnp.sum(cohde[:, min_pref:min_pref + pref_band], axis=1,
                       keepdims=True) * inv_pb

    xd_min_prev = st["xd_avg_min"]
    h_nl_xd_avg_min = jnp.where(
        (h_xd_avg < np.float32(0.75)) & (h_xd_avg < xd_min_prev),
        h_xd_avg, xd_min_prev)

    st_near_prev = st["st_near"]
    st_near = jnp.where(
        (h_de_avg > np.float32(0.98)) & (h_xd_avg > np.float32(0.9)),
        np.int32(1),
        jnp.where((h_de_avg < np.float32(0.95)) |
                  (h_xd_avg < np.float32(0.8)),
                  np.int32(0), st_near_prev))

    min_od = np.float32(MIN_OVERDRIVE[nlp_mode])
    one_m_cohxd = np.float32(1.0) - cohxd
    both_min = jnp.minimum(cohde, one_m_cohxd)

    # order statistics of the preferred band via rank selection (the C
    # qsort + index pick, aec_core.c:1005-1011); 12 elements, O(n^2)
    # compares are cheaper than a sort network on the VPU
    v = both_min[:, min_pref:min_pref + pref_band]      # [TB, pb]
    vi = jnp.expand_dims(v, 2)
    vj = jnp.expand_dims(v, 1)
    ii = jax.lax.broadcasted_iota(I32, (1, pref_band, pref_band), 1)
    jj = jax.lax.broadcasted_iota(I32, (1, pref_band, pref_band), 2)
    rank = jnp.sum(((vj < vi) | ((vj == vi) & (jj < ii))).astype(I32),
                   axis=2)                              # [TB, pb]
    q75 = int(np.floor(0.75 * (pref_band - 1)))
    q50 = int(np.floor(0.5 * (pref_band - 1)))
    v_q75 = jnp.sum(v * (rank == q75).astype(F32), axis=1, keepdims=True)
    v_q50 = jnp.sum(v * (rank == q50).astype(F32), axis=1, keepdims=True)

    is_min1 = h_nl_xd_avg_min == np.float32(1.0)
    near1 = st_near == 1
    echo_state = jnp.where(is_min1 | near1, np.int32(0), np.int32(1))
    over_drive = jnp.where(is_min1, min_od, st["over_drive"])

    h_nl = jnp.where(is_min1,
                     jnp.where(near1, cohde, one_m_cohxd),
                     jnp.where(near1, cohde, both_min))
    h_fb = jnp.where(is_min1,
                     jnp.where(near1, h_de_avg, h_xd_avg),
                     jnp.where(near1, h_de_avg, v_q75))
    h_fb_low = jnp.where(is_min1,
                         jnp.where(near1, h_de_avg, h_xd_avg),
                         jnp.where(near1, h_de_avg, v_q50))

    # minimum tracking (aec_core.c:1023-1043)
    fb_local_prev = st["fb_local_min"]
    fb_min_prev = st["fb_min"]
    new_min = (h_fb_low < np.float32(0.6)) & (h_fb_low < fb_local_prev)
    h_fb_local_min = jnp.where(new_min, h_fb_low, fb_local_prev)
    h_fb_min = jnp.where(new_min, h_fb_low, fb_min_prev)
    h_new_min = jnp.where(new_min, np.int32(1), st["new_min"])
    h_min_ctr = jnp.where(new_min, np.int32(0), st["min_ctr"])
    h_fb_local_min = jnp.minimum(
        h_fb_local_min + np.float32(0.0008 / mult), np.float32(1.0))
    h_nl_xd_avg_min = jnp.minimum(
        h_nl_xd_avg_min + np.float32(0.0006 / mult), np.float32(1.0))
    h_min_ctr = jnp.where(h_new_min == 1, h_min_ctr + 1, h_min_ctr)
    fire = h_min_ctr == 2
    h_new_min = jnp.where(fire, np.int32(0), h_new_min)
    h_min_ctr = jnp.where(fire, np.int32(0), h_min_ctr)
    od_cand = jnp.maximum(
        np.float32(TARGET_SUPP[nlp_mode]) /
        (jnp.log(h_fb_min + np.float32(1e-10)) + np.float32(1e-10)),
        min_od)
    over_drive = jnp.where(fire, od_cand, over_drive)
    od_sm_prev = st["over_drive_sm"]
    over_drive_sm = jnp.where(
        over_drive < od_sm_prev,
        np.float32(0.99) * od_sm_prev + np.float32(0.01) * over_drive,
        np.float32(0.9) * od_sm_prev + np.float32(0.1) * over_drive)

    # OverdriveAndSuppress (aec_core.c:272-293)
    wcurve = consts["wcurve"]
    odcurve = consts["odcurve"]
    blend = wcurve * h_fb + (np.float32(1.0) - wcurve) * h_nl
    h_nl = jnp.where(h_nl > h_fb, blend, h_nl)
    # powf(h_nl, od_sm * odcurve): h_nl in [0, 1], exponent > 0
    h_nl = jnp.exp((over_drive_sm * odcurve) *
                   jnp.log(h_nl + np.float32(1e-30)))
    efw_re = efw_re * h_nl
    efw_im = efw_im * h_nl * np.float32(-1.0)

    # ComfortNoise (aec_core.c:462-547): host uniforms, shared by the
    # batch (the C PRNG is per-instance; the batch model shares the
    # stream like the daemon's single instance would).  rand65 carries
    # rand[k-1] at lane k (lane 0 is masked - the C noise spans bins
    # 1..64); full-width ops + masks avoid lane-offset concats, which
    # Mosaic cannot relayout
    rand = rand65.astype(F32) * np.float32(1.0 / 32768.0)
    tmp_ang = np.float32(6.28318530717959) * rand      # [1, 65]
    noise = jnp.sqrt(jnp.maximum(noise_pow, 0.0))
    cn_re = noise * jnp.cos(tmp_ang) * consts["cn_re_mask"]
    cn_im = -(noise * jnp.sin(tmp_ang)) * consts["cn_im_mask"]
    lam2 = jnp.sqrt(jnp.maximum(
        np.float32(1.0) - h_nl * h_nl, np.float32(0.0)))
    efw_re = efw_re + lam2 * cn_re
    efw_im = efw_im + lam2 * cn_im

    # inverse error fft + overlap-add (aec_core.c:1066-1088); the Ooura
    # packing negates im, and the jax path packs -efw_im, so the two
    # negations cancel into a subtraction here
    t128 = _mm(efw_re, mgo[:, :PART_LEN2]) - \
        _mm(efw_im, mgo[:, PART_LEN2:])
    first = t128[:, :PART_LEN] * consts["win_a"] + st["out_buf"]
    out_buf = t128[:, PART_LEN:] * consts["win_b"]
    output = jnp.clip(first, -32768.0, 32767.0)

    vecs = jnp.stack([x_pow, d_pow, d_min_pow, d_init_min_pow,
                      sd, se, sx, sde0, sde1, sxd0, sxd1], axis=1)
    st = dict(st)
    st.update(d_buf=d_buf, e_buf=e_buf, out_buf=out_buf, vecs=vecs,
              xf_re=xf_re, xf_im=xf_im, wf_re=wf_re, wf_im=wf_im,
              xfw_re=xfw_re, xfw_im=xfw_im,
              fb_min=h_fb_min, fb_local_min=h_fb_local_min,
              xd_avg_min=h_nl_xd_avg_min, over_drive=over_drive,
              over_drive_sm=over_drive_sm,
              delay_idx=delay_idx, new_min=h_new_min,
              min_ctr=h_min_ctr, st_near=st_near,
              echo=echo_state, diverge=diverge.astype(I32))
    return st, output


STATE_FIELDS = (("vecs", "xf_re", "xf_im", "wf_re", "wf_im",
                 "xfw_re", "xfw_im", "d_buf", "e_buf", "out_buf",
                 "out_carry") + SCALAR_F + SCALAR_I)


def init_pallas_state(batch: int):
    """Fresh state matching WebRtcAec_InitAec (aec_core.c:1527-1688)."""
    z = lambda *s: jnp.zeros((batch,) + s, F32)
    vecs = np.zeros((batch, N_VECS, PART_LEN1), np.float32)
    vecs[:, V_DMIN] = 1.0e6
    vecs[:, V_SD] = 1.0
    vecs[:, V_SX] = 1.0
    ones = jnp.ones((batch, 1), F32)
    twos = jnp.full((batch, 1), 2.0, F32)
    zi = jnp.zeros((batch, 1), I32)
    return dict(
        vecs=jnp.asarray(vecs),
        xf_re=z(NUM_PARTITIONS, PART_LEN1),
        xf_im=z(NUM_PARTITIONS, PART_LEN1),
        wf_re=z(NUM_PARTITIONS, PART_LEN1),
        wf_im=z(NUM_PARTITIONS, PART_LEN1),
        xfw_re=z(NUM_PARTITIONS, PART_LEN1),
        xfw_im=z(NUM_PARTITIONS, PART_LEN1),
        d_buf=z(PART_LEN2), e_buf=z(PART_LEN2), out_buf=z(PART_LEN),
        out_carry=z(OUT_DELAY),
        fb_min=ones, fb_local_min=ones, xd_avg_min=ones,
        over_drive=twos, over_drive_sm=twos,
        delay_idx=zi, new_min=zi, min_ctr=zi, st_near=zi,
        echo=zi, diverge=zi,
    )


def _package_body(consts, st, near320, xf5r, xf5i, xfw5r, xfw5i,
                  rand, flag_triples,
                  mult: int, nlp_mode: int):
    """Whole-package math shared by the pallas kernel and the plain-jax
    reference: 5 blocks + the 48-sample output-stream delay.
    flag_triples: per block (noise_sel_init, noise_gate_open,
    update_delay_idx) traced booleans."""
    outs = []
    for b in range(BLOCKS_PER_PKG):
        f_sel, f_gate, f_upd = flag_triples[b]
        st, out64 = _block_math(
            consts, st,
            near320[:, b * PART_LEN:(b + 1) * PART_LEN],
            xf5r[:, b], xf5i[:, b], xfw5r[:, b], xfw5i[:, b],
            rand[b:b + 1],
            f_sel, f_gate, f_upd, mult, nlp_mode)
        outs.append(out64)
    stream = jnp.concatenate(outs, axis=1)              # [TB, 320]
    pkg_out = jnp.concatenate(
        [st["out_carry"], stream[:, :PKG_LEN - OUT_DELAY]], axis=1)
    st = dict(st)
    st["out_carry"] = stream[:, PKG_LEN - OUT_DELAY:]
    return st, pkg_out


PKG_LEN = BLOCKS_PER_PKG * PART_LEN


_cache_configured = False


def _ensure_compile_cache():
    """Persist compiled executables (the package kernel costs minutes
    cold); opt out with WMIX_COMPILE_CACHE=0."""
    global _cache_configured
    if _cache_configured:
        return
    _cache_configured = True
    import os
    if os.environ.get("WMIX_COMPILE_CACHE", "") == "0":
        return
    if jax.config.jax_compilation_cache_dir:
        return
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # key the cache on the machine: XLA's CPU AOT cache entries embed
    # target features of the COMPILING host and load with "could lead
    # to execution errors" warnings (and observed 1-LSB float diffs)
    # when the repo moves between machines.  Hostname is useless here
    # (every container is "vm"); hash the host CPU feature flags.
    import hashlib
    import platform
    feats = b""
    model = b""
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if not feats and line.startswith((b"flags", b"Features")):
                    feats = b" ".join(sorted(
                        line.split(b":", 1)[1].split()))
                if not model and line.startswith(b"model name"):
                    model = line.split(b":", 1)[1].strip()
                if feats and model:
                    break
    except OSError:
        pass
    # model name included: XLA:CPU picks tuning features (e.g.
    # prefer-no-gather) from the CPU MODEL, not the flag set — two hosts
    # with identical cpuinfo flags but different models produce
    # incompatible AOT entries (observed: feature-mismatch load warnings
    # and potential SIGILL)
    tag = (f"{platform.machine()}-"
           f"{hashlib.sha1(feats + b'|' + model).hexdigest()[:12]}")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache", tag))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5)
    except Exception:
        pass


def build_package_fn(mult: int = 2, nlp_mode: int = 1,
                     tile: int = 128, interpret: bool = False,
                     jit: bool = True):
    """Returns fn(state_dict, near320[B], xf5r/xf5i/xfw5r/xfw5i
    [B,5,65], rand[5,64] i32, flags[5,3] i32) -> (state_dict,
    out320[B]).

    One pallas launch per package; grid over batch tiles of `tile`
    streams; state aliased in place."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not interpret:
        _ensure_compile_cache()
    mats = _dft_mats()
    consts = {k: jnp.asarray(v) for k, v in mats.items()}

    def kernel(flags_ref, rand_ref, near_ref, xf5r_ref, xf5i_ref,
               xfw5r_ref, xfw5i_ref, *refs):
        nc = len(CONST_FIELDS)
        cvals = {k: r[:] for k, r in zip(CONST_FIELDS, refs[:nc])}
        state_refs = refs[nc:]
        in_refs = state_refs[:len(STATE_FIELDS)]
        out_refs = state_refs[len(STATE_FIELDS):-1]
        pkg_out_ref = state_refs[-1]
        st = {k: r[:] for k, r in zip(STATE_FIELDS, in_refs)}
        triples = [(flags_ref[b, 0] != 0, flags_ref[b, 1] != 0,
                    flags_ref[b, 2] != 0) for b in range(BLOCKS_PER_PKG)]
        st, pkg_out = _package_body(
            cvals, st, near_ref[:], xf5r_ref[:], xf5i_ref[:],
            xfw5r_ref[:], xfw5i_ref[:],
            rand_ref[:], triples, mult, nlp_mode)
        for k, r in zip(STATE_FIELDS, out_refs):
            r[:] = st[k]
        pkg_out_ref[:] = pkg_out

    def fn(state, near320, xf5r, xf5i, xfw5r, xfw5i, rand, flags):
        batch = near320.shape[0]
        tsize = next(t for t in (tile, 128, 64, 32, 16, 8, 4, 2, 1)
                     if t <= tile and batch % t == 0)
        grid = (batch // tsize,)

        def bspec(arr):
            blk = (tsize,) + arr.shape[1:]
            nz = len(arr.shape) - 1
            return pl.BlockSpec(
                blk, lambda i, _n=nz: (i,) + (0,) * _n,
                memory_space=pltpu.ANY if False else pltpu.VMEM)

        def shared(arr):
            nz = len(arr.shape)
            return pl.BlockSpec(
                arr.shape, lambda i, _n=nz: (0,) * _n,
                memory_space=pltpu.VMEM)

        state_vals = [state[k] for k in STATE_FIELDS]
        const_vals = [consts[k] for k in CONST_FIELDS]
        flags_spec = pl.BlockSpec(
            flags.shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
        in_specs = ([flags_spec, shared(rand), bspec(near320),
                     bspec(xf5r), bspec(xf5i),
                     bspec(xfw5r), bspec(xfw5i)] +
                    [shared(v) for v in const_vals] +
                    [bspec(v) for v in state_vals])
        out_shapes = ([jax.ShapeDtypeStruct(v.shape, v.dtype)
                       for v in state_vals] +
                      [jax.ShapeDtypeStruct((batch, PKG_LEN), F32)])
        out_specs = ([bspec(v) for v in state_vals] +
                     [bspec(near320)])
        # alias the state inputs onto the state outputs (in-place)
        base = 7 + len(CONST_FIELDS)
        aliases = {base + i: i for i in range(len(STATE_FIELDS))}
        params = {}
        if not interpret:
            from jax.experimental.pallas import tpu as _pltpu
            # per-tile working set exceeds the 16 MB scoped-vmem
            # default at tile >= 128; v5e has 128 MB VMEM
            params["compiler_params"] = _pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            input_output_aliases=aliases,
            interpret=interpret,
            **params,
        )(flags, rand, near320, xf5r, xf5i, xfw5r, xfw5i,
          *const_vals, *state_vals)
        new_state = dict(zip(STATE_FIELDS, outs[:len(STATE_FIELDS)]))
        return new_state, outs[-1]

    if jit:
        # jit with state donation: without it XLA copies every aliased
        # operand (and has been seen promoting the copies into VMEM,
        # which OOMs at batch >= 1024)
        return jax.jit(fn, donate_argnums=(0,))
    return fn


def package_body_ref(state, near320, xf5r, xf5i, xfw5r, xfw5i,
                     rand, flags,
                     mult: int = 2, nlp_mode: int = 1):
    """Plain-jax reference of the package body (no pallas), for tests."""
    consts = {k: jnp.asarray(v) for k, v in _dft_mats().items()}
    triples = [(flags[b, 0] != 0, flags[b, 1] != 0, flags[b, 2] != 0)
               for b in range(BLOCKS_PER_PKG)]
    return _package_body(consts, state, near320, xf5r, xf5i, xfw5r,
                         xfw5i, rand, triples, mult, nlp_mode)


# ------------------------------------------------- engine integration

def is_steady_16k(signature) -> bool:
    """The (normalized) 16 kHz steady-state plan shape: 2 subpackages,
    no startup passthrough, frames carrying (1, 1 | 1, 2) blocks."""
    if len(signature) != 2:
        return False
    (_, s0, f0), (_, s1, f1) = signature
    return (not s0 and not s1 and len(f0) == 2 and len(f1) == 2 and
            [len(fr) for fr in f0] == [1, 1] and
            [len(fr) for fr in f1] == [1, 2])


STEADY_FRAME_NEAR_REL = (0, 80, 16, 96)
STEADY_FRAME_OUT_REL = (96, 32, 112, 48)
STEADY_BLK_REL = (0, 64, 128, 48, 112)


def is_steady_dyn(dyn) -> bool:
    """True when a package's ring offsets follow the steady 16 kHz
    pattern the kernel bakes in.  The FIRST post-startup package is
    irregular (the C out ring's initial 64-zero priming shifts its frame
    reads, aec_core.c:1589) and must run the jax path."""
    import numpy as _np
    fn_ = _np.asarray(dyn["frame_near"])
    if fn_.shape[0] != 4:
        return False
    base = int(fn_[0])
    n = 144
    rel = lambda v: tuple(int(x) for x in ((_np.asarray(v) - base) % n))
    return (rel(dyn["frame_near"]) == STEADY_FRAME_NEAR_REL and
            rel(dyn["frame_out"]) == STEADY_FRAME_OUT_REL and
            rel(dyn["blk_near"]) == STEADY_BLK_REL and
            rel(dyn["blk_out"]) == STEADY_BLK_REL)


def convert_eng_state(eng, dyn):
    """AecEngState (the exact-layout jax engine state) -> pallas state,
    at a package boundary, given the dyn of the NEXT (steady) package.

    Layout changes: partition rings become newest-first shift buffers,
    the near ring disappears (zero leftover at 16 kHz package
    boundaries), and the out ring reduces to the 48-sample stream
    carry."""
    dev = eng.dev
    batch = dev.d_buf.shape[0]
    vecs = jnp.stack([
        dev.x_pow, dev.d_pow, dev.d_min_pow, dev.d_init_min_pow,
        dev.sd, dev.se, dev.sx,
        dev.sde[:, :, 0], dev.sde[:, :, 1],
        dev.sxd[:, :, 0], dev.sxd[:, :, 1]], axis=1)
    # xfBuf ring -> newest-first: the next package's first block writes
    # at blk_xf[0], so the newest partition sits at blk_xf[0] + 1
    pos = int(dyn["blk_xf"][0])
    perm = [(pos + 1 + i) % NUM_PARTITIONS
            for i in range(NUM_PARTITIONS)]
    xf = dev.xf_buf[:, perm]
    # xfwBuf: slot 0 is scratch (rewritten every block); true history
    # lives in slots 1..11 (see _block_math's shift-insert)
    wperm = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 11]
    xfw = dev.xfw_buf[:, wperm]
    carry_idx = (int(dyn["frame_out"][0]) +
                 np.arange(OUT_DELAY)) % eng.out_fr.shape[1]
    col = lambda x, dt: jnp.asarray(x, dt).reshape(batch, 1)
    return dict(
        vecs=vecs,
        xf_re=xf[:, :, 0], xf_im=xf[:, :, 1],
        wf_re=dev.wf_buf[:, :, 0], wf_im=dev.wf_buf[:, :, 1],
        xfw_re=xfw[:, :, 0], xfw_im=xfw[:, :, 1],
        d_buf=dev.d_buf, e_buf=dev.e_buf, out_buf=dev.out_buf,
        out_carry=eng.out_fr[:, carry_idx],
        fb_min=col(dev.h_nl_fb_min, F32),
        fb_local_min=col(dev.h_nl_fb_local_min, F32),
        xd_avg_min=col(dev.h_nl_xd_avg_min, F32),
        over_drive=col(dev.over_drive, F32),
        over_drive_sm=col(dev.over_drive_sm, F32),
        delay_idx=col(dev.delay_idx, I32),
        new_min=col(dev.h_nl_new_min, I32),
        min_ctr=col(dev.h_nl_min_ctr, I32),
        st_near=col(dev.st_near_state, I32),
        echo=col(dev.echo_state, I32),
        diverge=col(dev.diverge_state, I32),
    )


def build_far_body(signature, sub_len: int):
    """BufferFarend only (far_pre ring + partition extractions into the
    far spectrum store) — the front section of
    aec_step.build_pkg_body, reused by the pallas package step."""
    from wmix_tpu.engine import aec_step
    from wmix_tpu.dsp.aec import time_to_frequency_pair

    vttf = jax.vmap(time_to_frequency_pair)

    def fn(far_pre, far_parts, farw_parts, far_pkg, dyn):
        ei = 0
        for si, (n_extr, _startup, _blk) in enumerate(signature):
            farsub = far_pkg[:, si * sub_len:(si + 1) * sub_len]
            far_pre = aec_step._ring_write(
                far_pre, dyn["pre_writes"][si], farsub)
            for _ in range(n_extr):
                seg = aec_step._ring_read(
                    far_pre, dyn["extr_pre"][ei], PART_LEN2)
                xfp, xfwp = vttf(seg)
                slot = dyn["extr_slots"][ei]
                far_parts = jax.lax.dynamic_update_slice_in_dim(
                    far_parts, xfp[:, None], slot, axis=1)
                farw_parts = jax.lax.dynamic_update_slice_in_dim(
                    farw_parts, xfwp[:, None], slot, axis=1)
                ei += 1
        return far_pre, far_parts, farw_parts

    return fn


class AecBatchPallas:
    """Batched AEC with the pallas package kernel on the steady path.

    Mirrors `aec_step.AecBatch.step`; startup (and any non-steady plan)
    runs through the exact-layout jax path, and the state converts to
    the pallas layout at the first steady package.  Fast-mode float32
    only — parity with the C reference is owned by the jax path."""

    def __init__(self, batch: int, freq: int = 16000,
                 part_cap: int = None, tile: int = 128,
                 interpret: bool = False):
        from wmix_tpu.engine import aec_step
        from wmix_tpu.engine.aec_plan import AecPlanner
        assert freq == 16000, "pallas AEC path is 16 kHz-only for now"
        self.batch = batch
        self.tile = min(tile, batch)
        self.interpret = interpret
        self.part_cap = part_cap or aec_step.DEFAULT_PART_CAP
        self.planner = AecPlanner(freq)
        self.sub_len = 160
        self.eng = aec_step.init_eng_state(batch, self.part_cap)
        self.pstate = None
        self.far_pre = None      # split out of AecEngState post-convert
        self.far_parts = None
        self.farw_parts = None
        self._pkg_fn = build_package_fn(
            self.planner.mult, self.planner.nlp_mode,
            tile=self.tile, interpret=interpret)

    def step(self, far_pkg, near_pkg):
        from wmix_tpu.engine import aec_step
        plan = self.planner.plan_pkg()
        sig = plan.signature()
        dyn = aec_step.pack_dyn(plan, self.part_cap)
        if self.pstate is None and is_steady_16k(sig):
            self.pstate = convert_eng_state(self.eng, dyn)
            self.far_pre = self.eng.far_pre
            self.far_parts = self.eng.far_parts
            self.farw_parts = self.eng.farw_parts
            self.eng = None
        if self.pstate is None:
            fn = aec_step.build_pkg_fn(sig, self.sub_len,
                                       self.planner.mult,
                                       self.planner.nlp_mode)
            self.eng, out = fn(self.eng, far_pkg, near_pkg, dyn)
            return out
        assert is_steady_16k(sig), sig
        far_fn = _far_fn_cached(sig, self.sub_len)
        self.far_pre, self.far_parts, self.farw_parts = far_fn(
            self.far_pre, self.far_parts, self.farw_parts,
            jnp.asarray(far_pkg, F32), _np_dyn(dyn))
        slots = jnp.asarray(dyn["blk_far"], I32)
        xf5 = jnp.take(self.far_parts, slots, axis=1)
        xfw5 = jnp.take(self.farw_parts, slots, axis=1)
        self.pstate, out = self._pkg_fn(
            self.pstate, jnp.asarray(near_pkg, F32),
            xf5[:, :, :PART_LEN1], xf5[:, :, PART_LEN1:],
            xfw5[:, :, :PART_LEN1], xfw5[:, :, PART_LEN1:],
            jnp.asarray(np.concatenate(
                [np.zeros((BLOCKS_PER_PKG, 1), np.int32),
                 dyn["blk_rand"]], axis=1), I32),
            jnp.asarray(dyn["blk_flags"], I32))
        return out


def _np_dyn(dyn):
    return {k: jnp.asarray(v) for k, v in dyn.items()}


@functools.lru_cache(maxsize=8)
def _far_fn_cached(signature, sub_len):
    return jax.jit(build_far_body(signature, sub_len))


class PallasAecState(NamedTuple):
    """ChainState.aec for the pallas path: the far-end machinery keeps
    the exact jax layout (ring + partition store); the block state lives
    in the kernel layout."""
    far_pre: jax.Array       # [B, FAR_PRE_BUF_SIZE]
    far_parts: jax.Array     # [B, part_cap, 130]
    farw_parts: jax.Array    # [B, part_cap, 130]
    p: dict                  # kernel-layout block state


def convert_chain_aec(eng, dyn) -> "PallasAecState":
    """AecEngState -> PallasAecState at a steady package boundary."""
    return PallasAecState(eng.far_pre, eng.far_parts, eng.farw_parts,
                          convert_eng_state(eng, dyn))


def init_chain_aec(batch: int, part_cap: int) -> "PallasAecState":
    z = lambda *sh: jnp.zeros(sh, F32)
    from wmix_tpu.engine.aec_plan import FAR_PRE_BUF_SIZE
    return PallasAecState(
        z(batch, FAR_PRE_BUF_SIZE),
        z(batch, part_cap, 2 * PART_LEN1),
        z(batch, part_cap, 2 * PART_LEN1),
        init_pallas_state(batch))


def build_chain_aec_body(signature, sub_len: int, mult: int,
                         nlp_mode: int, tile: int = 256,
                         interpret: bool = False):
    """aec_body drop-in for chain._build_chain_body: fn(PallasAecState,
    far_pkg, near_pkg, dyn) -> (PallasAecState, out) — far machinery in
    jax, the 5-block package in one pallas launch."""
    far_fn = build_far_body(signature, sub_len)
    pkg_fn = build_package_fn(mult, nlp_mode, tile=tile,
                              interpret=interpret, jit=False)

    def fn(ast: PallasAecState, far_pkg, near_pkg, dyn):
        far_pre, fp, fwp = far_fn(ast.far_pre, ast.far_parts,
                                  ast.farw_parts, far_pkg, dyn)
        slots = dyn["blk_far"]
        xf5 = jnp.take(fp, slots, axis=1)
        xfw5 = jnp.take(fwp, slots, axis=1)
        rand65 = jnp.concatenate(
            [jnp.zeros((BLOCKS_PER_PKG, 1), I32),
             dyn["blk_rand"].astype(I32)], axis=1)
        pst, out = pkg_fn(ast.p, near_pkg,
                          xf5[:, :, :PART_LEN1], xf5[:, :, PART_LEN1:],
                          xfw5[:, :, :PART_LEN1], xfw5[:, :, PART_LEN1:],
                          rand65, dyn["blk_flags"].astype(I32))
        return PallasAecState(far_pre, fp, fwp, pst), out

    return fn


def pallas_enabled(freq: int) -> bool:
    """Production default: the pallas AEC serves 16 kHz fast-mode TPU
    deployments.  WMIX_PALLAS=0 forces the jax path; WMIX_PALLAS=1
    forces pallas (interpret mode off-TPU, for tests)."""
    import os
    v = os.environ.get("WMIX_PALLAS", "")
    if v == "0":
        return False
    if freq != 16000:
        return False
    from wmix_tpu.dsp import floatops
    if not floatops.fast_mode():
        return False
    if v not in ("", "0"):
        return True
    return jax.default_backend() == "tpu"

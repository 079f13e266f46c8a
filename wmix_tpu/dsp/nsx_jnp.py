"""Batched (vmappable) NSX core math in JAX — the device half of the
engine's ``ns_backend="nsx"`` offering (VERDICT r2 next-round #5,
second half).

Bit-exact integer re-derivation of nsx_core.c / nsx_core_c.c ProcessCore
matching the host-side reference port `wmix_tpu/dsp/nsx.py` (itself
gated sample-for-sample against the compiled C in tests/test_nsx.py):

  * the spl int16 complex FFT (complex_fft.c mode 1) generalized over
    order 7 (8 kHz, 128-point) and order 8 (16/32 kHz, 256-point) as
    unrolled vectorized butterfly stages;
  * quantile noise estimation (3 simultaneous log-domain estimates),
    startup white/pink parametric noise model;
  * LRT / spectral-flatness / spectral-difference features with the
    512-block histogram threshold adaptation (one-hot scatter adds,
    vectorized top-2 peak scans);
  * speech/noise probability, Wiener gain, energy-ratio gain mapping,
    overlap-add synthesis, and the high-band time-domain gain path.

Everything is int32/uint32 (TPU has no int64; full-range divisions use
the exact bit-serial forms in dsp/intops.py).  All control flow is
data-dependent (zero-input blocks gate block_index) so everything is
jnp.where selection — there is no host planner; the chain simply runs
this core twice per 20 ms package.

Reference: /root/reference pkg webrtc nsx_core.c:1501-2118 ProcessCore;
selected by the daemon's MAKE_WEBRTC_NSX build switch
(src/webrtc.c:511-530).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from wmix_tpu.dsp.intops import (
    I32, U32, add_sat_w16, div_u32_u16, div_u32_u32, div_w32_w16_exact,
    div_w32_w32_exact, norm_u32, norm_w16, norm_w32, sat_w16, shift_u32,
    shift_w32, sqrt_floor, wrap16)
from wmix_tpu.dsp import aecm as _host_aecm
from wmix_tpu.dsp.aecm import SIN_TABLE_1024, _bit_reverse_perm
from wmix_tpu.dsp.nsx import (
    ANAL_BLOCKL_MAX, BIN_SIZE_LRT, BLOCKS_160W256, BLOCKS_80W128,
    COUNTER_DIV, DD_PR_SNR_Q11, DETERMINANT_EST_MATRIX, END_STARTUP_LONG,
    END_STARTUP_SHORT, FACTOR1, FACTOR2_AGGR1, FACTOR2_AGGR2,
    FACTOR2_AGGR3, FACTOR_1_LRT_DIFF, FACTOR_2_FLAT_Q10, FACTOR_Q16,
    FACTOR_Q7, FACTOR_Q7_STARTUP, GAMMA_NOISE_TRANS_AND_SPEECH_Q8,
    HALF_ANAL_BLOCKL, HIST_PAR_EST, INDICATOR_TABLE, K_START_BAND,
    LIM_PEAK_SPACE_FLAT_DIFF, LIM_PEAK_WEIGHT_FLAT_DIFF, LOG_INDEX,
    LOG_TABLE, LOG_TABLE_FRAC, MAX_DIFF, MAX_FLAT_Q10, MIN_DIFF,
    MIN_FLAT_Q10, NOISE_UPDATE_Q8, NUM_HIGH_BANDS_MAX,
    ONE_MINUS_DD_PR_SNR_Q11, ONE_MINUS_GAMMA_PAUSE_Q8,
    ONE_MINUS_PROB_RANGE_Q8, PRIOR_UPDATE_Q14, SIMULT,
    SPECT_DIFF_TAVG_Q8, SPECT_FLAT_TAVG_Q14, STAT_UPDATES,
    SUM_LOG_INDEX, SUM_SQUARE_LOG_INDEX, THRES_FLUCT_LRT,
    THRES_PEAK_FLAT, THRES_WEIGHT_FLAT_DIFF, WIDTH_Q8, _SAT_MAX)

I16_MAX = 32767

_SIN1024 = np.asarray(SIN_TABLE_1024, np.int32)
_LOG_TABLE_FRAC = np.asarray(LOG_TABLE_FRAC, np.int32)
_LOG_INDEX = np.asarray(LOG_INDEX, np.int32)
_COUNTER_DIV = np.asarray(COUNTER_DIV, np.int32)
_INDICATOR = np.asarray(INDICATOR_TABLE, np.int32)
_FACTOR1 = np.asarray(FACTOR1, np.int32)
_FACTOR2 = {1: np.asarray(FACTOR2_AGGR1, np.int32),
            2: np.asarray(FACTOR2_AGGR2, np.int32),
            3: np.asarray(FACTOR2_AGGR3, np.int32)}

CFFTSFT = 14
CFFTRND = 1
CFFTRND2 = 16384
CIFFTSFT = 14
CIFFTRND = 1


def _u32(x):
    return jnp.asarray(x).astype(U32)


def _i32(x):
    return jnp.asarray(x).astype(I32)


def _wsum(x, axis=-1):
    """int32 wraparound sum (C w32 fold; int add is associative)."""
    return jnp.sum(_i32(x), axis=axis, dtype=I32)


def _usum(x, axis=-1):
    """uint32 mod-2^32 sum."""
    return jnp.sum(_u32(x), axis=axis, dtype=U32)


def _shr_u32_full(x, n):
    """Logical right shift with C-python semantics for n >= 32
    (result 0) and n < 0 clamped to 0 — XLA's own out-of-range shift
    is undefined."""
    x = _u32(x)
    n = _i32(n)
    y = x >> jnp.clip(n, 0, 31).astype(U32)
    return jnp.where(n >= 32, jnp.uint32(0), y)


def _mul_round(a, b, shift: int):
    """WEBRTC_SPL_MUL_16_16_RSFT_WITH_ROUND in int32 range."""
    return (_i32(a) * _i32(b) + (1 << (shift - 1))) >> shift


def _log2_frac_u16(v):
    """((31-zeros)<<8) + kLogTableFrac[frac]; v uint32 (guarded > 0 by
    callers via where)."""
    v = _u32(v)
    zeros = norm_u32(v)
    frac = ((v << zeros.astype(U32)) & jnp.uint32(0x7FFFFFFF)) >> 23
    tab = jnp.asarray(_LOG_TABLE_FRAC)
    return ((31 - zeros) << 8) + tab[frac.astype(I32)]


# --------------------------------------------------------------------------
# spl complex FFT, order-parameterized (complex_fft.c mode 1)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _perm(order: int):
    return np.asarray(_bit_reverse_perm(order), np.int32)


def _stage_twiddles(l: int, k: int, inverse: bool):
    m = np.arange(l, dtype=np.int32)
    j = m << k
    wr = _SIN1024[j + 256].astype(np.int32)
    wi = _SIN1024[j].astype(np.int32)
    if not inverse:
        wi = -wi
    return jnp.asarray(wr), jnp.asarray(wi)


def complex_fft_mode1(re, im, order: int):
    """Forward WebRtcSpl_ComplexFFT mode 1 over [..., n] int32 re/im
    (already bit-reversed), n = 2^order."""
    n = 1 << order
    l, k = 1, 9
    while l < n:
        istep = l << 1
        wr, wi = _stage_twiddles(l, k, inverse=False)
        sh = re.shape[:-1]
        r = re.reshape(sh + (n // istep, istep))
        i = im.reshape(sh + (n // istep, istep))
        r_a, r_b = r[..., :l], r[..., l:]
        i_a, i_b = i[..., :l], i[..., l:]
        tr = (wr * r_b - wi * i_b + CFFTRND) >> (15 - CFFTSFT)
        ti = (wr * i_b + wi * r_b + CFFTRND) >> (15 - CFFTSFT)
        qr = r_a << CFFTSFT
        qi = i_a << CFFTSFT
        r_b2 = wrap16((qr - tr + CFFTRND2) >> (1 + CFFTSFT))
        i_b2 = wrap16((qi - ti + CFFTRND2) >> (1 + CFFTSFT))
        r_a2 = wrap16((qr + tr + CFFTRND2) >> (1 + CFFTSFT))
        i_a2 = wrap16((qi + ti + CFFTRND2) >> (1 + CFFTSFT))
        re = jnp.concatenate([r_a2, r_b2], axis=-1).reshape(sh + (n,))
        im = jnp.concatenate([i_a2, i_b2], axis=-1).reshape(sh + (n,))
        k -= 1
        l = istep
    return re, im


def complex_ifft_mode1(re, im, order: int):
    """Inverse mode 1; returns (re, im, scale[...]) with the per-stage
    data-dependent scaling (per stream)."""
    n = 1 << order
    scale = jnp.zeros(re.shape[:-1], I32)
    l, k = 1, 9
    while l < n:
        mx = jnp.maximum(jnp.max(jnp.abs(re), axis=-1),
                         jnp.max(jnp.abs(im), axis=-1))
        sh1 = (mx > 13573).astype(I32)
        sh2 = (mx > 27146).astype(I32)
        shift = sh1 + sh2
        scale = scale + shift
        round2 = jnp.int32(8192) << shift
        shift_e = (shift + CIFFTSFT)[..., None, None]
        round_e = round2[..., None, None]
        istep = l << 1
        wr, wi = _stage_twiddles(l, k, inverse=True)
        sh = re.shape[:-1]
        r = re.reshape(sh + (n // istep, istep))
        i = im.reshape(sh + (n // istep, istep))
        r_a, r_b = r[..., :l], r[..., l:]
        i_a, i_b = i[..., :l], i[..., l:]
        tr = (wr * r_b - wi * i_b + CIFFTRND) >> (15 - CIFFTSFT)
        ti = (wr * i_b + wi * r_b + CIFFTRND) >> (15 - CIFFTSFT)
        qr = r_a << CIFFTSFT
        qi = i_a << CIFFTSFT
        r_b2 = wrap16((qr - tr + round_e) >> shift_e)
        i_b2 = wrap16((qi - ti + round_e) >> shift_e)
        r_a2 = wrap16((qr + tr + round_e) >> shift_e)
        i_a2 = wrap16((qi + ti + round_e) >> shift_e)
        re = jnp.concatenate([r_a2, r_b2], axis=-1).reshape(sh + (n,))
        im = jnp.concatenate([i_a2, i_b2], axis=-1).reshape(sh + (n,))
        k -= 1
        l = istep
    return re, im, scale


def real_forward_fft(x, order: int):
    """WebRtcSpl_RealForwardFFT over [..., n] int32 real input:
    returns (re[..., n/2+1], im[..., n/2+1])."""
    n2 = (1 << order) // 2
    perm = jnp.asarray(_perm(order))
    re = jnp.take(x, perm, axis=-1)
    im = jnp.zeros_like(re)
    re, im = complex_fft_mode1(re, im, order)
    return re[..., :n2 + 1], im[..., :n2 + 1]


def real_inverse_fft(re_h, im_h, order: int):
    """WebRtcSpl_RealInverseFFT: conj-symmetric expansion + inverse;
    re_h/im_h [..., n/2+1]; returns (real[..., n], scale[...])."""
    n2 = (1 << order) // 2
    rev = slice(n2 - 1, 0, -1)
    re_full = jnp.concatenate([re_h, re_h[..., rev]], axis=-1)
    im_full = jnp.concatenate([im_h, -im_h[..., rev]], axis=-1)
    perm = jnp.asarray(_perm(order))
    re = jnp.take(re_full, perm, axis=-1)
    im = jnp.take(im_full, perm, axis=-1)
    re, im, scale = complex_ifft_mode1(re, im, order)
    return re, scale


# --------------------------------------------------------------------------
# config + state
# --------------------------------------------------------------------------

class NsxConfig(NamedTuple):
    fs: int
    mode: int
    blk: int                  # block_len_10ms
    ana_len: int
    stages: int
    magn_len: int
    threshold_log_lrt_init: int
    max_lrt: int
    min_lrt: int
    overdrive: int
    denoise_bound: int
    gain_map: int


@functools.lru_cache(maxsize=None)
def make_config(fs: int, mode: int = 2) -> NsxConfig:
    if fs not in (8000, 16000, 32000, 48000):
        raise ValueError("NSX supports 8000/16000/32000/48000")
    if fs == 8000:
        blk, ana, st = 80, 128, 7
        thr, mx, mn = 131072, 0x0040000, 52429
    else:
        blk, ana, st = 160, 256, 8
        thr, mx, mn = 212644, 0x0080000, 104858
    od, db, gm = {0: (256, 8192, 0), 1: (256, 4096, 1),
                  2: (282, 2048, 1), 3: (320, 1475, 1)}[mode]
    return NsxConfig(fs, mode, blk, ana, st, ana // 2 + 1,
                     thr, mx, mn, od, db, gm)


def _window_np(cfg: NsxConfig):
    w = BLOCKS_80W128 if cfg.ana_len == 128 else BLOCKS_160W256
    return np.asarray(w, np.int32)


class NsxState(NamedTuple):
    """Per-stream NSX core state; every leaf int32/uint32.  Under the
    engine the leaves carry a leading [B] batch axis."""
    analysis_buffer: jnp.ndarray      # [ana_len] i32
    synthesis_buffer: jnp.ndarray     # [ana_len] i32
    data_buf_hb: jnp.ndarray          # [2, ana_len] i32
    noise_est_quantile: jnp.ndarray   # [magn_len] i32
    noise_est_log_quantile: jnp.ndarray   # [3, magn_len] i32
    noise_est_density: jnp.ndarray        # [3, magn_len] i32
    noise_est_counter: jnp.ndarray        # [3] i32
    noise_sup_filter: jnp.ndarray     # [magn_len] i32
    prior_non_speech_prob: jnp.ndarray    # [] i32
    prev_magn_u16: jnp.ndarray        # [magn_len] i32
    prev_noise_u32: jnp.ndarray       # [magn_len] u32
    log_lrt_time_avg_w32: jnp.ndarray     # [magn_len] i32
    avg_magn_pause: jnp.ndarray       # [magn_len] i32
    init_magn_est: jnp.ndarray        # [magn_len] u32
    threshold_log_lrt: jnp.ndarray    # [] i32
    threshold_spec_diff: jnp.ndarray  # [] i32
    threshold_spec_flat: jnp.ndarray  # [] u32
    feature_log_lrt: jnp.ndarray      # [] i32
    feature_spec_flat: jnp.ndarray    # [] u32
    feature_spec_diff: jnp.ndarray    # [] u32
    weight_log_lrt: jnp.ndarray       # [] i32
    weight_spec_flat: jnp.ndarray     # [] i32
    weight_spec_diff: jnp.ndarray     # [] i32
    cur_avg_magn_energy: jnp.ndarray  # [] u32
    time_avg_magn_energy: jnp.ndarray      # [] u32
    time_avg_magn_energy_tmp: jnp.ndarray  # [] u32
    hist_lrt: jnp.ndarray             # [1000] i32
    hist_spec_diff: jnp.ndarray       # [1000] i32
    hist_spec_flat: jnp.ndarray       # [1000] i32
    block_index: jnp.ndarray          # [] i32
    cnt_thres_update: jnp.ndarray     # [] i32
    prev_q_magn: jnp.ndarray          # [] i32
    q_noise: jnp.ndarray              # [] i32
    prev_q_noise: jnp.ndarray         # [] i32
    white_noise_level: jnp.ndarray    # [] u32
    pink_noise_numerator: jnp.ndarray     # [] i32
    pink_noise_exp: jnp.ndarray       # [] i32
    min_norm: jnp.ndarray             # [] i32


def init_state(fs: int, mode: int = 2) -> NsxState:
    cfg = make_config(fs, mode)
    ml = cfg.magn_len
    z = lambda *s: jnp.zeros(s, I32)       # noqa: E731
    zu = lambda *s: jnp.zeros(s, U32)      # noqa: E731
    return NsxState(
        analysis_buffer=z(cfg.ana_len),
        synthesis_buffer=z(cfg.ana_len),
        data_buf_hb=z(NUM_HIGH_BANDS_MAX, cfg.ana_len),
        noise_est_quantile=z(ml),
        noise_est_log_quantile=jnp.full((SIMULT, ml), 2048, I32),
        noise_est_density=jnp.full((SIMULT, ml), 153, I32),
        noise_est_counter=jnp.asarray(
            [(END_STARTUP_LONG * (i + 1)) // SIMULT
             for i in range(SIMULT)], I32),
        noise_sup_filter=jnp.full((ml,), 16384, I32),
        prior_non_speech_prob=jnp.int32(8192),
        prev_magn_u16=z(ml),
        prev_noise_u32=zu(ml),
        log_lrt_time_avg_w32=z(ml),
        avg_magn_pause=z(ml),
        init_magn_est=zu(ml),
        threshold_log_lrt=jnp.int32(cfg.threshold_log_lrt_init),
        threshold_spec_diff=jnp.int32(50),
        threshold_spec_flat=jnp.uint32(20480),
        feature_log_lrt=jnp.int32(cfg.threshold_log_lrt_init),
        feature_spec_flat=jnp.uint32(20480),
        feature_spec_diff=jnp.uint32(50),
        weight_log_lrt=jnp.int32(6),
        weight_spec_flat=jnp.int32(0),
        weight_spec_diff=jnp.int32(0),
        cur_avg_magn_energy=jnp.uint32(0),
        time_avg_magn_energy=jnp.uint32(0),
        time_avg_magn_energy_tmp=jnp.uint32(0),
        hist_lrt=z(HIST_PAR_EST),
        hist_spec_diff=z(HIST_PAR_EST),
        hist_spec_flat=z(HIST_PAR_EST),
        block_index=jnp.int32(-1),
        cnt_thres_update=jnp.int32(0),
        prev_q_magn=jnp.int32(0),
        q_noise=jnp.int32(0),
        prev_q_noise=jnp.int32(0),
        white_noise_level=jnp.uint32(0),
        pink_noise_numerator=jnp.int32(0),
        pink_noise_exp=jnp.int32(0),
        min_norm=jnp.int32(15),
    )


# --------------------------------------------------------------------------
# spl energy helpers
# --------------------------------------------------------------------------

def _energy(vec, length: int):
    """WebRtcSpl_Energy: (energy int32 wrap-fold, scaling).  `length`
    static."""
    nbits = 32 - _host_aecm.norm_u32(length)   # static python
    x = _i32(vec)
    sabs = jnp.where(x > 0, x, wrap16(-x))
    smax = jnp.maximum(jnp.max(sabs, axis=-1), -1)
    t = norm_w32(wrap32(smax * smax))
    scaling = jnp.where(smax == 0, 0,
                        jnp.where(t > nbits, 0, nbits - t)).astype(I32)
    en = _wsum((x * x) >> scaling[..., None])
    return en, scaling


def wrap32(x):
    """Keep int32 dtype (jnp int32 arithmetic already wraps)."""
    return _i32(x)


# --------------------------------------------------------------------------
# UpdateNoiseEstimate (nsx_core.c:303-331)
# --------------------------------------------------------------------------

def _update_noise_estimate(st: NsxState, s: int):
    """Returns (q_noise_new [], quantile_new [magn_len]) from estimate
    row s, without committing."""
    K_EXP2 = 11819
    lq = st.noise_est_log_quantile[s]
    tmp16 = jnp.max(lq, axis=-1)
    q_noise = 14 - _mul_round(K_EXP2, tmp16, 21)
    tmp32no2 = wrap32(K_EXP2 * lq)
    tmp32no1 = jnp.int32(0x00200000) | (tmp32no2 & 0x001FFFFF)
    t16 = wrap16(tmp32no2 >> 21) - 21 + wrap16(q_noise)
    tmp32no1 = shift_w32(tmp32no1, t16)
    return q_noise.astype(I32), sat_w16(tmp32no1).astype(I32)


# --------------------------------------------------------------------------
# NoiseEstimationC (nsx_core.c:334-453)
# --------------------------------------------------------------------------

def _noise_estimation(st: NsxState, magn, norm_data, cfg: NsxConfig):
    """Returns (counter, log_quantile, density, quantile, q_noise,
    noise_u32[magn_len] u32, q_noise16)."""
    log2_const = 22713
    width_factor = 21845
    log_tab = jnp.asarray(np.asarray(LOG_TABLE, np.int32))
    tabind = cfg.stages - norm_data                      # [-8, 8]
    logval = jnp.where(tabind < 0, -log_tab[-tabind], log_tab[tabind])
    logval = logval.astype(I32)

    log2 = _log2_frac_u16(_u32(magn))
    lm = wrap16((log2 * log2_const) >> 15)
    lmagn = jnp.where(_i32(magn) != 0, wrap16(lm + logval), logval)

    log_quantile = st.noise_est_log_quantile          # [3, ml]
    density = st.noise_est_density                    # [3, ml]
    counter = st.noise_est_counter                    # [3]
    q_noise = st.q_noise
    quantile = st.noise_est_quantile
    cdiv_tab = jnp.asarray(_COUNTER_DIV)

    for s in range(SIMULT):
        cnt = counter[s]
        count_div = cdiv_tab[jnp.clip(cnt, 0, len(_COUNTER_DIV) - 1)]
        count_prod = wrap16(cnt * count_div)
        dens = density[s]
        lq = log_quantile[s]

        factor = norm_w16(dens)
        delta_hi = wrap16(FACTOR_Q16 >> jnp.clip(14 - factor, 0, 31))
        delta_lo = jnp.where(st.block_index < END_STARTUP_LONG,
                             FACTOR_Q7_STARTUP, FACTOR_Q7)
        delta = jnp.where(dens > 512, delta_hi, delta_lo).astype(I32)

        tmp16 = wrap16((delta * count_div) >> 14)
        up = lmagn > lq
        # up: lq += (tmp16+2)//4 ; down: lq -= w16(((tmp16+1)//2*3)//2)
        lq_up = wrap16(lq + (tmp16 + 2) // 4)
        t2 = wrap16((((tmp16 + 1) // 2) * 3) // 2)
        lq_dn = wrap16(lq - t2)
        lq_dn = jnp.maximum(lq_dn, logval)
        lq_new = jnp.where(up, lq_up, lq_dn).astype(I32)

        near = jnp.abs(lmagn - lq_new) < WIDTH_Q8
        d_new = wrap16(wrap16(_mul_round(dens, count_prod, 15)) +
                       wrap16(_mul_round(width_factor, count_div, 15)))
        dens_new = jnp.where(near, d_new, dens).astype(I32)

        log_quantile = log_quantile.at[s].set(lq_new)
        density = density.at[s].set(dens_new)

        # counter wrap + conditional estimate refresh
        hit = cnt >= END_STARTUP_LONG
        cnt_next = jnp.where(hit, 0, cnt) + 1
        counter = counter.at[s].set(cnt_next.astype(I32))
        do_upd = hit & (st.block_index >= END_STARTUP_LONG)
        qn_new, quant_new = _update_noise_estimate(
            st._replace(noise_est_log_quantile=log_quantile), s)
        q_noise = jnp.where(do_upd, qn_new, q_noise)
        quantile = jnp.where(do_upd, quant_new, quantile)

    # startup: always refresh from the LAST estimate row
    qn_new, quant_new = _update_noise_estimate(
        st._replace(noise_est_log_quantile=log_quantile), SIMULT - 1)
    startup = st.block_index < END_STARTUP_LONG
    q_noise = jnp.where(startup, qn_new, q_noise).astype(I32)
    quantile = jnp.where(startup, quant_new, quantile).astype(I32)

    noise_u32 = _u32(quantile)
    return counter, log_quantile, density, quantile, q_noise, noise_u32


# --------------------------------------------------------------------------
# CalcParametricNoiseEstimate (nsx_core.c:586-628)
# --------------------------------------------------------------------------

def _calc_parametric_noise(st: NsxState, pink_exp_avg, pink_num_avg,
                           freq_index, cfg: NsxConfig):
    """freq_index: int array [k]; returns (noise_estimate u32 [k],
    noise_estimate_avg u32 [k])."""
    li = jnp.asarray(_LOG_INDEX)[freq_index]
    tmp32no2 = wrap32(pink_exp_avg * li) >> 15
    tmp32no1 = pink_num_avg - tmp32no2
    tmp32no1 = tmp32no1 + ((st.min_norm - cfg.stages) << 11)
    ok = tmp32no1 > 0
    int_part = wrap16(tmp32no1 >> 11)
    frac_part = wrap16(tmp32no1 & 0x7FF)
    t_hi = 2048 - (((2048 - frac_part) * 1244) >> 10)
    t_lo = (frac_part * 804) >> 10
    tmp32no2b = jnp.where((frac_part >> 10) != 0, t_hi, t_lo)
    tmp32no2b = shift_w32(tmp32no2b, int_part - 11)
    # (1 << int_part): int_part <= 20-ish by construction; clip for the
    # discarded where-lane
    one_shl = shift_w32(jnp.int32(1), jnp.clip(int_part, 0, 30))
    avg = _u32(one_shl + tmp32no2b)
    est = avg * _u32(st.block_index + 1)
    zero = jnp.uint32(0)
    return (jnp.where(ok, est, zero).astype(U32),
            jnp.where(ok, avg, zero).astype(U32))


# --------------------------------------------------------------------------
# FeatureParameterExtraction (nsx_core.c:821-1016)
# --------------------------------------------------------------------------

def _top2_peaks(hist):
    """The reference's sequential top-2 scan: peak1 = first argmax;
    peak2 = first argmax of the rest (a later equal maximum becomes
    peak2).  Returns (w1, pos1, w2, pos2), pos in 2*i+1 units."""
    n = hist.shape[-1]
    idx = jnp.arange(n, dtype=I32)
    m1 = jnp.max(hist, axis=-1)
    i1 = jnp.argmax(hist, axis=-1).astype(I32)
    masked = jnp.where(idx == i1, jnp.int32(-1), hist)
    m2 = jnp.max(masked, axis=-1)
    i2 = jnp.argmax(masked, axis=-1).astype(I32)
    # all-zero hist: the C loop never takes `h > 0`-guards, every
    # weight/pos stays 0
    w1 = jnp.where(m1 > 0, m1, 0)
    p1 = jnp.where(m1 > 0, 2 * i1 + 1, 0)
    w2 = jnp.where(m2 > 0, m2, 0)
    p2 = jnp.where(m2 > 0, 2 * i2 + 1, 0)
    return w1, p1, w2, p2


def _feature_parameter_extraction(st: NsxState, flag, cfg: NsxConfig):
    """Returns the updated (hist_lrt, hist_flat, hist_diff,
    threshold_log_lrt, threshold_spec_flat, threshold_spec_diff,
    weight_lrt, weight_flat, weight_diff); `flag` is traced [].

    no-flag branch: one-hot histogram increments; flag branch: the
    512-block threshold/weight refresh + histogram clear."""
    # ---- accumulate branch
    def one_hot_add(hist, hidx, valid):
        hidx = jnp.clip(hidx, 0, HIST_PAR_EST - 1)
        return hist + (valid.astype(I32) *
                       (jnp.arange(HIST_PAR_EST, dtype=I32) == hidx)
                       .astype(I32))

    hi_lrt = _u32(st.feature_log_lrt)
    h_lrt_acc = one_hot_add(st.hist_lrt, hi_lrt.astype(I32),
                            hi_lrt < HIST_PAR_EST)
    hi_flat = (_u32(st.feature_spec_flat) * 5) >> 8
    h_flat_acc = one_hot_add(st.hist_spec_flat, hi_flat.astype(I32),
                             hi_flat < HIST_PAR_EST)
    num_d = (_u32(st.feature_spec_diff) * 5) >> cfg.stages
    hi_diff = div_u32_u32(num_d, st.time_avg_magn_energy,
                          zero_result=HIST_PAR_EST)
    valid_d = (st.time_avg_magn_energy > 0) & (hi_diff < HIST_PAR_EST)
    h_diff_acc = one_hot_add(st.hist_spec_diff, hi_diff.astype(I32),
                             valid_d)

    # ---- refresh branch (uses the PRE-increment histograms, as the C
    # does: the flag call happens instead of the accumulate call)
    j_all = 2 * jnp.arange(HIST_PAR_EST, dtype=I32) + 1
    tmp32_all = wrap32(st.hist_lrt * j_all)
    avg_lrt = _wsum(tmp32_all[..., :BIN_SIZE_LRT])
    num_lrt = _wsum(st.hist_lrt[..., :BIN_SIZE_LRT])
    avg_compl = _wsum(tmp32_all)
    avg_sq = _wsum(wrap32(tmp32_all * j_all))
    fluct = wrap32(wrap32(avg_sq * num_lrt) - wrap32(avg_lrt * avg_compl))
    thres_fluct = THRES_FLUCT_LRT * num_lrt
    tmp_u32 = _u32(FACTOR_1_LRT_DIFF) * _u32(avg_lrt)
    bad = ((fluct < thres_fluct) | (num_lrt == 0) |
           (tmp_u32 > _u32(100 * num_lrt)))
    q1 = div_u32_u32(tmp_u32 << (9 + cfg.stages), _u32(num_lrt),
                     zero_result=0)
    q2 = div_u32_u16(q1, 25).astype(I32)
    thr_lrt = jnp.clip(q2, cfg.min_lrt, cfg.max_lrt)
    threshold_log_lrt = jnp.where(bad, cfg.max_lrt, thr_lrt).astype(I32)
    use_diff0 = jnp.where(fluct < thres_fluct, 0, 1).astype(I32)

    # flatness peaks
    w1, p1, w2, p2 = _top2_peaks(st.hist_spec_flat)
    close = ((_u32(p1 - p2) < LIM_PEAK_SPACE_FLAT_DIFF) &
             (w2 * LIM_PEAK_WEIGHT_FLAT_DIFF > w1))
    w1f = jnp.where(close, w1 + w2, w1)
    p1f = jnp.where(close, _u32(p1 + p2) >> 1, _u32(p1)).astype(I32)
    weak = (w1f < THRES_WEIGHT_FLAT_DIFF) | (p1f < THRES_PEAK_FLAT)
    use_flat = jnp.where(weak, 0, 1).astype(I32)
    thr_flat = jnp.clip(FACTOR_2_FLAT_Q10 * p1f,
                        MIN_FLAT_Q10, MAX_FLAT_Q10)
    threshold_spec_flat = jnp.where(weak, _u32(st.threshold_spec_flat),
                                    _u32(thr_flat)).astype(U32)

    # difference peaks (only when use_diff0)
    dw1, dp1, dw2, dp2 = _top2_peaks(st.hist_spec_diff)
    dclose = ((_u32(dp1 - dp2) < LIM_PEAK_SPACE_FLAT_DIFF) &
              (dw2 * LIM_PEAK_WEIGHT_FLAT_DIFF > dw1))
    dw1f = jnp.where(dclose, dw1 + dw2, dw1)
    dp1f = jnp.where(dclose, _u32(dp1 + dp2) >> 1, _u32(dp1)).astype(I32)
    thr_diff = jnp.clip(FACTOR_1_LRT_DIFF * dp1f, MIN_DIFF, MAX_DIFF)
    threshold_spec_diff = jnp.where(
        use_diff0 != 0, thr_diff, st.threshold_spec_diff).astype(I32)
    use_diff = jnp.where(use_diff0 != 0,
                         jnp.where(dw1f < THRES_WEIGHT_FLAT_DIFF, 0, 1),
                         0).astype(I32)

    feature_sum = (6 // (1 + use_flat + use_diff)).astype(I32)
    weight_lrt = feature_sum
    weight_flat = use_flat * feature_sum
    weight_diff = use_diff * feature_sum

    f = flag != 0
    zero_hist = jnp.zeros_like(st.hist_lrt)
    return (
        jnp.where(f, zero_hist, h_lrt_acc),
        jnp.where(f, zero_hist, h_flat_acc),
        jnp.where(f, zero_hist, h_diff_acc),
        jnp.where(f, threshold_log_lrt, st.threshold_log_lrt).astype(I32),
        jnp.where(f, threshold_spec_flat,
                  _u32(st.threshold_spec_flat)).astype(U32),
        jnp.where(f, threshold_spec_diff,
                  st.threshold_spec_diff).astype(I32),
        jnp.where(f, weight_lrt, st.weight_log_lrt).astype(I32),
        jnp.where(f, weight_flat, st.weight_spec_flat).astype(I32),
        jnp.where(f, weight_diff, st.weight_spec_diff).astype(I32),
    )


# --------------------------------------------------------------------------
# ComputeSpectralFlatness (nsx_core.c:1022-1084)
# --------------------------------------------------------------------------

def _compute_spectral_flatness(st: NsxState, magn, sum_magn,
                               cfg: NsxConfig):
    """Returns new feature_spec_flat (u32 [])."""
    m = _i32(magn)[..., :cfg.magn_len]
    has_zero = jnp.any(m[..., 1:] == 0, axis=-1)
    # decay path: first zero bin aborts with one decay step
    fsf = _u32(st.feature_spec_flat)
    decayed = fsf - ((fsf * SPECT_FLAT_TAVG_Q14) >> 14)

    avg_num = _usum(jnp.where(m[..., 1:] != 0,
                              _u32(_log2_frac_u16(_u32(m[..., 1:]))),
                              jnp.uint32(0)))
    avg_den = _u32(sum_magn) - _u32(m[..., 0])
    zeros = norm_u32(avg_den)
    frac = ((avg_den << zeros.astype(U32)) & jnp.uint32(0x7FFFFFFF)) >> 23
    tmp32 = (((31 - zeros) << 8) +
             jnp.asarray(_LOG_TABLE_FRAC)[frac.astype(I32)])
    log_cur = wrap32(avg_num)
    log_cur = wrap32(log_cur +
                     wrap32(jnp.int32(cfg.stages - 1) <<
                            (cfg.stages + 7)))
    log_cur = wrap32(log_cur - wrap32(tmp32 << (cfg.stages - 1)))
    log_cur = wrap32(log_cur << (10 - cfg.stages))
    t32 = jnp.int32(0x00020000) | (jnp.abs(log_cur) & 0x0001FFFF)
    int_part = 7 - (log_cur >> 17)
    current = shift_w32(t32, -int_part)
    diff = wrap32(wrap32(current - _i32(fsf)) * SPECT_FLAT_TAVG_Q14)
    updated = fsf + _u32(diff >> 14)
    return jnp.where(has_zero, decayed, updated).astype(U32)


# --------------------------------------------------------------------------
# ComputeSpectralDifference (nsx_core.c:1091-1181)
# --------------------------------------------------------------------------

def _compute_spectral_difference(st: NsxState, magn, sum_magn,
                                 magn_energy, norm_data,
                                 cfg: NsxConfig):
    """Returns (feature_spec_diff u32 [], cur_avg_magn_energy u32 [])."""
    amp = _i32(st.avg_magn_pause)
    avg_pause = _wsum(amp) >> (cfg.stages - 1)
    max_pause = jnp.max(amp, axis=-1)
    min_pause = jnp.min(amp, axis=-1)
    avg_magn = (_u32(sum_magn) >> (cfg.stages - 1)).astype(I32)
    tmp32no1 = jnp.maximum(max_pause - avg_pause, avg_pause - min_pause)
    n_shifts = jnp.maximum(0, 10 + cfg.stages - norm_w32(tmp32no1))

    m = _i32(magn)
    t16 = wrap16(m - avg_magn[..., None])
    t32p = wrap32(amp - avg_pause[..., None])
    var_magn = _usum(_u32(wrap32(t16 * t16)))
    cov = _wsum(wrap32(t32p * t16))
    t32s = t32p >> n_shifts[..., None]
    var_pause = _usum(_u32(wrap32(t32s * t32s)))

    cur_avg = (_u32(st.cur_avg_magn_energy) +
               _shr_u32_full(magn_energy,
                             2 * norm_data + cfg.stages - 1))

    avg_diff = var_magn
    have = (var_pause != 0) & (cov != 0)
    tmp_u32no1 = _u32(jnp.abs(cov))
    norm32 = norm_u32(tmp_u32no1) - 16
    tmp_u32no1 = shift_u32(tmp_u32no1, norm32)
    tmp_u32no2 = tmp_u32no1 * tmp_u32no1
    n_sh2 = (n_shifts + norm32) << 1
    var_pause_sh = jnp.where(n_sh2 < 0,
                             _shr_u32_full(var_pause, -n_sh2),
                             var_pause)
    n_sh3 = jnp.maximum(n_sh2, 0)
    q = div_u32_u32(tmp_u32no2, var_pause_sh, zero_result=0)
    q = _shr_u32_full(q, n_sh3)
    sub = jnp.minimum(avg_diff, q)
    avg_diff = jnp.where(have,
                         jnp.where(var_pause_sh > 0, avg_diff - sub,
                                   jnp.uint32(0)),
                         avg_diff)

    tgt = avg_diff >> (2 * norm_data).astype(U32)
    fsd = _u32(st.feature_spec_diff)
    dn = ((fsd - tgt) * SPECT_DIFF_TAVG_Q8) >> 8
    up = ((tgt - fsd) * SPECT_DIFF_TAVG_Q8) >> 8
    new_fsd = jnp.where(fsd > tgt, fsd - dn, fsd + up)
    return new_fsd.astype(U32), cur_avg.astype(U32)


# --------------------------------------------------------------------------
# DataAnalysis (nsx_core.c:524-541 AnalysisUpdate + 1184-1419)
# --------------------------------------------------------------------------

def _data_analysis(st: NsxState, speech_frame, cfg: NsxConfig):
    """speech_frame [blk] i32.  Returns a dict of intra-block values
    plus the state fields it updates (committed by the caller):

    magn [magn_len], re/im [magn_len] (imag NEGATED like the host),
    norm_data, zero_input, energy_in, scale_energy_in, magn_energy u32,
    sum_magn u32, analysis_buffer, min_norm, init_magn_est,
    white_noise_level, pink_noise_numerator, pink_noise_exp."""
    n, b = cfg.ana_len, cfg.blk
    window = jnp.asarray(_window_np(cfg))
    ana = jnp.concatenate([st.analysis_buffer[..., b:n], speech_frame],
                          axis=-1)
    win_data = wrap16(_mul_round(window, ana, 14))

    energy_in, scale_energy_in = _energy(win_data, n)
    max_abs = jnp.max(jnp.abs(win_data), axis=-1)
    max_win = jnp.minimum(max_abs, I16_MAX)
    zero_input = (max_win == 0)
    norm_data = norm_w16(max_win)

    net_norm = cfg.stages - norm_data
    r_in_magn = norm_data - st.min_norm
    r_in_init = jnp.maximum(-r_in_magn, 0)
    min_norm = st.min_norm - r_in_init
    r_in_magn = jnp.maximum(r_in_magn, 0)

    norm_in = wrap16(win_data << norm_data[..., None])
    fre, fim = real_forward_fft(norm_in, cfg.stages)
    n2 = cfg.ana_len // 2

    re = fre.at[..., 0].set(fre[..., 0])
    im = -fim
    im = im.at[..., 0].set(0)
    im = im.at[..., n2].set(0)

    # magnitudes; bins 0 and n2 are pure real
    t_mid = (_u32(fre[..., 1:n2]) * _u32(fre[..., 1:n2]) +
             _u32(fim[..., 1:n2]) * _u32(fim[..., 1:n2]))
    magn_mid = (sqrt_floor(t_mid.astype(I32)) & 0xFFFF).astype(I32)
    magn0 = jnp.abs(fre[..., 0:1])
    magnN = jnp.abs(fre[..., n2:n2 + 1])
    magn = jnp.concatenate([magn0, magn_mid, magnN], axis=-1)

    magn_energy = (_u32(fre[..., 0]) * _u32(fre[..., 0]) +
                   _u32(fre[..., n2]) * _u32(fre[..., n2]) +
                   _usum(t_mid))
    sum_magn = _usum(_u32(magn))

    # ---- startup statistics (block_index < END_STARTUP_SHORT)
    startup = st.block_index < END_STARTUP_SHORT
    ime = _shr_u32_full(st.init_magn_est,
                        jnp.broadcast_to(r_in_init[..., None],
                                         st.init_magn_est.shape))
    ime = ime + _shr_u32_full(_u32(magn),
                              jnp.broadcast_to(r_in_magn[..., None],
                                               magn.shape))
    init_magn_est = jnp.where(startup[..., None], ime,
                              st.init_magn_est).astype(U32)

    log2 = jnp.where(magn != 0, _log2_frac_u16(_u32(magn)),
                     jnp.int32(0))
    li = jnp.asarray(_LOG_INDEX)
    # sum_log_magn: bin n2 + bins [K_START_BAND, n2)
    band = jnp.arange(cfg.magn_len, dtype=I32)
    in_band = (band >= K_START_BAND) & (band < n2)
    sum_log_magn = wrap32(log2[..., n2] +
                          _wsum(jnp.where(in_band, log2, 0)))
    sum_log_i_log = wrap32(
        ((li[n2] * log2[..., n2]) >> 3) +
        _wsum(jnp.where(in_band, (li[: cfg.magn_len] * log2) >> 3, 0)))

    wnl = _shr_u32_full(st.white_noise_level, r_in_init)
    t_u32 = _u32(sum_magn) * _u32(cfg.overdrive)
    t_u32 = t_u32 >> jnp.uint32(cfg.stages + 8)
    t_u32 = _shr_u32_full(t_u32, r_in_magn)
    white_noise_level = jnp.where(startup, wnl + t_u32,
                                  st.white_noise_level).astype(U32)

    mdet = int(DETERMINANT_EST_MATRIX[K_START_BAND])
    sum_log_i = int(SUM_LOG_INDEX[K_START_BAND])
    sum_log_i_sq = int(SUM_SQUARE_LOG_INDEX[K_START_BAND])
    if cfg.fs == 8000:
        t1 = mdet
        t1 += (int(SUM_LOG_INDEX[65]) * sum_log_i) >> 9
        t1 -= (int(SUM_LOG_INDEX[65]) * int(SUM_LOG_INDEX[65])) >> 10
        t1 -= (sum_log_i_sq << 4) & 0xFFFFFFFF
        t1 -= ((cfg.magn_len - K_START_BAND) *
               int(SUM_SQUARE_LOG_INDEX[65])) >> 2
        mdet = ((t1 + 0x8000) & 0xFFFF) - 0x8000   # w16
        sum_log_i -= int(SUM_LOG_INDEX[65])
        sum_log_i_sq -= int(SUM_SQUARE_LOG_INDEX[65])

    zeros = jnp.maximum(16 - norm_w32(sum_log_magn), 0)
    t1_w32 = wrap32(sum_log_magn << 1)
    sum_log_magn_u16 = ((_u32(t1_w32) >> zeros.astype(U32))
                        & jnp.uint32(0xFFFF)).astype(I32)

    t2_w32 = wrap32(sum_log_i_sq * sum_log_magn_u16)
    t_u32no1 = _u32(sum_log_i_log) >> 12
    t_u16 = jnp.int32((sum_log_i << 1) & 0xFFFF)
    big = _u32(sum_log_i) > t_u32no1
    t_u16 = jnp.where(big, t_u16 >> zeros, t_u16)
    t_u32no1 = jnp.where(big, t_u32no1, t_u32no1 >> zeros.astype(U32))
    t2_w32 = wrap32(t2_w32 - wrap32((t_u32no1 *
                                     _u32(t_u16)).astype(I32)))
    mdet_sh = jnp.int32(mdet) >> zeros
    t2_div = div_w32_w32_exact(t2_w32, mdet_sh)
    t2_div = wrap32(t2_div + wrap32(net_norm << 11))
    t2_div = jnp.maximum(t2_div, 0)
    pink_num = jnp.where(startup,
                         wrap32(st.pink_noise_numerator + t2_div),
                         st.pink_noise_numerator).astype(I32)

    t2b = wrap32(sum_log_i * sum_log_magn_u16)
    t1b = sum_log_i_log >> (3 + zeros)
    t1b = wrap32(t1b * (cfg.magn_len - K_START_BAND))
    t2b = wrap32(t2b - t1b)
    pe_add = jnp.clip(div_w32_w32_exact(t2b, mdet_sh), 0, 16384)
    pink_exp = jnp.where(startup & (t2b > 0),
                         wrap32(st.pink_noise_exp + pe_add),
                         st.pink_noise_exp).astype(I32)

    return dict(magn=magn, re=re, im=im, norm_data=norm_data,
                zero_input=zero_input, energy_in=energy_in,
                scale_energy_in=scale_energy_in,
                magn_energy=magn_energy, sum_magn=sum_magn,
                analysis_buffer=ana.astype(I32), min_norm=min_norm,
                init_magn_est=init_magn_est,
                white_noise_level=white_noise_level,
                pink_noise_numerator=pink_num,
                pink_noise_exp=pink_exp, net_norm=net_norm)


# --------------------------------------------------------------------------
# SpeechNoiseProb (nsx_core_c.c)
# --------------------------------------------------------------------------

def _speech_noise_prob(st: NsxState, prior_loc_snr, post_loc_snr,
                       cfg: NsxConfig):
    """Returns (non_speech_prob [magn_len] i32, log_lrt_time_avg_w32,
    feature_log_lrt, prior_non_speech_prob)."""
    post = _u32(post_loc_snr)
    prior = _u32(prior_loc_snr)

    bessel = wrap32(post_loc_snr)
    norm_tmp = norm_u32(post)
    num = post << norm_tmp.astype(U32)
    den = jnp.where(norm_tmp > 10,
                    prior << jnp.clip(norm_tmp - 11, 0, 31).astype(U32),
                    prior >> jnp.clip(11 - norm_tmp, 0, 31).astype(U32))
    q = div_u32_u32(num, den, zero_result=0)
    bessel = jnp.where(den > 0, wrap32(bessel - q.astype(I32)),
                       jnp.int32(0))

    zeros = norm_u32(prior)
    frac32 = (((prior << zeros.astype(U32)) & jnp.uint32(0x7FFFFFFF))
              >> 19).astype(I32)
    t32 = (frac32 * frac32 * -43) >> 19
    t32 = wrap32(t32 + ((wrap16(frac32) * 5412) >> 12))
    frac32b = wrap32(t32 + 37)
    t32c = wrap32(((31 - zeros) << 12) + frac32b) - (11 << 12)
    log_tmp = wrap32(t32c * 178) >> 8
    t = wrap32(log_tmp + st.log_lrt_time_avg_w32)
    half = jnp.where(t < 0, -((-t) // 2), t // 2)
    log_lrt = wrap32(st.log_lrt_time_avg_w32 + (bessel - half))
    lrt_sum = _wsum(log_lrt)
    feature_log_lrt = wrap32(lrt_sum * BIN_SIZE_LRT) >> (cfg.stages + 11)

    # average LRT indicator
    t32no1 = wrap32(lrt_sum - st.threshold_log_lrt)
    neg = t32no1 < 0
    n_shifts = jnp.where(neg, 7 - cfg.stages + 1,
                         7 - cfg.stages).astype(I32)
    t32no1 = shift_w32(jnp.where(neg, -t32no1, t32no1), n_shifts)
    tbl_i = wrap16(t32no1 >> 14)
    in_tab = (tbl_i >= 0) & (tbl_i < 16)
    ind = jnp.asarray(_INDICATOR)
    ci = jnp.clip(tbl_i, 0, 15)
    base = ind[ci]
    slope = ind[ci + 1] - ind[ci]
    frac = wrap16(t32no1 & 0x3FFF)
    interp = base + wrap16((slope * frac) >> 14)
    tmp_ind = jnp.where(in_tab,
                        jnp.where(neg, 8192 - interp, 8192 + interp),
                        jnp.where(neg, 0, 16384)).astype(I32)
    ind_prior = wrap32(st.weight_log_lrt * tmp_ind)

    # spectral flatness indicator
    fsf400 = _u32(st.feature_spec_flat) * 400
    tsf = _u32(st.threshold_spec_flat)
    flat_neg = tsf < fsf400
    diffv = jnp.where(flat_neg, fsf400 - tsf, tsf - fsf400)
    n_sh = jnp.where(flat_neg, 5, 4).astype(U32)
    q_f = div_u32_u16(diffv << n_sh, 25)
    tbl_f = wrap16((q_f >> 14).astype(I32))
    in_f = tbl_f < 16
    cif = jnp.clip(tbl_f, 0, 15)
    base_f = ind[cif]
    slope_f = ind[cif + 1] - ind[cif]
    frac_f = wrap16((q_f & jnp.uint32(0x3FFF)).astype(I32))
    interp_f = base_f + wrap16((slope_f * frac_f) >> 14)
    # tmp_ind == 0 <=> flat_neg; `8192 + interp if tmp_ind else 8192 -`
    tmp_ind_f = jnp.where(in_f,
                          jnp.where(flat_neg, 8192 - interp_f,
                                    8192 + interp_f),
                          jnp.where(flat_neg, 0, 16384)).astype(I32)
    ind_prior = jnp.where(st.weight_spec_flat != 0,
                          wrap32(ind_prior +
                                 st.weight_spec_flat * tmp_ind_f),
                          ind_prior)

    # spectral difference indicator
    fsd = _u32(st.feature_spec_diff)
    norm_d = jnp.minimum(20 - cfg.stages, norm_u32(fsd).astype(I32))
    t_u32no1 = fsd << jnp.clip(norm_d, 0, 31).astype(U32)
    t_u32no2 = _shr_u32_full(st.time_avg_magn_energy,
                             20 - cfg.stages - norm_d)
    ratio = div_u32_u32(t_u32no1, t_u32no2,
                        zero_result=0x7FFFFFFF)
    t_u32no1 = jnp.where(fsd != 0, ratio, jnp.uint32(0))
    t_u32no3 = div_u32_u16(_u32(st.threshold_spec_diff) << 17, 25)
    t_u32no2b = t_u32no1 - t_u32no3
    diff_neg = (t_u32no2b & jnp.uint32(0x80000000)) != 0
    t_u32no2b = jnp.where(diff_neg, t_u32no3 - t_u32no1, t_u32no2b)
    n_sh_d = jnp.where(diff_neg, 0, 1).astype(U32)
    q_d = t_u32no2b >> n_sh_d
    tbl_d = wrap16((q_d >> 14).astype(I32))
    in_d = tbl_d < 16
    cid = jnp.clip(tbl_d, 0, 15)
    base_d = ind[cid]
    slope_d = ind[cid + 1] - ind[cid]
    frac_d = wrap16((q_d & jnp.uint32(0x3FFF)).astype(I32))
    interp_d = base_d + wrap16(_mul_round(slope_d, frac_d, 14))
    tmp_ind_d = jnp.where(in_d,
                          jnp.where(diff_neg, 8192 - interp_d,
                                    8192 + interp_d),
                          jnp.where(diff_neg, 0, 16384)).astype(I32)
    ind_prior = jnp.where(st.weight_spec_diff != 0,
                          wrap32(ind_prior +
                                 st.weight_spec_diff * tmp_ind_d),
                          ind_prior)

    ind16 = wrap16(div_w32_w16_exact(wrap32(98307 - ind_prior), 6))
    d16 = wrap16(ind16 - st.prior_non_speech_prob)
    prior_nsp = wrap16(st.prior_non_speech_prob +
                       wrap16((PRIOR_UPDATE_Q14 * d16) >> 14))

    # invert the prior per-bin
    ll = log_lrt
    t32no1 = wrap32(ll * 23637) >> 14
    int_part = jnp.maximum(wrap16(t32no1 >> 12), -8)
    fracp = wrap16(t32no1 & 0xFFF)
    t32no2 = (fracp * fracp * 44) >> 19
    t32no2 = wrap32(t32no2 + ((fracp * 84) >> 7))
    inv_lrt = wrap32(shift_w32(jnp.int32(1), 8 + int_part) +
                     shift_w32(t32no2, int_part - 4))
    norm_i = norm_w32(inv_lrt)
    one_m = wrap16(16384 - prior_nsp)
    norm_p = norm_w16(one_m)
    s7 = norm_i + norm_p >= 7
    s15 = norm_i + norm_p < 15
    inv_a = inv_lrt >> jnp.clip(15 - norm_p - norm_i, 0, 31)
    prod_a = wrap32(inv_a * one_m)
    inv_lrt_a = shift_w32(prod_a, 7 - norm_i - norm_p)
    prod_b = wrap32(inv_lrt * one_m)
    inv_lrt_b = prod_b >> 8
    inv_sel = jnp.where(s15, inv_lrt_a, inv_lrt_b)
    num_p = wrap32(prior_nsp << 8)
    den_p = wrap32(prior_nsp + inv_sel)
    qq = div_w32_w32_exact(num_p, den_p)
    qv = jnp.where(den_p != 0, qq & 0xFFFF, jnp.int32(0))
    nsp = jnp.where((prior_nsp > 0) & (ll < 65300) & s7, qv,
                    jnp.int32(0))
    return nsp.astype(I32), log_lrt.astype(I32), \
        feature_log_lrt.astype(I32), prior_nsp.astype(I32)


# --------------------------------------------------------------------------
# PrepareSpectrum / Denormalize / SynthesisUpdate / DataSynthesis
# (nsx_core.c:456-521, 1421-1499)
# --------------------------------------------------------------------------

def _data_synthesis(st: NsxState, re, im, noise_sup_filter, norm_data,
                    energy_in, scale_energy_in, prior_nsp, block_index,
                    cfg: NsxConfig):
    """Returns (out [blk], synthesis_buffer_new [ana_len]) for the
    NON-zero-input path."""
    n, blk = cfg.ana_len, cfg.blk
    filt = wrap16(noise_sup_filter)
    fre = wrap16((re * filt) >> 14)
    fim_f = wrap16((im * filt) >> 14)
    # freq_buf re = fre, im = -filtered imag
    rfft, scale = real_inverse_fft(fre, -fim_f, cfg.stages)
    real = sat_w16(shift_w32(rfft, (scale - norm_data)[..., None]))

    gain_factor = jnp.int32(8192)
    if cfg.gain_map == 1:
        energy_out, scale_out = _energy(real, n)
        cheap = (scale_out == 0) & ((energy_out & 0x7F800000) == 0)
        eo_shift = shift_w32(energy_out,
                             8 + scale_out - scale_energy_in)
        sh = (8 + scale_out - scale_energy_in) & 31
        ei_shift = energy_in >> sh
        eo = jnp.where(cheap, eo_shift, energy_out)
        ei = jnp.where(cheap, energy_in, ei_shift)
        ratio = div_w32_w32_exact(eo + (ei >> 1), ei)
        ratio = jnp.clip(ratio, 0, 256)
        g1 = jnp.asarray(_FACTOR1)[ratio]
        g2 = jnp.asarray(_FACTOR2[cfg.mode if cfg.mode in _FACTOR2
                                  else 1])[ratio]
        t1 = wrap16(((16384 - prior_nsp) * g1) >> 14)
        t2 = wrap16((prior_nsp * g2) >> 14)
        gmapped = wrap16(t1 + t2)
        use = (block_index > END_STARTUP_LONG) & (energy_in > 0)
        gain_factor = jnp.where(use, gmapped, 8192).astype(I32)

    win = jnp.asarray(_window_np(cfg))
    t16a = wrap16(_mul_round(win, real, 14))
    t32 = _mul_round(t16a, gain_factor[..., None]
                     if jnp.ndim(gain_factor) else gain_factor, 13)
    t16b = sat_w16(t32)
    synth = add_sat_w16(st.synthesis_buffer, t16b)
    out = synth[..., :blk]
    synth_new = jnp.concatenate(
        [synth[..., blk:n], jnp.zeros(synth.shape[:-1] + (blk,), I32)],
        axis=-1)
    return out, synth_new


# --------------------------------------------------------------------------
# ProcessCore (nsx_core.c:1501-2118)
# --------------------------------------------------------------------------

def process_block(st: NsxState, bands, fs: int, mode: int = 2,
                  num_bands: int = 1):
    """One 10 ms block: bands [num_bands, blk] i32 -> (st, out
    [num_bands, blk] i32).  fs/mode/num_bands static."""
    cfg = make_config(fs, mode)
    blk, ml, n2 = cfg.blk, cfg.magn_len, cfg.ana_len // 2

    d = _data_analysis(st, _i32(bands[0]), cfg)
    magn = d["magn"]
    zero = d["zero_input"]
    norm_data = d["norm_data"]
    q_magn = norm_data - cfg.stages

    # ---------------- full (non-zero-input) pipeline
    fsf_new = _compute_spectral_flatness(
        st._replace(init_magn_est=d["init_magn_est"]),
        magn, d["sum_magn"], cfg)
    block_index = st.block_index + 1
    st1 = st._replace(block_index=block_index,
                      analysis_buffer=d["analysis_buffer"],
                      min_norm=d["min_norm"],
                      init_magn_est=d["init_magn_est"],
                      white_noise_level=d["white_noise_level"],
                      pink_noise_numerator=d["pink_noise_numerator"],
                      pink_noise_exp=d["pink_noise_exp"],
                      feature_spec_flat=fsf_new)
    st1 = st1._replace(q_noise=st.q_noise)
    counter, log_q, dens, quant, q_noise, noise_u32 = \
        _noise_estimation(st1, magn, norm_data, cfg)
    st1 = st1._replace(noise_est_counter=counter,
                       noise_est_log_quantile=log_q,
                       noise_est_density=dens,
                       noise_est_quantile=quant,
                       q_noise=q_noise)

    prev_noise_u16 = (st.prev_noise_u32 >> 11).astype(U32)

    # -------- startup mixing (block_index < END_STARTUP_SHORT)
    startup_s = block_index < END_STARTUP_SHORT
    q_dom = jnp.minimum(q_noise, st1.min_norm - cfg.stages)
    have_pink = st1.pink_noise_exp != 0
    pink_exp_avg = wrap16(div_w32_w16_exact(st1.pink_noise_exp,
                                            block_index + 1))
    pink_num_avg = div_w32_w16_exact(st1.pink_noise_numerator,
                                     block_index + 1)
    bands_idx = jnp.arange(ml, dtype=I32)
    par_idx = jnp.maximum(bands_idx, K_START_BAND)
    ne_par, nea_par = _calc_parametric_noise(st1._replace(
        block_index=block_index), pink_exp_avg, pink_num_avg,
        par_idx, cfg)
    white = _u32(st1.white_noise_level)
    nea_white = div_u32_u16(white, (block_index + 1))
    noise_est = jnp.where(have_pink[..., None] if have_pink.ndim
                          else have_pink, ne_par, white)
    noise_est_avg = jnp.where(have_pink, nea_par, nea_white)

    nsf_tmp = jnp.full_like(magn, cfg.denoise_bound)
    t_u32no1 = noise_est * _u32(cfg.overdrive)
    numer = _u32(st1.init_magn_est) << 8
    gt = numer > t_u32no1
    numer2 = numer - t_u32no1
    n_sh = jnp.clip(norm_u32(numer2), 0, 6)
    numer3 = numer2 << n_sh.astype(U32)
    den3 = _u32(st1.init_magn_est) >> (6 - n_sh).astype(U32)
    den3 = jnp.maximum(den3, 1)
    q3 = div_u32_u32(numer3, den3, zero_result=0).astype(I32)
    nsf_q = jnp.clip(q3, cfg.denoise_bound, 16384)
    nsf_tmp = jnp.where((st1.init_magn_est != 0) & gt, nsf_q, nsf_tmp)

    no1 = _shr_u32_full(noise_u32,
                        jnp.broadcast_to((q_noise - q_dom)[..., None],
                                         noise_u32.shape))
    no2 = _shr_u32_full(
        noise_est_avg,
        jnp.broadcast_to((st1.min_norm - cfg.stages - q_dom)[..., None]
                         if q_dom.ndim else
                         st1.min_norm - cfg.stages - q_dom,
                         noise_est_avg.shape))
    big = (no1 & jnp.uint32(0xFC000000)) != 0
    no1s = jnp.where(big, no1 >> 6, no1)
    no2s = jnp.where(big, no2 >> 6, no2)
    shl = jnp.where(big, 6, 0).astype(U32)
    mixed = div_u32_u16(no1s * _u32(block_index) +
                        no2s * _u32(END_STARTUP_SHORT - block_index),
                        END_STARTUP_SHORT) << shl
    noise_u32 = jnp.where(startup_s[..., None], mixed, noise_u32)
    q_noise = jnp.where(startup_s, q_dom, q_noise).astype(I32)

    # -------- long-startup energy average
    startup_l = block_index < END_STARTUP_LONG
    tame_tmp = (st1.time_avg_magn_energy_tmp +
                _shr_u32_full(d["magn_energy"],
                              2 * norm_data + cfg.stages - 1))
    tame = div_u32_u16(tame_tmp, (block_index + 1))
    time_avg_tmp = jnp.where(startup_l, tame_tmp,
                             st1.time_avg_magn_energy_tmp).astype(U32)
    time_avg = jnp.where(startup_l, tame,
                         st1.time_avg_magn_energy).astype(U32)
    st1 = st1._replace(time_avg_magn_energy_tmp=time_avg_tmp,
                       time_avg_magn_energy=time_avg)

    # -------- STEP 1: prior and post SNR
    post_shifts = 6 + q_magn - q_noise
    n_sh1 = 5 - st.prev_q_magn + st.prev_q_noise
    t_u32m = _u32(magn) << 6
    t_u32n = shift_u32(noise_u32, post_shifts[..., None])
    num_p = t_u32m << 11
    qp = div_u32_u32(num_p, t_u32n, zero_result=_SAT_MAX)
    qp = jnp.minimum(qp, _SAT_MAX)
    post_loc_snr = jnp.where(t_u32m > t_u32n, qp.astype(I32),
                             jnp.int32(2048))
    post_loc_snr = jnp.where((t_u32m > t_u32n) & (t_u32n == 0),
                             _SAT_MAX, post_loc_snr)

    near_est = _u32(st.prev_magn_u16) * _u32(st.noise_sup_filter)
    t_u32a = near_est << 3
    t_u32b = _shr_u32_full(st.prev_noise_u32,
                           jnp.broadcast_to(n_sh1[..., None],
                                            st.prev_noise_u32.shape))
    qn = div_u32_u32(t_u32a, t_u32b, zero_result=_SAT_MAX)
    prev_near_snr = jnp.minimum(qn, _SAT_MAX).astype(I32)
    prev_near_snr = jnp.where(t_u32b > 0, prev_near_snr, _SAT_MAX)

    t1s = _u32(prev_near_snr) * DD_PR_SNR_Q11
    t2s = _u32(post_loc_snr - 2048) * ONE_MINUS_DD_PR_SNR_Q11
    prior_snr = t1s + t2s + 512
    prior_loc_snr = (2048 + (prior_snr >> 10)).astype(I32)

    # -------- STEP 2: features + speech/noise probability
    fsd_new, cur_avg = _compute_spectral_difference(
        st1, magn, d["sum_magn"], d["magn_energy"], norm_data, cfg)
    st1 = st1._replace(feature_spec_diff=fsd_new,
                       cur_avg_magn_energy=cur_avg)
    cnt_upd = st1.cnt_thres_update + 1
    flag = (cnt_upd == (1 << STAT_UPDATES)).astype(I32)
    (h_lrt, h_flat, h_diff, thr_lrt, thr_flat, thr_diff,
     w_lrt, w_flat, w_diff) = _feature_parameter_extraction(
        st1, flag, cfg)
    st1 = st1._replace(hist_lrt=h_lrt, hist_spec_flat=h_flat,
                       hist_spec_diff=h_diff,
                       threshold_log_lrt=thr_lrt,
                       threshold_spec_flat=thr_flat,
                       threshold_spec_diff=thr_diff,
                       weight_log_lrt=w_lrt, weight_spec_flat=w_flat,
                       weight_spec_diff=w_diff)
    fl = flag != 0
    cnt_upd = jnp.where(fl, 0, cnt_upd).astype(I32)
    cur2 = _u32(st1.cur_avg_magn_energy) >> STAT_UPDATES
    half_e = (cur2 + st1.time_avg_magn_energy + 1) >> 1
    # renormalize feature_spec_diff to the new average energy
    t3 = half_e
    sh_a = jnp.maximum(32 - norm_u32(t3) - 16, 0)
    t3s = t3 >> sh_a.astype(U32)
    fsd = _u32(st1.feature_spec_diff)
    sh_b = jnp.maximum(32 - norm_u32(fsd) - 16, 0)
    fsds = fsd >> sh_b.astype(U32)
    norm32no1 = (sh_a + sh_b).astype(I32)
    prodd = t3s * fsds
    qd = div_u32_u32(prodd, st1.time_avg_magn_energy, zero_result=0)
    ovf = norm_u32(qd) < norm32no1
    fsd_scaled = jnp.where(
        ovf, jnp.uint32(0x007FFFFF),
        jnp.minimum(jnp.uint32(0x007FFFFF),
                    qd << jnp.clip(norm32no1, 0, 31).astype(U32)))
    do_scale = (fl & (half_e != st1.time_avg_magn_energy) &
                (fsd != 0) & (st1.time_avg_magn_energy > 0))
    st1 = st1._replace(
        feature_spec_diff=jnp.where(do_scale, fsd_scaled,
                                    st1.feature_spec_diff).astype(U32),
        time_avg_magn_energy=jnp.where(fl, half_e,
                                       st1.time_avg_magn_energy)
        .astype(U32),
        cur_avg_magn_energy=jnp.where(fl, jnp.uint32(0),
                                      st1.cur_avg_magn_energy)
        .astype(U32),
        cnt_thres_update=cnt_upd)

    nsp, log_lrt, feat_lrt, prior_nsp = _speech_noise_prob(
        st1, prior_loc_snr, post_loc_snr, cfg)
    st1 = st1._replace(log_lrt_time_avg_w32=log_lrt,
                       feature_log_lrt=feat_lrt,
                       prior_non_speech_prob=prior_nsp)

    # -------- noise update
    post_shifts2 = st.prev_q_noise - q_magn
    n_sh2 = st.prev_q_magn - q_magn
    t_u32no2 = shift_u32(_u32(magn), post_shifts2[..., None])
    up_pos = prev_noise_u16 <= t_u32no2
    t_u32no1 = jnp.where(up_pos, t_u32no2 - prev_noise_u16,
                         prev_noise_u16 - t_u32no2)
    gamma = jnp.where(_u32(nsp) < ONE_MINUS_PROB_RANGE_Q8,
                      GAMMA_NOISE_TRANS_AND_SPEECH_Q8,
                      NOISE_UPDATE_Q8).astype(U32)
    prev_gamma = jnp.concatenate(
        [jnp.full(gamma.shape[:-1] + (1,), NOISE_UPDATE_Q8, U32),
         gamma[..., :-1]], axis=-1)
    t_u32no3 = t_u32no1 * _u32(nsp)
    active = (t_u32no1 != 0) & (nsp != 0)
    big3 = (t_u32no3 & jnp.uint32(0x7C000000)) != 0
    # step at the PREVIOUS bin's gamma (the C reassigns gamma after use)
    step_prev = jnp.where(big3, (t_u32no3 >> 5) * prev_gamma,
                          (t_u32no3 * prev_gamma) >> 5)
    noise_upd = jnp.where(
        active,
        jnp.where(up_pos, st.prev_noise_u32 + step_prev,
                  st.prev_noise_u32 - step_prev),
        st.prev_noise_u32)
    step_cur = jnp.where(big3, (t_u32no3 >> 5) * gamma,
                         (t_u32no3 * gamma) >> 5)
    alt = jnp.where(up_pos, st.prev_noise_u32 + step_cur,
                    st.prev_noise_u32 - step_cur)
    noise_upd = jnp.where(prev_gamma != gamma,
                          jnp.minimum(noise_upd, alt), noise_upd)
    noise_u32 = noise_upd.astype(U32)
    max_noise = jnp.max(noise_u32, axis=-1)

    amp_sh = shift_w32(st.avg_magn_pause, -n_sh2[..., None])
    neg_sh = n_sh2 < 0
    d_a = wrap32(wrap32(magn - amp_sh) * ONE_MINUS_GAMMA_PAUSE_Q8)
    d_a = (d_a + 128) >> 8
    d_b = wrap32(wrap32(shift_w32(magn, n_sh2[..., None]) -
                        st.avg_magn_pause) * ONE_MINUS_GAMMA_PAUSE_Q8)
    d_b = wrap32(d_b + shift_w32(jnp.int32(128), n_sh2[..., None])) >> \
        jnp.clip(8 + n_sh2[..., None], 0, 31)
    delta_p = jnp.where(neg_sh[..., None], d_a, d_b)
    pause_new = jnp.where(_u32(nsp) > ONE_MINUS_PROB_RANGE_Q8,
                          wrap32(amp_sh + delta_p), amp_sh)
    st1 = st1._replace(avg_magn_pause=pause_new.astype(I32))

    norm_mn = norm_u32(max_noise)
    q_noise_next = st.prev_q_noise + norm_mn - 5

    # -------- STEP 3: final DD + Wiener filter
    n_sh3 = st.prev_q_noise + 11 - q_magn
    tm_a = _u32(magn)
    tm_b = _u32(magn) << 17
    tn_b = _shr_u32_full(noise_u32,
                         jnp.broadcast_to((n_sh3 - 17)[..., None],
                                          noise_u32.shape))
    tm_c = shift_u32(_u32(magn), n_sh3[..., None])
    sel_a = n_sh3 < 0
    sel_b = n_sh3 > 17
    tmp_magn = jnp.where(sel_a[..., None], tm_a,
                         jnp.where(sel_b[..., None], tm_b, tm_c))
    tmp_noise = jnp.where(sel_a[..., None],
                          shift_u32(noise_u32, (-n_sh3)[..., None]),
                          jnp.where(sel_b[..., None], tn_b, noise_u32))
    gt_n = tmp_magn > tmp_noise
    diff_mn = tmp_magn - tmp_noise
    nrm = jnp.minimum(11, norm_u32(diff_mn))
    num_c = diff_mn << nrm.astype(U32)
    den_c = tmp_noise >> (11 - nrm).astype(U32)
    q_c = div_u32_u32(num_c, den_c, zero_result=0)
    q_c = jnp.where(den_c > 0, q_c, num_c)
    cur_near = jnp.where(gt_n, jnp.minimum(q_c, _SAT_MAX),
                         jnp.uint32(0))

    t1f = _u32(prev_near_snr) * DD_PR_SNR_Q11
    t2f = cur_near * ONE_MINUS_DD_PR_SNR_Q11
    prior_f = t1f + t2f
    od = _u32(cfg.overdrive) + ((prior_f + 8192) >> 14)
    gain_q = div_u32_u32(prior_f + (od >> 1), od, zero_result=0)
    nsf = jnp.clip(gain_q.astype(I32), cfg.denoise_bound, 16384)
    mix = (_u32(nsf) * _u32(block_index) +
           _u32(nsf_tmp) * _u32(END_STARTUP_SHORT - block_index))
    nsf_startup = (div_u32_u16(mix, END_STARTUP_SHORT) &
                   jnp.uint32(0xFFFF)).astype(I32)
    noise_sup_filter = jnp.where(startup_s[..., None], nsf_startup,
                                 nsf)
    st1 = st1._replace(noise_sup_filter=noise_sup_filter.astype(I32))

    # -------- save noise / magn for next frame
    pn = jnp.where((norm_mn > 5)[..., None],
                   noise_u32 << jnp.clip(norm_mn - 5, 0, 31)
                   .astype(U32)[..., None],
                   noise_u32 >> jnp.clip(5 - norm_mn, 0, 31)
                   .astype(U32)[..., None])
    st1 = st1._replace(prev_q_noise=q_noise_next.astype(I32),
                       prev_q_magn=q_magn.astype(I32),
                       prev_noise_u32=pn.astype(U32),
                       prev_magn_u16=magn.astype(I32))

    out_low, synth_new = _data_synthesis(
        st1, d["re"], d["im"], noise_sup_filter, norm_data,
        d["energy_in"], d["scale_energy_in"], prior_nsp, block_index,
        cfg)
    st1 = st1._replace(synthesis_buffer=synth_new)

    # ---------------- zero-input path (analysis buffer still shifts)
    z_out = st.synthesis_buffer[..., :blk]
    z_synth = jnp.concatenate(
        [st.synthesis_buffer[..., blk:],
         jnp.zeros(st.synthesis_buffer.shape[:-1] + (blk,), I32)],
        axis=-1)
    # zero input returns from DataAnalysis BEFORE the min_norm update
    # (nsx_core.c:1226-1232): only the analysis buffer advanced
    st0 = st._replace(analysis_buffer=d["analysis_buffer"],
                      synthesis_buffer=z_synth)

    def pick(a, b):
        z = zero
        while z.ndim < a.ndim:
            z = z[..., None]
        return jnp.where(z, a, b).astype(a.dtype)

    st_out = jax.tree_util.tree_map(pick, st0, st1)
    out0 = pick(z_out, out_low)

    # ---------------- high bands (time-domain gain)
    outs = [out0]
    if num_bands > 1:
        n = cfg.ana_len
        hb_new = []
        hb_outs = []
        # gain from the top quarter of the low-band spectrum
        lo = n2 - (n2 >> 2)
        t_u16 = (_wsum(nsp[..., lo:n2]) & 0xFFFF)
        t_u32 = _usum(_u32(noise_sup_filter[..., lo:n2]))
        avg_prob = wrap16(4096 - (t_u16 >> (cfg.stages - 7)))
        avg_gain = wrap16((t_u32 >> (cfg.stages - 3)).astype(I32))
        gain_mod = jnp.minimum(avg_prob, 3607)
        g_lo = wrap16((gain_mod << 1) + (avg_gain >> 1))
        g_hi = wrap16(wrap16((3 * avg_gain) >> 2) + gain_mod)
        g_hb = jnp.where(avg_prob < 2048, g_lo, g_hi)
        g_hb = jnp.clip(g_hb, wrap16(jnp.int32(cfg.denoise_bound)),
                        16384)
        for i in range(num_bands - 1):
            buf = jnp.concatenate([st.data_buf_hb[..., i, blk:n],
                                   _i32(bands[i + 1])], axis=-1)
            hb_new.append(buf)
            hb_out_full = wrap16((g_hb[..., None] * buf[..., :blk])
                                 >> 14)
            hb_outs.append(pick(buf[..., :blk], hb_out_full))
        for i in range(num_bands - 1, NUM_HIGH_BANDS_MAX):
            hb_new.append(st.data_buf_hb[..., i, :])
        data_buf_hb = jnp.stack(hb_new, axis=-2).astype(I32)
        st_out = st_out._replace(data_buf_hb=data_buf_hb)
        outs.extend(hb_outs)

    return st_out, jnp.stack(outs, axis=-2)


# --------------------------------------------------------------------------
# daemon wrapper for the engine (webrtc.c ns_process, NSX branch)
# --------------------------------------------------------------------------

def process_pkg(st: NsxState, pkg, chn: int, freq: int, mode: int = 2):
    """One interleaved package [pkg_len * chn] i32 through the NSX
    branch of the daemon wrapper (webrtc.c:511-530 + NsxProcessor
    semantics): 10 ms subpackages, channels passed as BANDS (stereo
    right channel gets only the derived high-band time gain), and at
    32 kHz only the first 160 frames of each 320-frame subpackage are
    processed — the rest of the output stays zero."""
    cfg = make_config(freq, mode)
    pkg_frame = freq // 1000 * 10
    blk = cfg.blk
    x = _i32(pkg)
    n_frames = x.shape[-1] // chn
    frames = x.reshape(x.shape[:-1] + (n_frames, chn))
    out = jnp.zeros_like(frames)
    for off in range(0, n_frames, pkg_frame):
        bands = jnp.moveaxis(frames[..., off:off + blk, :], -1, -2)
        st, ob = process_block(st, bands, freq, mode, chn)
        out = out.at[..., off:off + blk, :].set(
            jnp.moveaxis(ob, -2, -1))
    return st, out.reshape(x.shape)

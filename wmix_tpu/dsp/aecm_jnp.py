"""Batched (vmappable) AECM core math in JAX — the device half of the
engine's ``aec_backend="aecm"`` offering (VERDICT r2 next-round #5).

Bit-exact integer re-derivation of aecm_core.c / aecm_core_c.c +
utility/delay_estimator*.c per-64-sample-block processing, matching the
host-side reference port `wmix_tpu/dsp/aecm.py` (itself gated
sample-for-sample against the compiled C in tests/test_aecm.py):

  * the spl int16 complex FFT (complex_fft.c mode 1, order 7) as seven
    unrolled vectorized butterfly stages over [B, 128] lanes;
  * TimeToFrequencyDomain with per-stream dynamic Q scaling;
  * the binary-spectrum delay estimator (XOR popcounts over a [B, 100]
    history, mean-threshold binarization);
  * far/near energy VAD, NLMS dual-Q channel estimation (per-bin
    variable shifts), MSE stored/adaptive arbitration;
  * Wiener gain + NLP + comfort noise, overlap-add synthesis.

Everything is int32/uint32 (TPU has no int64; divisions with full-range
numerators use the exact bit-serial forms in dsp/intops.py).  All
control flow that depends on CALL PATTERN (buffer cursors, startup
counters, rand sequence) is host-planned (engine/aecm_step.py); control
flow that depends on DATA (VAD decisions, delay candidates, Q domains)
is jnp.where / gather arithmetic so the whole block vmaps over streams.

Reference: /root/reference pkg webrtc aecm_core.c:403-787 (ProcessBlock),
echo_control_mobile.c; wired as the daemon's alternate AEC via
src/webrtc.c:172-191.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from wmix_tpu.dsp.intops import (
    I32, U32, add_sat_w16, add_sat_w32, div_u32_u16, div_w32_w16_exact,
    mul_16_u16, norm_u32, norm_w16, norm_w32, popcount32, shift_u32,
    shift_w32, sqrt_floor, wrap16)
from wmix_tpu.dsp.aecm import (
    CHANNEL_VAD, ENERGY_DEV_OFFSET, ENERGY_DEV_TOL, FAR_ENERGY_DIFF,
    FAR_ENERGY_MIN, FAR_ENERGY_VAD_REGION, K_BAND_FIRST, K_BAND_LAST,
    K_CHANNEL_STORED_8K, K_CHANNEL_STORED_16K, K_COS_TABLE,
    K_MAX_BIT_COUNTS_Q9, K_NOISE_EST_INC_COUNT, K_NOISE_EST_Q_DOMAIN,
    K_PROBABILITY_LOWER_LIMIT, K_PROBABILITY_MIN_SPREAD,
    K_PROBABILITY_OFFSET, K_SHIFTS_AT_ZERO, K_SHIFTS_LINEAR_SLOPE,
    K_SIN_TABLE, K_SQRT_HANNING, MAX_BUF_LEN, MAX_DELAY, MIN_MSE_COUNT,
    MIN_MSE_DIFF, MSE_RESOLUTION, MU_DIFF, MU_MAX, MU_MIN, NLP_COMP_HIGH,
    NLP_COMP_LOW, ONE_Q14, PART_LEN, PART_LEN1, PART_LEN2,
    PART_LEN_SHIFT, RESOLUTION_CHANNEL16, RESOLUTION_CHANNEL32,
    RESOLUTION_SUPGAIN, SUPGAIN_DEFAULT, SUPGAIN_EPC_DT,
    SUPGAIN_ERROR_PARAM_A, SUPGAIN_ERROR_PARAM_B, SUPGAIN_ERROR_PARAM_D,
    _bit_reverse_perm, SIN_TABLE_1024)

I16_MAX, I16_MIN = 32767, -32768
I32_MAX = 0x7FFFFFFF

_PERM7 = np.asarray(_bit_reverse_perm(7), np.int32)
_SIN1024 = np.asarray(SIN_TABLE_1024, np.int32)
_HANNING = np.asarray(K_SQRT_HANNING, np.int32)
_COS_T = np.asarray(K_COS_TABLE, np.int32)
_SIN_T = np.asarray(K_SIN_TABLE, np.int32)

CFFTSFT = 14
CFFTRND = 1
CFFTRND2 = 16384
CIFFTSFT = 14
CIFFTRND = 1


# --------------------------------------------------------------------------
# spl complex FFT (complex_fft.c mode 1, order 7), batch-vectorized
# --------------------------------------------------------------------------

def _stage_twiddles(l: int, k: int, inverse: bool):
    m = np.arange(l, dtype=np.int32)
    j = m << k
    wr = _SIN1024[j + 256].astype(np.int32)
    wi = _SIN1024[j].astype(np.int32)
    if not inverse:
        wi = -wi
    return jnp.asarray(wr), jnp.asarray(wi)


def complex_fft_mode1(re, im):
    """Forward WebRtcSpl_ComplexFFT mode 1 over [..., 128] int32 re/im
    (already bit-reversed).  Seven vectorized butterfly stages."""
    n = 128
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


def complex_ifft_mode1(re, im):
    """Inverse mode 1; returns (re, im, scale[...]) with the per-stage
    data-dependent scaling (per stream)."""
    n = 128
    scale = jnp.zeros(re.shape[:-1], I32)
    l, k = 1, 9
    while l < n:
        mx = jnp.maximum(jnp.max(jnp.abs(re), axis=-1),
                         jnp.max(jnp.abs(im), axis=-1))
        sh1 = (mx > 13573).astype(I32)
        sh2 = (mx > 27146).astype(I32)
        shift = sh1 + sh2                       # per stream, 0..2
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


def real_forward_fft(x):
    """WebRtcSpl_RealForwardFFT over [..., 128] int32 real input:
    returns (re[..., 65], im[..., 65])."""
    perm = jnp.asarray(_PERM7)
    re = jnp.take(x, perm, axis=-1)
    im = jnp.zeros_like(re)
    re, im = complex_fft_mode1(re, im)
    return re[..., :PART_LEN1], im[..., :PART_LEN1]


def real_inverse_fft(re65, im65):
    """WebRtcSpl_RealInverseFFT: conj-symmetric expansion + inverse;
    returns (real[..., 128], scale[...])."""
    # full spectrum: bins 65..127 mirror 63..1 conjugated
    rev = slice(PART_LEN - 1, 0, -1)
    re_full = jnp.concatenate([re65, re65[..., rev]], axis=-1)
    im_full = jnp.concatenate([im65, -im65[..., rev]], axis=-1)
    perm = jnp.asarray(_PERM7)
    re = jnp.take(re_full, perm, axis=-1)
    im = jnp.take(im_full, perm, axis=-1)
    re, im, scale = complex_ifft_mode1(re, im)
    return re, scale


# --------------------------------------------------------------------------
# TimeToFrequencyDomain (aecm_core_c.c:403-474)
# --------------------------------------------------------------------------

def time_to_freq(buf128):
    """[B, 128] int32 (int16 values) -> (re, im, abs, sum_abs(u32 as
    i32), q) each [B, ...]."""
    tmp = jnp.max(jnp.abs(buf128), axis=-1)
    scaling = jnp.where(tmp != 0, norm_w16(tmp), 0)     # [B]
    sc = scaling[..., None]
    han = jnp.asarray(_HANNING)
    win = jnp.concatenate([han[:PART_LEN], han[PART_LEN:0:-1]])
    st = wrap16(buf128 << sc)
    fft = wrap16((st * win) >> 14)
    re, im = real_forward_fft(fft)
    im = -im
    im = im.at[..., 0].set(0)
    im = im.at[..., PART_LEN].set(0)
    mid = jnp.arange(PART_LEN1)
    inner = (mid > 0) & (mid < PART_LEN)
    absval = jnp.where(
        re == 0, jnp.abs(im),
        jnp.where(im == 0, jnp.abs(re),
                  sqrt_floor(add_sat_w32(re * re, im * im))))
    absval = jnp.where(inner, absval, jnp.abs(re))
    s = jnp.sum(absval.astype(U32), axis=-1).astype(I32)
    return re, im, absval, s, scaling


# --------------------------------------------------------------------------
# binary delay estimator (delay_estimator*.c)
# --------------------------------------------------------------------------

_BANDS = np.arange(K_BAND_FIRST, K_BAND_LAST + 1)


def binary_spectrum(spectrum, mean, init_flag, q_domain):
    """[B,65] spectrum -> ([B] u32-pattern i32, new mean [B,65], new
    init [B]).  q_domain: [B]."""
    sq15 = spectrum << (15 - q_domain[..., None])       # [B, 65]
    band = jnp.zeros(spectrum.shape[:-1] + (PART_LEN1,), jnp.bool_)
    band = band.at[..., K_BAND_FIRST:K_BAND_LAST + 1].set(True)
    # init: first call with any positive band sets mean = sq15 >> 1
    do_init = (init_flag == 0)[..., None] & band & (spectrum > 0)
    any_init = jnp.any(do_init, axis=-1)
    mean = jnp.where(do_init, sq15 >> 1, mean)
    new_init = jnp.where(any_init, 1, init_flag)
    # MeanEstimatorFix(sq15, 6, &mean)
    diff = sq15 - mean
    diff = jnp.where(diff < 0, -((-diff) >> 6), diff >> 6)
    mean = jnp.where(band, mean + diff, mean)
    bits = jnp.where(band & (sq15 > mean), 1, 0)
    weights = jnp.asarray(
        np.where((np.arange(PART_LEN1) >= K_BAND_FIRST) &
                 (np.arange(PART_LEN1) <= K_BAND_LAST),
                 1 << (np.arange(PART_LEN1) - K_BAND_FIRST), 0)
        .astype(np.int64).astype(np.uint32).astype(np.int32))
    out = jnp.sum(jnp.where(bits != 0, weights, 0).astype(U32),
                  axis=-1).astype(I32)
    return out, mean, new_init


def delay_add_far(st, far_spectrum, far_q):
    b, mean_far, far_init = binary_spectrum(
        far_spectrum, st["de_mean_far"], st["de_far_init"], far_q)
    st = dict(st)
    st["de_mean_far"] = mean_far
    st["de_far_init"] = far_init
    st["de_far_hist"] = jnp.concatenate(
        [b[..., None], st["de_far_hist"][..., :-1]], axis=-1)
    st["de_far_bit_counts"] = jnp.concatenate(
        [popcount32(b)[..., None], st["de_far_bit_counts"][..., :-1]],
        axis=-1)
    return st


def delay_process_near(st, near_spectrum, near_q):
    """Returns (st, last_delay [B])."""
    b, mean_near, near_init = binary_spectrum(
        near_spectrum, st["de_mean_near"], st["de_near_init"], near_q)
    st = dict(st)
    st["de_mean_near"] = mean_near
    st["de_near_init"] = near_init

    bit_counts = popcount32(
        st["de_far_hist"].astype(U32) ^ b[..., None].astype(U32))
    fbc = st["de_far_bit_counts"]
    shifts = K_SHIFTS_AT_ZERO - ((K_SHIFTS_LINEAR_SLOPE * fbc) >> 4)
    diff = (bit_counts << 9) - st["de_mean_bit_counts"]
    diff = jnp.where(diff < 0, -((-diff) >> shifts), diff >> shifts)
    mbc = jnp.where(fbc > 0, st["de_mean_bit_counts"] + diff,
                    st["de_mean_bit_counts"])
    st["de_mean_bit_counts"] = mbc

    value_best = jnp.min(mbc, axis=-1)
    # first index achieving the min (C keeps the first)
    iota = jax.lax.broadcasted_iota(I32, mbc.shape, mbc.ndim - 1)
    candidate = jnp.min(jnp.where(mbc == value_best[..., None], iota,
                                  MAX_DELAY), axis=-1)
    value_worst = jnp.max(mbc, axis=-1)
    valley_depth = value_worst - value_best

    min_prob = st["de_min_prob"]
    thr = jnp.maximum(value_best + K_PROBABILITY_OFFSET,
                      K_PROBABILITY_LOWER_LIMIT)
    upd = (min_prob > K_PROBABILITY_LOWER_LIMIT) & \
        (valley_depth > K_PROBABILITY_MIN_SPREAD) & (min_prob > thr)
    min_prob = jnp.where(upd, thr, min_prob)
    last_prob = st["de_last_delay_prob"] + 1
    valid = (valley_depth > K_PROBABILITY_OFFSET) & \
        ((value_best < min_prob) | (value_best < last_prob))
    last_delay = jnp.where(valid, candidate, st["de_last_delay"])
    last_prob = jnp.where(valid & (value_best < last_prob), value_best,
                          last_prob)
    st["de_min_prob"] = min_prob
    st["de_last_delay_prob"] = last_prob
    st["de_last_delay"] = last_delay
    return st, last_delay


# --------------------------------------------------------------------------
# energies / step size / channel (aecm_core.c:403-787)
# --------------------------------------------------------------------------

def _log_of_energy_q8(energy, q_domain):
    """[B] u32-valued i32 energy -> Q8 log2 energy (int16 wrap)."""
    e = energy.astype(U32)
    zeros = norm_u32(e)
    frac = (shift_u32(e, zeros) & jnp.uint32(0x7FFFFFFF)) >> 23
    val = (PART_LEN_SHIFT << 7) + ((31 - zeros) << 8) + \
        frac.astype(I32) - (q_domain << 8)
    return wrap16(jnp.where(e > 0, val, PART_LEN_SHIFT << 7))


def _asym_filt(filt_old, in_val, step_pos, step_neg):
    ret = jnp.where(filt_old > in_val,
                    filt_old - ((filt_old - in_val) >> step_neg),
                    filt_old + ((in_val - filt_old) >> step_pos))
    return jnp.where((filt_old == I16_MAX) | (filt_old == I16_MIN),
                     in_val, wrap16(ret))


def calc_energies(st, far_spectrum, far_q, near_ener, startup0):
    """aecm_core.c CalcEnergies.  startup0: [B] bool (startupState==0).
    Returns (st, echo_est [B,65])."""
    st = dict(st)
    st["near_log_energy"] = jnp.concatenate(
        [_log_of_energy_q8(near_ener, st["dfa_noisy_q"])[..., None],
         st["near_log_energy"][..., :-1]], axis=-1)

    echo_est = mul_16_u16(st["channel_stored"], far_spectrum)
    tmp_far = jnp.sum(far_spectrum.astype(U32), axis=-1).astype(I32)
    tmp_adapt = jnp.sum(
        st["channel_adapt16"].astype(U32) * far_spectrum.astype(U32),
        axis=-1).astype(I32)
    tmp_stored = jnp.sum(echo_est.astype(U32), axis=-1).astype(I32)

    far_log = _log_of_energy_q8(tmp_far, far_q)
    st["far_log_energy"] = far_log
    st["echo_adapt_log"] = jnp.concatenate(
        [_log_of_energy_q8(tmp_adapt,
                           RESOLUTION_CHANNEL16 + far_q)[..., None],
         st["echo_adapt_log"][..., :-1]], axis=-1)
    st["echo_stored_log"] = jnp.concatenate(
        [_log_of_energy_q8(tmp_stored,
                           RESOLUTION_CHANNEL16 + far_q)[..., None],
         st["echo_stored_log"][..., :-1]], axis=-1)

    inc_max = jnp.where(startup0, 2, 4)
    dec_max = jnp.int32(11)
    inc_min = jnp.where(startup0, 8, 11)
    dec_min = jnp.where(startup0, 2, 3)
    active = far_log > FAR_ENERGY_MIN

    fmin = _asym_filt(st["far_energy_min"], far_log, inc_min, dec_min)
    fmax = _asym_filt(st["far_energy_max"], far_log, inc_max, dec_max)
    fmin = jnp.where(active, fmin, st["far_energy_min"])
    fmax = jnp.where(active, fmax, st["far_energy_max"])
    fmaxmin = jnp.where(active, wrap16(fmax - fmin),
                        st["far_energy_max_min"])

    t16 = 2560 - fmin
    t16 = jnp.where(t16 > 0, wrap16((t16 * FAR_ENERGY_VAD_REGION) >> 9),
                    0)
    t16 = t16 + FAR_ENERGY_VAD_REGION
    direct = startup0 | (st["vad_update_count"] > 1024)
    fvad_direct = fmin + t16
    over = st["far_energy_vad"] > far_log
    fvad_tracked = st["far_energy_vad"] + \
        ((far_log + t16 - st["far_energy_vad"]) >> 6)
    fvad = jnp.where(direct, fvad_direct,
                     jnp.where(over, fvad_tracked, st["far_energy_vad"]))
    vuc = jnp.where(direct, st["vad_update_count"],
                    jnp.where(over, 0, st["vad_update_count"] + 1))
    fvad = jnp.where(active, fvad, st["far_energy_vad"])
    vuc = jnp.where(active, vuc, st["vad_update_count"])
    fmse = jnp.where(active, fvad + (1 << 8), st["far_energy_mse"])

    st["far_energy_min"] = fmin
    st["far_energy_max"] = fmax
    st["far_energy_max_min"] = fmaxmin
    st["far_energy_vad"] = fvad
    st["vad_update_count"] = vuc
    st["far_energy_mse"] = fmse

    loud = far_log > fvad
    vad_on = loud & (startup0 | (fmaxmin > FAR_ENERGY_DIFF))
    cvv = jnp.where(loud, jnp.where(vad_on, 1, st["current_vad"]), 0)
    st["current_vad"] = cvv

    # first-VAD channel kickdown
    fire = (cvv != 0) & (st["first_vad"] != 0)
    worse = st["echo_adapt_log"][..., 0] > st["near_log_energy"][..., 0]
    do_kick = fire & worse
    st["channel_adapt16"] = jnp.where(
        do_kick[..., None], st["channel_adapt16"] >> 3,
        st["channel_adapt16"])
    st["echo_adapt_log"] = st["echo_adapt_log"].at[..., 0].set(
        jnp.where(do_kick, st["echo_adapt_log"][..., 0] - (3 << 8),
                  st["echo_adapt_log"][..., 0]))
    st["first_vad"] = jnp.where(fire & ~worse, 0, st["first_vad"])
    return st, echo_est


def calc_step_size(st, startup_pos):
    """[B] mu (shift amount).  startup_pos: [B] bool startupState > 0."""
    t16 = wrap16(st["far_log_energy"] - st["far_energy_min"])
    t32 = t16 * MU_DIFF
    q = div_w32_w16_exact(t32, st["far_energy_max_min"])
    mu_mid = jnp.maximum(MU_MIN - 1 - wrap16(q), MU_MAX)
    mu = jnp.where(st["far_energy_min"] >= st["far_energy_max"],
                   MU_MIN, mu_mid)
    mu = jnp.where(startup_pos, mu, MU_MAX)
    mu = jnp.where(st["current_vad"] == 0, 0, mu)
    return mu


def update_channel(st, far_spectrum, far_q, dfa, mu, echo_est,
                   startup0):
    """aecm_core.c UpdateChannel, vectorized over [B, 65] bins."""
    st = dict(st)
    ch32 = st["channel_adapt32"]
    far_i = far_spectrum
    far_qe = far_q[..., None]
    dfa_q = st["dfa_noisy_q"][..., None]

    zeros_ch = norm_u32(ch32)
    zeros_far = norm_u32(far_i)
    fits = (zeros_ch + zeros_far) > 31
    scf = jnp.where(fits, 0, 32 - zeros_ch - zeros_far)
    tmp_u32_1 = (shift_u32(ch32.astype(U32), -scf) *
                 far_i.astype(U32))
    zeros_num = norm_u32(tmp_u32_1.astype(I32))
    zeros_dfa = jnp.where(dfa != 0, norm_u32(dfa), 32)
    t16no1 = (zeros_dfa - 2 + dfa_q - RESOLUTION_CHANNEL32 -
              far_qe + scf)
    big = zeros_num > (t16no1 + 1)
    xfa_q = jnp.where(big, t16no1, zeros_num - 2)
    dfa_q2 = jnp.where(big, zeros_dfa - 2,
                       RESOLUTION_CHANNEL32 + far_qe - dfa_q - scf +
                       xfa_q)
    u1 = shift_u32(tmp_u32_1, xfa_q)
    u2 = shift_u32(dfa.astype(U32), dfa_q2)
    t32no1 = (u2 - u1).astype(I32)
    zeros_num2 = norm_w32(t32no1)

    gate = (t32no1 != 0) & (far_i > (CHANNEL_VAD << far_qe))
    fits2 = (zeros_num2 + zeros_far) > 31
    shift_num = jnp.where(fits2, 0, 32 - zeros_num2 - zeros_far)
    mag = (shift_u32(jnp.abs(t32no1).astype(U32), -shift_num) *
           far_i.astype(U32)).astype(I32)
    t32no2 = jnp.where(t32no1 > 0, mag, -mag)
    iota = jax.lax.broadcasted_iota(I32, t32no2.shape, t32no2.ndim - 1)
    t32no2 = div_w32_w16_exact(t32no2, iota + 1)
    shift2 = (shift_num + scf - xfa_q - mu[..., None] -
              ((30 - zeros_far) << 1))
    t32no2 = jnp.where(norm_w32(t32no2) < shift2, I32_MAX,
                       shift_w32(t32no2, shift2))
    new_ch32 = jnp.maximum(add_sat_w32(ch32, t32no2), 0)
    apply = gate & (mu[..., None] != 0)
    ch32 = jnp.where(apply, new_ch32, ch32)
    adapt16 = jnp.where(apply, ch32 >> 16, st["channel_adapt16"])
    st["channel_adapt32"] = ch32
    st["channel_adapt16"] = adapt16

    # ---- stored/adaptive arbitration (StoreAdaptiveChannel /
    #      channel MSE comparison)
    store_now = startup0 & (st["current_vad"] != 0)

    mse_reset = st["far_log_energy"] < st["far_energy_mse"]
    mcc = jnp.where(mse_reset, 0, st["mse_channel_count"] + 1)
    evaluate = (~store_now) & (mcc >= (MIN_MSE_COUNT + 10))

    d_stored = jnp.sum(jnp.abs(
        st["echo_stored_log"][..., :MIN_MSE_COUNT] -
        st["near_log_energy"][..., :MIN_MSE_COUNT]), axis=-1)
    d_adapt = jnp.sum(jnp.abs(
        st["echo_adapt_log"][..., :MIN_MSE_COUNT] -
        st["near_log_energy"][..., :MIN_MSE_COUNT]), axis=-1)

    revert = evaluate & \
        ((d_stored << MSE_RESOLUTION) < MIN_MSE_DIFF * d_adapt) & \
        ((st["mse_stored_old"] << MSE_RESOLUTION) <
         MIN_MSE_DIFF * st["mse_adapt_old"])
    adopt = evaluate & ~revert & \
        ((MIN_MSE_DIFF * d_stored) > (d_adapt << MSE_RESOLUTION)) & \
        (d_adapt < st["mse_threshold"]) & \
        (st["mse_adapt_old"] < st["mse_threshold"])

    # revert: adaptive <- stored
    st["channel_adapt16"] = jnp.where(
        revert[..., None], st["channel_stored"], st["channel_adapt16"])
    st["channel_adapt32"] = jnp.where(
        revert[..., None], st["channel_stored"] << 16,
        st["channel_adapt32"])
    # adopt (or startup store): stored <- adaptive, echo_est recomputed
    do_store = store_now | adopt
    st["channel_stored"] = jnp.where(
        do_store[..., None], st["channel_adapt16"],
        st["channel_stored"])
    echo_est = jnp.where(do_store[..., None],
                         mul_16_u16(st["channel_stored"], far_spectrum),
                         echo_est)
    thr_unset = st["mse_threshold"] == I32_MAX
    scaled = div_w32_w16_exact(st["mse_threshold"] * 5, 8)
    thr_new = jnp.where(
        thr_unset, d_adapt + st["mse_adapt_old"],
        st["mse_threshold"] + ((( d_adapt - scaled) * 205) >> 8))
    st["mse_threshold"] = jnp.where(adopt, thr_new,
                                    st["mse_threshold"])

    st["mse_stored_old"] = jnp.where(evaluate, d_stored,
                                     st["mse_stored_old"])
    st["mse_adapt_old"] = jnp.where(evaluate, d_adapt,
                                    st["mse_adapt_old"])
    st["mse_channel_count"] = jnp.where(store_now, st["mse_channel_count"],
                                        jnp.where(evaluate, 0, mcc))
    return st, echo_est


def calc_suppression_gain(st):
    st = dict(st)
    dE_s = wrap16(st["near_log_energy"][..., 0] -
                  st["echo_stored_log"][..., 0] - ENERGY_DEV_OFFSET)
    dE = jnp.abs(dE_s)
    # dE < SUPGAIN_EPC_DT branch
    t32a = (SUPGAIN_ERROR_PARAM_A - SUPGAIN_ERROR_PARAM_B) * dE
    t32a = t32a + (SUPGAIN_EPC_DT >> 1)
    ga = SUPGAIN_ERROR_PARAM_A - wrap16(
        div_w32_w16_exact(t32a, SUPGAIN_EPC_DT))
    t32b = (SUPGAIN_ERROR_PARAM_B - SUPGAIN_ERROR_PARAM_D) * \
        (ENERGY_DEV_TOL - dE)
    t32b = t32b + ((ENERGY_DEV_TOL - SUPGAIN_EPC_DT) >> 1)
    gb = SUPGAIN_ERROR_PARAM_D + wrap16(
        div_w32_w16_exact(t32b, ENERGY_DEV_TOL - SUPGAIN_EPC_DT))
    g = jnp.where(dE < ENERGY_DEV_TOL,
                  jnp.where(dE < SUPGAIN_EPC_DT, ga, gb),
                  SUPGAIN_ERROR_PARAM_D)
    sup = jnp.where(st["current_vad"] == 0, 0, g)

    t16 = jnp.maximum(sup, st["sup_gain_old"])
    st["sup_gain_old"] = sup
    st["sup_gain"] = st["sup_gain"] + wrap16((t16 - st["sup_gain"]) >> 4)
    return st, st["sup_gain"]


# --------------------------------------------------------------------------
# the block (ProcessBlock, aecm_core.c:403-787)
# --------------------------------------------------------------------------

def make_init_state(batch: int, samp_freq: int) -> dict:
    """Device state matching AecmCore.init (dsp/aecm.py)."""
    stored = (K_CHANNEL_STORED_8K if samp_freq == 8000
              else K_CHANNEL_STORED_16K).astype(np.int32)
    noise_est = np.zeros(PART_LEN1, np.int32)
    t32 = PART_LEN1 * PART_LEN1
    t16 = PART_LEN1
    for i in range((PART_LEN1 >> 1) - 1):
        noise_est[i] = t32 << 8
        t16 -= 1
        t32 -= (t16 << 1) + 1
    for i in range((PART_LEN1 >> 1) - 1, PART_LEN1):
        noise_est[i] = t32 << 8
    B = batch
    zi = lambda *s: jnp.zeros((B,) + s, I32)
    fill = lambda v, *s: jnp.full((B,) + s, v, I32)
    return dict(
        x_buf=zi(PART_LEN2), d_buf=zi(PART_LEN2),
        out_buf=zi(PART_LEN),
        far_history=zi(MAX_DELAY, PART_LEN1),
        far_q_domains=zi(MAX_DELAY),
        de_mean_far=zi(PART_LEN1), de_mean_near=zi(PART_LEN1),
        de_far_init=zi(), de_near_init=zi(),
        de_far_hist=zi(MAX_DELAY), de_far_bit_counts=zi(MAX_DELAY),
        de_mean_bit_counts=fill(20 << 9, MAX_DELAY),
        de_min_prob=fill(K_MAX_BIT_COUNTS_Q9),
        de_last_delay_prob=fill(K_MAX_BIT_COUNTS_Q9),
        de_last_delay=fill(-2),
        channel_stored=jnp.broadcast_to(jnp.asarray(stored),
                                        (B, PART_LEN1)).astype(I32),
        channel_adapt16=jnp.broadcast_to(jnp.asarray(stored),
                                         (B, PART_LEN1)).astype(I32),
        channel_adapt32=jnp.broadcast_to(jnp.asarray(stored) << 16,
                                         (B, PART_LEN1)).astype(I32),
        near_log_energy=zi(MAX_BUF_LEN), echo_adapt_log=zi(MAX_BUF_LEN),
        echo_stored_log=zi(MAX_BUF_LEN), far_log_energy=zi(),
        echo_filt=zi(PART_LEN1), near_filt=zi(PART_LEN1),
        noise_est=jnp.broadcast_to(jnp.asarray(noise_est),
                                   (B, PART_LEN1)).astype(I32),
        ne_too_low=zi(PART_LEN1), ne_too_high=zi(PART_LEN1),
        far_energy_min=fill(I16_MAX), far_energy_max=fill(I16_MIN),
        far_energy_max_min=zi(), far_energy_vad=fill(FAR_ENERGY_MIN),
        far_energy_mse=zi(),
        current_vad=zi(), vad_update_count=zi(), first_vad=fill(1),
        sup_gain=fill(SUPGAIN_DEFAULT), sup_gain_old=fill(SUPGAIN_DEFAULT),
        mse_adapt_old=fill(1000), mse_stored_old=fill(1000),
        mse_threshold=fill(I32_MAX), mse_channel_count=zi(),
        dfa_noisy_q=zi(), dfa_noisy_q_old=zi(),
    )


def process_block(st, far64, near64, rand16, hist_pos, tot_count,
                  noise_ctr_lt100, mult: int):
    """One 64-sample AECM block over [B] streams.

    far64/near64: [B, 64] int32; rand16: [64] int32 (the shared RandU
    sequence — the seed path is call-pattern-deterministic);
    hist_pos: traced scalar (far-history write slot); tot_count: traced
    scalar (startup state machine); noise_ctr_lt100: traced bool
    (comfort-noise min_track_shift).  Returns (st, out64)."""
    st = dict(st)
    startup_state = (tot_count >= 512).astype(I32) + \
        (tot_count >= 1024).astype(I32)
    B = far64.shape[0]
    startup0 = jnp.broadcast_to(startup_state == 0, (B,))
    startup_pos = jnp.broadcast_to(startup_state > 0, (B,))

    x_buf = jnp.concatenate([st["x_buf"][:, PART_LEN:], far64], axis=1)
    d_buf = jnp.concatenate([st["d_buf"][:, PART_LEN:], near64], axis=1)

    xre, xim, xfa, xfa_sum, far_q_new = time_to_freq(x_buf)
    dre, dim, dfa, dfa_sum, zeros_d = time_to_freq(d_buf)
    st["dfa_noisy_q_old"] = st["dfa_noisy_q"]
    st["dfa_noisy_q"] = zeros_d

    # far history + delay estimation
    st["far_history"] = jax.lax.dynamic_update_slice_in_dim(
        st["far_history"], xfa[:, None], hist_pos, axis=1)
    st["far_q_domains"] = jax.lax.dynamic_update_slice_in_dim(
        st["far_q_domains"], far_q_new[:, None], hist_pos, axis=1)
    st = delay_add_far(st, xfa, far_q_new)
    st, delay = delay_process_near(st, dfa, zeros_d)
    delay = jnp.where(delay == -2, 0, delay)

    pos = hist_pos - delay
    pos = jnp.where(pos < 0, pos + MAX_DELAY, pos)
    far_spectrum = jnp.take_along_axis(
        st["far_history"], pos[:, None, None], axis=1)[:, 0]
    far_q = jnp.take_along_axis(st["far_q_domains"], pos[:, None],
                                axis=1)[:, 0]

    st, echo_est = calc_energies(st, far_spectrum, far_q, dfa_sum,
                                 startup0)
    mu = calc_step_size(st, startup_pos)
    st, echo_est = update_channel(st, far_spectrum, far_q, dfa, mu,
                                  echo_est, startup0)
    st, sup_gain = calc_suppression_gain(st)

    # ---- Wiener gain hnl (aecm_core_c.c:291-356) ----
    dfa_clean_q = st["dfa_noisy_q"][..., None]
    dfa_clean_q_old = st["dfa_noisy_q_old"][..., None]
    far_qe = far_q[..., None]
    sup_e = sup_gain[..., None]

    t32no1 = (echo_est.astype(U32) -
              st["echo_filt"].astype(U32)).astype(I32)   # w32 sub
    # aecm_core_c.c:456 computes (t * 50) in int32, which WRAPS on loud
    # echo estimates (|t| > 2^31/50); the int32 multiply below wraps
    # identically, then >>8 is the C's arithmetic shift of the wrapped
    # product (PARITY_r04 int-chain divergence root cause)
    inc = (t32no1 * jnp.int32(50)) >> 8
    echo_filt = (st["echo_filt"].astype(U32) +
                 inc.astype(U32)).astype(I32)            # w32 add
    st["echo_filt"] = echo_filt
    zeros32 = norm_w32(echo_filt) + 1
    zeros16 = norm_w16(sup_e) + 1
    fits = (zeros32 + zeros16) > 16
    t16no1 = 17 - zeros32 - zeros16
    rd_base = 14 - RESOLUTION_CHANNEL16 - RESOLUTION_SUPGAIN + \
        dfa_clean_q - far_qe
    resolution_diff = jnp.where(fits, rd_base, rd_base + t16no1)
    gained_a = echo_filt.astype(U32) * (sup_e.astype(U32) &
                                        jnp.uint32(0xFFFF))
    gained_b = jnp.where(
        zeros32 > t16no1,
        echo_filt.astype(U32) * shift_u32(sup_e.astype(U32), -t16no1),
        shift_w32(echo_filt, -t16no1).astype(U32) * sup_e.astype(U32))
    echo_est_gained = jnp.where(fits, gained_a, gained_b)

    # near_filt tracking
    nf = st["near_filt"]
    zeros16n = norm_w16(nf)
    dfa_diff = dfa_clean_q - dfa_clean_q_old
    cond = (zeros16n < dfa_diff) & (nf != 0)
    t16a = wrap16(shift_w32(nf, jnp.where(cond, zeros16n, 0)))
    t16a = jnp.where(cond, t16a,
                     jnp.where(dfa_diff < 0,
                               nf >> jnp.maximum(-dfa_diff, 0),
                               wrap16(nf << jnp.maximum(dfa_diff, 0))))
    q_diff = jnp.where(cond, zeros16n - dfa_diff, 0)
    t16b = jnp.where(cond, dfa >> jnp.maximum(-q_diff, 0), dfa)
    t32no1n = t16b - t16a
    # the C smoothing add is an int16 += and WRAPS (aecm_core_c.c:503)
    t16no2 = wrap16(wrap16(t32no1n >> 4) + t16a)
    zeros16b = norm_w16(t16no2)
    # upstream quirk (aecm_core_c.c:505): `(tmp16no2) & (bool)` is a
    # BITWISE and — saturation fires only when t16no2 is ODD
    overflow = ((t16no2 & 1) != 0) & ((-q_diff) > zeros16b)
    nf_new = jnp.where(
        overflow, I16_MAX,
        jnp.where(q_diff < 0,
                  wrap16(t16no2 << jnp.maximum(-q_diff, 0)),
                  t16no2 >> jnp.maximum(q_diff, 0)))
    st["near_filt"] = nf_new

    # hnl
    gained_half = echo_est_gained + (nf_new >> 1).astype(U32)
    ratio = div_u32_u16(gained_half, nf_new.astype(U32))
    t32r = shift_w32(ratio.astype(I32), resolution_diff)
    hnl_mid = jnp.clip(ONE_Q14 - t32r, 0, ONE_Q14)
    hnl_mid = jnp.where(t32r > ONE_Q14, 0,
                        jnp.where(t32r < 0, ONE_Q14, hnl_mid))
    hnl = jnp.where(echo_est_gained == 0, ONE_Q14,
                    jnp.where(nf_new == 0, 0, hnl_mid))
    num_pos_coef = jnp.sum((hnl != 0).astype(I32), axis=-1)

    if mult == 2:
        hnl = (hnl * hnl) >> 14
        avg = div_w32_w16_exact(
            jnp.sum(hnl[..., 4:25], axis=-1), 21)[..., None]
        idx = jax.lax.broadcasted_iota(I32, hnl.shape, hnl.ndim - 1)
        hnl = jnp.where(idx >= 24, jnp.minimum(hnl, avg), hnl)

    # NLP (nlp_flag fixed 1 in the daemon wrapper)
    hnl = jnp.where(hnl > NLP_COMP_HIGH, ONE_Q14,
                    jnp.where(hnl < NLP_COMP_LOW, 0, hnl))
    nlp_gain = jnp.where(num_pos_coef < 3, 0, ONE_Q14)[..., None]
    pass_through = (hnl == ONE_Q14) & (nlp_gain == ONE_Q14)
    hnl = jnp.where(pass_through, hnl, (hnl * nlp_gain) >> 14)
    efw_re = wrap16((dre * hnl + (1 << 13)) >> 14)
    efw_im = wrap16((dim * hnl + (1 << 13)) >> 14)

    # ---- ComfortNoise (aecm_core_c.c:583-719) ----
    shift_from_near = K_NOISE_EST_Q_DOMAIN - st["dfa_noisy_q"]
    min_track_shift = jnp.where(noise_ctr_lt100, 6, 9)
    sfn = shift_from_near[..., None]
    out_l = shift_w32(dfa, sfn)
    ne = st["noise_est"]
    below = out_l < ne
    small = ne < (1 << min_track_shift)
    too_high_inc = st["ne_too_high"] + 1
    fire_high = below & small & (too_high_inc >= K_NOISE_EST_INC_COUNT)
    ne_b = jnp.where(small,
                     jnp.where(fire_high, ne - 1, ne),
                     ne - shift_w32(ne - out_l, -min_track_shift))
    # below path: too_low := 0; too_high increments only in the `small`
    # sub-branch (else untouched).  above path: too_high := 0; too_low
    # increments only in the smallest sub-branch.
    th_new = jnp.where(
        below,
        jnp.where(small, jnp.where(fire_high, 0, too_high_inc),
                  st["ne_too_high"]),
        0)
    # above path
    big19 = (ne >> 19) > 0
    big11 = (ne >> 11) > 0
    ne_a19 = ((ne >> 11).astype(U32) * jnp.uint32(2049)).astype(I32)
    ne_a11 = (ne.astype(U32) * jnp.uint32(2049)).astype(I32) >> 11
    too_low_inc = st["ne_too_low"] + 1
    fire_low = (~big19) & (~big11) & \
        (too_low_inc >= K_NOISE_EST_INC_COUNT)
    ne_a = jnp.where(big19, ne_a19,
                     jnp.where(big11, ne_a11,
                               jnp.where(fire_low, ne + ((ne >> 9) + 1),
                                         ne)))
    tl_new = jnp.where(below, 0,
                       jnp.where(big19 | big11, st["ne_too_low"],
                                 jnp.where(fire_low, 0, too_low_inc)))
    ne_new = jnp.where(below, ne_b, ne_a)
    st["ne_too_high"] = th_new
    st["ne_too_low"] = tl_new

    t32 = shift_w32(ne_new, -sfn)
    clip = t32 > 32767
    t32 = jnp.where(clip, 32767, t32)
    ne_new = jnp.where(clip, shift_w32(t32, sfn), ne_new)
    st["noise_est"] = ne_new
    noise_r = wrap16(((ONE_Q14 - hnl) * t32) >> 14)

    t16r = (359 * rand16) >> 15                         # [64]
    cosv = jnp.take(jnp.asarray(_COS_T), t16r)
    sinv = jnp.take(jnp.asarray(_SIN_T), t16r)
    u_re = jnp.concatenate(
        [jnp.zeros((B, 1), I32),
         wrap16((noise_r[:, 1:] * cosv[None, :]) >> 13)], axis=1)
    u_im = jnp.concatenate(
        [jnp.zeros((B, 1), I32),
         wrap16((-noise_r[:, 1:] * sinv[None, :]) >> 13)], axis=1)
    u_im = u_im.at[:, PART_LEN].set(0)
    efw_re = add_sat_w16(efw_re, u_re)
    efw_im = add_sat_w16(efw_im, u_im)

    # ---- InverseFFTAndWindow (aecm_core_c.c:476-531) ----
    ifft_out, out_cfft = real_inverse_fft(efw_re, -efw_im)
    shift_out = (out_cfft - st["dfa_noisy_q"])[..., None]
    han = jnp.asarray(_HANNING)
    v = wrap16((ifft_out[:, :PART_LEN] * han[None, :PART_LEN] +
                (1 << 13)) >> 14)
    t32a = shift_w32(v, shift_out)
    output = jnp.clip(t32a + st["out_buf"], I16_MIN, I16_MAX)
    t32b = (ifft_out[:, PART_LEN:] * han[None, PART_LEN:0:-1]) >> 14
    st["out_buf"] = jnp.clip(shift_w32(t32b, shift_out),
                             I16_MIN, I16_MAX)

    st["x_buf"] = x_buf
    st["d_buf"] = d_buf
    return st, output

"""Voice activity detection: bit-exact rebuild of the webrtc GMM VAD.

Reimplements, as pure JAX int32 arithmetic over a state pytree:
  * the 6-band split filterbank + log-energy features
    (common_audio/vad/vad_filterbank.c)
  * the Gaussian pair per band with fixed-point probability/exp approx
    (vad_gmm.c)
  * minimum tracking + median smoothing (vad_sp.c WebRtcVad_FindMinimum)
  * the GMM hypothesis test, model adaptation and hangover
    (vad_core.c GmmProbability)
  * 32k->16k->8k downsampling (vad_sp.c WebRtcVad_Downsampling)
  * the daemon's wrapper semantics (src/webrtc.c vad_process:91-151):
    truncating channel downmix, the progressive ``reduce`` mute with its
    first-package-only quirk (src/webrtc.c:140), and reverse upmix.

Everything is elementwise or small static scans, so a stream batch
dimension is added with jax.vmap and the whole chain runs on the VPU.
The aggressiveness mode is fixed to 3 by the wrapper (src/webrtc.c:16).

All functions are single-stream; see wmix_tpu.engine for batching.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wmix_tpu.dsp.intops import (I32, div_w32_w16, norm_u32, norm_w32,
                                 wrap16)

# ---- constants (vad_core.c:19-91, vad_gmm.c:16-17, vad_filterbank.c:19-31,
#      vad_sp.c:19-23) ----
N_CH = 6            # frequency bands
N_G = 2             # gaussians per band
TBL = N_CH * N_G

SPECTRUM_WEIGHT = np.array([6, 8, 10, 12, 14, 16], np.int32)
NOISE_UPDATE = 655      # Q15
SPEECH_UPDATE = 6554    # Q15
BACK_ETA = 154          # Q8
MIN_DIFF = np.array([544, 544, 576, 576, 576, 576], np.int32)       # Q5
MAX_SPEECH = np.array([11392, 11392, 11520, 11520, 11520, 11520], np.int32)
MIN_MEAN = np.array([640, 768], np.int32)
MAX_NOISE = np.array([9216, 9088, 8960, 8832, 8704, 8576], np.int32)
NOISE_W = np.array([34, 62, 72, 66, 53, 25, 94, 66, 56, 62, 75, 103],
                   np.int32)
SPEECH_W = np.array([48, 82, 45, 87, 50, 47, 80, 46, 83, 41, 78, 81],
                    np.int32)
NOISE_MEANS0 = np.array([6738, 4892, 7065, 6715, 6771, 3369, 7646, 3863,
                         7820, 7266, 5020, 4362], np.int32)
SPEECH_MEANS0 = np.array([8306, 10085, 10078, 11823, 11843, 6309, 9473,
                          9571, 10879, 7581, 8180, 7483], np.int32)
NOISE_STDS0 = np.array([378, 1064, 493, 582, 688, 593, 474, 697, 475, 688,
                        421, 455], np.int32)
SPEECH_STDS0 = np.array([555, 505, 567, 524, 585, 1231, 509, 828, 492,
                         1540, 1079, 850], np.int32)
MAX_SPEECH_FRAMES = 6
MIN_STD = 384
MIN_ENERGY = 10
COMP_VAR = 22005
LOG2_EXP = 5909         # Q12

# mode 3 ("very aggressive", set by the daemon wrapper) thresholds indexed
# by frame length {80,160,240}
OVER_HANG_MAX_1 = np.array([6, 3, 2], np.int32)
OVER_HANG_MAX_2 = np.array([9, 5, 3], np.int32)
LOCAL_THRESHOLD = np.array([94, 94, 94], np.int32)
GLOBAL_THRESHOLD = np.array([1100, 1050, 1100], np.int32)

LOG_CONST = 24660       # 160*log10(2) in Q9
LOG_ENERGY_INT = 14336  # 14 in Q10
HP_ZERO = np.array([6631, -13262, 6631], np.int32)  # Q14
HP_POLE = np.array([16384, -7756, 5620], np.int32)  # Q14
ALLPASS_Q15 = np.array([20972, 5571], np.int32)
OFFSET_VECTOR = np.array([368, 368, 272, 176, 176, 176], np.int32)
ALLPASS_Q13 = np.array([5243, 1392], np.int32)
SMOOTH_DOWN = 6553      # 0.2 Q15
SMOOTH_UP = 32439       # 0.99 Q15


class VadState(NamedTuple):
    """Per-stream VAD state (VadInstT, vad_core.h:28-59 + wrapper reduce)."""
    noise_means: jax.Array    # [12] int32 (int16 semantics)
    speech_means: jax.Array   # [12]
    noise_stds: jax.Array     # [12]
    speech_stds: jax.Array    # [12]
    frame_counter: jax.Array  # scalar int32
    over_hang: jax.Array      # scalar
    num_of_speech: jax.Array  # scalar
    index_vector: jax.Array   # [6,16] ages
    low_value_vector: jax.Array  # [6,16] 16 smallest feature values
    mean_value: jax.Array     # [6]
    upper_state: jax.Array    # [5]
    lower_state: jax.Array    # [5]
    hp_filter_state: jax.Array  # [4]
    ds_state: jax.Array       # [4] int32, 32k->16k->8k downsampling
    reduce: jax.Array         # scalar, wrapper progressive mute 0..4


def init_state() -> VadState:
    """WebRtcVad_InitCore (vad_core.c:482-536) + wrapper reduce=4."""
    z = jnp.zeros
    return VadState(
        noise_means=jnp.asarray(NOISE_MEANS0),
        speech_means=jnp.asarray(SPEECH_MEANS0),
        noise_stds=jnp.asarray(NOISE_STDS0),
        speech_stds=jnp.asarray(SPEECH_STDS0),
        frame_counter=jnp.int32(0),
        over_hang=jnp.int32(0),
        num_of_speech=jnp.int32(0),
        index_vector=z((N_CH, 16), I32),
        low_value_vector=jnp.full((N_CH, 16), 10000, I32),
        mean_value=jnp.full((N_CH,), 1600, I32),
        upper_state=z((5,), I32),
        lower_state=z((5,), I32),
        hp_filter_state=z((4,), I32),
        ds_state=z((4,), I32),
        reduce=jnp.int32(4),
    )


# --------------------------------------------------------------------------
# filterbank (vad_filterbank.c)
# --------------------------------------------------------------------------

def _allpass(data, coef, state16):
    """AllPassFilter (vad_filterbank.c:83-108); data already strided.

    The scan's initial carry is materialized through an
    optimization_barrier: on the TPU backend, fusing the row-slice of
    the stacked [5, 2] filter-state array into the scan makes the
    carry read the WRONG slot (observed: garbage init state at B>1
    when the whole VAD is one program; bitwise-verified fix)."""
    state16 = jax.lax.optimization_barrier(state16)
    state32_0 = state16.astype(I32) << 16

    def body(state32, x):
        tmp32 = state32 + coef * x
        tmp16 = wrap16(tmp32 >> 16)
        s = (x << 14) - coef * tmp16
        return s << 1, tmp16

    state32, out = jax.lax.scan(body, state32_0, data)
    return out, wrap16(state32 >> 16)


def _split_filter(data, up16, lo16):
    """SplitFilter (vad_filterbank.c:121-142)."""
    hp, up16 = _allpass(data[0::2], ALLPASS_Q15[0], up16)
    lp, lo16 = _allpass(data[1::2], ALLPASS_Q15[1], lo16)
    hp_out = wrap16(hp - lp)
    lp_out = wrap16(lp + hp)
    return hp_out, lp_out, up16, lo16


def _highpass(data, state):
    """HighPassFilter (vad_filterbank.c:41-72); state [4] int16 values.

    Same TPU scan-carry slice hazard as _allpass — barrier the state."""
    state = jax.lax.optimization_barrier(state)

    def body(st, x):
        f0, f1, f2, f3 = st
        tmp32 = HP_ZERO[0] * x + HP_ZERO[1] * f0 + HP_ZERO[2] * f1
        f1n, f0n = f0, x
        tmp32 = tmp32 - HP_POLE[1] * f2 - HP_POLE[2] * f3
        f3n = f2
        f2n = wrap16(tmp32 >> 14)
        return (f0n, f1n, f2n, f3n), f2n

    st0 = (state[0], state[1], state[2], state[3])
    st, out = jax.lax.scan(body, st0, data)
    return out, jnp.stack(st)


def _bit_length(n: int) -> int:
    return int(n).bit_length()


def _log_of_energy(data, length: int, offset, total_energy):
    """LogOfEnergy (vad_filterbank.c:155-244) for static `length`."""
    # WebRtcSpl_GetScalingSquare: sabs wraps to int16 (so -32768 stays
    # -32768 and never wins the max — a reference quirk)
    sabs = wrap16(jnp.abs(data))
    smax = jnp.max(jnp.concatenate([sabs, jnp.full((1,), -1, I32)]))
    nbits = _bit_length(length)
    t = norm_w32(smax * smax)
    scaling = jnp.where(smax == 0, 0,
                        jnp.where(t > nbits, 0, nbits - t)).astype(I32)
    en = jnp.sum((data * data) >> scaling).astype(I32)  # wraps like C int32
    energy = en.astype(jnp.uint32)

    nonzero = energy != 0
    norm_rs = 17 - norm_u32(energy)
    tot_rshifts = scaling + norm_rs
    e_norm = jnp.where(norm_rs < 0, energy << (-norm_rs).astype(jnp.uint32),
                       energy >> jnp.maximum(norm_rs, 0).astype(jnp.uint32))
    log2_energy = wrap16(LOG_ENERGY_INT +
                         ((e_norm & jnp.uint32(0x3FFF)).astype(I32) >> 4))
    log_e = wrap16(((LOG_CONST * log2_energy) >> 19) +
                   ((tot_rshifts * LOG_CONST) >> 9))
    log_e = jnp.maximum(log_e, 0)
    log_e = wrap16(log_e + offset)
    log_energy = jnp.where(nonzero, log_e, offset).astype(I32)

    # total_energy update only on the nonzero path (the else returns early)
    add = jnp.where(
        tot_rshifts >= 0, MIN_ENERGY + 1,
        wrap16((energy >> (-jnp.minimum(tot_rshifts, 0)).astype(jnp.uint32)
                ).astype(I32)))
    te = jnp.where(nonzero & (total_energy <= MIN_ENERGY),
                   wrap16(total_energy + add), total_energy)
    return log_energy, te


def _calculate_features(state: VadState, frame):
    """WebRtcVad_CalculateFeatures (vad_filterbank.c:246-333).

    frame: int32 [80|160|240] 8 kHz samples.  Returns (features[6],
    total_energy, new filter states)."""
    n = frame.shape[0]
    up = state.upper_state
    lo = state.lower_state
    features = [None] * 6
    total = jnp.int32(0)

    hp120, lp120, u0, l0 = _split_filter(frame, up[0], lo[0])          # n/2
    hp60, lp60, u1, l1 = _split_filter(hp120, up[1], lo[1])            # n/4
    features[5], total = _log_of_energy(hp60, n // 4, OFFSET_VECTOR[5],
                                        total)
    features[4], total = _log_of_energy(lp60, n // 4, OFFSET_VECTOR[4],
                                        total)
    hp60b, lp60b, u2, l2 = _split_filter(lp120, up[2], lo[2])          # n/4
    features[3], total = _log_of_energy(hp60b, n // 4, OFFSET_VECTOR[3],
                                        total)
    hp120b, lp120b, u3, l3 = _split_filter(lp60b, up[3], lo[3])        # n/8
    features[2], total = _log_of_energy(hp120b, n // 8, OFFSET_VECTOR[2],
                                        total)
    hp60c, lp60c, u4, l4 = _split_filter(lp120b, up[4], lo[4])         # n/16
    features[1], total = _log_of_energy(hp60c, n // 16, OFFSET_VECTOR[1],
                                        total)
    hp_out, hp_state = _highpass(lp60c, state.hp_filter_state)
    features[0], total = _log_of_energy(hp_out, n // 16, OFFSET_VECTOR[0],
                                        total)

    new_up = jnp.stack([u0, u1, u2, u3, u4])
    new_lo = jnp.stack([l0, l1, l2, l3, l4])
    return (jnp.stack(features), total,
            state._replace(upper_state=new_up, lower_state=new_lo,
                           hp_filter_state=hp_state))


# --------------------------------------------------------------------------
# gaussian probability (vad_gmm.c)
# --------------------------------------------------------------------------

def _gaussian_probability(inp, mean, std):
    """WebRtcVad_GaussianProbability (vad_gmm.c:30-83); elementwise over
    any shape.  Returns (probability Q20*, delta Q11)."""
    tmp32 = jnp.int32(131072) + (std >> 1)
    inv_std = wrap16(div_w32_w16(tmp32, std))
    tmp16 = inv_std >> 2
    inv_std2 = wrap16((tmp16 * tmp16) >> 2)
    x = wrap16(inp << 3)
    xm = wrap16(x - mean)
    delta = wrap16((inv_std2 * xm) >> 10)
    expo = (delta * xm) >> 9

    t16 = wrap16((LOG2_EXP * expo) >> 12)
    t16 = wrap16(-t16)
    exp_value = (jnp.int32(0x0400) | (t16 & 0x03FF))
    t16 = wrap16(t16 ^ 0xFFFF)
    t16 = t16 >> 10
    t16 = t16 + 1
    exp_value = exp_value >> jnp.clip(t16, 0, 31)
    exp_value = jnp.where(expo < COMP_VAR, exp_value, 0)
    return inv_std * exp_value, delta


# --------------------------------------------------------------------------
# minimum tracking (vad_sp.c WebRtcVad_FindMinimum)
# --------------------------------------------------------------------------

def _find_minimum(vals, ages, mean, frame_counter, feature):
    """One channel of WebRtcVad_FindMinimum (vad_sp.c:59-177).

    vals/ages: [16].  Returns (new_vals, new_ages, new_mean, minimum)."""
    idx16 = jnp.arange(16, dtype=I32)

    # aging loop with removal; replicated literally (the post-removal
    # entries' age bookkeeping is order-dependent)
    def age_body(i, carry):
        # traced-index .at[] ops lower to scatter under the engine's
        # vmap (TPU-serialized); the masked selects are value-identical
        v, a = carry
        is_removal = a[i] == 100
        # removal: shift left from i, tail gets (101, 10000)
        v_shift = jnp.where(idx16 >= i, jnp.roll(v, -1), v)
        v_shift = jnp.where(idx16 == 15, 10000, v_shift)
        a_shift = jnp.where(idx16 >= i, jnp.roll(a, -1), a)
        a_shift = jnp.where(idx16 == 15, 101, a_shift)
        # no removal: increment this age
        a_inc = jnp.where(idx16 == i, a + 1, a)
        v2 = jnp.where(is_removal, v_shift, v)
        a2 = jnp.where(is_removal, a_shift, a_inc)
        return (v2, a2)

    vals, ages = jax.lax.fori_loop(0, 16, age_body, (vals, ages))

    # insertion position: first index with feature < vals[idx]
    pos = jnp.sum((vals <= feature).astype(I32))
    do_insert = pos < 16
    v_shift = jnp.where(idx16 > pos, jnp.roll(vals, 1), vals)
    a_shift = jnp.where(idx16 > pos, jnp.roll(ages, 1), ages)
    safe_pos = jnp.clip(pos, 0, 15)
    v_new = jnp.where(idx16 == safe_pos, feature, v_shift)
    a_new = jnp.where(idx16 == safe_pos, 1, a_shift)
    vals = jnp.where(do_insert, v_new, vals)
    ages = jnp.where(do_insert, a_new, ages)

    median = jnp.where(frame_counter > 2, vals[2],
                       jnp.where(frame_counter > 0, vals[0], 1600))
    alpha = jnp.where(
        frame_counter > 0,
        jnp.where(median < mean, SMOOTH_DOWN, SMOOTH_UP), 0).astype(I32)
    tmp32 = (alpha + 1) * mean + (32767 - alpha) * median + 16384
    mean = wrap16(tmp32 >> 15)
    return vals, ages, mean, mean


# --------------------------------------------------------------------------
# GMM probability / decision (vad_core.c GmmProbability)
# --------------------------------------------------------------------------

def _frame_index(frame_length: int) -> int:
    return {80: 0, 160: 1}.get(frame_length, 2)


def _gmm_probability(state: VadState, features, total_power,
                     frame_length: int):
    """GmmProbability (vad_core.c:124-479) for a static frame_length."""
    fi = _frame_index(frame_length)
    overhead1 = jnp.int32(OVER_HANG_MAX_1[fi])
    overhead2 = jnp.int32(OVER_HANG_MAX_2[fi])
    individual = jnp.int32(LOCAL_THRESHOLD[fi])
    total_thr = jnp.int32(GLOBAL_THRESHOLD[fi])

    nm = state.noise_means.reshape(N_G, N_CH)
    sm = state.speech_means.reshape(N_G, N_CH)
    ns = state.noise_stds.reshape(N_G, N_CH)
    ss = state.speech_stds.reshape(N_G, N_CH)
    w_n = jnp.asarray(NOISE_W).reshape(N_G, N_CH)
    w_s = jnp.asarray(SPEECH_W).reshape(N_G, N_CH)
    feat = features  # [6]

    # --- hypothesis test, vectorized over [gaussian, channel] ---
    probs_n, delta_n = _gaussian_probability(feat[None, :], nm, ns)
    probs_s, delta_s = _gaussian_probability(feat[None, :], sm, ss)
    np_w = w_n * probs_n       # Q27, [2,6]
    sp_w = w_s * probs_s
    h0 = np_w.sum(axis=0)      # [6] int32
    h1 = sp_w.sum(axis=0)

    sh0 = jnp.where(h0 == 0, 31, norm_w32(h0))
    sh1 = jnp.where(h1 == 0, 31, norm_w32(h1))
    llr = sh0 - sh1
    sum_llr = jnp.sum(llr * jnp.asarray(SPECTRUM_WEIGHT))
    vad_local = jnp.any((llr << 2) > individual)

    h0_16 = wrap16(h0 >> 12)
    h1_16 = wrap16(h1 >> 12)
    mask_neg4096 = jnp.int32(-4096)  # 0xFFFFF000
    ngr0 = wrap16(div_w32_w16((np_w[0] & mask_neg4096) << 2,
                              jnp.where(h0_16 > 0, h0_16, 1)))
    ngprvec = jnp.where(h0_16 > 0,
                        jnp.stack([ngr0, 16384 - ngr0]),
                        jnp.stack([jnp.full((N_CH,), 16384, I32),
                                   jnp.zeros((N_CH,), I32)]))
    sgr0 = wrap16(div_w32_w16((sp_w[0] & mask_neg4096) << 2,
                              jnp.where(h1_16 > 0, h1_16, 1)))
    sgprvec = jnp.where(h1_16 > 0,
                        jnp.stack([sgr0, 16384 - sgr0]),
                        jnp.zeros((N_G, N_CH), I32))

    vadflag = jnp.where(vad_local | (sum_llr >= total_thr), 1, 0)

    # --- minimum tracking (only on high-power frames) ---
    fm_vals, fm_ages, fm_mean, feature_minimum = jax.vmap(
        _find_minimum, in_axes=(0, 0, 0, None, 0))(
            state.low_value_vector, state.index_vector, state.mean_value,
            state.frame_counter, feat)

    # --- model update, vectorized over [gaussian, channel] ---
    # noise_global_mean in Q14 (weighted sum, offset 0)
    noise_gmean = (nm * w_n).sum(axis=0)
    tmp1_16 = wrap16(noise_gmean >> 6)  # Q8

    nmk = nm
    smk = sm
    nsk = ns
    ssk = ss

    delt_n = wrap16((ngprvec * delta_n) >> 11)
    nmk2 = jnp.where(vadflag == 0,
                     wrap16(nmk + wrap16((delt_n * NOISE_UPDATE) >> 22)),
                     nmk)
    ndelt = wrap16((feature_minimum << 4) - tmp1_16)[None, :]
    nmk3 = wrap16(nmk2 + wrap16((ndelt * BACK_ETA) >> 9))
    k_idx = jnp.arange(N_G, dtype=I32)[:, None]
    ch_idx = jnp.arange(N_CH, dtype=I32)[None, :]
    lo = wrap16((k_idx + 5) << 7)
    hi = wrap16((72 + k_idx - ch_idx) << 7)
    nmk3 = jnp.clip(nmk3, lo, hi)
    new_nm = nmk3

    # speech model update (vadflag == 1)
    delt_s = wrap16((sgprvec * delta_s) >> 11)
    t16 = wrap16((delt_s * SPEECH_UPDATE) >> 21)
    smk2 = wrap16(smk + ((t16 + 1) >> 1))
    # maxspe for channel c uses 12800 for c == 0, else kMaximumSpeech[c-1]
    maxspe_seq = jnp.concatenate(
        [jnp.full((1,), 12800, I32), jnp.asarray(MAX_SPEECH[:-1])])
    maxmu = maxspe_seq[None, :] + 640
    smk2 = jnp.clip(smk2, jnp.asarray(MIN_MEAN)[:, None], maxmu)
    new_sm = jnp.where(vadflag == 1, smk2, smk)

    # speech std update
    t16b = (smk + 4) >> 3
    t16b = wrap16(feat[None, :] - t16b)
    t32 = (delta_s * t16b) >> 3
    t32b = t32 - 4096
    t16c = sgprvec >> 2
    t32c = t16c * t32b
    t32d = t32c >> 4
    den_s = wrap16(ssk * 10)  # ssk*10 is passed as int16_t (wraps)
    q = wrap16(div_w32_w16(jnp.abs(t32d), den_s))
    t16d = jnp.where(t32d > 0, q, wrap16(-q)).astype(I32)
    t16d = wrap16(t16d + 128)
    ssk2 = wrap16(ssk + (t16d >> 8))
    ssk2 = jnp.maximum(ssk2, MIN_STD)
    new_ss = jnp.where(vadflag == 1, ssk2, ssk)

    # noise std update (vadflag == 0)
    t16e = wrap16(feat[None, :] - (nmk >> 3))
    t32e = ((delta_n * t16e) >> 3) - 4096
    t16f = (ngprvec + 2) >> 2
    t32f = t16f * t32e
    t32g = t32f >> 14
    qn = wrap16(div_w32_w16(jnp.abs(t32g), nsk))
    t16g = jnp.where(t32g > 0, qn, wrap16(-qn)).astype(I32)
    t16g = wrap16(t16g + 32)
    nsk2 = wrap16(nsk + (t16g >> 6))
    nsk2 = jnp.maximum(nsk2, MIN_STD)
    new_ns = jnp.where(vadflag == 0, nsk2, nsk)

    # --- separate models if too close (vad_core.c:402-436) ---
    noise_gmean2 = (new_nm * w_n).sum(axis=0)   # Q14
    speech_gmean = (new_sm * w_s).sum(axis=0)
    diff = wrap16(speech_gmean >> 9) - wrap16(noise_gmean2 >> 9)
    too_close = diff < jnp.asarray(MIN_DIFF)
    t16h = wrap16(jnp.asarray(MIN_DIFF) - diff)
    up_s = wrap16((13 * t16h) >> 2)
    dn_n = wrap16((3 * t16h) >> 2)
    new_sm = jnp.where(too_close[None, :], wrap16(new_sm + up_s[None, :]),
                       new_sm)
    new_nm = jnp.where(too_close[None, :], wrap16(new_nm - dn_n[None, :]),
                       new_nm)
    speech_gmean = jnp.where(too_close, (new_sm * w_s).sum(axis=0),
                             speech_gmean)
    noise_gmean2 = jnp.where(too_close, (new_nm * w_n).sum(axis=0),
                             noise_gmean2)

    # --- drift control (vad_core.c:438-457) ---
    maxspe_ch = jnp.asarray(MAX_SPEECH)
    t2 = wrap16(speech_gmean >> 7)
    over_s = jnp.maximum(t2 - maxspe_ch, 0) * (t2 > maxspe_ch)
    new_sm = wrap16(new_sm - over_s[None, :])
    t2n = wrap16(noise_gmean2 >> 7)
    over_n = jnp.maximum(t2n - jnp.asarray(MAX_NOISE), 0) * \
        (t2n > jnp.asarray(MAX_NOISE))
    new_nm = wrap16(new_nm - over_n[None, :])

    # --- commit updates only on high-power frames ---
    power_ok = total_power > MIN_ENERGY

    def sel(new, old):
        return jnp.where(power_ok, new, old)

    state = state._replace(
        noise_means=sel(new_nm, nm).reshape(TBL),
        speech_means=sel(new_sm, sm).reshape(TBL),
        noise_stds=sel(new_ns, ns).reshape(TBL),
        speech_stds=sel(new_ss, ss).reshape(TBL),
        low_value_vector=sel(fm_vals, state.low_value_vector),
        index_vector=sel(fm_ages, state.index_vector),
        mean_value=sel(fm_mean, state.mean_value),
        frame_counter=state.frame_counter + power_ok.astype(I32),
    )
    vadflag = jnp.where(power_ok, vadflag, 0)

    # --- hangover smoothing (vad_core.c:462-477) ---
    hang_fire = (vadflag == 0) & (state.over_hang > 0)
    out_flag = jnp.where(vadflag != 0, vadflag,
                         jnp.where(hang_fire, 2 + state.over_hang, 0))
    new_over_hang = jnp.where(
        vadflag != 0,
        jnp.where(state.num_of_speech + 1 > MAX_SPEECH_FRAMES, overhead2,
                  overhead1),
        jnp.where(hang_fire, state.over_hang - 1, state.over_hang))
    new_num = jnp.where(vadflag != 0,
                        jnp.minimum(state.num_of_speech + 1,
                                    MAX_SPEECH_FRAMES),
                        0)
    state = state._replace(over_hang=new_over_hang.astype(I32),
                           num_of_speech=new_num.astype(I32))
    return state, out_flag.astype(I32)


# --------------------------------------------------------------------------
# downsampling (vad_sp.c WebRtcVad_Downsampling)
# --------------------------------------------------------------------------

def _downsample_by2(frame, st):
    """WebRtcVad_Downsampling (vad_sp.c:27-54); st: int32 [2].

    Same TPU scan-carry slice hazard as _allpass — barrier the state."""
    st = jax.lax.optimization_barrier(st)
    even = frame[0::2]
    odd = frame[1::2]

    def body(carry, xs):
        s1, s2 = carry
        xe, xo = xs
        t1 = wrap16((s1 >> 1) + ((ALLPASS_Q13[0] * xe) >> 14))
        s1n = xe - ((ALLPASS_Q13[0] * t1) >> 12)
        t2 = wrap16((s2 >> 1) + ((ALLPASS_Q13[1] * xo) >> 14))
        s2n = xo - ((ALLPASS_Q13[1] * t2) >> 12)
        return (s1n, s2n), wrap16(t1 + t2)

    (s1, s2), out = jax.lax.scan(body, (st[0], st[1]), (even, odd))
    return out, jnp.stack([s1, s2])


# --------------------------------------------------------------------------
# top level
# --------------------------------------------------------------------------

def calc_vad(state: VadState, frame, fs: int):
    """WebRtcVad_CalcVad{8,16,32}khz (vad_core.c:598-674).

    frame: int32 [fs/100 * (10|20|30 ms)].  Returns (state, vad decision
    as WebRtcVad_Process reports it: 0 or 1)."""
    if fs == 32000:
        wb, ds_hi = _downsample_by2(frame, state.ds_state[2:])
        nb, ds_lo = _downsample_by2(wb, state.ds_state[:2])
        state = state._replace(ds_state=jnp.concatenate([ds_lo, ds_hi]))
    elif fs == 16000:
        nb, ds_lo = _downsample_by2(frame, state.ds_state[:2])
        state = state._replace(
            ds_state=jnp.concatenate([ds_lo, state.ds_state[2:]]))
    elif fs == 8000:
        nb = frame
    else:
        raise ValueError("fs must be 8000, 16000 or 32000")

    features, total_power, state = _calculate_features(state, nb)
    state, flag = _gmm_probability(state, features, total_power,
                                   nb.shape[0])
    return state, (flag > 0).astype(I32)


def process(state: VadState, pkg, chn: int, freq: int,
            interval_ms: int = 20):
    """The daemon wrapper vad_process (src/webrtc.c:91-151) for one
    package: truncating downmix, per-subpackage VAD + progressive reduce,
    the first-subpackage-only mute quirk, and upmix.

    pkg: int32 [frame_num * chn] interleaved.  Returns (state, out pkg)."""
    # wrapper subpackage length (src/webrtc.c:56-65)
    if freq <= 16000:
        sub_ms = 20 if interval_ms % 20 == 0 else 10
    else:
        sub_ms = 10
    pkg_frame = freq // 1000 * sub_ms
    frame_num = pkg.shape[0] // chn

    x = pkg.astype(I32)
    if chn > 1:
        frames = x.reshape(frame_num, chn)
        s = frames.sum(axis=1)
        mono = jnp.where(s < 0, -((-s) // chn), s // chn).astype(I32)
    else:
        mono = x

    n_sub = frame_num // pkg_frame
    out = mono
    for i in range(n_sub):
        # the C loop never advances pFrame (src/webrtc.c:120), so every
        # subpackage re-processes the FIRST pkgFrame samples — including
        # the mute applied below on the first pass
        seg = out[:pkg_frame]
        state, flag = calc_vad(state, seg, freq)
        red = jnp.where(flag == 0,
                        jnp.minimum(state.reduce + 1, 4),
                        jnp.maximum(state.reduce - 1, 0))
        state = state._replace(reduce=red.astype(I32))
        # and the mute loop runs from cLen to pkgFrame, so only the first
        # subpackage's pass attenuates anything (src/webrtc.c:140-141)
        if i == 0:
            out = (seg >> red if out.shape[0] == pkg_frame else
                   jnp.concatenate([seg >> red, out[pkg_frame:]]))
    if chn > 1:
        out_pkg = jnp.repeat(out, chn)
    else:
        out_pkg = out
    return state, wrap16(out_pkg)

"""Noise suppression: bit-exact rebuild of the webrtc float NS in JAX.

Reimplements ns_core.c as a pure function over a state pytree:
  * quantile noise estimation (3 simultaneous log-quantile trackers,
    NoiseEstimation, ns_core.c:217-285)
  * startup white/pink parametric noise model (:1109-1162)
  * speech/noise probability from LRT + spectral flatness + spectral
    difference features with histogram-learned thresholds (:293-749)
  * decision-directed Wiener gain, overlap-add synthesis, and the
    gain-map energy factor (:980-1007,1183-1415)
  * high-band handling (the daemon feeds stereo right channels as "high
    bands", src/webrtc.c:634-638)

Numerics: float32 state with the reference's double-precision libm calls
double-rounded via dsp.floatops; sequential float32 accumulations use
seq_sum so vectorized reductions cannot reorder rounding; block transforms
are the bit-exact Ooura rdft (ops/rdft.py).  The analysis/synthesis
windows are regenerated from the sin formulas with the 8-decimal rounding
their printed tables carry (windows_private.h).

Daemon-wrapper quirks reproduced (src/webrtc.c:612-644): at 32 kHz the
wrapper's 10 ms package is 320 samples but the core processes only
blockLen=160, so the second half of every package is silence; outputs are
truncated toward zero on the int16 store.

Single-stream functions; the engine vmaps a batch axis onto everything.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wmix_tpu.dsp.floatops import (fexp, flog, fpow_div, fsqrt_d, ftanh,
                                   gm, gq, guard_zero, oc, seq_sum,
                                   seq_sum_multi)
from wmix_tpu.ops.rdft import rdft_traced

F32 = jnp.float32
I32 = jnp.int32

# defines.h
SIMULT = 3
END_STARTUP_LONG = 200
END_STARTUP_SHORT = 50
FACTOR = np.float32(40.0)
WIDTH = np.float32(0.01)
QUANTILE = np.float32(0.25)
DD_PR_SNR = np.float32(0.98)
LRT_TAVG = np.float32(0.50)
SPECT_FL_TAVG = np.float32(0.30)
SPECT_DIFF_TAVG = np.float32(0.30)
PRIOR_UPDATE = np.float32(0.10)
NOISE_UPDATE_G = np.float32(0.90)
SPEECH_UPDATE_G = np.float32(0.99)
WIDTH_PR_MAP = np.float32(4.0)
LRT_FEATURE_THR = np.float32(0.5)
SF_FEATURE_THR = np.float32(0.5)
PROB_RANGE = np.float32(0.20)
HIST_PAR_EST = 1000
GAMMA_PAUSE = np.float32(0.05)
B_LIM = np.float32(0.5)

# set_feature_extraction_parameters (ns_core.c:23-71); aggressiveness is
# fixed to 2 by the daemon (src/webrtc.c:532) -> overdrive 1.1, bound 0.125
BIN_SIZE_LRT = np.float32(0.1)
BIN_SIZE_SPEC_FLAT = np.float32(0.05)
BIN_SIZE_SPEC_DIFF = np.float32(0.1)
RANGE_AVG_HIST_LRT = np.float32(1.0)
FACTOR1_MODEL_PARS = np.float32(1.2)
FACTOR2_MODEL_PARS = np.float32(0.9)
THRES_POS_SPEC_FLAT = np.float32(0.6)
LIMIT_PEAK_SPACING_FLAT = np.float32(2 * np.float32(0.05))
LIMIT_PEAK_SPACING_DIFF = np.float32(2 * np.float32(0.1))
LIMIT_PEAK_WEIGHTS = np.float32(0.5)
THRES_FLUCT_LRT = np.float32(0.05)
MAX_LRT, MIN_LRT = np.float32(1.0), np.float32(0.2)
MAX_SPEC_FLAT, MIN_SPEC_FLAT = np.float32(0.95), np.float32(0.1)
MAX_SPEC_DIFF, MIN_SPEC_DIFF = np.float32(1.0), np.float32(0.16)
THRES_WEIGHT = int(0.3 * 500)  # 150
MODEL_UPDATE_WINDOW = 500

OVERDRIVE = np.float32(1.1)
DENOISE_BOUND = np.float32(0.125)
GAINMAP = 1
K_START_BAND = 5


def block_len(fs: int) -> int:
    return 80 if fs == 8000 else 160


def ana_len(fs: int) -> int:
    return 128 if fs == 8000 else 256


def magn_len(fs: int) -> int:
    return ana_len(fs) // 2 + 1


@functools.lru_cache(maxsize=None)
def _window(n: int) -> np.ndarray:
    """kBlocks80w128 / kBlocks160w256 (windows_private.h): sin ramps + flat
    top, printed to 8 decimals — regenerate with the same rounding."""
    ramp = n * 3 // 8          # 48 for 128, 96 for 256
    denom = ramp * 2
    vals = [math.sin(math.pi * i / denom) for i in range(ramp)]
    vals += [1.0] * (n - 2 * ramp)
    vals += [math.sin(math.pi * (n - i) / denom) for i in range(n - ramp, n)]
    return np.array([np.float32("%.8f" % v) for v in vals], np.float32)


@functools.lru_cache(maxsize=None)
def _startup_log_consts(m: int):
    """Host-exact f32 folds of log(i) and log(i)^2 for i in [5, m)
    (ns_core.c:1093-1095) plus the per-bin f32 log(i) table."""
    logs = np.zeros(m, np.float32)
    s1 = np.float32(0.0)
    s2 = np.float32(0.0)
    for i in range(K_START_BAND, m):
        t = np.float32(math.log(float(i)))
        logs[i] = t
        s1 = np.float32(s1 + t)
        s2 = np.float32(s2 + np.float32(t * t))
    return logs, s1, s2


@functools.lru_cache(maxsize=None)
def _bin_mids(bin_size_bits: bytes):
    bin_size = np.frombuffer(bin_size_bits, np.float32)[0]
    i = np.arange(HIST_PAR_EST, dtype=np.float64)
    # (i + 0.5f) * binSize in f32
    return ((i.astype(np.float32) + np.float32(0.5)) * bin_size).astype(
        np.float32)


class NsState(NamedTuple):
    """NoiseSuppressionC (ns_core.h) as a pytree; shapes use M=magn_len,
    A=ana_len, B=block_len, H=num high bands."""
    analyze_buf: jax.Array      # [A]
    data_buf: jax.Array         # [A]
    synt_buf: jax.Array         # [A]
    data_buf_hb: jax.Array      # [H, A]
    noise: jax.Array            # [M]
    noise_prev: jax.Array       # [M]
    magn_prev_analyze: jax.Array  # [M]
    magn_prev_process: jax.Array  # [M]
    magn_avg_pause: jax.Array   # [M]
    init_magn_est: jax.Array    # [M]
    parametric_noise: jax.Array  # [M]
    smooth: jax.Array           # [M]
    speech_prob: jax.Array      # [M]
    log_lrt_time_avg: jax.Array  # [M]
    quantile: jax.Array         # [M]
    lquantile: jax.Array        # [SIMULT, M]
    density: jax.Array          # [SIMULT, M]
    counter: jax.Array          # [SIMULT] i32
    updates: jax.Array          # i32
    block_ind: jax.Array        # i32
    prior_speech_prob: jax.Array  # f32
    feature_data: jax.Array     # [7]
    prior_model: jax.Array      # [7]
    update_countdown: jax.Array  # i32 (modelUpdatePars[3])
    hist_lrt: jax.Array         # [1000] i32
    hist_spec_flat: jax.Array   # [1000] i32
    hist_spec_diff: jax.Array   # [1000] i32
    white_noise_level: jax.Array   # f32
    pink_noise_numerator: jax.Array  # f32
    pink_noise_exp: jax.Array   # f32
    signal_energy: jax.Array    # f32
    sum_magn: jax.Array         # f32


def init_state(fs: int, num_high_bands: int = 0) -> NsState:
    """WebRtcNs_InitCore (ns_core.c:74-214), policy 2."""
    A, M = ana_len(fs), magn_len(fs)
    H = max(num_high_bands, 1)
    z = jnp.zeros
    counters = jnp.asarray(
        [int(math.floor(END_STARTUP_LONG * (i + 1) / SIMULT))
         for i in range(SIMULT)], I32)
    fd = jnp.asarray([SF_FEATURE_THR, 0, 0, LRT_FEATURE_THR,
                      SF_FEATURE_THR, 0, 0], F32)
    pm = jnp.asarray([LRT_FEATURE_THR, 0.5, 1.0, 0.5, 1.0, 0, 0], F32)
    return NsState(
        analyze_buf=z(A, F32), data_buf=z(A, F32), synt_buf=z(A, F32),
        data_buf_hb=z((H, A), F32),
        noise=z(M, F32), noise_prev=z(M, F32),
        magn_prev_analyze=z(M, F32), magn_prev_process=z(M, F32),
        magn_avg_pause=z(M, F32), init_magn_est=z(M, F32),
        parametric_noise=z(M, F32),
        smooth=jnp.ones(M, F32), speech_prob=z(M, F32),
        log_lrt_time_avg=jnp.full(M, LRT_FEATURE_THR, F32),
        quantile=z(M, F32),
        lquantile=jnp.full((SIMULT, M), 8.0, F32),
        density=jnp.full((SIMULT, M), 0.3, F32),
        counter=counters, updates=jnp.int32(0), block_ind=jnp.int32(-1),
        prior_speech_prob=jnp.float32(0.5), feature_data=fd, prior_model=pm,
        update_countdown=jnp.int32(MODEL_UPDATE_WINDOW),
        hist_lrt=z(HIST_PAR_EST, I32), hist_spec_flat=z(HIST_PAR_EST, I32),
        hist_spec_diff=z(HIST_PAR_EST, I32),
        white_noise_level=jnp.float32(0), pink_noise_numerator=jnp.float32(0),
        pink_noise_exp=jnp.float32(0), signal_energy=jnp.float32(0),
        sum_magn=jnp.float32(0))


def _tree_select(mask, a, b):
    return jax.tree.map(lambda x, y: jnp.where(mask, x, y), a, b)


def _set1(vec, k: int, val):
    """vec.at[k].set(val) as a select: .at[].set lowers to scatter under
    the engine's vmap (TPU-serialized); the masked select is
    value-identical and fuses."""
    return jnp.where(jnp.arange(vec.shape[0]) == k, val, vec)


class _K:
    """Opaque-constant pool: k(c) is exactly float32(c) but runtime-valued,
    so the algebraic simplifier cannot merge it with neighboring constants
    (e.g. (1 + x) + 1e-4 -> x + 1.0001, which changes rounding)."""

    def __init__(self, zero):
        self.zero = zero

    def __call__(self, c):
        return jnp.float32(c) - self.zero


def _fft(win, z):
    """FFT helper (ns_core.c:886-911): rdft + magnitude with +1 floor."""
    k = _K(z)
    a = rdft_traced(win)
    n = win.shape[-1]
    M = n // 2 + 1
    real = jnp.concatenate([a[0:1], a[2::2], a[1:2]])
    imag = jnp.concatenate([jnp.zeros(1, F32), a[3::2],
                            jnp.zeros(1, F32)])
    mid = fsqrt_d(gm(real[1:M - 1], real[1:M - 1], z) +
                  gm(imag[1:M - 1], imag[1:M - 1], z)) + k(1.0)
    magn = jnp.concatenate([jnp.abs(real[0:1]) + k(1.0), mid,
                            jnp.abs(real[M - 1:M]) + k(1.0)])
    return real, imag, magn


def _ifft(real, imag, n):
    """IFFT helper (ns_core.c:923-944) including the 2/n scaling."""
    # Ooura packing [re0, reN, re1, im1, re2, im2, ...] built by
    # interleave+concat (scatter-free; .at[2::2] lowers to scatter
    # under the engine's vmap)
    pairs = jnp.stack([real[1:-1], imag[1:-1]], axis=-1).reshape(-1)
    a = jnp.concatenate([real[0:1], real[-1:], pairs])
    t = rdft_traced(a, inverse=True)
    return t * jnp.float32(np.float32(2.0) / np.float32(n))


# --------------------------------------------------------------------------
# noise estimation (ns_core.c:217-285)
# --------------------------------------------------------------------------

def _noise_estimation(st: NsState, magn, z):
    updates = st.updates + (st.updates < END_STARTUP_LONG).astype(I32)
    lmagn = flog(magn)

    # rows collected and stacked at the end: per-row .at[s].set lowers
    # to scatter under vmap (TPU-serialized); stacking is free
    lq_rows, dens_rows, ctr_rows = [], [], []
    quantile = st.quantile
    for s in range(SIMULT):
        lq_s = st.lquantile[s]
        dens_s = st.density[s]
        ctr_s = st.counter[s]
        cnt1 = (ctr_s + 1).astype(F32)
        # FACTOR * 1.f / density parses as (FACTOR*1)/density: one divide
        delta = jnp.where(dens_s > jnp.float32(1.0),
                          gq(jnp.float32(FACTOR), dens_s, z),
                          jnp.full_like(dens_s, FACTOR))
        up = lq_s + gq(gm(QUANTILE, delta, z), cnt1, z)
        dn = lq_s - gq(gm(jnp.float32(1.0) - QUANTILE, delta, z),
                       cnt1, z)
        new_lq = jnp.where(lmagn > lq_s, up, dn)
        new_dens = jnp.where(
            jnp.abs(lmagn - new_lq) < WIDTH,
            gq(gm(ctr_s.astype(F32), dens_s, z) +
               gq(jnp.float32(1.0), oc(2.0 * float(WIDTH), z), z),
               cnt1, z),
            dens_s)
        lq_rows.append(new_lq)
        dens_rows.append(new_dens)

        wrap = ctr_s >= END_STARTUP_LONG
        take = wrap & (updates >= END_STARTUP_LONG)
        quantile = jnp.where(take, fexp(new_lq), quantile)
        ctr_rows.append(jnp.where(wrap, 0, ctr_s) + 1)

    lq = jnp.stack(lq_rows)
    # startup: use the last tracker's quantile each frame
    quantile = jnp.where(updates < END_STARTUP_LONG,
                         fexp(lq[SIMULT - 1]), quantile)
    st = st._replace(lquantile=lq, density=jnp.stack(dens_rows),
                     counter=jnp.stack(ctr_rows),
                     updates=updates, quantile=quantile)
    return st, quantile


# --------------------------------------------------------------------------
# feature extraction (ns_core.c:293-634)
# --------------------------------------------------------------------------

def _hist_bin(value, bin_size, z):
    ok = (value < HIST_PAR_EST * bin_size) & (value >= jnp.float32(0.0))
    idx = gq(value, oc(float(bin_size), z), z).astype(I32)
    return ok, jnp.clip(idx, 0, HIST_PAR_EST - 1)


def _hist_add(hist, idx, inc):
    """hist.at[idx].add(inc) without a scatter: TPU lowers traced-index
    scatters to serialized kernels (and the engine vmaps a batch axis
    onto this, making it a [B, 1000] scatter per frame — measured as the
    dominant NS stage cost); the one-hot add is value-identical in int32
    and stays a fused compare+select+add."""
    iota = jax.lax.iota(I32, hist.shape[0])
    return hist + jnp.where(iota == idx, inc, jnp.int32(0))


def _two_peaks(hist, bin_mids):
    """The running first/second peak scan (ns_core.c:386-432) is
    equivalent to first-occurrence argmax, then argmax of the rest."""
    i1 = jnp.argmax(hist)
    p1 = hist[i1]
    # hist.at[i1].set(-1) without the traced-index scatter
    rest = jnp.where(jnp.arange(hist.shape[0]) == i1, -1, hist)
    i2 = jnp.argmax(rest)
    p2 = jnp.maximum(rest[i2], 0)
    pos1 = jnp.where(p1 > 0, bin_mids[i1], jnp.float32(0.0))
    pos2 = jnp.where(p2 > 0, bin_mids[i2], jnp.float32(0.0))
    return p1, pos1, p2, pos2


def _feature_parameter_extraction(st: NsState, z):
    """flag == 1 path (ns_core.c:337-517).  Computed every frame and
    masked in by the caller on window boundaries."""
    mids_lrt = jnp.asarray(_bin_mids(BIN_SIZE_LRT.tobytes()))
    mids_flat = jnp.asarray(_bin_mids(BIN_SIZE_SPEC_FLAT.tobytes()))
    mids_diff = jnp.asarray(_bin_mids(BIN_SIZE_SPEC_DIFF.tobytes()))
    hist_lrt_f = st.hist_lrt.astype(F32)

    in_range = np.asarray(_bin_mids(BIN_SIZE_LRT.tobytes())) <= \
        RANGE_AVG_HIST_LRT
    avg_terms = jnp.where(jnp.asarray(in_range),
                          hist_lrt_f * mids_lrt, jnp.float32(0.0))
    sq_terms = (hist_lrt_f * mids_lrt) * mids_lrt
    compl_terms = hist_lrt_f * mids_lrt
    avg_hist, avg_sq, avg_compl = seq_sum_multi(avg_terms, sq_terms,
                                                compl_terms)
    num_hist = jnp.sum(jnp.where(jnp.asarray(in_range), st.hist_lrt, 0))
    avg_hist = jnp.where(num_hist > 0,
                         gq(avg_hist, num_hist.astype(F32), z), avg_hist)
    win_f = oc(float(MODEL_UPDATE_WINDOW), z)
    avg_compl = gq(avg_compl, win_f, z)
    avg_sq = gq(avg_sq, win_f, z)
    fluct_lrt = avg_sq - gm(avg_hist, avg_compl, z)

    low_fluct = fluct_lrt < THRES_FLUCT_LRT
    thr_lrt = jnp.where(
        low_fluct, MAX_LRT,
        jnp.clip(FACTOR1_MODEL_PARS * avg_hist, MIN_LRT, MAX_LRT))

    # spectral flatness peaks
    w1f, pos1f, w2f, pos2f = _two_peaks(st.hist_spec_flat, mids_flat)
    mergef = (jnp.abs(pos2f - pos1f) < LIMIT_PEAK_SPACING_FLAT) & \
        (w2f.astype(F32) > LIMIT_PEAK_WEIGHTS * w1f.astype(F32))
    w1f = jnp.where(mergef, w1f + w2f, w1f)
    pos1f = jnp.where(mergef, jnp.float32(0.5) * (pos1f + pos2f), pos1f)
    use_flat = ~((w1f < THRES_WEIGHT) | (pos1f < THRES_POS_SPEC_FLAT))
    thr_flat = jnp.where(
        use_flat,
        jnp.clip(FACTOR2_MODEL_PARS * pos1f, MIN_SPEC_FLAT, MAX_SPEC_FLAT),
        st.prior_model[1])

    # spectral difference peaks
    w1d, pos1d, w2d, pos2d = _two_peaks(st.hist_spec_diff, mids_diff)
    merged = (jnp.abs(pos2d - pos1d) < LIMIT_PEAK_SPACING_DIFF) & \
        (w2d.astype(F32) > LIMIT_PEAK_WEIGHTS * w1d.astype(F32))
    w1d = jnp.where(merged, w1d + w2d, w1d)
    pos1d = jnp.where(merged, jnp.float32(0.5) * (pos1d + pos2d), pos1d)
    thr_diff = jnp.clip(FACTOR1_MODEL_PARS * pos1d, MIN_SPEC_DIFF,
                        MAX_SPEC_DIFF)
    use_diff = ~(w1d < THRES_WEIGHT) & ~low_fluct

    feature_sum = (jnp.int32(1) + use_flat.astype(I32) +
                   use_diff.astype(I32)).astype(F32)
    pm = st.prior_model
    pm = _set1(pm, 0, thr_lrt)
    pm = _set1(pm, 1, thr_flat)
    pm = _set1(pm, 3, thr_diff)
    pm = _set1(pm, 4, gq(jnp.float32(1.0), feature_sum, z))
    pm = _set1(pm, 5, gq(use_flat.astype(F32), feature_sum, z))
    pm = _set1(pm, 6, gq(use_diff.astype(F32), feature_sum, z))
    return st._replace(
        prior_model=pm,
        hist_lrt=jnp.zeros_like(st.hist_lrt),
        hist_spec_flat=jnp.zeros_like(st.hist_spec_flat),
        hist_spec_diff=jnp.zeros_like(st.hist_spec_diff))


def _feature_update(st: NsState, magn, M: int, z=None):
    """FeatureUpdate (ns_core.c:755-791) with its two callees."""
    # ComputeSpectralFlatness (:523-556); magn >= 1 so the log(0) early
    # return cannot trigger
    den = gq(st.sum_magn - magn[0], oc(float(M), z), z)
    num = gq(seq_sum(flog(magn[1:])), oc(float(M), z), z)
    spectral_tmp = gq(fexp(num), den, z)
    fd = st.feature_data
    fd = _set1(fd, 0, fd[0] + gm(SPECT_FL_TAVG, spectral_tmp - fd[0], z))

    # ComputeSpectralDifference (:595-634)
    mf = oc(float(M), z)
    avg_pause = gq(seq_sum(st.magn_avg_pause), mf, z)
    avg_magn = gq(st.sum_magn, mf, z)
    dm = magn - avg_magn
    dp = st.magn_avg_pause - avg_pause
    cov, var_pause, var_magn = seq_sum_multi(dm * dp, dp * dp, dm * dm)
    cov = gq(cov, mf, z)
    var_pause = gq(var_pause, mf, z)
    var_magn = gq(var_magn, mf, z)
    fd = _set1(fd, 6, fd[6] + st.signal_energy)
    k = _K(z)
    avg_diff = var_magn - gq(gm(cov, cov, z), var_pause + k(1e-4), z)
    avg_diff = gq(avg_diff, fd[5] + k(1e-4), z)
    fd = _set1(fd, 4, fd[4] + gm(SPECT_DIFF_TAVG, avg_diff - fd[4], z))
    st = st._replace(feature_data=fd)

    # histogram bookkeeping; modelUpdatePars[0] == 2 -> always on
    countdown = st.update_countdown - 1
    ok_l, i_l = _hist_bin(fd[3], BIN_SIZE_LRT, z)
    ok_f, i_f = _hist_bin(fd[0], BIN_SIZE_SPEC_FLAT, z)
    ok_d, i_d = _hist_bin(fd[4], BIN_SIZE_SPEC_DIFF, z)
    update_hist = countdown > 0
    st_hist = st._replace(
        hist_lrt=_hist_add(st.hist_lrt, i_l,
                           (ok_l & update_hist).astype(I32)),
        hist_spec_flat=_hist_add(st.hist_spec_flat, i_f,
                                 (ok_f & update_hist).astype(I32)),
        hist_spec_diff=_hist_add(st.hist_spec_diff, i_d,
                                 (ok_d & update_hist).astype(I32)),
        update_countdown=countdown)

    extracted = _feature_parameter_extraction(st_hist, z)
    fd2 = extracted.feature_data
    z2 = guard_zero(fd2)
    fd2 = _set1(fd2, 6, gq(fd2[6], oc(float(MODEL_UPDATE_WINDOW), z2),
                           z2))
    fd2 = _set1(fd2, 5, jnp.float32(0.5) * (fd2[6] + fd2[5]))
    # note: featureData[6] scaling happens before [5], then [6] reset
    fd3 = _set1(fd2, 6, jnp.float32(0.0))
    extracted = extracted._replace(
        feature_data=fd3,
        update_countdown=jnp.int32(MODEL_UPDATE_WINDOW))
    return _tree_select(countdown == 0, extracted, st_hist)


# --------------------------------------------------------------------------
# speech probability (ns_core.c:642-749)
# --------------------------------------------------------------------------

def _speech_noise_prob(st: NsState, snr_prior, snr_post, M: int,
                       z=None):
    k = _K(z)
    one = k(1.0)
    t1 = one + jnp.float32(2.0) * snr_prior
    t2 = gq(gm(jnp.float32(2.0), snr_prior, z), t1 + k(1e-4), z)
    bessel = gm(snr_post + one, t2, z)
    lrt = st.log_lrt_time_avg
    lrt = lrt + LRT_TAVG * ((bessel - flog(t1)) - lrt)
    ksum = gq(seq_sum(lrt), oc(float(M), z), z)
    fd = _set1(st.feature_data, 3, ksum)

    thr0 = st.prior_model[0]
    thr1 = st.prior_model[1]
    thr2 = st.prior_model[3]
    w0 = st.prior_model[4]
    w1 = st.prior_model[5]
    w2 = st.prior_model[6]
    sgn_map = st.prior_model[2]  # 1.0

    wp0 = jnp.where(ksum < thr0, jnp.float32(2.0) * WIDTH_PR_MAP,
                    WIDTH_PR_MAP)
    ind0 = jnp.float32(0.5) * (ftanh(wp0 * (ksum - thr0)) + one)

    tf = fd[0]
    wp1 = jnp.where((sgn_map == one) & (tf > thr1),
                    jnp.float32(2.0) * WIDTH_PR_MAP, WIDTH_PR_MAP)
    ind1 = jnp.float32(0.5) * (ftanh(sgn_map * wp1 * (thr1 - tf)) + one)

    td = fd[4]
    wp2 = jnp.where(td < thr2, jnp.float32(2.0) * WIDTH_PR_MAP,
                    WIDTH_PR_MAP)
    ind2 = jnp.float32(0.5) * (ftanh(wp2 * (td - thr2)) + one)

    ind_prior = (gm(w0, ind0, z) + gm(w1, ind1, z)) + gm(w2, ind2, z)
    prior = st.prior_speech_prob + gm(
        PRIOR_UPDATE, ind_prior - st.prior_speech_prob, z)
    prior = jnp.minimum(prior, one)
    prior = jnp.maximum(prior, jnp.float32(0.01))

    gain_prior = gq(one - prior, prior + k(1e-4), z)
    inv_lrt = gm(gain_prior, fexp(-lrt), z)
    prob = gq(one, one + inv_lrt, z)
    return st._replace(log_lrt_time_avg=lrt, feature_data=fd,
                       prior_speech_prob=prior, speech_prob=prob)


def _update_noise_estimate(st: NsState, magn, noise, z=None):
    """UpdateNoiseEstimate (ns_core.c:800-846); the gamma carried across
    bins becomes a shifted vector."""
    prob = st.speech_prob
    k = _K(z)
    pn = k(1.0) - prob
    gamma = jnp.where(prob > PROB_RANGE, SPEECH_UPDATE_G, NOISE_UPDATE_G)
    gamma_prev = jnp.concatenate(
        [jnp.full((1,), NOISE_UPDATE_G, F32), gamma[:-1]])
    blend = gm(pn, magn, z) + gm(prob, st.noise_prev, z)
    noise_tmp = gm(gamma_prev, st.noise_prev, z) + \
        gm(k(1.0) - gamma_prev, blend, z)
    pause = jnp.where(prob < PROB_RANGE,
                      st.magn_avg_pause + gm(
                          GAMMA_PAUSE, magn - st.magn_avg_pause, z),
                      st.magn_avg_pause)
    noise_new = gm(gamma, st.noise_prev, z) + \
        gm(k(1.0) - gamma, blend, z)
    noise_new = jnp.minimum(noise_new, noise_tmp)
    out = jnp.where(gamma == gamma_prev, noise_tmp, noise_new)
    return st._replace(magn_avg_pause=pause), out


# --------------------------------------------------------------------------
# AnalyzeCore (ns_core.c:1043-1181)
# --------------------------------------------------------------------------

def analyze(st: NsState, frame, fs: int) -> NsState:
    B, A, M = block_len(fs), ana_len(fs), magn_len(fs)
    window = jnp.asarray(_window(A))
    buf = jnp.concatenate([st.analyze_buf[B:], frame.astype(F32)])
    st = st._replace(analyze_buf=buf)
    z = guard_zero(frame.astype(F32))
    win = gm(window, buf, z)
    energy = seq_sum(win * win)
    active = energy != jnp.float32(0.0)

    new = _analyze_active(st, win, fs, B, A, M, z)
    return _tree_select(active, new, st)


def _analyze_active(st: NsState, win, fs, B, A, M, z):
    block_ind = st.block_ind + 1
    real, imag, magn = _fft(win, z)

    e_terms = gm(real[:M], real[:M], z) + gm(imag[:M], imag[:M], z)
    signal_energy, sum_magn = seq_sum_multi(e_terms, magn)
    signal_energy = gq(signal_energy, oc(float(M), z), z)
    st = st._replace(signal_energy=signal_energy, sum_magn=sum_magn,
                     block_ind=block_ind)

    # startup pink/white-noise regression sums
    logs_i, sum_log_i, sum_log_i_sq = _startup_log_consts(M)
    lm = flog(magn)
    sum_log_magn = seq_sum(jnp.where(jnp.arange(M) >= K_START_BAND, lm,
                                     jnp.float32(0.0)))
    sum_log_il = seq_sum(jnp.where(jnp.arange(M) >= K_START_BAND,
                                   jnp.asarray(logs_i) * lm,
                                   jnp.float32(0.0)))

    st, noise = _noise_estimation(st, magn, z)

    in_short = block_ind < END_STARTUP_SHORT
    # white noise
    wn = st.white_noise_level + \
        gm(gq(sum_magn, oc(float(M), z), z), OVERDRIVE, z)
    # pink noise regression (ns_core.c:1113-1133)
    # t1 is a compile-time constant in C too; fold it on host in f32 and
    # keep it opaque so the division is a true divide
    t1_np = np.float32(
        np.float32(sum_log_i_sq * np.float32(M - K_START_BAND)) -
        np.float32(sum_log_i) * np.float32(sum_log_i))
    t1 = oc(t1_np, z)
    t2 = (gm(jnp.float32(sum_log_i_sq), sum_log_magn, z) -
          gm(jnp.float32(sum_log_i), sum_log_il, z))
    t3 = gq(t2, t1, z)
    t3 = jnp.maximum(t3, jnp.float32(0.0))
    pnum = st.pink_noise_numerator + t3
    t2b = gm(jnp.float32(sum_log_i), sum_log_magn, z)
    t2b = t2b - gm(jnp.float32(float(M - K_START_BAND)), sum_log_il, z)
    t3b = gq(t2b, t1, z)
    t3b = jnp.clip(t3b, jnp.float32(0.0), jnp.float32(1.0))
    pexp = st.pink_noise_exp + t3b

    bi1 = (block_ind + 1).astype(F32)
    param_num = fexp(gq(pnum, bi1, z)) * bi1
    param_exp = gq(pexp, bi1, z)
    use_band = jnp.maximum(jnp.arange(M), K_START_BAND).astype(F32)
    pnoise = jnp.where(pexp == jnp.float32(0.0),
                       jnp.broadcast_to(wn, (M,)),
                       fpow_div(param_num, use_band, param_exp))
    noise_s = gm(noise, block_ind.astype(F32), z)
    tmp2 = gm(pnoise, (END_STARTUP_SHORT - block_ind).astype(F32), z)
    noise_s = noise_s + gq(tmp2, bi1, z)
    noise_s = gq(noise_s, oc(float(END_STARTUP_SHORT), z), z)

    noise = jnp.where(in_short, noise_s, noise)
    st = st._replace(
        white_noise_level=jnp.where(in_short, wn, st.white_noise_level),
        pink_noise_numerator=jnp.where(in_short, pnum,
                                       st.pink_noise_numerator),
        pink_noise_exp=jnp.where(in_short, pexp, st.pink_noise_exp),
        parametric_noise=jnp.where(in_short, pnoise, st.parametric_noise))

    # featureData[5] average signal energy during startup (:1165-1169)
    fd = st.feature_data
    fd5 = gq(gm(fd[5], block_ind.astype(F32), z) + signal_energy,
             bi1, z)
    fd = _set1(fd, 5, jnp.where(block_ind < END_STARTUP_LONG, fd5, fd[5]))
    st = st._replace(feature_data=fd)

    # ComputeSnr (:566-588)
    k = _K(z)
    prev_stsa = gm(gq(st.magn_prev_analyze,
                      st.noise_prev + k(1e-4), z),
                   st.smooth, z)
    snr_post = jnp.where(magn > noise,
                         gq(magn, noise + k(1e-4), z) - k(1.0),
                         jnp.float32(0.0))
    snr_prior = gm(DD_PR_SNR, prev_stsa, z) + \
        gm(jnp.float32(1.0) - DD_PR_SNR, snr_post, z)

    st = _feature_update(st, magn, M, z)
    st = _speech_noise_prob(st, snr_prior, snr_post, M, z)
    st, noise = _update_noise_estimate(st, magn, noise, z)

    return st._replace(noise=noise, magn_prev_analyze=magn)


# --------------------------------------------------------------------------
# ProcessCore (ns_core.c:1183-1415)
# --------------------------------------------------------------------------

def process(st: NsState, frames, fs: int):
    """frames: [num_bands, B] float32 (band 0 = low band; the rest are the
    daemon's extra channels).  Returns (state, out [num_bands, B])."""
    B, A, M = block_len(fs), ana_len(fs), magn_len(fs)
    num_bands = frames.shape[0]
    window = jnp.asarray(_window(A))

    data_buf = jnp.concatenate([st.data_buf[B:], frames[0].astype(F32)])
    hb = st.data_buf_hb
    if num_bands > 1:
        rows = [jnp.concatenate([hb[i, B:], frames[i + 1].astype(F32)])
                for i in range(num_bands - 1)]
        rows += [hb[i] for i in range(num_bands - 1, hb.shape[0])]
        hb = jnp.stack(rows)
    st = st._replace(data_buf=data_buf, data_buf_hb=hb)

    z = guard_zero(frames.astype(F32))
    win = gm(window, data_buf, z)
    energy1 = seq_sum(win * win)
    active = energy1 != jnp.float32(0.0)

    # zero-input path (:1239-1264)
    fout_z = st.synt_buf[:B]
    synt_z = jnp.concatenate([st.synt_buf[B:], jnp.zeros(B, F32)])
    st_zero = st._replace(synt_buf=synt_z)
    out_zero = [jnp.clip(fout_z, -32768.0, 32767.0)]
    for i in range(num_bands - 1):
        out_zero.append(jnp.clip(hb[i, :B], -32768.0, 32767.0))
    out_zero = jnp.stack(out_zero)

    st_act, out_act = _process_active(st, win, energy1, fs, B, A, M,
                                      num_bands, z)
    st_new = _tree_select(active, st_act, st_zero)
    out = jnp.where(active, out_act, out_zero)
    return st_new, out


def _process_active(st: NsState, win, energy1, fs, B, A, M, num_bands,
                    z=None):
    k = _K(z)
    one = k(1.0)
    window = jnp.asarray(_window(A))
    real, imag, magn = _fft(win, z)

    in_short = st.block_ind < END_STARTUP_SHORT
    init_est = jnp.where(in_short, st.init_magn_est + magn,
                         st.init_magn_est)
    st = st._replace(init_magn_est=init_est)

    # ComputeDdBasedWienerFilter (:985-1007)
    prev_stsa = gm(gq(st.magn_prev_process,
                      st.noise_prev + k(1e-4), z),
                   st.smooth, z)
    cur = jnp.where(magn > st.noise,
                    gq(magn, st.noise + k(1e-4), z) - one,
                    jnp.float32(0.0))
    snr_prior = gm(DD_PR_SNR, prev_stsa, z) + gm(one - DD_PR_SNR, cur, z)
    filt = gq(snr_prior, OVERDRIVE + snr_prior, z)
    filt = jnp.clip(filt, DENOISE_BOUND, one)

    # startup blend (:1285-1302)
    filt_tmp = gq(init_est - gm(OVERDRIVE, st.parametric_noise, z),
                  init_est + k(1e-4), z)
    filt_tmp = jnp.clip(filt_tmp, DENOISE_BOUND, one)
    bi = st.block_ind.astype(F32)
    blended = gq(gm(filt, bi, z) +
                 gm(filt_tmp,
                    (END_STARTUP_SHORT - st.block_ind).astype(F32), z),
                 oc(float(END_STARTUP_SHORT), z), z)
    filt = jnp.where(in_short, blended, filt)

    st = st._replace(smooth=filt, magn_prev_process=magn,
                     noise_prev=st.noise)
    # guarded: these products feed the inverse FFT's butterfly adds
    real = gm(real, filt, z)
    imag = gm(imag, filt, z)

    win_data = _ifft(real, imag, A)

    # gain-map factor (:1314-1342)
    factor = one
    if GAINMAP == 1:
        energy2 = seq_sum(win_data * win_data)
        gain = fsqrt_d(gq(energy2, energy1 + one, z))
        f1v = one + gm(jnp.float32(1.3), gain - B_LIM, z)
        factor1 = jnp.where(
            gain > B_LIM,
            jnp.where(gm(gain, f1v, z) > one, gq(one, gain, z), f1v),
            one)
        g2 = jnp.where(gain <= DENOISE_BOUND, DENOISE_BOUND, gain)
        factor2 = jnp.where(gain < B_LIM,
                            one - gm(jnp.float32(0.3), B_LIM - g2, z), one)
        f = gm(st.prior_speech_prob, factor1, z) + \
            gm(one - st.prior_speech_prob, factor2, z)
        factor = jnp.where(st.block_ind > END_STARTUP_LONG, f, one)

    win2 = gm(window, win_data, z)
    synt = st.synt_buf + gm(factor, win2, z)
    fout = synt[:B]
    synt_new = jnp.concatenate([synt[B:], jnp.zeros(B, F32)])
    st = st._replace(synt_buf=synt_new)
    outs = [jnp.clip(fout, -32768.0, 32767.0)]

    if num_bands > 1:
        delta = M // 4
        avg_prob = gq(seq_sum(st.speech_prob[M - delta - 1:M - 1]),
                      oc(float(delta), z), z)
        sum_ana, sum_proc = seq_sum_multi(st.magn_prev_analyze,
                                          st.magn_prev_process)
        avg_prob = avg_prob * gq(sum_proc, sum_ana, z)
        avg_gain = gq(seq_sum(st.smooth[M - delta - 1:M - 1]),
                      oc(float(delta), z), z)
        tmp = jnp.float32(2.0) * avg_prob - one
        gain_mod = jnp.float32(0.5) * (one + ftanh(one * tmp))
        g = jnp.where(avg_prob >= jnp.float32(0.5),
                      jnp.float32(0.25) * gain_mod +
                      gm(jnp.float32(0.75), avg_gain, z),
                      jnp.float32(0.5) * gain_mod +
                      jnp.float32(0.5) * avg_gain)
        g = g * one  # decayBweHB == 1.0
        g = jnp.clip(g, DENOISE_BOUND, one)
        for i in range(num_bands - 1):
            outs.append(jnp.clip(g * st.data_buf_hb[i, :B],
                                 -32768.0, 32767.0))
    return st, jnp.stack(outs)


# --------------------------------------------------------------------------
# daemon wrapper (src/webrtc.c ns_process:612-644)
# --------------------------------------------------------------------------

def process_pkg(st: NsState, pkg, chn: int, freq: int):
    """One daemon package (frame_num*chn interleaved int16-valued ints):
    Analyze on the left channel, Process with the channels as bands.

    At 32 kHz the wrapper's 10 ms subpackage is 320 samples but the core's
    block is 160, so only the first half of each subpackage is processed
    and the rest of the output stays zero (src/webrtc.c:577 vs
    ns_core.c:94)."""
    B = block_len(freq)
    pkg_frame = freq // 1000 * 10
    frame_num = pkg.shape[0] // chn
    n_sub = frame_num // pkg_frame

    x = pkg.reshape(frame_num, chn).astype(F32)  # [k, chn]
    outs = []
    for i in range(n_sub):
        seg = x[i * pkg_frame:(i + 1) * pkg_frame]  # [pkg_frame, chn]
        bands = seg[:B].T  # [chn, B]
        st = analyze(st, bands[0], freq)
        st, out_bands = process(st, bands, freq)
        full = out_bands.T if pkg_frame == B else jnp.concatenate(
            [out_bands.T, jnp.zeros((pkg_frame - B, chn), F32)])
        outs.append(full)
    out = jnp.concatenate(outs).reshape(-1)
    # (int16_t) cast truncates toward zero
    return st, out.astype(I32)

"""Acoustic echo cancellation: bit-exact rebuild of the webrtc AEC in JAX.

The reference AEC is a partitioned-block frequency-domain NLMS adaptive
filter (64-sample partitions, 12 in normal mode) with subband-coherence
based nonlinear suppression and comfort noise (aec_core.c), wrapped in
buffering/startup/delay logic (echo_cancellation.c).

Deployment as the daemon uses it (src/webrtc.c aec_init:217-274):
  * nlpMode = kAecNlpAggressive, skew off, metrics off, delay logging off;
  * reported-delay mode (non-Android default) => the signal-based delay
    estimator (delay_estimator.c) is dead code and is not modeled;
  * extended filter off => 12 partitions, normal mu/threshold;
  * the daemon reports delayms = 0 on every call (src/wmix.c:656).

Architecture: every buffer-pointer/counter decision in the reference is
data-independent (it depends only on the call pattern), so all ring-buffer
cursors and the startup/delay state machines live on the HOST as exact
Python ints/floats, while the per-block DSP — FFTs (the AEC's own
length-128 Ooura variant, ops/rdft.aec_rdft), PSD smoothing, the NLMS
update, coherence, NLP, comfort noise — runs as a jitted device kernel
over a state pytree.  The comfort-noise PRNG (WebRtcSpl_RandU, seed 777)
advances 64 draws per block and is likewise host-generated.  Float parity
uses the guarded-product/quotient scheme from dsp.floatops; sequential
accumulations use seq folds.

Single-stream; the engine batches by vmapping the block kernel.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wmix_tpu.dsp import floatops
from wmix_tpu.dsp.floatops import flog, gm, gq, guard_zero, oc, seq_sum, \
    seq_sum_multi
from wmix_tpu.ops.rdft import aec_rdft_traced

F32 = jnp.float32
I32 = jnp.int32

FRAME_LEN = 80
PART_LEN = 64
PART_LEN1 = 65
PART_LEN2 = 128
NUM_PARTITIONS = 12         # kNormalNumPartitions
BUF_SIZE_PARTITIONS = 250
FAR_PRE_BUF_SIZE = PART_LEN2 + 4 * FRAME_LEN  # PART_LEN2+kResamplerBufferSize
PREF_BAND_SIZE = 24

# nlp mode tables (aec_core.c:107-115)
TARGET_SUPP = np.array([-6.9, -11.5, -18.4], np.float32)
MIN_OVERDRIVE = np.array([1.0, 2.0, 5.0], np.float32)  # normal mode
SMOOTHING = {1: (np.float32(0.9), np.float32(0.1)),
             2: (np.float32(0.93), np.float32(0.07))}   # by mult
MIN_FAREND_PSD = np.float32(15.0)


@functools.lru_cache(maxsize=None)
def _sqrt_hanning() -> np.ndarray:
    """WebRtcAec_sqrtHanning (aec_core.c:54-71): sin(pi*i/128) printed to
    14 decimals — regenerate with identical float32 rounding."""
    return np.array([np.float32("%.14f" % math.sin(math.pi * i / 128))
                     for i in range(65)], np.float32)


@functools.lru_cache(maxsize=None)
def _weight_curve() -> np.ndarray:
    """WebRtcAec_weightCurve (aec_core.c:76-85): 0.3*sqrt(linspace)+0.1
    printed to 4 decimals."""
    vals = [0.0] + [0.3 * math.sqrt(i / 63.0) + 0.1 for i in range(64)]
    return np.array([np.float32("%.4f" % v) for v in vals], np.float32)


@functools.lru_cache(maxsize=None)
def _overdrive_curve() -> np.ndarray:
    """WebRtcAec_overDriveCurve (aec_core.c:90-99): sqrt(linspace)+1."""
    vals = [math.sqrt(i / 64.0) + 1.0 for i in range(65)]
    return np.array([np.float32("%.4f" % v) for v in vals], np.float32)


@functools.lru_cache(maxsize=8)
def _lcg_jump_tables(n: int):
    """Closed-form stepping of the WebRtcSpl LCG s' = 69069 s + 1 mod
    2^31: s_i = A_i s_0 + C_i with A_i = 69069^i, C_i = sum_{j<i}
    69069^j (both mod 2^31), so a whole array of draws vectorizes."""
    a = np.zeros(n, np.uint64)
    c = np.zeros(n, np.uint64)
    ai, ci = 1, 0
    for i in range(n):
        ai = (ai * 69069) & 0x7FFFFFFF
        ci = (ci * 69069 + 1) & 0x7FFFFFFF
        a[i] = ai
        c[i] = ci
    return a, c


def _rand_u_array(seed: int, n: int):
    """WebRtcSpl_RandUArray (randomization_functions.c:93-115) — exact
    LCG sequence, vectorized (the per-block host planner calls this 5x
    per package; the naive Python loop dominated planning cost)."""
    a, c = _lcg_jump_tables(n)
    s = (a * np.uint64(seed) + c) & np.uint64(0x7FFFFFFF)
    out = ((s >> np.uint64(16)) & np.uint64(0xFFFF)).astype(
        np.uint16).astype(np.int16)
    return out, int(s[-1])


class AecDev(NamedTuple):
    """Device-resident AecCore state (aec_core_internal.h:60-140)."""
    d_buf: jax.Array        # [128] near history
    e_buf: jax.Array        # [128] error history
    out_buf: jax.Array      # [64] overlap-add tail
    x_pow: jax.Array        # [65]
    d_pow: jax.Array        # [65]
    d_min_pow: jax.Array    # [65]
    d_init_min_pow: jax.Array  # [65]
    sd: jax.Array           # [65]
    se: jax.Array           # [65]
    sx: jax.Array           # [65]
    sde: jax.Array          # [65,2]
    sxd: jax.Array          # [65,2]
    xf_buf: jax.Array       # [12,2,65] far spectra (partition ring)
    wf_buf: jax.Array       # [12,2,65] filter
    xfw_buf: jax.Array      # [12,2,65] windowed far history
    delay_idx: jax.Array    # i32
    h_nl_fb_min: jax.Array
    h_nl_fb_local_min: jax.Array
    h_nl_xd_avg_min: jax.Array
    h_nl_new_min: jax.Array   # i32
    h_nl_min_ctr: jax.Array   # i32
    over_drive: jax.Array
    over_drive_sm: jax.Array
    st_near_state: jax.Array  # i32
    echo_state: jax.Array     # i32
    diverge_state: jax.Array  # i32


def init_dev() -> AecDev:
    """WebRtcAec_InitAec's device-visible parts (aec_core.c:1527-1688)."""
    z = jnp.zeros
    return AecDev(
        d_buf=z(PART_LEN2, F32), e_buf=z(PART_LEN2, F32),
        out_buf=z(PART_LEN, F32),
        x_pow=z(PART_LEN1, F32), d_pow=z(PART_LEN1, F32),
        d_min_pow=jnp.full(PART_LEN1, 1.0e6, F32),
        d_init_min_pow=z(PART_LEN1, F32),
        sd=jnp.ones(PART_LEN1, F32), se=z(PART_LEN1, F32),
        sx=jnp.ones(PART_LEN1, F32),
        sde=z((PART_LEN1, 2), F32), sxd=z((PART_LEN1, 2), F32),
        xf_buf=z((NUM_PARTITIONS, 2, PART_LEN1), F32),
        wf_buf=z((NUM_PARTITIONS, 2, PART_LEN1), F32),
        xfw_buf=z((NUM_PARTITIONS, 2, PART_LEN1), F32),
        delay_idx=jnp.int32(0),
        h_nl_fb_min=jnp.float32(1), h_nl_fb_local_min=jnp.float32(1),
        h_nl_xd_avg_min=jnp.float32(1),
        h_nl_new_min=jnp.int32(0), h_nl_min_ctr=jnp.int32(0),
        over_drive=jnp.float32(2), over_drive_sm=jnp.float32(2),
        st_near_state=jnp.int32(0), echo_state=jnp.int32(0),
        diverge_state=jnp.int32(0),
    )


def _wide():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _fpow(x, y):
    """powf: glibc computes in double internally; dd emulation on
    backends without f64 (floatops.fpowf)."""
    return floatops.fpowf(x, y)


def _fcos(x):
    return floatops.fcosf(x)


def _fsin(x):
    return floatops.fsinf(x)


# --------------------------------------------------------------------------
# device kernels
# --------------------------------------------------------------------------

def _pack_spectrum(a):
    """rdft output -> (re[65], im[65]) per TimeToFrequency
    (aec_core.c:831-854)."""
    re = jnp.concatenate([a[0:1], a[2::2], a[1:2]])
    im = jnp.concatenate([jnp.zeros(1, F32), a[3::2], jnp.zeros(1, F32)])
    return re, im


def _unpack_spectrum(re, im):
    """(re, im) -> rdft input packing (inverse of _pack_spectrum)."""
    a = jnp.zeros(PART_LEN2, F32)
    a = a.at[0].set(re[0])
    a = a.at[1].set(re[PART_LEN])
    a = a.at[2::2].set(re[1:PART_LEN])
    a = a.at[3::2].set(im[1:PART_LEN])
    return a


@jax.jit
def time_to_frequency_pair(time_data):
    """BufferFarendPartition's two transforms (aec_core.c:1690-1707):
    returns ([130] plain, [130] windowed) far spectra, C layout
    re[0:65] ++ im[65:130]."""
    z = guard_zero(time_data)
    win = jnp.asarray(_sqrt_hanning())
    a0 = aec_rdft_traced(time_data.astype(F32))
    re0, im0 = _pack_spectrum(a0)
    xw = jnp.concatenate([gm(time_data[:PART_LEN], win[:PART_LEN], z),
                          gm(time_data[PART_LEN:], win[PART_LEN:0:-1], z)])
    a1 = aec_rdft_traced(xw)
    re1, im1 = _pack_spectrum(a1)
    return (jnp.concatenate([re0, im0]), jnp.concatenate([re1, im1]))


def _filter_far(xf_buf, wf_buf, block_pos):
    """FilterFar (aec_core.c:148-170): sequential accumulation over
    partitions in order i=0..N-1 reading xf at (i+block_pos) mod N.

    Fast mode: the per-partition complex MACs are order-released into one
    vectorized reduction over the partition axis (no 12-step scan)."""
    if floatops.fast_mode():
        idx = (jnp.arange(NUM_PARTITIONS, dtype=I32) + block_pos) \
            % NUM_PARTITIONS
        x = xf_buf[idx]              # [N, 2, 65]
        xr, xi = x[:, 0], x[:, 1]
        wr, wi = wf_buf[:, 0], wf_buf[:, 1]
        yf_re = jnp.sum(xr * wr - xi * wi, axis=0)
        yf_im = jnp.sum(xr * wi + xi * wr, axis=0)
        return yf_re, yf_im

    def body(carry, i):
        yf_re, yf_im = carry
        idx = (i + block_pos) % NUM_PARTITIONS
        xr = xf_buf[idx, 0]
        xi = xf_buf[idx, 1]
        wr = wf_buf[i, 0]
        wi = wf_buf[i, 1]
        z = xr[0] - xr[0]
        yf_re = yf_re + (gm(xr, wr, z) - gm(xi, wi, z))
        yf_im = yf_im + (gm(xr, wi, z) + gm(xi, wr, z))
        return (yf_re, yf_im), None

    (yr, yi), _ = jax.lax.scan(
        body, (jnp.zeros(PART_LEN1, F32), jnp.zeros(PART_LEN1, F32)),
        jnp.arange(NUM_PARTITIONS))
    return yr, yi


def _filter_adaptation(xf_buf, wf_buf, block_pos, ef_re, ef_im, z):
    """FilterAdaptation (aec_core.c:222-270), vmapped over partitions."""
    def one(i):
        idx = (i + block_pos) % NUM_PARTITIONS
        xr = xf_buf[idx, 0]
        xi = -xf_buf[idx, 1]
        fr = gm(xr[:PART_LEN], ef_re[:PART_LEN], z) - \
            gm(xi[:PART_LEN], ef_im[:PART_LEN], z)
        fi = gm(xr[:PART_LEN], ef_im[:PART_LEN], z) + \
            gm(xi[:PART_LEN], ef_re[:PART_LEN], z)
        f1 = gm(xr[PART_LEN], ef_re[PART_LEN], z) - \
            gm(xi[PART_LEN], ef_im[PART_LEN], z)
        fft = jnp.zeros(PART_LEN2, F32)
        fft = fft.at[0::2].set(fr)
        fft = fft.at[1::2].set(fi)
        fft = fft.at[1].set(f1)
        t = aec_rdft_traced(fft, inverse=True)
        t = t.at[PART_LEN:].set(0.0)
        t = t * jnp.float32(2.0 / PART_LEN2)
        # NB the zeroed second half is scaled in C only for j<PART_LEN,
        # which is what we did (the rest stays zero either way)
        w = aec_rdft_traced(t)
        d_re = jnp.concatenate([w[0:1], w[2::2], w[1:2]])
        d_im = jnp.concatenate([jnp.zeros(1, F32), w[3::2],
                                jnp.zeros(1, F32)])
        return d_re, d_im

    d_re, d_im = jax.vmap(one)(jnp.arange(NUM_PARTITIONS))
    # wfBuf[1][pos] / [pos+PART_LEN] receive fft[0]/fft[1] => d_re[0],
    # d_re[PART_LEN]; imaginary end bins stay untouched (they're the
    # packed real parts in C's layout).  In C: wfBuf[0][pos]+=fft[0],
    # wfBuf[0][pos+64]+=fft[1], wfBuf[0/1][pos+j]+=fft[2j]/fft[2j+1].
    new0 = wf_buf[:, 0, :] + d_re
    new1 = wf_buf[:, 1, :].at[:, 1:PART_LEN].add(d_im[:, 1:PART_LEN])
    return jnp.stack([new0, new1], axis=1)


def _update_psd(old, new_val, g0, g1, z):
    return gm(g0, old, z) + gm(g1, new_val, z)


def _sel(flag, a, b):
    """Select that folds at trace time for Python-bool flags (the
    single-stream path) and lowers to jnp.where for traced flags (the
    batched engine, where one compiled program covers every host-counter
    phase)."""
    if isinstance(flag, (bool, np.bool_)):
        return a if flag else b
    return jnp.where(flag, a, b)


def process_block_kernel(dev: AecDev, xf130, xfw130, nearend, rand64,
                         block_pos, mult: int, nlp_mode: int,
                         noise_sel_init: bool, noise_gate_open: bool,
                         update_delay_idx: bool):
    """One 64-sample ProcessBlock + NonLinearProcessing
    (aec_core.c:1143-1351, 911-1141) for the daemon deployment
    (metrics/delay-logging off, single band).

    xf130: the far partition spectrum read from far_buf;
    xfw130: the windowed far spectrum read from far_buf_windowed;
    rand64: host-generated comfort-noise uniforms (int16 values).
    Returns (dev, output[64] float saturated)."""
    z = guard_zero(nearend)
    # gPow is fixed {0.9, 0.1} (aec_core.c:1156); the mult-dependent
    # coefficients apply only to the smoothed PSDs (SmoothedPSD)
    gp0, gp1 = np.float32(0.9), np.float32(0.1)
    g0, g1 = SMOOTHING[mult]
    win = jnp.asarray(_sqrt_hanning())

    # ---- concatenate near blocks (dBuf) and near fft ----
    d_buf = jnp.concatenate([dev.d_buf[PART_LEN:], nearend.astype(F32)])
    a = aec_rdft_traced(d_buf)
    df_re, df_im = _pack_spectrum(a)

    xf_re = xf130[:PART_LEN1]
    xf_im = xf130[PART_LEN1:]

    # ---- power smoothing (aec_core.c:1207-1219) ----
    far_spec = gm(xf_re, xf_re, z) + gm(xf_im, xf_im, z)
    np_g1 = np.float32(np.float32(gp1) * np.float32(NUM_PARTITIONS))
    x_pow = gm(gp0, dev.x_pow, z) + gm(np_g1, far_spec, z)
    near_spec = gm(df_re, df_re, z) + gm(df_im, df_im, z)
    d_pow = gm(gp0, dev.d_pow, z) + gm(gp1, near_spec, z)

    # ---- noise estimate (aec_core.c:1222-1248) ----
    # noiseEstCtr > 50 gating and the <noiseInitBlocks ramp are handled by
    # host flags: noise_sel_init chooses dInitMinPow as noisePow and also
    # whether the ramp update runs; the >50 gate is passed via
    # update_min_pow below.
    # The two gates are data-independent host counters.  They arrive either
    # as Python bools (single-stream path: the selects below fold away at
    # trace time) or as traced scalars (batched engine: one compiled
    # program covers every counter phase).
    step = np.float32(0.1)
    ramp = np.float32(1.0002)
    lower = (d_pow + gm(step, dev.d_min_pow - d_pow, z)) * ramp
    d_min_pow_upd = jnp.where(d_pow < dev.d_min_pow, lower,
                              dev.d_min_pow * ramp)
    # noiseEstCtr <= 50: no min-pow update (aec_core.c:1224-1243)
    d_min_pow = _sel(noise_gate_open, d_min_pow_upd, dev.d_min_pow)
    gi0, gi1 = np.float32(0.999), np.float32(0.001)
    d_init_min_pow = jnp.where(
        d_min_pow > dev.d_init_min_pow,
        gm(gi0, dev.d_init_min_pow, z) + gm(gi1, d_min_pow, z),
        d_min_pow)
    # ramp counter expired (noiseEstCtr >= 500*mult): no ramp update, and
    # noisePow switches from dInitMinPow to dMinPow
    d_init_min_pow = _sel(noise_sel_init, d_init_min_pow,
                          dev.d_init_min_pow)
    noise_pow = _sel(noise_sel_init, d_init_min_pow, d_min_pow)

    # ---- xfBuf ring: block_pos decrement handled on host; here we write
    # the new partition at block_pos (aec_core.c:1269-1280) ----
    # dynamic_update_slice lowers to an in-place update inside loops,
    # where the equivalent scatter tends to materialize a buffer copy
    xf_buf = jax.lax.dynamic_update_slice(
        dev.xf_buf, jnp.stack([xf_re, xf_im])[None],
        (block_pos, jnp.int32(0), jnp.int32(0)))

    # ---- FilterFar + inverse fft -> echo estimate y ----
    yf_re, yf_im = _filter_far(xf_buf, dev.wf_buf, block_pos)
    t = aec_rdft_traced(_unpack_spectrum(yf_re, yf_im), inverse=True)
    y = t[PART_LEN:] * jnp.float32(2.0 / PART_LEN2)
    e = nearend.astype(F32) - y

    # ---- error fft (aec_core.c:1306-1319) ----
    e_buf = jnp.concatenate([dev.e_buf[PART_LEN:], e])
    efft = jnp.concatenate([jnp.zeros(PART_LEN, F32), e])
    a_e = aec_rdft_traced(efft)
    ef_re, ef_im = _pack_spectrum(a_e)

    # ---- ScaleErrorSignal (aec_core.c:172-194) ----
    mu = np.float32(0.6) if mult == 1 else np.float32(0.5)
    err_th = np.float32(2e-6) if mult == 1 else np.float32(1.5e-6)
    denom = x_pow + jnp.float32(1e-10)
    ef_re = gq(ef_re, denom, z)
    ef_im = gq(ef_im, denom, z)
    abs_ef = floatops.fsqrtf(gm(ef_re, ef_re, z) + gm(ef_im, ef_im, z))
    fac = gq(jnp.float32(err_th), abs_ef + jnp.float32(1e-10), z)
    big = abs_ef > err_th
    ef_re = jnp.where(big, ef_re * fac, ef_re)
    ef_im = jnp.where(big, ef_im * fac, ef_im)
    ef_re = ef_re * mu
    ef_im = ef_im * mu

    # ---- FilterAdaptation (aec_core.c:222-270) ----
    wf_buf = _filter_adaptation(xf_buf, dev.wf_buf, block_pos, ef_re,
                                ef_im, z)

    # ================= NonLinearProcessing (aec_core.c:911-1141) ========
    xfw_re = xfw130[:PART_LEN1]
    xfw_im = xfw130[PART_LEN1:]
    # buffer windowed far into history (memmove happens at the END in C;
    # the current block's xfw is written at slot 0 now and shifted later)
    xfw_buf = jax.lax.dynamic_update_slice(
        dev.xfw_buf, jnp.stack([xfw_re, xfw_im])[None],
        (jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    # PartitionDelay (aec_core.c:295-319) every delayEstInterval blocks;
    # argmax returns the first occurrence of the max, matching the strict
    # `>` update rule.  With a constant-False flag XLA dead-code-eliminates
    # the energy computation entirely.
    if update_delay_idx is False:
        delay_idx = dev.delay_idx
    else:
        en = jax.vmap(lambda p: seq_sum(
            gm(p[0], p[0], z) + gm(p[1], p[1], z)))(wf_buf)
        delay_idx = _sel(update_delay_idx, jnp.argmax(en).astype(I32),
                         dev.delay_idx)

    # delayed windowed far
    xfw_d_re = xfw_buf[delay_idx, 0]
    xfw_d_im = xfw_buf[delay_idx, 1]

    # windowed near/error ffts (SubbandCoherence, aec_core.c:412-450)
    def wfft(buf):
        xw = jnp.concatenate([gm(buf[:PART_LEN], win[:PART_LEN], z),
                              gm(buf[PART_LEN:], win[PART_LEN:0:-1], z)])
        aw = aec_rdft_traced(xw)
        r = jnp.concatenate([aw[0:1], aw[2::2], aw[1:2]])
        i = jnp.concatenate([jnp.zeros(1, F32), aw[3::2],
                             jnp.zeros(1, F32)])
        return r, i

    dfw_re, dfw_im = wfft(d_buf)
    efw_re, efw_im = wfft(e_buf)

    # SmoothedPSD (aec_core.c:333-386)
    sd = gm(g0, dev.sd, z) + gm(g1, gm(dfw_re, dfw_re, z) +
                                gm(dfw_im, dfw_im, z), z)
    se = gm(g0, dev.se, z) + gm(g1, gm(efw_re, efw_re, z) +
                                gm(efw_im, efw_im, z), z)
    sx = gm(g0, dev.sx, z) + gm(g1, jnp.maximum(
        gm(xfw_d_re, xfw_d_re, z) + gm(xfw_d_im, xfw_d_im, z),
        MIN_FAREND_PSD), z)
    sde0 = gm(g0, dev.sde[:, 0], z) + gm(g1, gm(dfw_re, efw_re, z) +
                                         gm(dfw_im, efw_im, z), z)
    sde1 = gm(g0, dev.sde[:, 1], z) + gm(g1, gm(dfw_re, efw_im, z) -
                                         gm(dfw_im, efw_re, z), z)
    sxd0 = gm(g0, dev.sxd[:, 0], z) + gm(g1, gm(dfw_re, xfw_d_re, z) +
                                         gm(dfw_im, xfw_d_im, z), z)
    sxd1 = gm(g0, dev.sxd[:, 1], z) + gm(g1, gm(dfw_re, xfw_d_im, z) -
                                         gm(dfw_im, xfw_d_re, z), z)
    sd_sum, se_sum = seq_sum_multi(sd, se)

    diverge = jnp.where(dev.diverge_state != 0,
                        gm(jnp.float32(1.05), se_sum, z),
                        se_sum) > sd_sum
    efw_re = jnp.where(diverge, dfw_re, efw_re)
    efw_im = jnp.where(diverge, dfw_im, efw_im)
    reset_wf = se_sum > gm(jnp.float32(19.95), sd_sum, z)
    wf_buf = jnp.where(reset_wf, jnp.zeros_like(wf_buf), wf_buf)

    # subband coherence
    cohde = gq(gm(sde0, sde0, z) + gm(sde1, sde1, z),
               gm(sd, se, z) + jnp.float32(1e-10), z)
    cohxd = gq(gm(sxd0, sxd0, z) + gm(sxd1, sxd1, z),
               gm(sx, sd, z) + jnp.float32(1e-10), z)

    # ---- NLP decision logic (aec_core.c:962-1050) ----
    pref_band = PREF_BAND_SIZE // mult
    min_pref = 4 // mult
    h_xd_avg = gq(seq_sum(cohxd[min_pref:min_pref + pref_band]),
                  oc(float(pref_band), z), z)
    h_xd_avg = jnp.float32(1.0) - h_xd_avg
    h_de_avg = gq(seq_sum(cohde[min_pref:min_pref + pref_band]),
                  oc(float(pref_band), z), z)

    h_nl_xd_avg_min = jnp.where(
        (h_xd_avg < jnp.float32(0.75)) & (h_xd_avg < dev.h_nl_xd_avg_min),
        h_xd_avg, dev.h_nl_xd_avg_min)

    st_near = jnp.where(
        (h_de_avg > jnp.float32(0.98)) & (h_xd_avg > jnp.float32(0.9)),
        jnp.int32(1),
        jnp.where((h_de_avg < jnp.float32(0.95)) |
                  (h_xd_avg < jnp.float32(0.8)),
                  jnp.int32(0), dev.st_near_state))

    min_od = np.float32(MIN_OVERDRIVE[nlp_mode])
    one_m_cohxd = jnp.float32(1.0) - cohxd
    both_min = jnp.minimum(cohde, one_m_cohxd)
    pref_sorted = jnp.sort(
        jax.lax.dynamic_slice(both_min, (min_pref,), (pref_band,)))
    q75 = int(math.floor(0.75 * (pref_band - 1)))
    q50 = int(math.floor(0.5 * (pref_band - 1)))

    is_min1 = h_nl_xd_avg_min == jnp.float32(1.0)
    near1 = st_near == 1
    echo_state = jnp.where(is_min1, jnp.int32(0),
                           jnp.where(near1, jnp.int32(0), jnp.int32(1)))
    over_drive = jnp.where(is_min1, min_od, dev.over_drive)

    h_nl = jnp.where(is_min1,
                     jnp.where(near1, cohde, one_m_cohxd),
                     jnp.where(near1, cohde, both_min))
    h_fb = jnp.where(is_min1,
                     jnp.where(near1, h_de_avg, h_xd_avg),
                     jnp.where(near1, h_de_avg, pref_sorted[q75]))
    h_fb_low = jnp.where(is_min1,
                         jnp.where(near1, h_de_avg, h_xd_avg),
                         jnp.where(near1, h_de_avg, pref_sorted[q50]))

    # minimum tracking (aec_core.c:1023-1043)
    new_min_cond = (h_fb_low < jnp.float32(0.6)) &         (h_fb_low < dev.h_nl_fb_local_min)
    h_fb_local_min = jnp.where(new_min_cond, h_fb_low,
                               dev.h_nl_fb_local_min)
    h_fb_min = jnp.where(new_min_cond, h_fb_low, dev.h_nl_fb_min)
    h_new_min = jnp.where(new_min_cond, jnp.int32(1), dev.h_nl_new_min)
    h_min_ctr = jnp.where(new_min_cond, jnp.int32(0), dev.h_nl_min_ctr)

    step_local = np.float32(np.float32(0.0008) / np.float32(mult))
    step_xd = np.float32(np.float32(0.0006) / np.float32(mult))
    h_fb_local_min = jnp.minimum(h_fb_local_min + step_local,
                                 jnp.float32(1.0))
    h_nl_xd_avg_min = jnp.minimum(h_nl_xd_avg_min + step_xd,
                                  jnp.float32(1.0))

    h_min_ctr = jnp.where(h_new_min == 1, h_min_ctr + 1, h_min_ctr)
    fire = h_min_ctr == 2
    h_new_min = jnp.where(fire, jnp.int32(0), h_new_min)
    h_min_ctr = jnp.where(fire, jnp.int32(0), h_min_ctr)
    od_cand = jnp.maximum(
        gq(np.float32(TARGET_SUPP[nlp_mode]),
           flog(h_fb_min + jnp.float32(1e-10)) + jnp.float32(1e-10), z),
        min_od)
    over_drive = jnp.where(fire, od_cand, over_drive)

    over_drive_sm = jnp.where(
        over_drive < dev.over_drive_sm,
        gm(np.float32(0.99), dev.over_drive_sm, z) +
        gm(np.float32(0.01), over_drive, z),
        gm(np.float32(0.9), dev.over_drive_sm, z) +
        gm(np.float32(0.1), over_drive, z))

    # ---- OverdriveAndSuppress (aec_core.c:272-293) ----
    wcurve = jnp.asarray(_weight_curve())
    wcurve_c = jnp.asarray(
        (np.float32(1.0) - _weight_curve()).astype(np.float32))
    odcurve = jnp.asarray(_overdrive_curve())
    blend = gm(wcurve, h_fb, z) + gm(wcurve_c, h_nl, z)
    h_nl = jnp.where(h_nl > h_fb, blend, h_nl)
    h_nl = _fpow(h_nl, over_drive_sm * odcurve)
    # guarded: the raw mul would contract into an FMA with the comfort-noise
    # add below, changing the rounding of the suppression product
    efw_re = gm(efw_re, h_nl, z)
    efw_im = gm(efw_im, h_nl, z) * jnp.float32(-1.0)

    # ---- ComfortNoise (aec_core.c:462-547), single band ----
    rand = rand64.astype(F32) / jnp.float32(32768.0)
    tmp_ang = jnp.float32(6.28318530717959) * rand
    noise = floatops.fsqrtf(noise_pow[1:])
    u_re = gm(noise, _fcos(tmp_ang), z)
    u_im = -gm(noise, _fsin(tmp_ang), z)
    lam2 = floatops.fsqrtf(jnp.maximum(
        jnp.float32(1.0) - gm(h_nl, h_nl, z), jnp.float32(0.0)))
    cn_re = jnp.concatenate([jnp.zeros(1, F32), u_re])
    cn_im = jnp.concatenate([jnp.zeros(1, F32),
                             u_im.at[PART_LEN - 1].set(0.0)])
    efw_re = efw_re + gm(lam2, cn_re, z)
    efw_im = efw_im + gm(lam2, cn_im, z)

    # ---- inverse error fft + overlap-add (aec_core.c:1066-1088) ----
    fft_in = jnp.zeros(PART_LEN2, F32)
    fft_in = fft_in.at[0].set(efw_re[0])
    fft_in = fft_in.at[1].set(efw_re[PART_LEN])
    fft_in = fft_in.at[2::2].set(efw_re[1:PART_LEN])
    fft_in = fft_in.at[3::2].set(-efw_im[1:PART_LEN])
    t_out = aec_rdft_traced(fft_in, inverse=True)
    # scale must be opaque: mul(mul(t, 1/64), win_const) would otherwise be
    # constant-folded into mul(t, win/64), changing the rounding order vs
    # the reference's fft[i] *= scale; fft[i] * sqrtHanning[i] sequence
    scale = oc(2.0 / PART_LEN2, z)
    first = gm(t_out[:PART_LEN], scale, z)
    first = gm(first, win[:PART_LEN], z) + dev.out_buf
    second = gm(t_out[PART_LEN:], scale, z)
    out_buf = gm(second, win[PART_LEN:0:-1], z)
    output = jnp.clip(first, -32768.0, 32767.0)

    # shift xfw history right by one partition (memmove,
    # aec_core.c:1138-1140); slot 0 keeps the current block's value and is
    # rewritten next block
    xfw_buf = jnp.concatenate([xfw_buf[:1], xfw_buf[:-1]])

    dev = dev._replace(
        d_buf=d_buf, e_buf=e_buf, out_buf=out_buf,
        x_pow=x_pow, d_pow=d_pow, d_min_pow=d_min_pow,
        d_init_min_pow=d_init_min_pow,
        sd=sd, se=se, sx=sx,
        sde=jnp.stack([sde0, sde1], axis=1),
        sxd=jnp.stack([sxd0, sxd1], axis=1),
        xf_buf=xf_buf, wf_buf=wf_buf, xfw_buf=xfw_buf,
        delay_idx=delay_idx,
        h_nl_fb_min=h_fb_min, h_nl_fb_local_min=h_fb_local_min,
        h_nl_xd_avg_min=h_nl_xd_avg_min, h_nl_new_min=h_new_min,
        h_nl_min_ctr=h_min_ctr, over_drive=over_drive,
        over_drive_sm=over_drive_sm, st_near_state=st_near,
        echo_state=echo_state,
        diverge_state=diverge.astype(I32))
    return dev, output


# --------------------------------------------------------------------------
# host-side ring buffer with the reference's exact semantics
# (common_audio/ring_buffer.c: clamped reads/writes/moves, zero-initialized)
# --------------------------------------------------------------------------

def _idiv(a: int, b: int) -> int:
    """C integer division (truncate toward zero)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


class _Ring:
    def __init__(self, count: int, elem_shape=()):
        self.count = count
        self.data = np.zeros((count,) + tuple(elem_shape), np.float32)
        self.read_pos = 0
        self.write_pos = 0
        self.same_wrap = True

    def available_read(self) -> int:
        if self.same_wrap:
            return self.write_pos - self.read_pos
        return self.count - self.read_pos + self.write_pos

    def available_write(self) -> int:
        return self.count - self.available_read()

    def write(self, data: np.ndarray) -> int:
        n = min(self.available_write(), len(data))
        chunk = data[:n]
        margin = self.count - self.write_pos
        if n > margin:
            self.data[self.write_pos:] = chunk[:margin]
            self.data[:n - margin] = chunk[margin:]
            self.write_pos = n - margin
            self.same_wrap = False
        else:
            self.data[self.write_pos:self.write_pos + n] = chunk
            self.write_pos += n
        return n

    def read(self, n: int) -> np.ndarray:
        avail = self.available_read()
        n = min(n, avail)
        margin = self.count - self.read_pos
        if n > margin:
            out = np.concatenate([self.data[self.read_pos:],
                                  self.data[:n - margin]])
        else:
            out = self.data[self.read_pos:self.read_pos + n].copy()
        self.move_read(n)
        return out

    def move_read(self, n: int) -> int:
        free = self.available_write()
        avail = self.available_read()
        n = min(n, avail)
        n = max(n, -free)
        rp = self.read_pos + n
        if rp > self.count:
            rp -= self.count
            self.same_wrap = True
        if rp < 0:
            rp += self.count
            self.same_wrap = False
        self.read_pos = rp
        return n


# --------------------------------------------------------------------------
# host core orchestration (AecCore parts of aec_core.c that only shuffle
# buffers/counters)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _block_jit(mult, nlp_mode, noise_sel_init, noise_gate_open,
               update_delay_idx):
    def f(dev, xf130, xfw130, nearend, rand64, block_pos):
        return process_block_kernel(
            dev, xf130, xfw130, nearend, rand64, block_pos,
            mult, nlp_mode, noise_sel_init, noise_gate_open,
            update_delay_idx)
    return jax.jit(f)


class AecCoreHost:
    """WebRtcAec_CreateAec/InitAec + ProcessFrames host logic
    (aec_core.c:1353-1850)."""

    def __init__(self, samp_freq: int):
        self.samp_freq = samp_freq
        self.num_bands = 1 if samp_freq == 8000 else samp_freq // 16000
        self.mult = samp_freq // 8000 if self.num_bands == 1 else             samp_freq // 16000
        self.nlp_mode = 1
        self.metrics_mode = 0
        self.dev = init_dev()
        self.far_buf = _Ring(BUF_SIZE_PARTITIONS, (2 * PART_LEN1,))
        self.far_wbuf = _Ring(BUF_SIZE_PARTITIONS, (2 * PART_LEN1,))
        self.near_fr = _Ring(FRAME_LEN + PART_LEN)
        self.out_fr = _Ring(FRAME_LEN + PART_LEN)
        self.system_delay = 0
        self.known_delay = 0
        self.xf_pos = 0          # xfBufBlockPos
        self.noise_est_ctr = 0
        self.delay_est_ctr = 0
        self.seed = 777

    def set_config(self, nlp_mode: int):
        self.nlp_mode = nlp_mode

    def buffer_farend_partition(self, part: np.ndarray):
        """WebRtcAec_BufferFarendPartition (aec_core.c:1690-1707)."""
        if self.far_buf.available_write() < 1:
            self.move_far_read_ptr(1)
        xf, xfw = time_to_frequency_pair(jnp.asarray(part, jnp.float32))
        self.far_buf.write(np.asarray(xf, np.float32)[None])
        self.far_wbuf.write(np.asarray(xfw, np.float32)[None])

    def move_far_read_ptr(self, elements: int) -> int:
        """WebRtcAec_MoveFarReadPtr (aec_core.c:1709-1717)."""
        moved = self.far_wbuf.move_read(elements)
        self.far_buf.move_read(elements)
        self.system_delay -= moved * PART_LEN
        return moved

    def _process_block(self):
        xf = self.far_buf.read(1)[0]
        xfw = self.far_wbuf.read(1)[0]
        near = self.near_fr.read(PART_LEN)

        rand, self.seed = _rand_u_array(self.seed, PART_LEN)
        noise_gate_open = self.noise_est_ctr > 50
        noise_sel_init = self.noise_est_ctr < 500 * self.mult
        if noise_sel_init:
            self.noise_est_ctr += 1
        # delayEstCtr increments at NonLinearProcessing entry and wraps at
        # 10*mult; delayIdx updates when it wrapped to 0
        self.delay_est_ctr += 1
        if self.delay_est_ctr == 10 * self.mult:
            self.delay_est_ctr = 0
        update_delay_idx = self.delay_est_ctr == 0

        self.xf_pos = (self.xf_pos - 1) % NUM_PARTITIONS

        fn = _block_jit(self.mult, self.nlp_mode, noise_sel_init,
                        noise_gate_open, update_delay_idx)
        self.dev, out = fn(self.dev, jnp.asarray(xf), jnp.asarray(xfw),
                           jnp.asarray(near), jnp.asarray(rand, jnp.int32),
                           jnp.int32(self.xf_pos))
        self.out_fr.write(np.asarray(out, np.float32))

    def process_frames(self, nearend: np.ndarray, known_delay: int
                       ) -> np.ndarray:
        """WebRtcAec_ProcessFrames (aec_core.c:1719-1850), reported-delay
        mode, single band."""
        num_samples = len(nearend)
        out = np.zeros(num_samples, np.float32)
        for j in range(0, num_samples, FRAME_LEN):
            self.near_fr.write(nearend[j:j + FRAME_LEN])

            if self.system_delay < FRAME_LEN:
                self.move_far_read_ptr(-(self.mult + 1))

            # 2a) compensate for system delay changes
            move_elements = _idiv(self.known_delay - known_delay - 32,
                                  PART_LEN)
            moved = self.far_buf.move_read(move_elements)
            self.far_wbuf.move_read(move_elements)
            self.known_delay -= moved * PART_LEN

            while self.near_fr.available_read() >= PART_LEN:
                self._process_block()

            self.system_delay -= FRAME_LEN

            out_elements = self.out_fr.available_read()
            if out_elements < FRAME_LEN:
                self.out_fr.move_read(out_elements - FRAME_LEN)
            out[j:j + FRAME_LEN] = self.out_fr.read(FRAME_LEN)
        return out


# --------------------------------------------------------------------------
# top-level wrapper (echo_cancellation.c) + daemon semantics (webrtc.c)
# --------------------------------------------------------------------------

SAMP_MS_NB = 8
MAX_BUF_SIZE_START = 62


class Aec:
    """WebRtcAec instance in the daemon's configuration
    (echo_cancellation.c ProcessNormal/EstBufDelayNormal paths)."""

    def __init__(self, samp_freq: int, nlp_mode: int = 2):
        self.core = AecCoreHost(samp_freq)
        self.core.set_config(nlp_mode)
        self.samp_freq = samp_freq
        self.split_freq = 16000 if samp_freq > 16000 else samp_freq
        self.rate_factor = self.split_freq // 8000
        self.far_pre = _Ring(FAR_PRE_BUF_SIZE)
        self.far_pre.move_read(-PART_LEN)  # start overlap
        self.sum = 0
        self.counter = 0
        self.check_buff_size = True
        self.first_val = 0
        self.startup_phase = 1  # reported_delay_enabled
        self.buf_size_start = 0
        self.check_buf_size_ctr = 0
        self.ms_in_snd_card_buf = 0
        self.filt_delay = -1
        self.time_for_delay_change = 0
        self.known_delay = 0
        self.last_delay_diff = 0
        self.farend_started = False

    # -- BufferFarend (echo_cancellation.c:278-339) --
    def buffer_farend(self, farend: np.ndarray):
        n = len(farend)
        self.farend_started = True
        self.core.system_delay += n
        self.far_pre.write(farend.astype(np.float32))
        while self.far_pre.available_read() >= PART_LEN2:
            part = self.far_pre.read(PART_LEN2)
            self.core.buffer_farend_partition(part)
            self.far_pre.move_read(-PART_LEN)

    # -- Process -> ProcessNormal (echo_cancellation.c:341-747) --
    def process(self, nearend: np.ndarray, reported_delay_ms: int
                ) -> np.ndarray:
        if reported_delay_ms < 0:
            reported_delay_ms = 0
        elif reported_delay_ms > 500:
            reported_delay_ms = 500
        # ProcessNormal adds a 10 ms robustness margin to the reported
        # delay (echo_cancellation.c:616) before all startup/EstBufDelay
        # computations
        self.ms_in_snd_card_buf = reported_delay_ms + 10
        num_samples = len(nearend)
        n_blocks_10ms = num_samples // (FRAME_LEN * self.rate_factor)

        if self.startup_phase:
            out = nearend.astype(np.float32).copy()

            if self.check_buff_size:
                self.check_buf_size_ctr += 1
                if self.counter == 0:
                    self.first_val = self.ms_in_snd_card_buf
                    self.sum = 0
                if abs(self.first_val - self.ms_in_snd_card_buf) <                         max(0.2 * self.ms_in_snd_card_buf, SAMP_MS_NB):
                    self.sum += self.ms_in_snd_card_buf
                    self.counter += 1
                else:
                    self.counter = 0
                if self.counter * n_blocks_10ms >= 6:
                    self.buf_size_start = min(
                        _idiv(3 * self.sum * self.rate_factor * 8,
                              4 * self.counter * PART_LEN),
                        MAX_BUF_SIZE_START)
                    self.check_buff_size = False
                if self.check_buf_size_ctr * n_blocks_10ms > 50:
                    self.buf_size_start = min(
                        _idiv(self.ms_in_snd_card_buf *
                              self.rate_factor * 3, 40),
                        MAX_BUF_SIZE_START)
                    self.check_buff_size = False

            if not self.check_buff_size:
                overhead_elements = _idiv(self.core.system_delay, PART_LEN)                     - self.buf_size_start
                if overhead_elements == 0:
                    self.startup_phase = 0
                elif overhead_elements > 0:
                    self.core.move_far_read_ptr(overhead_elements)
                    self.startup_phase = 0
            return out

        # AEC enabled
        self._est_buf_delay_normal()
        return self.core.process_frames(nearend.astype(np.float32),
                                        self.known_delay)

    def _est_buf_delay_normal(self):
        """EstBufDelayNormal (echo_cancellation.c:821-875)."""
        n_samp_snd_card = self.ms_in_snd_card_buf * SAMP_MS_NB *             self.rate_factor
        current_delay = n_samp_snd_card - self.core.system_delay
        current_delay += FRAME_LEN * self.rate_factor

        if current_delay < PART_LEN:
            current_delay += self.core.move_far_read_ptr(1) * PART_LEN

        if self.filt_delay < 0:
            self.filt_delay = 0
        self.filt_delay = max(
            0, _c_short(0.8 * self.filt_delay + 0.2 * current_delay))

        delay_difference = self.filt_delay - self.known_delay
        if delay_difference > 224:
            if self.last_delay_diff < 96:
                self.time_for_delay_change = 0
            else:
                self.time_for_delay_change += 1
        elif delay_difference < 96 and self.known_delay > 0:
            if self.last_delay_diff > 224:
                self.time_for_delay_change = 0
            else:
                self.time_for_delay_change += 1
        else:
            self.time_for_delay_change = 0
        self.last_delay_diff = delay_difference

        if self.time_for_delay_change > 25:
            self.known_delay = max(int(self.filt_delay) - 160, 0)


def _c_short(x: float) -> int:
    """(short) cast of a double: truncate toward zero, wrap to int16."""
    t = int(x)  # trunc toward zero
    return ((t + 0x8000) & 0xFFFF) - 0x8000


# --------------------------------------------------------------------------
# daemon wrapper (src/webrtc.c aec_process2:410-483)
# --------------------------------------------------------------------------

class AecProcessor:
    """The daemon's aec handle: chn/freq geometry, 10-or-20 ms subpackage
    loop, left-channel extraction, float<->int16 conversions."""

    def __init__(self, chn: int, freq: int, interval_ms: int = 20):
        assert freq <= 16000 and freq % 8000 == 0
        self.chn = chn
        self.freq = freq
        if freq <= 8000:
            self.interval_ms = 20 if interval_ms % 20 == 0 else 10
        else:
            self.interval_ms = 10
        self.pkg_frame = freq // 1000 * self.interval_ms
        self.aec = Aec(freq, nlp_mode=2)  # kAecNlpAggressive

    def set_frame_far(self, far) -> None:
        """aec_setFrameFar (src/webrtc.c:286-323): left-channel extract +
        BufferFarend per subpackage, no Process."""
        far = np.asarray(far).reshape(-1, self.chn)
        for s in range(0, far.shape[0], self.pkg_frame):
            self.aec.buffer_farend(
                far[s:s + self.pkg_frame, 0].astype(np.float32))

    def process(self, near, delay_ms: int = 0) -> np.ndarray:
        """aec_process (src/webrtc.c:337-395): Process against far-end
        data previously queued with set_frame_far."""
        near = np.asarray(near).reshape(-1, self.chn)
        frame_num = near.shape[0]
        out = np.zeros((frame_num, self.chn), np.int16)
        for s in range(0, frame_num, self.pkg_frame):
            n = near[s:s + self.pkg_frame, 0].astype(np.float32)
            res = self.aec.process(n, delay_ms)
            with np.errstate(invalid="ignore"):
                res_i = np.where(
                    np.isnan(res), np.int64(0),
                    np.trunc(np.asarray(res, np.float64)).astype(np.int64))
            res_i = ((res_i + 0x8000) & 0xFFFF) - 0x8000
            out[s:s + self.pkg_frame] = res_i[:, None].astype(np.int16)
        return out.reshape(-1)

    def process2(self, far, near, delay_ms: int = 0) -> np.ndarray:
        """aec_process2: BufferFarend + Process per subpackage."""
        far = np.asarray(far).reshape(-1, self.chn)
        near = np.asarray(near).reshape(-1, self.chn)
        frame_num = far.shape[0]
        out = np.zeros((frame_num, self.chn), np.int16)
        for s in range(0, frame_num, self.pkg_frame):
            f = far[s:s + self.pkg_frame, 0].astype(np.float32)
            n = near[s:s + self.pkg_frame, 0].astype(np.float32)
            self.aec.buffer_farend(f)
            res = self.aec.process(n, delay_ms)
            # (int16_t) cast truncates toward zero; NaN (which the C NLP
            # can produce via powf of a negative coherence) casts to 0 on
            # x86, matching the masked conversion here
            with np.errstate(invalid="ignore"):
                res_i = np.where(
                    np.isnan(res), np.int64(0),
                    np.trunc(np.asarray(res, np.float64)).astype(np.int64))
            res_i = ((res_i + 0x8000) & 0xFFFF) - 0x8000
            out[s:s + self.pkg_frame] = res_i[:, None].astype(np.int16)
        return out.reshape(-1)

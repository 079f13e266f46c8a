"""AECM — the WebRTC mobile echo suppressor, the daemon's compile-time
alternate AEC (`#undef MAKE_WEBRTC_AEC`, src/webrtc.c:172-191).

Bit-exact integer rebuild of:
  * echo_control_mobile.c — startup/buffer-stability state machine,
    EstBufDelay/DelayComp, the far-end ring buffer;
  * aecm_core.c / aecm_core_c.c — per-64-sample-block processing:
    int16 windowed FFT (spl ComplexFFT mode 1, order 7), NLMS channel
    estimation in dual Q-domains (16/32-bit channels), far-energy VAD,
    MSE-based stored/adaptive channel arbitration, Wiener gain + NLP,
    comfort noise (RandU LCG seed 666), overlap-add synthesis with
    dynamic Q (AECM_DYNAMIC_Q);
  * utility/delay_estimator*.c — the binary-spectrum delay estimator
    (bands 12..43, mean-threshold binarization, XOR bit counts,
    Markov-validated candidate; robust validation disabled as shipped).

Everything is integer arithmetic, so the numpy port is exact by
construction; tests/test_aecm.py gates sample-for-sample output equality
against the compiled reference (.oracle/libaecm_probe.so) on echo
scenes at 8 and 16 kHz, plus the webrtc.c wrapper semantics
(aec_process2 with the AECM branch, left-channel-only + duplication).
"""
from __future__ import annotations

import numpy as np

from wmix_tpu.dsp.aec import _Ring, _rand_u_array  # ring_buffer.c + RandU

# aecm_defines.h
FRAME_LEN = 80
PART_LEN = 64
PART_LEN1 = 65
PART_LEN2 = 128
PART_LEN4 = 256
FAR_BUF_LEN = PART_LEN4
MAX_DELAY = 100
CONV_LEN = 512
CONV_LEN2 = 1024
MAX_BUF_LEN = 64
FAR_ENERGY_MIN = 1025
FAR_ENERGY_DIFF = 929
ENERGY_DEV_OFFSET = 0
ENERGY_DEV_TOL = 400
FAR_ENERGY_VAD_REGION = 230
MU_MIN = 10
MU_MAX = 1
MU_DIFF = 9
MIN_MSE_COUNT = 20
MIN_MSE_DIFF = 29
MSE_RESOLUTION = 5
RESOLUTION_CHANNEL16 = 12
RESOLUTION_CHANNEL32 = 28
CHANNEL_VAD = 16
RESOLUTION_SUPGAIN = 8
SUPGAIN_DEFAULT = 1 << RESOLUTION_SUPGAIN
SUPGAIN_ERROR_PARAM_A = 3072
SUPGAIN_ERROR_PARAM_B = 1536
SUPGAIN_ERROR_PARAM_D = SUPGAIN_DEFAULT
SUPGAIN_EPC_DT = 200
ONE_Q14 = 1 << 14
NLP_COMP_LOW = 3277
NLP_COMP_HIGH = ONE_Q14
PART_LEN_SHIFT = 7
K_NOISE_EST_Q_DOMAIN = 15
K_NOISE_EST_INC_COUNT = 5

# echo_control_mobile.c
BUF_SIZE_FRAMES = 50
K_SAMP_MS_NB = 8
K_INIT_CHECK = 42

# delay_estimator
K_BAND_FIRST = 12
K_BAND_LAST = 43
K_SHIFTS_AT_ZERO = 13
K_SHIFTS_LINEAR_SLOPE = 3
K_PROBABILITY_OFFSET = 1024
K_PROBABILITY_LOWER_LIMIT = 8704
K_PROBABILITY_MIN_SPREAD = 2816
K_MAX_BIT_COUNTS_Q9 = 32 << 9

I16_MAX = 32767
I16_MIN = -32768
I32_MAX = 0x7FFFFFFF
I32_MIN = -0x80000000


def w16(x: int) -> int:
    return ((int(x) + 0x8000) & 0xFFFF) - 0x8000


def w32(x: int) -> int:
    return ((int(x) + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def u32(x: int) -> int:
    return int(x) & 0xFFFFFFFF


def add_sat_w32(a: int, b: int) -> int:
    s = int(a) + int(b)
    return I32_MAX if s > I32_MAX else (I32_MIN if s < I32_MIN else s)


def add_sat_w16(a: int, b: int) -> int:
    s = int(a) + int(b)
    return I16_MAX if s > I16_MAX else (I16_MIN if s < I16_MIN else s)


def norm_w32(a: int) -> int:
    """WebRtcSpl_NormW32: leading sign-bit count - 1; 0 for a == 0."""
    a = w32(a)
    if a == 0:
        return 0
    if a < 0:
        a = ~a
    n = 0
    while not (a & 0x40000000):
        a = (a << 1) & 0x7FFFFFFF
        n += 1
    return n


def norm_u32(a: int) -> int:
    a = u32(a)
    if a == 0:
        return 0
    n = 0
    while not (a & 0x80000000):
        a <<= 1
        n += 1
    return n


def norm_w16(a: int) -> int:
    a = w16(a)
    if a == 0:
        return 0
    if a < 0:
        a = ~a
    n = 0
    while not (a & 0x4000):
        a = (a << 1) & 0x7FFF
        n += 1
    return n


def shift_w32(x: int, c: int) -> int:
    """WEBRTC_SPL_SHIFT_W32: left when c>=0, arithmetic right else."""
    x = int(x)
    return w32(x << c) if c >= 0 else (x >> -c)


def sqrt_floor(value: int) -> int:
    """WebRtcSpl_SqrtFloor (spl_sqrt_floor.c): bitwise method."""
    root = 0
    value = w32(value)
    for shift in range(15, -1, -1):
        try1 = root + (1 << shift)
        if value >= w32(try1 << shift):
            value -= w32(try1 << shift)
            root |= 2 << shift
    return root >> 1


def div_w32_w16(num: int, den: int) -> int:
    if den == 0:
        return I32_MAX
    q = abs(int(num)) // abs(int(den))
    return -q if (num < 0) != (den < 0) else q


def div_u32_u16(num: int, den: int) -> int:
    if den == 0:
        return 0xFFFFFFFF
    return u32(num) // (int(den) & 0xFFFF)


# --------------------------------------------------------------------------
# spl complex FFT (complex_fft.c mode 1, order 7) + tables
# --------------------------------------------------------------------------

from wmix_tpu.dsp._spl_tables import (AECM_COS_TABLE, AECM_SIN_TABLE,
                                      AECM_SQRT_HANNING, SIN_TABLE_1024)

_SIN1024 = SIN_TABLE_1024


def _bit_reverse_perm(stages: int) -> np.ndarray:
    n = 1 << stages
    perm = np.zeros(n, np.int64)
    for i in range(n):
        r = 0
        t = i
        for _ in range(stages):
            r = (r << 1) | (t & 1)
            t >>= 1
        perm[i] = r
    return perm


_PERM7 = _bit_reverse_perm(7)
_PERMS = {7: _PERM7, 8: _bit_reverse_perm(8)}

CFFTSFT = 14
CFFTRND = 1
CFFTRND2 = 16384
CIFFTSFT = 14
CIFFTRND = 1


def complex_fft_mode1(frfi: np.ndarray, stages: int) -> None:
    """WebRtcSpl_ComplexFFT mode=1, in-place on int64 array [2n]."""
    n = 1 << stages
    l = 1
    k = 9
    while l < n:
        istep = l << 1
        for m in range(l):
            j = m << k
            wr = int(_SIN1024[j + 256])
            wi = -int(_SIN1024[j])
            idx = np.arange(m, n, istep, np.int64)
            jdx = idx + l
            tr32 = (wr * frfi[2 * jdx] - wi * frfi[2 * jdx + 1] +
                    CFFTRND) >> (15 - CFFTSFT)
            ti32 = (wr * frfi[2 * jdx + 1] + wi * frfi[2 * jdx] +
                    CFFTRND) >> (15 - CFFTSFT)
            qr32 = frfi[2 * idx] << CFFTSFT
            qi32 = frfi[2 * idx + 1] << CFFTSFT
            frfi[2 * jdx] = _w16a((qr32 - tr32 + CFFTRND2) >>
                                  (1 + CFFTSFT))
            frfi[2 * jdx + 1] = _w16a((qi32 - ti32 + CFFTRND2) >>
                                      (1 + CFFTSFT))
            frfi[2 * idx] = _w16a((qr32 + tr32 + CFFTRND2) >>
                                  (1 + CFFTSFT))
            frfi[2 * idx + 1] = _w16a((qi32 + ti32 + CFFTRND2) >>
                                      (1 + CFFTSFT))
        k -= 1
        l = istep


def complex_ifft_mode1(frfi: np.ndarray, stages: int) -> int:
    """WebRtcSpl_ComplexIFFT mode=1, in-place; returns scale."""
    n = 1 << stages
    scale = 0
    l = 1
    k = 9
    while l < n:
        shift = 0
        round2 = 8192
        tmp32 = int(np.max(np.abs(frfi[:2 * n])))
        if tmp32 > 13573:
            shift += 1
            scale += 1
            round2 <<= 1
        if tmp32 > 27146:
            shift += 1
            scale += 1
            round2 <<= 1
        istep = l << 1
        for m in range(l):
            j = m << k
            wr = int(_SIN1024[j + 256])
            wi = int(_SIN1024[j])
            idx = np.arange(m, n, istep, np.int64)
            jdx = idx + l
            tr32 = (wr * frfi[2 * jdx] - wi * frfi[2 * jdx + 1] +
                    CIFFTRND) >> (15 - CIFFTSFT)
            ti32 = (wr * frfi[2 * jdx + 1] + wi * frfi[2 * jdx] +
                    CIFFTRND) >> (15 - CIFFTSFT)
            qr32 = frfi[2 * idx] << CIFFTSFT
            qi32 = frfi[2 * idx + 1] << CIFFTSFT
            frfi[2 * jdx] = _w16a((qr32 - tr32 + round2) >>
                                  (shift + CIFFTSFT))
            frfi[2 * jdx + 1] = _w16a((qi32 - ti32 + round2) >>
                                      (shift + CIFFTSFT))
            frfi[2 * idx] = _w16a((qr32 + tr32 + round2) >>
                                  (shift + CIFFTSFT))
            frfi[2 * idx + 1] = _w16a((qi32 + ti32 + round2) >>
                                      (shift + CIFFTSFT))
        k -= 1
        l = istep
    return scale


def _w16a(a: np.ndarray) -> np.ndarray:
    """(int16_t) cast, elementwise, staying in int64."""
    return ((a + 0x8000) & 0xFFFF) - 0x8000


def real_forward_fft(real_in: np.ndarray, order: int = 7) -> tuple:
    """WebRtcSpl_RealForwardFFT: returns int64[n+2] of interleaved
    re/im (the first n+2 words of the complex output)."""
    n = 1 << order
    buf = np.zeros(2 * n, np.int64)
    buf[0::2] = real_in
    c = buf.reshape(-1, 2)[_PERMS[order]].reshape(-1).copy()
    complex_fft_mode1(c, order)
    return c[:n + 2]


def real_inverse_fft(complex_in: np.ndarray, order: int = 7) -> tuple:
    """WebRtcSpl_RealInverseFFT: complex_in int64[n+2] interleaved;
    returns (real_out int64[n], scale)."""
    n = 1 << order
    buf = np.zeros(2 * n, np.int64)
    buf[:n + 2] = complex_in
    for i in range(n + 2, 2 * n, 2):
        buf[i] = complex_in[2 * n - i]
        buf[i + 1] = -complex_in[2 * n - i + 1]
    c = buf.reshape(-1, 2)[_PERMS[order]].reshape(-1).copy()
    scale = complex_ifft_mode1(c, order)
    return c[0::2][:n].copy(), scale


# --------------------------------------------------------------------------
# binary delay estimator (delay_estimator*.c, robust validation off)
# --------------------------------------------------------------------------

class DelayEstimator:
    def __init__(self, history_size: int = MAX_DELAY):
        self.history_size = history_size
        self.reset()

    def reset(self):
        self.far_history = np.zeros(self.history_size, np.int64)  # u32
        self.far_bit_counts = np.zeros(self.history_size, np.int64)
        self.mean_far = np.zeros(PART_LEN1, np.int64)
        self.far_init = 0
        self.mean_near = np.zeros(PART_LEN1, np.int64)
        self.near_init = 0
        self.mean_bit_counts = np.full(self.history_size + 1,
                                       20 << 9, np.int64)  # 20 in Q9
        self.bit_counts = np.zeros(self.history_size, np.int64)
        self.minimum_probability = K_MAX_BIT_COUNTS_Q9
        self.last_delay_probability = K_MAX_BIT_COUNTS_Q9
        self.last_delay = -2
        self.compare_delay = self.history_size

    @staticmethod
    def _binary_spectrum(spectrum, mean, init_flag, q_domain):
        out = 0
        if not init_flag[0]:
            for i in range(K_BAND_FIRST, K_BAND_LAST + 1):
                if spectrum[i] > 0:
                    sq15 = int(spectrum[i]) << (15 - q_domain)
                    mean[i] = sq15 >> 1
                    init_flag[0] = 1
        for i in range(K_BAND_FIRST, K_BAND_LAST + 1):
            sq15 = int(spectrum[i]) << (15 - q_domain)
            # WebRtc_MeanEstimatorFix(sq15, 6, &mean[i])
            diff = sq15 - int(mean[i])
            diff = -((-diff) >> 6) if diff < 0 else diff >> 6
            mean[i] = int(mean[i]) + diff
            if sq15 > mean[i]:
                out |= 1 << (i - K_BAND_FIRST)
        return out

    def add_far(self, far_spectrum, far_q):
        flag = [self.far_init]
        b = self._binary_spectrum(far_spectrum, self.mean_far, flag,
                                  far_q)
        self.far_init = flag[0]
        self.far_history[1:] = self.far_history[:-1]
        self.far_history[0] = b
        self.far_bit_counts[1:] = self.far_bit_counts[:-1]
        self.far_bit_counts[0] = bin(b).count("1")

    def process_near(self, near_spectrum, near_q) -> int:
        flag = [self.near_init]
        b = self._binary_spectrum(near_spectrum, self.mean_near, flag,
                                  near_q)
        self.near_init = flag[0]

        # BitCountComparison
        x = np.bitwise_xor(self.far_history, b)
        self.bit_counts = np.array(
            [bin(int(v)).count("1") for v in x], np.int64)

        for i in range(self.history_size):
            bit_count = int(self.bit_counts[i]) << 9
            if self.far_bit_counts[i] > 0:
                shifts = K_SHIFTS_AT_ZERO
                shifts -= (K_SHIFTS_LINEAR_SLOPE *
                           int(self.far_bit_counts[i])) >> 4
                diff = bit_count - int(self.mean_bit_counts[i])
                diff = -((-diff) >> shifts) if diff < 0 \
                    else diff >> shifts
                self.mean_bit_counts[i] += diff

        candidate_delay = -1
        value_best = K_MAX_BIT_COUNTS_Q9
        value_worst = 0
        for i in range(self.history_size):
            if self.mean_bit_counts[i] < value_best:
                value_best = int(self.mean_bit_counts[i])
                candidate_delay = i
            if self.mean_bit_counts[i] > value_worst:
                value_worst = int(self.mean_bit_counts[i])
        valley_depth = value_worst - value_best

        if (self.minimum_probability > K_PROBABILITY_LOWER_LIMIT and
                valley_depth > K_PROBABILITY_MIN_SPREAD):
            threshold = value_best + K_PROBABILITY_OFFSET
            if threshold < K_PROBABILITY_LOWER_LIMIT:
                threshold = K_PROBABILITY_LOWER_LIMIT
            if self.minimum_probability > threshold:
                self.minimum_probability = threshold
        self.last_delay_probability += 1
        valid = (valley_depth > K_PROBABILITY_OFFSET and
                 (value_best < self.minimum_probability or
                  value_best < self.last_delay_probability))
        if valid:
            self.last_delay = candidate_delay
            if value_best < self.last_delay_probability:
                self.last_delay_probability = value_best
            self.compare_delay = self.last_delay
        return self.last_delay


# --------------------------------------------------------------------------
# AECM core (aecm_core.c / aecm_core_c.c)
# --------------------------------------------------------------------------

K_CHANNEL_STORED_8K = np.array([
    2040, 1815, 1590, 1498, 1405, 1395, 1385, 1418, 1451, 1506, 1562,
    1644, 1726, 1804, 1882, 1918, 1953, 1982, 2010, 2025, 2040, 2034,
    2027, 2021, 2014, 1997, 1980, 1925, 1869, 1800, 1732, 1683, 1635,
    1604, 1572, 1545, 1517, 1481, 1444, 1405, 1367, 1331, 1294, 1270,
    1245, 1239, 1233, 1247, 1260, 1282, 1303, 1338, 1373, 1407, 1441,
    1470, 1499, 1524, 1549, 1565, 1582, 1601, 1621, 1649, 1676],
    np.int64)

K_CHANNEL_STORED_16K = np.array([
    2040, 1590, 1405, 1385, 1451, 1562, 1726, 1882, 1953, 2010, 2040,
    2027, 2014, 1980, 1869, 1732, 1635, 1572, 1517, 1444, 1367, 1294,
    1245, 1233, 1260, 1303, 1373, 1441, 1499, 1549, 1582, 1621, 1676,
    1741, 1802, 1861, 1921, 1983, 2040, 2102, 2170, 2265, 2375, 2515,
    2651, 2781, 2922, 3075, 3253, 3471, 3738, 3976, 4151, 4258, 4308,
    4288, 4270, 4253, 4237, 4179, 4086, 3947, 3757, 3484, 3153],
    np.int64)


K_SQRT_HANNING = AECM_SQRT_HANNING
K_COS_TABLE = AECM_COS_TABLE
K_SIN_TABLE = AECM_SIN_TABLE


class AecmCore:
    def __init__(self):
        self.delay_est = DelayEstimator(MAX_DELAY)

    def init(self, samp_freq: int):
        self.mult = samp_freq // 8000
        self.samp_freq = samp_freq
        self.far_buf_write_pos = 0
        self.far_buf_read_pos = 0
        self.known_delay = 0
        self.last_known_delay = 0
        self.far_frame_q = []   # FIFO of int16 samples (FRAME_LEN+PART_LEN)
        self.near_noisy_q = []
        # outFrameBuf is a real ring_buffer: stuffing via MoveReadPtr(-n)
        # re-exposes previously READ samples (zeros only initially)
        self.out_ring = _Ring(FRAME_LEN + PART_LEN)
        self.x_buf = np.zeros(PART_LEN2, np.int64)
        self.d_buf_noisy = np.zeros(PART_LEN2, np.int64)
        self.out_buf = np.zeros(PART_LEN, np.int64)
        self.seed = 666
        self.tot_count = 0
        self.delay_est.reset()
        self.far_history = np.zeros((MAX_DELAY, PART_LEN1), np.int64)
        self.far_q_domains = np.zeros(MAX_DELAY, np.int64)
        self.far_history_pos = MAX_DELAY
        self.nlp_flag = 1
        self.fixed_delay = -1
        self.dfa_clean_q = 0
        self.dfa_clean_q_old = 0
        self.dfa_noisy_q = 0
        self.dfa_noisy_q_old = 0
        self.near_log_energy = np.zeros(MAX_BUF_LEN, np.int64)
        self.far_log_energy = 0
        self.echo_adapt_log_energy = np.zeros(MAX_BUF_LEN, np.int64)
        self.echo_stored_log_energy = np.zeros(MAX_BUF_LEN, np.int64)
        stored = K_CHANNEL_STORED_8K if samp_freq == 8000 \
            else K_CHANNEL_STORED_16K
        self.channel_stored = stored.copy()
        self.channel_adapt16 = stored.copy()
        self.channel_adapt32 = stored.astype(np.int64) << 16
        self.mse_adapt_old = 1000
        self.mse_stored_old = 1000
        self.mse_threshold = I32_MAX
        self.mse_channel_count = 0
        self.echo_filt = np.zeros(PART_LEN1, np.int64)
        self.near_filt = np.zeros(PART_LEN1, np.int64)
        self.noise_est_ctr = 0
        self.cng_mode = True
        self.noise_est_too_low = np.zeros(PART_LEN1, np.int64)
        self.noise_est_too_high = np.zeros(PART_LEN1, np.int64)
        self.noise_est = np.zeros(PART_LEN1, np.int64)
        tmp32 = PART_LEN1 * PART_LEN1
        tmp16 = PART_LEN1
        for i in range((PART_LEN1 >> 1) - 1):
            self.noise_est[i] = tmp32 << 8
            tmp16 -= 1
            tmp32 -= (tmp16 << 1) + 1
        for i in range((PART_LEN1 >> 1) - 1, PART_LEN1):
            self.noise_est[i] = tmp32 << 8
        self.far_energy_min = I16_MAX
        self.far_energy_max = I16_MIN
        self.far_energy_max_min = 0
        self.far_energy_vad = FAR_ENERGY_MIN
        self.far_energy_mse = 0
        self.current_vad_value = 0
        self.vad_update_count = 0
        self.first_vad = 1
        self.startup_state = 0
        self.sup_gain = SUPGAIN_DEFAULT
        self.sup_gain_old = SUPGAIN_DEFAULT
        self.far_buf = np.zeros(FAR_BUF_LEN, np.int64)

    # -- far frame delay buffer (BufferFarFrame / FetchFarFrame) --
    def buffer_far_frame(self, farend):
        write_len = len(farend)
        write_pos = 0
        while self.far_buf_write_pos + write_len > FAR_BUF_LEN:
            n = FAR_BUF_LEN - self.far_buf_write_pos
            self.far_buf[self.far_buf_write_pos:] = \
                farend[write_pos:write_pos + n]
            self.far_buf_write_pos = 0
            write_pos = n
            write_len = len(farend) - n
        self.far_buf[self.far_buf_write_pos:
                     self.far_buf_write_pos + write_len] = \
            farend[write_pos:write_pos + write_len]
        self.far_buf_write_pos += write_len

    def fetch_far_frame(self, far_len, known_delay):
        delay_change = known_delay - self.last_known_delay
        self.far_buf_read_pos -= delay_change
        while self.far_buf_read_pos < 0:
            self.far_buf_read_pos += FAR_BUF_LEN
        while self.far_buf_read_pos > FAR_BUF_LEN - 1:
            self.far_buf_read_pos -= FAR_BUF_LEN
        self.last_known_delay = known_delay
        out = np.empty(far_len, np.int64)
        read_len = far_len
        read_pos = 0
        while self.far_buf_read_pos + read_len > FAR_BUF_LEN:
            n = FAR_BUF_LEN - self.far_buf_read_pos
            out[read_pos:read_pos + n] = self.far_buf[self.far_buf_read_pos:]
            self.far_buf_read_pos = 0
            read_pos += n
            read_len -= n
        out[read_pos:] = self.far_buf[self.far_buf_read_pos:
                                      self.far_buf_read_pos + read_len]
        self.far_buf_read_pos += read_len
        return out

    def update_far_history(self, far_spectrum, far_q):
        self.far_history_pos += 1
        if self.far_history_pos >= MAX_DELAY:
            self.far_history_pos = 0
        self.far_q_domains[self.far_history_pos] = far_q
        self.far_history[self.far_history_pos] = far_spectrum

    def aligned_farend(self, delay):
        pos = self.far_history_pos - delay
        if pos < 0:
            pos += MAX_DELAY
        return self.far_history[pos], int(self.far_q_domains[pos])

    # -- frame / block processing --
    def process_frame(self, farend, near_noisy, out):
        self.buffer_far_frame(farend)
        far_frame = self.fetch_far_frame(FRAME_LEN, self.known_delay)
        self.far_frame_q.extend(far_frame.tolist())
        self.near_noisy_q.extend(int(v) for v in near_noisy)
        while len(self.far_frame_q) >= PART_LEN:
            far_block = np.array(self.far_frame_q[:PART_LEN], np.int64)
            del self.far_frame_q[:PART_LEN]
            near_block = np.array(self.near_noisy_q[:PART_LEN], np.int64)
            del self.near_noisy_q[:PART_LEN]
            out_block = self.process_block(far_block, near_block)
            self.out_ring.write(out_block.astype(np.float32))
        size = self.out_ring.available_read()
        if size < FRAME_LEN:
            self.out_ring.move_read(size - FRAME_LEN)
        out[:] = self.out_ring.read(FRAME_LEN).astype(np.int64)

    def _time_to_freq(self, time_signal):
        """TimeToFrequencyDomain: returns (freq re/im int64[PART_LEN1,2],
        abs u16[PART_LEN1], sum_abs, q)."""
        tmp = int(np.max(np.abs(time_signal))) if len(time_signal) else 0
        scaling = norm_w16(tmp) if tmp else 0
        # WindowAndFFT
        fft = np.zeros(PART_LEN2, np.int64)
        st = _w16a(time_signal[:PART_LEN] << scaling)
        fft[:PART_LEN] = _w16a((st * K_SQRT_HANNING[:PART_LEN]) >> 14)
        st2 = _w16a(time_signal[PART_LEN:] << scaling)
        fft[PART_LEN:] = _w16a(
            (st2 * K_SQRT_HANNING[PART_LEN:0:-1]) >> 14)
        cplx = real_forward_fft(fft)
        re = cplx[0::2].copy()
        im = -cplx[1::2]
        im[0] = 0
        im[PART_LEN] = 0
        absval = np.zeros(PART_LEN1, np.int64)
        absval[0] = abs(int(re[0]))
        absval[PART_LEN] = abs(int(re[PART_LEN]))
        s = absval[0] + absval[PART_LEN]
        for i in range(1, PART_LEN):
            if re[i] == 0:
                absval[i] = abs(int(im[i]))
            elif im[i] == 0:
                absval[i] = abs(int(re[i]))
            else:
                t = add_sat_w32(int(re[i]) * int(re[i]),
                                int(im[i]) * int(im[i]))
                absval[i] = sqrt_floor(t)
            s += int(absval[i])
        return re, im, absval, u32(s), scaling

    def _log_of_energy_q8(self, energy, q_domain):
        log_energy = PART_LEN_SHIFT << 7
        energy = u32(energy)
        if energy > 0:
            zeros = norm_u32(energy)
            frac = ((u32(energy << zeros) & 0x7FFFFFFF) >> 23)
            log_energy += ((31 - zeros) << 8) + frac - (q_domain << 8)
        return w16(log_energy)

    def calc_energies(self, far_spectrum, far_q, near_ener):
        echo_est = np.zeros(PART_LEN1, np.int64)
        self.near_log_energy[1:] = self.near_log_energy[:-1]
        self.near_log_energy[0] = self._log_of_energy_q8(
            near_ener, self.dfa_noisy_q)

        echo_est[:] = _mulw16u16(self.channel_stored, far_spectrum)
        tmp_far = u32(int(np.sum(far_spectrum)))
        tmp_adapt = u32(int(np.sum(self.channel_adapt16 * far_spectrum)))
        tmp_stored = u32(int(np.sum(np.where(echo_est < 0,
                                             echo_est + (1 << 32),
                                             echo_est))))

        self.echo_adapt_log_energy[1:] = self.echo_adapt_log_energy[:-1]
        self.echo_stored_log_energy[1:] = \
            self.echo_stored_log_energy[:-1]
        self.far_log_energy = self._log_of_energy_q8(tmp_far, far_q)
        self.echo_adapt_log_energy[0] = self._log_of_energy_q8(
            tmp_adapt, RESOLUTION_CHANNEL16 + far_q)
        self.echo_stored_log_energy[0] = self._log_of_energy_q8(
            tmp_stored, RESOLUTION_CHANNEL16 + far_q)

        increase_max_shifts = 4
        decrease_max_shifts = 11
        increase_min_shifts = 11
        decrease_min_shifts = 3
        if self.far_log_energy > FAR_ENERGY_MIN:
            if self.startup_state == 0:
                increase_max_shifts = 2
                decrease_min_shifts = 2
                increase_min_shifts = 8
            self.far_energy_min = _asym_filt(
                self.far_energy_min, self.far_log_energy,
                increase_min_shifts, decrease_min_shifts)
            self.far_energy_max = _asym_filt(
                self.far_energy_max, self.far_log_energy,
                increase_max_shifts, decrease_max_shifts)
            self.far_energy_max_min = w16(self.far_energy_max -
                                          self.far_energy_min)
            tmp16 = 2560 - self.far_energy_min
            if tmp16 > 0:
                tmp16 = w16((tmp16 * FAR_ENERGY_VAD_REGION) >> 9)
            else:
                tmp16 = 0
            tmp16 += FAR_ENERGY_VAD_REGION
            if self.startup_state == 0 or self.vad_update_count > 1024:
                self.far_energy_vad = self.far_energy_min + tmp16
            else:
                if self.far_energy_vad > self.far_log_energy:
                    self.far_energy_vad += (
                        self.far_log_energy + tmp16 -
                        self.far_energy_vad) >> 6
                    self.vad_update_count = 0
                else:
                    self.vad_update_count += 1
            self.far_energy_mse = self.far_energy_vad + (1 << 8)

        if self.far_log_energy > self.far_energy_vad:
            if (self.startup_state == 0 or
                    self.far_energy_max_min > FAR_ENERGY_DIFF):
                self.current_vad_value = 1
        else:
            self.current_vad_value = 0
        if self.current_vad_value and self.first_vad:
            self.first_vad = 0
            if self.echo_adapt_log_energy[0] > self.near_log_energy[0]:
                self.channel_adapt16 >>= 3
                self.echo_adapt_log_energy[0] -= (3 << 8)
                self.first_vad = 1
        return echo_est

    def calc_step_size(self):
        mu = MU_MAX
        if not self.current_vad_value:
            mu = 0
        elif self.startup_state > 0:
            if self.far_energy_min >= self.far_energy_max:
                mu = MU_MIN
            else:
                tmp16 = w16(self.far_log_energy - self.far_energy_min)
                tmp32 = tmp16 * MU_DIFF
                tmp32 = div_w32_w16(tmp32, self.far_energy_max_min)
                mu = MU_MIN - 1 - w16(tmp32)
                if mu < MU_MAX:
                    mu = MU_MAX
        return mu

    def update_channel(self, far_spectrum, far_q, dfa, mu, echo_est):
        if mu:
            for i in range(PART_LEN1):
                ch32 = int(self.channel_adapt32[i])
                far_i = int(far_spectrum[i])
                zeros_ch = norm_u32(ch32)
                zeros_far = norm_u32(far_i)
                if zeros_ch + zeros_far > 31:
                    tmp_u32_1 = u32(ch32 * far_i)
                    shift_ch_far = 0
                else:
                    shift_ch_far = 32 - zeros_ch - zeros_far
                    tmp_u32_1 = u32((ch32 >> shift_ch_far) * far_i)
                zeros_num = norm_u32(tmp_u32_1)
                zeros_dfa = norm_u32(int(dfa[i])) if dfa[i] else 32
                tmp16no1 = (zeros_dfa - 2 + self.dfa_noisy_q -
                            RESOLUTION_CHANNEL32 - far_q + shift_ch_far)
                if zeros_num > tmp16no1 + 1:
                    xfa_q = tmp16no1
                    dfa_q = zeros_dfa - 2
                else:
                    xfa_q = zeros_num - 2
                    dfa_q = (RESOLUTION_CHANNEL32 + far_q -
                             self.dfa_noisy_q - shift_ch_far + xfa_q)
                tmp_u32_1 = u32(shift_w32(tmp_u32_1, xfa_q))
                tmp_u32_2 = u32(shift_w32(int(dfa[i]), dfa_q))
                tmp32no1 = w32(tmp_u32_2 - tmp_u32_1)
                zeros_num = norm_w32(tmp32no1)
                if tmp32no1 and far_i > (CHANNEL_VAD << far_q):
                    if zeros_num + zeros_far > 31:
                        if tmp32no1 > 0:
                            tmp32no2 = w32(u32(tmp32no1 * far_i))
                        else:
                            tmp32no2 = -w32(u32((-tmp32no1) * far_i))
                        shift_num = 0
                    else:
                        shift_num = 32 - (zeros_num + zeros_far)
                        if tmp32no1 > 0:
                            tmp32no2 = (tmp32no1 >> shift_num) * far_i
                        else:
                            tmp32no2 = -((-tmp32no1 >> shift_num) *
                                         far_i)
                    tmp32no2 = div_w32_w16(tmp32no2, i + 1)
                    shift2 = (shift_num + shift_ch_far - xfa_q - mu -
                              ((30 - zeros_far) << 1))
                    if norm_w32(tmp32no2) < shift2:
                        tmp32no2 = I32_MAX
                    else:
                        tmp32no2 = shift_w32(tmp32no2, shift2)
                    ch32 = add_sat_w32(ch32, tmp32no2)
                    if ch32 < 0:
                        ch32 = 0
                    self.channel_adapt32[i] = ch32
                    self.channel_adapt16[i] = ch32 >> 16

        if self.startup_state == 0 and self.current_vad_value:
            self._store_adaptive_channel(far_spectrum, echo_est)
        else:
            if self.far_log_energy < self.far_energy_mse:
                self.mse_channel_count = 0
            else:
                self.mse_channel_count += 1
            if self.mse_channel_count >= MIN_MSE_COUNT + 10:
                mse_stored = 0
                mse_adapt = 0
                for i in range(MIN_MSE_COUNT):
                    mse_stored += abs(
                        int(self.echo_stored_log_energy[i]) -
                        int(self.near_log_energy[i]))
                    mse_adapt += abs(
                        int(self.echo_adapt_log_energy[i]) -
                        int(self.near_log_energy[i]))
                if ((mse_stored << MSE_RESOLUTION) <
                        MIN_MSE_DIFF * mse_adapt and
                        (self.mse_stored_old << MSE_RESOLUTION) <
                        MIN_MSE_DIFF * self.mse_adapt_old):
                    self.channel_adapt16 = self.channel_stored.copy()
                    self.channel_adapt32 = \
                        self.channel_stored.astype(np.int64) << 16
                elif ((MIN_MSE_DIFF * mse_stored) >
                      (mse_adapt << MSE_RESOLUTION) and
                      mse_adapt < self.mse_threshold and
                      self.mse_adapt_old < self.mse_threshold):
                    self._store_adaptive_channel(far_spectrum, echo_est)
                    if self.mse_threshold == I32_MAX:
                        self.mse_threshold = mse_adapt + \
                            self.mse_adapt_old
                    else:
                        scaled = self.mse_threshold * 5 // 8
                        self.mse_threshold += \
                            ((mse_adapt - scaled) * 205) >> 8
                self.mse_channel_count = 0
                self.mse_stored_old = mse_stored
                self.mse_adapt_old = mse_adapt

    def _store_adaptive_channel(self, far_spectrum, echo_est):
        self.channel_stored = self.channel_adapt16.copy()
        echo_est[:] = _mulw16u16(self.channel_stored, far_spectrum)

    def calc_suppression_gain(self):
        sup_gain = SUPGAIN_DEFAULT
        if not self.current_vad_value:
            sup_gain = 0
        else:
            tmp16no1 = w16(int(self.near_log_energy[0]) -
                           int(self.echo_stored_log_energy[0]) -
                           ENERGY_DEV_OFFSET)
            dE = abs(tmp16no1)
            if dE < ENERGY_DEV_TOL:
                if dE < SUPGAIN_EPC_DT:
                    tmp32no1 = (SUPGAIN_ERROR_PARAM_A -
                                SUPGAIN_ERROR_PARAM_B) * dE
                    tmp32no1 += SUPGAIN_EPC_DT >> 1
                    tmp16no1 = w16(div_w32_w16(tmp32no1, SUPGAIN_EPC_DT))
                    sup_gain = SUPGAIN_ERROR_PARAM_A - tmp16no1
                else:
                    tmp32no1 = (SUPGAIN_ERROR_PARAM_B -
                                SUPGAIN_ERROR_PARAM_D) * \
                        (ENERGY_DEV_TOL - dE)
                    tmp32no1 += (ENERGY_DEV_TOL - SUPGAIN_EPC_DT) >> 1
                    tmp16no1 = w16(div_w32_w16(
                        tmp32no1, ENERGY_DEV_TOL - SUPGAIN_EPC_DT))
                    sup_gain = SUPGAIN_ERROR_PARAM_D + tmp16no1
            else:
                sup_gain = SUPGAIN_ERROR_PARAM_D

        tmp16no1 = sup_gain if sup_gain > self.sup_gain_old \
            else self.sup_gain_old
        self.sup_gain_old = sup_gain
        self.sup_gain += w16((tmp16no1 - self.sup_gain) >> 4)
        return self.sup_gain

    def process_block(self, farend, near_noisy):
        if self.startup_state < 2:
            self.startup_state = int(self.tot_count >= CONV_LEN) + \
                int(self.tot_count >= CONV_LEN2)

        self.x_buf[PART_LEN:] = farend
        self.d_buf_noisy[PART_LEN:] = near_noisy

        xre, xim, xfa, xfa_sum, far_q = self._time_to_freq(self.x_buf)
        dre, dim, dfa_noisy, dfa_noisy_sum, zeros_d = \
            self._time_to_freq(self.d_buf_noisy)
        self.dfa_noisy_q_old = self.dfa_noisy_q
        self.dfa_noisy_q = zeros_d
        ptr_dfa = dfa_noisy
        self.dfa_clean_q_old = self.dfa_noisy_q_old
        self.dfa_clean_q = self.dfa_noisy_q
        dfw_re, dfw_im = dre, dim

        self.update_far_history(xfa, far_q)
        self.delay_est.add_far(xfa, far_q)
        delay = self.delay_est.process_near(dfa_noisy, zeros_d)
        if delay == -2:
            delay = 0
        if self.fixed_delay >= 0:
            delay = self.fixed_delay

        far_spectrum, far_q = self.aligned_farend(delay)
        zeros_x_buf = far_q

        echo_est = self.calc_energies(far_spectrum, zeros_x_buf,
                                      dfa_noisy_sum)
        mu = self.calc_step_size()
        self.tot_count += 1
        self.update_channel(far_spectrum, zeros_x_buf, dfa_noisy, mu,
                            echo_est)
        sup_gain = self.calc_suppression_gain()

        hnl = np.zeros(PART_LEN1, np.int64)
        num_pos_coef = 0
        for i in range(PART_LEN1):
            # aecm_core_c.c:455-456 — BOTH the subtraction and the *50
            # product are int32 ops that wrap on loud echo estimates
            # (|diff| > 2^31/50 ~ 42.9M); reproducing the wrap is what
            # keeps long tonal scenes bit-exact (PARITY_r04 int-chain
            # divergence root cause)
            tmp32no1 = w32(int(echo_est[i]) - int(self.echo_filt[i]))
            self.echo_filt[i] = w32(int(self.echo_filt[i]) +
                                    (w32(tmp32no1 * 50) >> 8))
            zeros32 = norm_w32(int(self.echo_filt[i])) + 1
            zeros16 = norm_w16(sup_gain) + 1
            if zeros32 + zeros16 > 16:
                echo_est_gained = u32(u32(self.echo_filt[i]) *
                                      (sup_gain & 0xFFFF))
                resolution_diff = 14 - RESOLUTION_CHANNEL16 - \
                    RESOLUTION_SUPGAIN
                resolution_diff += self.dfa_clean_q - zeros_x_buf
            else:
                tmp16no1 = 17 - zeros32 - zeros16
                resolution_diff = (14 + tmp16no1 - RESOLUTION_CHANNEL16 -
                                   RESOLUTION_SUPGAIN)
                resolution_diff += self.dfa_clean_q - zeros_x_buf
                if zeros32 > tmp16no1:
                    echo_est_gained = u32(u32(self.echo_filt[i]) *
                                          (sup_gain >> tmp16no1))
                else:
                    echo_est_gained = u32(
                        (int(self.echo_filt[i]) >> tmp16no1) * sup_gain)

            zeros16 = norm_w16(int(self.near_filt[i]))
            dfa_diff = self.dfa_clean_q - self.dfa_clean_q_old
            if zeros16 < dfa_diff and self.near_filt[i]:
                tmp16no1 = w16(int(self.near_filt[i]) << zeros16)
                q_diff = zeros16 - dfa_diff
                tmp16no2 = int(ptr_dfa[i]) >> -q_diff
            else:
                tmp16no1 = (int(self.near_filt[i]) >> -dfa_diff
                            if dfa_diff < 0
                            else w16(int(self.near_filt[i]) << dfa_diff))
                q_diff = 0
                tmp16no2 = int(ptr_dfa[i])
            tmp32no1 = tmp16no2 - tmp16no1
            tmp16no2 = w16(tmp32no1 >> 4)
            # int16 += in C: the smoothing add WRAPS (aecm_core_c.c:503)
            tmp16no2 = w16(tmp16no2 + tmp16no1)
            zeros16 = norm_w16(tmp16no2)
            # upstream quirk (aecm_core_c.c:505): BITWISE & between the
            # int16 value and the bool — saturation fires only when
            # tmp16no2 is ODD and the shift would overflow
            if (tmp16no2 & 1) and (-q_diff > zeros16):
                self.near_filt[i] = I16_MAX
            else:
                self.near_filt[i] = (w16(tmp16no2 << -q_diff)
                                     if q_diff < 0
                                     else tmp16no2 >> q_diff)

            if echo_est_gained == 0:
                hnl[i] = ONE_Q14
            elif self.near_filt[i] == 0:
                hnl[i] = 0
            else:
                echo_est_gained = u32(echo_est_gained +
                                      (int(self.near_filt[i]) >> 1))
                tmp_u32 = div_u32_u16(echo_est_gained,
                                      int(self.near_filt[i]))
                tmp32no1 = w32(shift_w32(w32(tmp_u32), resolution_diff))
                if tmp32no1 > ONE_Q14:
                    hnl[i] = 0
                elif tmp32no1 < 0:
                    hnl[i] = ONE_Q14
                else:
                    hnl[i] = ONE_Q14 - tmp32no1
                    if hnl[i] < 0:
                        hnl[i] = 0
            if hnl[i]:
                num_pos_coef += 1

        if self.mult == 2:
            hnl = (hnl * hnl) >> 14
            avg = int(np.sum(hnl[4:25])) // 21
            hnl[24:] = np.minimum(hnl[24:], avg)  # clamp FROM kMaxPrefBand

        efw_re = np.zeros(PART_LEN1, np.int64)
        efw_im = np.zeros(PART_LEN1, np.int64)
        if self.nlp_flag:
            for i in range(PART_LEN1):
                if hnl[i] > NLP_COMP_HIGH:
                    hnl[i] = ONE_Q14
                elif hnl[i] < NLP_COMP_LOW:
                    hnl[i] = 0
                nlp_gain = 0 if num_pos_coef < 3 else ONE_Q14
                if not (hnl[i] == ONE_Q14 and nlp_gain == ONE_Q14):
                    hnl[i] = (int(hnl[i]) * nlp_gain) >> 14
                efw_re[i] = w16((int(dfw_re[i]) * int(hnl[i]) +
                                 (1 << 13)) >> 14)
                efw_im[i] = w16((int(dfw_im[i]) * int(hnl[i]) +
                                 (1 << 13)) >> 14)
        else:
            efw_re = _w16a((dfw_re * hnl + (1 << 13)) >> 14)
            efw_im = _w16a((dfw_im * hnl + (1 << 13)) >> 14)

        if self.cng_mode:
            self._comfort_noise(ptr_dfa, efw_re, efw_im, hnl)

        return self._inverse_fft_and_window(efw_re, efw_im)

    def _comfort_noise(self, dfa, out_re, out_im, lambda_):
        shift_from_near = K_NOISE_EST_Q_DOMAIN - self.dfa_clean_q
        if self.noise_est_ctr < 100:
            self.noise_est_ctr += 1
            min_track_shift = 6
        else:
            min_track_shift = 9

        for i in range(PART_LEN1):
            out_l = int(dfa[i]) << shift_from_near
            ne = int(self.noise_est[i])
            if out_l < ne:
                self.noise_est_too_low[i] = 0
                if ne < (1 << min_track_shift):
                    self.noise_est_too_high[i] += 1
                    if self.noise_est_too_high[i] >= \
                            K_NOISE_EST_INC_COUNT:
                        self.noise_est[i] = ne - 1
                        self.noise_est_too_high[i] = 0
                else:
                    self.noise_est[i] = ne - ((ne - out_l) >>
                                              min_track_shift)
            else:
                self.noise_est_too_high[i] = 0
                if (ne >> 19) > 0:
                    ne >>= 11
                    ne = w32(ne * 2049)
                    self.noise_est[i] = ne
                elif (ne >> 11) > 0:
                    ne = w32(ne * 2049)
                    ne >>= 11
                    self.noise_est[i] = ne
                else:
                    self.noise_est_too_low[i] += 1
                    if self.noise_est_too_low[i] >= \
                            K_NOISE_EST_INC_COUNT:
                        self.noise_est[i] = ne + ((ne >> 9) + 1)
                        self.noise_est_too_low[i] = 0

        noise_r = np.zeros(PART_LEN1, np.int64)
        for i in range(PART_LEN1):
            tmp32 = int(self.noise_est[i]) >> shift_from_near
            if tmp32 > 32767:
                tmp32 = 32767
                self.noise_est[i] = tmp32 << shift_from_near
            noise_r[i] = tmp32
            tmp16 = ONE_Q14 - int(lambda_[i])
            noise_r[i] = w16((tmp16 * int(noise_r[i])) >> 14)

        rand_w16, self.seed = _rand_u_array(self.seed, PART_LEN)
        u_re = np.zeros(PART_LEN1, np.int64)
        u_im = np.zeros(PART_LEN1, np.int64)
        for i in range(1, PART_LEN1):
            tmp16 = (359 * int(rand_w16[i - 1])) >> 15
            u_re[i] = w16((int(noise_r[i]) * int(K_COS_TABLE[tmp16]))
                          >> 13)
            u_im[i] = w16((-int(noise_r[i]) * int(K_SIN_TABLE[tmp16]))
                          >> 13)
        u_im[PART_LEN] = 0

        for i in range(PART_LEN1):
            out_re[i] = add_sat_w16(int(out_re[i]), int(u_re[i]))
            out_im[i] = add_sat_w16(int(out_im[i]), int(u_im[i]))

    def _inverse_fft_and_window(self, efw_re, efw_im):
        fft = np.zeros(PART_LEN2 + 2, np.int64)
        fft[0] = efw_re[0]
        fft[1] = -efw_im[0]
        fft[2:PART_LEN2:2] = efw_re[1:PART_LEN]
        fft[3:PART_LEN2:2] = -efw_im[1:PART_LEN]
        fft[PART_LEN2] = efw_re[PART_LEN]
        fft[PART_LEN2 + 1] = -efw_im[PART_LEN]

        ifft_out, out_cfft = real_inverse_fft(fft)
        output = np.zeros(PART_LEN, np.int64)
        for i in range(PART_LEN):
            v = w16((int(ifft_out[i]) * int(K_SQRT_HANNING[i]) +
                     (1 << 13)) >> 14)
            tmp32no1 = shift_w32(v, out_cfft - self.dfa_clean_q)
            output[i] = max(I16_MIN,
                            min(I16_MAX,
                                tmp32no1 + int(self.out_buf[i])))
            tmp32no1 = (int(ifft_out[PART_LEN + i]) *
                        int(K_SQRT_HANNING[PART_LEN - i])) >> 14
            tmp32no1 = shift_w32(tmp32no1,
                                 out_cfft - self.dfa_clean_q)
            self.out_buf[i] = max(I16_MIN, min(I16_MAX, tmp32no1))

        self.x_buf[:PART_LEN] = self.x_buf[PART_LEN:]
        self.d_buf_noisy[:PART_LEN] = self.d_buf_noisy[PART_LEN:]
        return output


def _mulw16u16(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """WEBRTC_SPL_MUL_16_U16: int16 * uint16 -> int32 wrap."""
    r = (a.astype(np.int64) * (b.astype(np.int64) & 0xFFFF))
    return ((r + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def _asym_filt(filt_old, in_val, step_pos, step_neg):
    if filt_old in (I16_MAX, I16_MIN):
        return in_val
    ret = filt_old
    if filt_old > in_val:
        ret -= (filt_old - in_val) >> step_neg
    else:
        ret += (in_val - filt_old) >> step_pos
    return w16(ret)


# --------------------------------------------------------------------------
# mobile wrapper (echo_control_mobile.c)
# --------------------------------------------------------------------------

class AecMobile:
    """WebRtcAecm_{Create,Init,BufferFarend,Process}.

    Note: the reference Init clears only farendOld[0]
    (echo_control_mobile.c:204 memsets 160 BYTES over a 2x80 int16
    array), leaving farendOld[1] as malloc garbage that leaks into the
    far signal on buffer underrun at the second frame slot.  This port
    zeroes both slots (clearly the memset's intent); the parity tests
    clear the reference's slot 1 to compare against intended behavior.
    """

    def __init__(self, samp_freq: int):
        if samp_freq not in (8000, 16000):
            raise ValueError("AECM supports 8000/16000 only")
        self.core = AecmCore()
        self.core.init(samp_freq)
        self.samp_freq = samp_freq
        self.buf_size = BUF_SIZE_FRAMES * FRAME_LEN
        # a real ring_buffer: MoveReadPtr(-n) re-exposes previously READ
        # samples (echo_control_mobile.c farendBuf), not zeros
        self.farend_buf = _Ring(self.buf_size)
        self.init_flag = K_INIT_CHECK
        self.ec_startup = 1
        self.buf_size_start = 0
        self.check_buff_size = 1
        self.check_buf_size_ctr = 0
        self.filt_delay = 0
        self.first_val = 0
        self.counter = 0
        self.sum = 0
        self.known_delay = 0
        self.last_delay_diff = 0
        self.time_for_delay_change = 0
        self.ms_in_snd_card_buf = 0
        self.delay_change = 1
        self.far_end_old = np.zeros((2, FRAME_LEN), np.int64)

    def _move_read_ptr(self, n: int) -> int:
        """WebRtc_MoveReadPtr on farendBuf: positive skips data; negative
        re-exposes previously read samples (ring_buffer.c semantics)."""
        return self.farend_buf.move_read(n)

    def buffer_farend(self, farend: np.ndarray):
        if len(farend) not in (80, 160):
            raise ValueError("nrOfSamples must be 80/160")
        if not self.ec_startup:
            self._delay_comp()
        self.farend_buf.write(np.asarray(farend))  # drops overflow

    def _est_buf_delay(self):
        n_samp_far = self.farend_buf.available_read()
        n_samp_snd = self.ms_in_snd_card_buf * K_SAMP_MS_NB * \
            self.core.mult
        delay_new = n_samp_snd - n_samp_far
        if delay_new < FRAME_LEN:
            self._move_read_ptr(FRAME_LEN)
            delay_new += FRAME_LEN
        t = 8 * self.filt_delay + 2 * delay_new
        t = -((-t) // 10) if t < 0 else t // 10  # C division truncates
        self.filt_delay = max(0, w16(t))
        diff = self.filt_delay - self.known_delay
        if diff > 224:
            if self.last_delay_diff < 96:
                self.time_for_delay_change = 0
            else:
                self.time_for_delay_change += 1
        elif diff < 96 and self.known_delay > 0:
            if self.last_delay_diff > 224:
                self.time_for_delay_change = 0
            else:
                self.time_for_delay_change += 1
        else:
            self.time_for_delay_change = 0
        self.last_delay_diff = diff
        if self.time_for_delay_change > 25:
            self.known_delay = max(int(self.filt_delay) - 160, 0)
            self.core.known_delay = self.known_delay

    def _delay_comp(self):
        n_samp_far = self.farend_buf.available_read()
        n_samp_snd = self.ms_in_snd_card_buf * K_SAMP_MS_NB * \
            self.core.mult
        delay_new = n_samp_snd - n_samp_far
        if delay_new > FAR_BUF_LEN - FRAME_LEN * self.core.mult:
            n_add = max((n_samp_snd >> 1) - n_samp_far, FRAME_LEN)
            n_add = min(n_add, 10 * FRAME_LEN)
            self._move_read_ptr(-n_add)
            self.delay_change = 1

    def process(self, near_noisy: np.ndarray,
                ms_in_snd_card_buf: int) -> np.ndarray:
        n = len(near_noisy)
        if n not in (80, 160):
            raise ValueError("nrOfSamples must be 80/160")
        ms = max(0, min(500, ms_in_snd_card_buf)) + 10
        self.ms_in_snd_card_buf = ms
        n_frames = n // FRAME_LEN
        n_blocks_10ms = n_frames // self.core.mult
        out = np.zeros(n, np.int64)

        if self.ec_startup:
            out[:] = near_noisy
            n_filled = self.farend_buf.available_read() // FRAME_LEN
            if self.check_buff_size:
                self.check_buf_size_ctr += 1
                if self.counter == 0:
                    self.first_val = self.ms_in_snd_card_buf
                    self.sum = 0
                if abs(self.first_val - self.ms_in_snd_card_buf) < \
                        max(0.2 * self.ms_in_snd_card_buf, K_SAMP_MS_NB):
                    self.sum += self.ms_in_snd_card_buf
                    self.counter += 1
                else:
                    self.counter = 0
                if self.counter * n_blocks_10ms >= 6:
                    self.buf_size_start = min(
                        (3 * self.sum * self.core.mult) //
                        (self.counter * 40), BUF_SIZE_FRAMES)
                    self.check_buff_size = 0
                if self.check_buf_size_ctr * n_blocks_10ms > 50:
                    self.buf_size_start = min(
                        (3 * self.ms_in_snd_card_buf *
                         self.core.mult) // 40, BUF_SIZE_FRAMES)
                    self.check_buff_size = 0
            if not self.check_buff_size:
                if n_filled == self.buf_size_start:
                    self.ec_startup = 0
                elif n_filled > self.buf_size_start:
                    self._move_read_ptr(
                        self.farend_buf.available_read() -
                        self.buf_size_start * FRAME_LEN)
                    self.ec_startup = 0
        else:
            for i in range(n_frames):
                n_filled = self.farend_buf.available_read() // FRAME_LEN
                if n_filled > 0:
                    farend = self.farend_buf.read(FRAME_LEN) \
                        .astype(np.int64)
                    self.far_end_old[i] = farend
                else:
                    farend = self.far_end_old[i].copy()
                if (i == 0 and self.samp_freq == 8000) or \
                        (i == 1 and self.samp_freq == 16000):
                    self._est_buf_delay()
                frame_out = np.zeros(FRAME_LEN, np.int64)
                self.core.process_frame(farend,
                                        near_noisy[i * FRAME_LEN:
                                                   (i + 1) * FRAME_LEN],
                                        frame_out)
                out[i * FRAME_LEN:(i + 1) * FRAME_LEN] = frame_out
        return out


# --------------------------------------------------------------------------
# daemon wrapper (src/webrtc.c aec_* with MAKE_WEBRTC_AEC undefined)
# --------------------------------------------------------------------------

class AecmProcessor:
    """aec_init/aec_process2 with the AECM branch: left channel only,
    output duplicated to all channels."""

    def __init__(self, chn: int, freq: int, interval_ms: int):
        if freq > 16000 or freq % 8000 != 0:
            raise ValueError("freq must be 8000/16000")
        self.chn = chn
        self.freq = freq
        if freq <= 8000:
            self.interval_ms = 20 if interval_ms % 20 == 0 else 10
        else:
            self.interval_ms = 10
        self.pkg_frame = freq // 1000 * self.interval_ms
        self.inst = AecMobile(freq)

    def process2(self, frame_far: np.ndarray, frame_near: np.ndarray,
                 delayms: int = 0) -> np.ndarray:
        far = np.asarray(frame_far, np.int16).reshape(-1, self.chn)
        near = np.asarray(frame_near, np.int16).reshape(-1, self.chn)
        n_frames = near.shape[0]
        out = np.empty((n_frames, self.chn), np.int16)
        for off in range(0, n_frames, self.pkg_frame):
            f = far[off:off + self.pkg_frame, 0].astype(np.int64)
            d = near[off:off + self.pkg_frame, 0].astype(np.int64)
            self.inst.buffer_farend(f)
            res = self.inst.process(d, delayms)
            out[off:off + self.pkg_frame] = \
                res.astype(np.int16)[:, None]
        return out.reshape(-1)

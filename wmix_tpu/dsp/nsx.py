"""NSX — fixed-point noise suppression (WebRtcNsx), bit-exact port.

The reference daemon selects NSX over the float NS with the
MAKE_WEBRTC_NSX compile switch (src/webrtc.c:511-530: WebRtcNsX_* maps
to WebRtcNsx_* and Analyze becomes a no-op).  This module reimplements
the vendored fixed-point pipeline — nsx_core.c, nsx_core_c.c,
noise_suppression_x.c — in exact int16/int32/uint32 arithmetic:

- quantile noise estimation over three simultaneous estimates
  (nsx_core.c:334-453 NoiseEstimationC)
- startup white/pink parametric noise model (nsx_core.c:586-628,
  1276-1418)
- speech/noise probability from LRT, spectral flatness and spectral
  difference features (nsx_core_c.c WebRtcNsx_SpeechNoiseProb,
  nsx_core.c:821-1181)
- Wiener gain, energy-ratio gain mapping and overlap-add synthesis
  (nsx_core.c:1421-1499 DataSynthesis, 455-552)
- the split-band high-band path driven by low-band gains
  (nsx_core.c:2040-2117) — which the wmix wrapper abuses to process the
  RIGHT channel of stereo input (webrtc.c ns_process passes chn as
  num_bands)

Constant tables are extracted from the compiled reference probe by
oracle/gen_nsx_tables.py into _nsx_tables.py.  The spl FFT pair is
shared with the AECM port (dsp/aecm.py real_forward_fft/..., order 7/8).

Like the other fixed-point oracle-parity ports (aecm/vad/agc), the
implementation is exact host-side integer code — the batched TPU
engine uses the float NS; NSX exists for reference-parity deployments.
"""
import numpy as np

from wmix_tpu.dsp._nsx_tables import (BLOCKS_80W128, BLOCKS_160W256,
                                      COUNTER_DIV, DETERMINANT_EST_MATRIX,
                                      FACTOR1, FACTOR2_AGGR1, FACTOR2_AGGR2,
                                      FACTOR2_AGGR3, INDICATOR_TABLE,
                                      LOG_INDEX, LOG_TABLE, LOG_TABLE_FRAC,
                                      SUM_LOG_INDEX, SUM_SQUARE_LOG_INDEX)
from wmix_tpu.dsp.aecm import (I16_MAX, add_sat_w16, div_u32_u16,
                               div_w32_w16, norm_u32, norm_w16, norm_w32,
                               real_forward_fft, real_inverse_fft,
                               shift_w32, sqrt_floor, u32, w16, w32)

# nsx_defines.h
ANAL_BLOCKL_MAX = 256
HALF_ANAL_BLOCKL = 129
NUM_HIGH_BANDS_MAX = 2
SIMULT = 3
END_STARTUP_LONG = 200
END_STARTUP_SHORT = 50
FACTOR_Q16 = 2621440
FACTOR_Q7 = 5120
FACTOR_Q7_STARTUP = 1024
WIDTH_Q8 = 3
DD_PR_SNR_Q11 = 2007
ONE_MINUS_DD_PR_SNR_Q11 = 41
SPECT_FLAT_TAVG_Q14 = 4915
SPECT_DIFF_TAVG_Q8 = 77
PRIOR_UPDATE_Q14 = 1638
NOISE_UPDATE_Q8 = 26
ONE_MINUS_PROB_RANGE_Q8 = 205
HIST_PAR_EST = 1000
BIN_SIZE_LRT = 10
FACTOR_1_LRT_DIFF = 6
FACTOR_2_FLAT_Q10 = 922
THRES_PEAK_FLAT = 24
LIM_PEAK_SPACE_FLAT_DIFF = 4
LIM_PEAK_WEIGHT_FLAT_DIFF = 2
THRES_FLUCT_LRT = 10240
MAX_FLAT_Q10 = 38912
MIN_FLAT_Q10 = 4096
MAX_DIFF = 100
MIN_DIFF = 16
THRES_WEIGHT_FLAT_DIFF = 154
STAT_UPDATES = 9
ONE_MINUS_GAMMA_PAUSE_Q8 = 13
GAMMA_NOISE_TRANS_AND_SPEECH_Q8 = 3

K_START_BAND = 5  # nsx_core.c:71

_SAT_MAX = 1048575  # largest value safe for 12 shifts (ProcessCore)


def _mul_round(a: int, b: int, shift: int) -> int:
    """WEBRTC_SPL_MUL_16_16_RSFT_WITH_ROUND."""
    return (int(a) * int(b) + (1 << (shift - 1))) >> shift


def _sat_w32_to_w16(v: int) -> int:
    return I16_MAX if v > I16_MAX else (-32768 if v < -32768 else int(v))


def _get_scaling_square(vec: np.ndarray, times: int) -> int:
    """WebRtcSpl_GetScalingSquare incl. the int16 abs(-32768) wrap."""
    nbits = 32 - norm_u32(times)
    smax = -1
    for x in vec:
        x = int(x)
        sabs = x if x > 0 else w16(-x)
        if sabs > smax:
            smax = sabs
    if smax == 0:
        return 0
    t = norm_w32(w32(smax * smax))
    return 0 if t > nbits else nbits - t


def _energy(vec: np.ndarray) -> tuple:
    """WebRtcSpl_Energy: (energy int32, scaling)."""
    scaling = _get_scaling_square(vec, len(vec))
    en = 0
    for x in vec:
        en = w32(en + ((int(x) * int(x)) >> scaling))
    return en, scaling


def _log2_frac_u16(v: int) -> int:
    """((31-zeros)<<8) + kLogTableFrac[frac] for a nonzero uint value."""
    zeros = norm_u32(v)
    frac = (u32(v << zeros) & 0x7FFFFFFF) >> 23
    return ((31 - zeros) << 8) + int(LOG_TABLE_FRAC[frac])


class NoiseSuppressionFixed:
    """WebRtcNsx_{Create,InitCore,set_policy_core,ProcessCore}."""

    def __init__(self, fs: int):
        self.init(fs)

    # -- nsx_core.c:631-784 WebRtcNsx_InitCore --
    def init(self, fs: int):
        if fs not in (8000, 16000, 32000, 48000):
            raise ValueError("NSX supports 8000/16000/32000/48000")
        self.fs = fs
        if fs == 8000:
            self.block_len_10ms = 80
            self.ana_len = 128
            self.stages = 7
            self.window = BLOCKS_80W128
            self.threshold_log_lrt = 131072
            self.max_lrt = 0x0040000
            self.min_lrt = 52429
        else:
            self.block_len_10ms = 160
            self.ana_len = 256
            self.stages = 8
            self.window = BLOCKS_160W256
            self.threshold_log_lrt = 212644
            self.max_lrt = 0x0080000
            self.min_lrt = 104858
        self.ana_len2 = self.ana_len // 2
        self.magn_len = self.ana_len2 + 1

        self.analysis_buffer = np.zeros(ANAL_BLOCKL_MAX, np.int64)
        self.synthesis_buffer = np.zeros(ANAL_BLOCKL_MAX, np.int64)
        self.data_buf_hb = np.zeros((NUM_HIGH_BANDS_MAX, ANAL_BLOCKL_MAX),
                                    np.int64)
        self.noise_est_quantile = np.zeros(HALF_ANAL_BLOCKL, np.int64)
        self.noise_est_log_quantile = np.full(SIMULT * HALF_ANAL_BLOCKL,
                                              2048, np.int64)  # Q8
        self.noise_est_density = np.full(SIMULT * HALF_ANAL_BLOCKL, 153,
                                         np.int64)  # Q9
        self.noise_est_counter = np.array(
            [(END_STARTUP_LONG * (i + 1)) // SIMULT for i in range(SIMULT)],
            np.int64)
        self.noise_sup_filter = np.full(HALF_ANAL_BLOCKL, 16384, np.int64)
        self.aggr_mode = 0
        self.prior_non_speech_prob = 8192  # Q14(0.5)
        self.prev_magn_u16 = np.zeros(HALF_ANAL_BLOCKL, np.int64)
        self.prev_noise_u32 = np.zeros(HALF_ANAL_BLOCKL, np.int64)
        self.log_lrt_time_avg_w32 = np.zeros(HALF_ANAL_BLOCKL, np.int64)
        self.avg_magn_pause = np.zeros(HALF_ANAL_BLOCKL, np.int64)
        self.init_magn_est = np.zeros(HALF_ANAL_BLOCKL, np.int64)
        self.threshold_spec_diff = 50
        self.threshold_spec_flat = 20480
        self.feature_log_lrt = self.threshold_log_lrt
        self.feature_spec_flat = self.threshold_spec_flat
        self.feature_spec_diff = self.threshold_spec_diff
        self.weight_log_lrt = 6
        self.weight_spec_flat = 0
        self.weight_spec_diff = 0
        self.cur_avg_magn_energy = 0
        self.time_avg_magn_energy = 0
        self.time_avg_magn_energy_tmp = 0
        self.hist_lrt = np.zeros(HIST_PAR_EST, np.int64)
        self.hist_spec_diff = np.zeros(HIST_PAR_EST, np.int64)
        self.hist_spec_flat = np.zeros(HIST_PAR_EST, np.int64)
        self.block_index = -1
        self.model_update = 1 << STAT_UPDATES
        self.cnt_thres_update = 0
        self.sum_magn = 0
        self.magn_energy = 0
        self.prev_q_magn = 0
        self.q_noise = 0
        self.prev_q_noise = 0
        self.energy_in = 0
        self.scale_energy_in = 0
        self.white_noise_level = 0
        self.pink_noise_numerator = 0
        self.pink_noise_exp = 0
        self.min_norm = 15
        self.zero_input_signal = 0
        self.real = np.zeros(ANAL_BLOCKL_MAX, np.int64)
        self.imag = np.zeros(HALF_ANAL_BLOCKL, np.int64)
        self.norm_data = 0
        self.set_policy(0)

    # -- nsx_core.c:786-814 --
    def set_policy(self, mode: int):
        if mode < 0 or mode > 3:
            raise ValueError("mode 0..3")
        self.aggr_mode = mode
        if mode == 0:
            self.overdrive = 256
            self.denoise_bound = 8192
            self.gain_map = 0
            self.factor2_table = FACTOR2_AGGR1  # unused when gainMap=0
        elif mode == 1:
            self.overdrive = 256
            self.denoise_bound = 4096
            self.factor2_table = FACTOR2_AGGR1
            self.gain_map = 1
        elif mode == 2:
            self.overdrive = 282
            self.denoise_bound = 2048
            self.factor2_table = FACTOR2_AGGR2
            self.gain_map = 1
        else:
            self.overdrive = 320
            self.denoise_bound = 1475
            self.factor2_table = FACTOR2_AGGR3
            self.gain_map = 1

    # -- nsx_core.c:303-331 UpdateNoiseEstimate --
    def _update_noise_estimate(self, offset: int):
        K_EXP2 = 11819  # Q13
        tmp16 = int(np.max(
            self.noise_est_log_quantile[offset:offset + self.magn_len]))
        self.q_noise = 14 - _mul_round(K_EXP2, tmp16, 21)
        for i in range(self.magn_len):
            tmp32no2 = w32(K_EXP2 *
                           int(self.noise_est_log_quantile[offset + i]))
            tmp32no1 = 0x00200000 | (tmp32no2 & 0x001FFFFF)
            t16 = w16(tmp32no2 >> 21) - 21 + w16(self.q_noise)
            if t16 < 0:
                tmp32no1 >>= -t16
            else:
                tmp32no1 = w32(tmp32no1 << t16)
            self.noise_est_quantile[i] = _sat_w32_to_w16(tmp32no1)

    # -- nsx_core.c:334-453 NoiseEstimationC --
    def _noise_estimation(self, magn: np.ndarray):
        log2_const = 22713  # Q15
        width_factor = 21845
        tabind = self.stages - self.norm_data
        logval = -int(LOG_TABLE[-tabind]) if tabind < 0 \
            else int(LOG_TABLE[tabind])
        lmagn = np.zeros(self.magn_len, np.int64)
        for i in range(self.magn_len):
            if magn[i]:
                log2 = _log2_frac_u16(int(magn[i]))
                lmagn[i] = w16((log2 * log2_const) >> 15)
                lmagn[i] = w16(int(lmagn[i]) + logval)
            else:
                lmagn[i] = logval

        offset = 0
        for s in range(SIMULT):
            offset = s * self.magn_len
            counter = int(self.noise_est_counter[s])
            count_div = int(COUNTER_DIV[counter])
            count_prod = w16(counter * count_div)
            for i in range(self.magn_len):
                dens = int(self.noise_est_density[offset + i])
                if dens > 512:
                    factor = norm_w16(dens)
                    delta = w16(FACTOR_Q16 >> (14 - factor))
                else:
                    delta = FACTOR_Q7
                    if self.block_index < END_STARTUP_LONG:
                        delta = FACTOR_Q7_STARTUP
                tmp16 = w16((delta * count_div) >> 14)
                if lmagn[i] > self.noise_est_log_quantile[offset + i]:
                    tmp16 += 2
                    self.noise_est_log_quantile[offset + i] = w16(
                        int(self.noise_est_log_quantile[offset + i]) +
                        tmp16 // 4)
                else:
                    tmp16 += 1
                    tmp16no2 = w16(((tmp16 // 2) * 3) // 2)
                    self.noise_est_log_quantile[offset + i] = w16(
                        int(self.noise_est_log_quantile[offset + i]) -
                        tmp16no2)
                    if self.noise_est_log_quantile[offset + i] < logval:
                        self.noise_est_log_quantile[offset + i] = logval
                if abs(int(lmagn[i]) -
                       int(self.noise_est_log_quantile[offset + i])) \
                        < WIDTH_Q8:
                    tmp16no1 = w16(_mul_round(dens, count_prod, 15))
                    tmp16no2 = w16(_mul_round(width_factor, count_div, 15))
                    self.noise_est_density[offset + i] = w16(tmp16no1 +
                                                             tmp16no2)
            if counter >= END_STARTUP_LONG:
                self.noise_est_counter[s] = 0
                if self.block_index >= END_STARTUP_LONG:
                    self._update_noise_estimate(offset)
            self.noise_est_counter[s] += 1

        if self.block_index < END_STARTUP_LONG:
            self._update_noise_estimate(offset)
        noise = self.noise_est_quantile[:self.magn_len].astype(np.int64)
        return noise, w16(self.q_noise)

    # -- nsx_core.c:586-628 --
    def _calc_parametric_noise_estimate(self, pink_exp_avg, pink_num_avg,
                                        freq_index):
        tmp32no2 = (pink_exp_avg * int(LOG_INDEX[freq_index])) >> 15  # Q11
        tmp32no1 = pink_num_avg - tmp32no2
        tmp32no1 += (self.min_norm - self.stages) << 11
        if tmp32no1 <= 0:
            return 0, 0
        int_part = w16(tmp32no1 >> 11)
        frac_part = w16(tmp32no1 & 0x7FF)
        if frac_part >> 10:
            tmp32no2 = (2048 - frac_part) * 1244
            tmp32no2 = 2048 - (tmp32no2 >> 10)
        else:
            tmp32no2 = (frac_part * 804) >> 10
        tmp32no2 = shift_w32(tmp32no2, int_part - 11)
        noise_estimate_avg = u32((1 << int_part) + tmp32no2)
        noise_estimate = u32(noise_estimate_avg * (self.block_index + 1))
        return noise_estimate, noise_estimate_avg

    # -- nsx_core.c:821-1016 FeatureParameterExtraction --
    def _feature_parameter_extraction(self, flag: int):
        if not flag:
            hist_index = u32(self.feature_log_lrt)
            if hist_index < HIST_PAR_EST:
                self.hist_lrt[hist_index] += 1
            hist_index = u32(self.feature_spec_flat * 5) >> 8
            if hist_index < HIST_PAR_EST:
                self.hist_spec_flat[hist_index] += 1
            hist_index = HIST_PAR_EST
            if self.time_avg_magn_energy > 0:
                hist_index = (u32(self.feature_spec_diff * 5) >>
                              self.stages) // self.time_avg_magn_energy
            if hist_index < HIST_PAR_EST:
                self.hist_spec_diff[hist_index] += 1
            return

        use_spec_diff = 1
        avg_hist_lrt = 0
        avg_square_hist_lrt = 0
        num_hist_lrt = 0
        for i in range(BIN_SIZE_LRT):
            j = 2 * i + 1
            tmp32 = w32(int(self.hist_lrt[i]) * j)
            avg_hist_lrt = w32(avg_hist_lrt + tmp32)
            num_hist_lrt += int(self.hist_lrt[i])
            avg_square_hist_lrt = w32(avg_square_hist_lrt +
                                      w32(tmp32 * j))
        avg_hist_lrt_compl = avg_hist_lrt
        for i in range(BIN_SIZE_LRT, HIST_PAR_EST):
            j = 2 * i + 1
            tmp32 = w32(int(self.hist_lrt[i]) * j)
            avg_hist_lrt_compl = w32(avg_hist_lrt_compl + tmp32)
            avg_square_hist_lrt = w32(avg_square_hist_lrt +
                                      w32(tmp32 * j))
        fluct_lrt = w32(w32(avg_square_hist_lrt * num_hist_lrt) -
                        w32(avg_hist_lrt * avg_hist_lrt_compl))
        thres_fluct_lrt = THRES_FLUCT_LRT * num_hist_lrt
        tmp_u32 = u32(FACTOR_1_LRT_DIFF * u32(avg_hist_lrt))
        if (fluct_lrt < thres_fluct_lrt or num_hist_lrt == 0 or
                tmp_u32 > u32(100 * num_hist_lrt)):
            self.threshold_log_lrt = self.max_lrt
        else:
            tmp32 = w32(u32(tmp_u32 << (9 + self.stages)) //
                        num_hist_lrt // 25)
            self.threshold_log_lrt = max(self.min_lrt,
                                         min(self.max_lrt, tmp32))
        if fluct_lrt < thres_fluct_lrt:
            use_spec_diff = 0

        # peaks for flatness
        max_peak1 = max_peak2 = 0
        pos_peak1_flat = pos_peak2_flat = 0
        weight_peak1_flat = weight_peak2_flat = 0
        for i in range(HIST_PAR_EST):
            h = int(self.hist_spec_flat[i])
            if h > max_peak1:
                max_peak2 = max_peak1
                weight_peak2_flat = weight_peak1_flat
                pos_peak2_flat = pos_peak1_flat
                max_peak1 = h
                weight_peak1_flat = h
                pos_peak1_flat = 2 * i + 1
            elif h > max_peak2:
                max_peak2 = h
                weight_peak2_flat = h
                pos_peak2_flat = 2 * i + 1

        use_spec_flat = 1
        if (u32(pos_peak1_flat - pos_peak2_flat) <
                LIM_PEAK_SPACE_FLAT_DIFF and
                weight_peak2_flat * LIM_PEAK_WEIGHT_FLAT_DIFF >
                weight_peak1_flat):
            weight_peak1_flat += weight_peak2_flat
            pos_peak1_flat = u32(pos_peak1_flat + pos_peak2_flat) >> 1
        if (weight_peak1_flat < THRES_WEIGHT_FLAT_DIFF or
                pos_peak1_flat < THRES_PEAK_FLAT):
            use_spec_flat = 0
        else:
            self.threshold_spec_flat = max(
                MIN_FLAT_Q10, min(MAX_FLAT_Q10,
                                  FACTOR_2_FLAT_Q10 * pos_peak1_flat))

        if use_spec_diff:
            max_peak1 = max_peak2 = 0
            pos_peak1_diff = pos_peak2_diff = 0
            weight_peak1_diff = weight_peak2_diff = 0
            for i in range(HIST_PAR_EST):
                h = int(self.hist_spec_diff[i])
                if h > max_peak1:
                    max_peak2 = max_peak1
                    weight_peak2_diff = weight_peak1_diff
                    pos_peak2_diff = pos_peak1_diff
                    max_peak1 = h
                    weight_peak1_diff = h
                    pos_peak1_diff = 2 * i + 1
                elif h > max_peak2:
                    max_peak2 = h
                    weight_peak2_diff = h
                    pos_peak2_diff = 2 * i + 1
            if (u32(pos_peak1_diff - pos_peak2_diff) <
                    LIM_PEAK_SPACE_FLAT_DIFF and
                    weight_peak2_diff * LIM_PEAK_WEIGHT_FLAT_DIFF >
                    weight_peak1_diff):
                weight_peak1_diff += weight_peak2_diff
                pos_peak1_diff = u32(pos_peak1_diff + pos_peak2_diff) >> 1
            self.threshold_spec_diff = max(
                MIN_DIFF, min(MAX_DIFF, FACTOR_1_LRT_DIFF * pos_peak1_diff))
            if weight_peak1_diff < THRES_WEIGHT_FLAT_DIFF:
                use_spec_diff = 0

        feature_sum = 6 // (1 + use_spec_flat + use_spec_diff)
        self.weight_log_lrt = feature_sum
        self.weight_spec_flat = use_spec_flat * feature_sum
        self.weight_spec_diff = use_spec_diff * feature_sum
        self.hist_lrt[:] = 0
        self.hist_spec_diff[:] = 0
        self.hist_spec_flat[:] = 0

    # -- nsx_core.c:1022-1084 ComputeSpectralFlatness --
    def _compute_spectral_flatness(self, magn: np.ndarray):
        avg_num = 0
        avg_den = u32(self.sum_magn - int(magn[0]))
        for i in range(1, self.magn_len):
            if magn[i]:
                avg_num = u32(avg_num + _log2_frac_u16(int(magn[i])))
            else:
                tmp_u32 = u32(u32(self.feature_spec_flat) *
                              SPECT_FLAT_TAVG_Q14)
                self.feature_spec_flat = u32(self.feature_spec_flat -
                                             (tmp_u32 >> 14))
                return
        zeros = norm_u32(avg_den)
        frac = (u32(avg_den << zeros) & 0x7FFFFFFF) >> 23
        tmp32 = ((31 - zeros) << 8) + int(LOG_TABLE_FRAC[frac])
        log_cur = w32(avg_num)
        log_cur = w32(log_cur + w32((self.stages - 1) <<
                                    (self.stages + 7)))
        log_cur = w32(log_cur - w32(tmp32 << (self.stages - 1)))
        log_cur = w32(log_cur << (10 - self.stages))
        tmp32 = 0x00020000 | (abs(log_cur) & 0x0001FFFF)
        int_part = 7 - (log_cur >> 17)
        if int_part > 0:
            current = tmp32 >> int_part
        else:
            current = w32(tmp32 << -int_part)
        tmp32 = w32(current - w32(self.feature_spec_flat))
        tmp32 = w32(tmp32 * SPECT_FLAT_TAVG_Q14)
        self.feature_spec_flat = u32(self.feature_spec_flat +
                                     (tmp32 >> 14))

    # -- nsx_core.c:1091-1181 ComputeSpectralDifference --
    def _compute_spectral_difference(self, magn: np.ndarray):
        avg_pause = 0
        max_pause = 0
        min_pause = int(self.avg_magn_pause[0])
        for i in range(self.magn_len):
            p = int(self.avg_magn_pause[i])
            avg_pause = w32(avg_pause + p)
            max_pause = max(max_pause, p)
            min_pause = min(min_pause, p)
        avg_pause >>= self.stages - 1
        avg_magn = u32(self.sum_magn) >> (self.stages - 1)
        tmp32no1 = max(max_pause - avg_pause, avg_pause - min_pause)
        n_shifts = max(0, 10 + self.stages - norm_w32(tmp32no1))

        var_magn = 0
        var_pause = 0
        cov_magn_pause = 0
        for i in range(self.magn_len):
            tmp16no1 = w16(int(magn[i]) - avg_magn)
            tmp32no2 = w32(int(self.avg_magn_pause[i]) - avg_pause)
            var_magn = u32(var_magn + w32(tmp16no1 * tmp16no1))
            tmp32no1 = w32(tmp32no2 * tmp16no1)
            cov_magn_pause = w32(cov_magn_pause + tmp32no1)
            tmp32no1 = tmp32no2 >> n_shifts
            var_pause = u32(var_pause + w32(tmp32no1 * tmp32no1))
        self.cur_avg_magn_energy = u32(
            self.cur_avg_magn_energy +
            (u32(self.magn_energy) >>
             (2 * self.norm_data + self.stages - 1)))

        avg_diff = var_magn
        if var_pause and cov_magn_pause:
            tmp_u32no1 = u32(abs(cov_magn_pause))
            norm32 = norm_u32(tmp_u32no1) - 16
            if norm32 > 0:
                tmp_u32no1 = u32(tmp_u32no1 << norm32)
            else:
                tmp_u32no1 >>= -norm32
            tmp_u32no2 = u32(tmp_u32no1 * tmp_u32no1)
            n_shifts += norm32
            n_shifts <<= 1
            if n_shifts < 0:
                var_pause >>= -n_shifts
                n_shifts = 0
            if var_pause > 0:
                tmp_u32no1 = tmp_u32no2 // var_pause
                tmp_u32no1 >>= n_shifts
                avg_diff -= min(avg_diff, tmp_u32no1)
            else:
                avg_diff = 0
        tmp_u32no1 = avg_diff >> (2 * self.norm_data)
        if self.feature_spec_diff > tmp_u32no1:
            tmp_u32no2 = u32(u32(self.feature_spec_diff - tmp_u32no1) *
                             SPECT_DIFF_TAVG_Q8)
            self.feature_spec_diff = u32(self.feature_spec_diff -
                                         (tmp_u32no2 >> 8))
        else:
            tmp_u32no2 = u32(u32(tmp_u32no1 - self.feature_spec_diff) *
                             SPECT_DIFF_TAVG_Q8)
            self.feature_spec_diff = u32(self.feature_spec_diff +
                                         (tmp_u32no2 >> 8))

    # -- nsx_core.c:524-541 AnalysisUpdateC --
    def _analysis_update(self, new_speech: np.ndarray) -> np.ndarray:
        n, b = self.ana_len, self.block_len_10ms
        self.analysis_buffer[:n - b] = self.analysis_buffer[b:n]
        self.analysis_buffer[n - b:n] = new_speech
        win = np.zeros(n, np.int64)
        for i in range(n):
            win[i] = w16(_mul_round(int(self.window[i]),
                                    int(self.analysis_buffer[i]), 14))
        return win

    # -- nsx_core.c:1184-1419 DataAnalysis --
    def _data_analysis(self, speech_frame: np.ndarray) -> np.ndarray:
        magn = np.zeros(HALF_ANAL_BLOCKL, np.int64)
        win_data = self._analysis_update(speech_frame)
        self.energy_in, self.scale_energy_in = _energy(
            win_data[:self.ana_len])
        self.zero_input_signal = 0
        max_abs = int(np.max(np.abs(win_data[:self.ana_len])))
        max_win_data = min(max_abs, I16_MAX)
        self.norm_data = norm_w16(max_win_data)
        if max_win_data == 0:
            self.zero_input_signal = 1
            return magn

        net_norm = self.stages - self.norm_data
        right_shifts_in_magn = self.norm_data - self.min_norm
        right_shifts_in_init = max(-right_shifts_in_magn, 0)
        self.min_norm -= right_shifts_in_init
        right_shifts_in_magn = max(right_shifts_in_magn, 0)

        norm_in = np.zeros(self.ana_len, np.int64)
        for i in range(self.ana_len):
            norm_in[i] = w16(int(win_data[i]) << self.norm_data)
        fft_out = real_forward_fft(norm_in, self.stages)

        self.imag[0] = 0
        self.imag[self.ana_len2] = 0
        self.real[0] = int(fft_out[0])
        self.real[self.ana_len2] = int(fft_out[self.ana_len])
        self.magn_energy = u32(int(self.real[0]) * int(self.real[0]))
        self.magn_energy = u32(self.magn_energy +
                               int(self.real[self.ana_len2]) *
                               int(self.real[self.ana_len2]))
        magn[0] = abs(int(self.real[0]))
        magn[self.ana_len2] = abs(int(self.real[self.ana_len2]))
        self.sum_magn = u32(int(magn[0]) + int(magn[self.ana_len2]))

        if self.block_index >= END_STARTUP_SHORT:
            for i in range(1, self.ana_len2):
                j = 2 * i
                self.real[i] = int(fft_out[j])
                self.imag[i] = -int(fft_out[j + 1])
                t = u32(int(fft_out[j]) * int(fft_out[j]) +
                        int(fft_out[j + 1]) * int(fft_out[j + 1]))
                self.magn_energy = u32(self.magn_energy + t)
                magn[i] = sqrt_floor(w32(t)) & 0xFFFF
                self.sum_magn = u32(self.sum_magn + int(magn[i]))
        else:
            # startup: gather white/pink noise statistics
            self.init_magn_est[0] >>= right_shifts_in_init
            self.init_magn_est[self.ana_len2] >>= right_shifts_in_init
            self.init_magn_est[0] = u32(
                int(self.init_magn_est[0]) +
                (int(magn[0]) >> right_shifts_in_magn))
            self.init_magn_est[self.ana_len2] = u32(
                int(self.init_magn_est[self.ana_len2]) +
                (int(magn[self.ana_len2]) >> right_shifts_in_magn))
            log2 = 0
            if magn[self.ana_len2]:
                log2 = _log2_frac_u16(int(magn[self.ana_len2]))
            sum_log_magn = log2  # Q8
            sum_log_i_log_magn = (int(LOG_INDEX[self.ana_len2]) *
                                  log2) >> 3  # Q17
            for i in range(1, self.ana_len2):
                j = 2 * i
                self.real[i] = int(fft_out[j])
                self.imag[i] = -int(fft_out[j + 1])
                t = u32(int(fft_out[j]) * int(fft_out[j]) +
                        int(fft_out[j + 1]) * int(fft_out[j + 1]))
                self.magn_energy = u32(self.magn_energy + t)
                magn[i] = sqrt_floor(w32(t)) & 0xFFFF
                self.sum_magn = u32(self.sum_magn + int(magn[i]))
                self.init_magn_est[i] >>= right_shifts_in_init
                self.init_magn_est[i] = u32(
                    int(self.init_magn_est[i]) +
                    (int(magn[i]) >> right_shifts_in_magn))
                if i >= K_START_BAND:
                    log2 = 0
                    if magn[i]:
                        log2 = _log2_frac_u16(int(magn[i]))
                    sum_log_magn = w32(sum_log_magn + log2)
                    sum_log_i_log_magn = w32(
                        sum_log_i_log_magn +
                        ((int(LOG_INDEX[i]) * log2) >> 3))

            self.white_noise_level >>= right_shifts_in_init
            tmp_u32no1 = u32(u32(self.sum_magn) * self.overdrive)
            tmp_u32no1 >>= self.stages + 8
            tmp_u32no1 >>= right_shifts_in_magn
            self.white_noise_level = u32(self.white_noise_level +
                                         tmp_u32no1)

            matrix_determinant = int(DETERMINANT_EST_MATRIX[K_START_BAND])
            sum_log_i = int(SUM_LOG_INDEX[K_START_BAND])  # Q5
            sum_log_i_square = int(SUM_SQUARE_LOG_INDEX[K_START_BAND])
            if self.fs == 8000:
                tmp_1_w32 = matrix_determinant
                tmp_1_w32 += (int(SUM_LOG_INDEX[65]) * sum_log_i) >> 9
                tmp_1_w32 -= (int(SUM_LOG_INDEX[65]) *
                              int(SUM_LOG_INDEX[65])) >> 10
                tmp_1_w32 -= w32(sum_log_i_square << 4)
                tmp_1_w32 -= ((self.magn_len - K_START_BAND) *
                              int(SUM_SQUARE_LOG_INDEX[65])) >> 2
                matrix_determinant = w16(tmp_1_w32)
                sum_log_i -= int(SUM_LOG_INDEX[65])
                sum_log_i_square -= int(SUM_SQUARE_LOG_INDEX[65])

            zeros = 16 - norm_w32(sum_log_magn)
            if zeros < 0:
                zeros = 0
            tmp_1_w32 = w32(sum_log_magn << 1)  # Q9
            sum_log_magn_u16 = u32(tmp_1_w32 >> zeros) & 0xFFFF

            tmp_2_w32 = w32(sum_log_i_square * sum_log_magn_u16)
            tmp_u32no1 = u32(sum_log_i_log_magn) >> 12  # Q5
            tmp_u16 = (sum_log_i << 1) & 0xFFFF  # Q6
            if u32(sum_log_i) > tmp_u32no1:
                tmp_u16 >>= zeros
            else:
                tmp_u32no1 >>= zeros
            tmp_2_w32 = w32(tmp_2_w32 - w32(u32(tmp_u32no1 * tmp_u16)))
            matrix_determinant = matrix_determinant >> zeros
            tmp_2_w32 = div_w32_w16(tmp_2_w32, matrix_determinant)
            tmp_2_w32 = w32(tmp_2_w32 + w32(net_norm << 11))
            if tmp_2_w32 < 0:
                tmp_2_w32 = 0
            self.pink_noise_numerator = w32(self.pink_noise_numerator +
                                            tmp_2_w32)

            tmp_2_w32 = w32(sum_log_i * sum_log_magn_u16)  # Q(14-zeros)
            tmp_1_w32 = sum_log_i_log_magn >> (3 + zeros)
            tmp_1_w32 = w32(tmp_1_w32 * (self.magn_len - K_START_BAND))
            tmp_2_w32 = w32(tmp_2_w32 - tmp_1_w32)
            if tmp_2_w32 > 0:
                tmp_1_w32 = div_w32_w16(tmp_2_w32, matrix_determinant)
                self.pink_noise_exp = w32(
                    self.pink_noise_exp +
                    max(0, min(16384, tmp_1_w32)))
        return magn

    # -- nsx_core.c:456-474 PrepareSpectrumC --
    def _prepare_spectrum(self) -> np.ndarray:
        for i in range(self.magn_len):
            self.real[i] = w16((int(self.real[i]) *
                                w16(self.noise_sup_filter[i])) >> 14)
            self.imag[i] = w16((int(self.imag[i]) *
                                w16(self.noise_sup_filter[i])) >> 14)
        freq_buf = np.zeros(self.ana_len + 2, np.int64)
        freq_buf[0] = self.real[0]
        freq_buf[1] = -self.imag[0]
        for i in range(1, self.ana_len2):
            freq_buf[2 * i] = self.real[i]
            freq_buf[2 * i + 1] = -self.imag[i]
        freq_buf[self.ana_len] = self.real[self.ana_len2]
        freq_buf[self.ana_len + 1] = -self.imag[self.ana_len2]
        return freq_buf

    # -- nsx_core.c:477-521 Denormalize + SynthesisUpdate --
    def _denormalize(self, rfft_out: np.ndarray, factor: int):
        for i in range(self.ana_len):
            tmp32 = shift_w32(int(rfft_out[i]), factor - self.norm_data)
            self.real[i] = _sat_w32_to_w16(tmp32)

    def _synthesis_update(self, gain_factor: int) -> np.ndarray:
        n, b = self.ana_len, self.block_len_10ms
        for i in range(n):
            tmp16a = w16(_mul_round(int(self.window[i]),
                                    int(self.real[i]), 14))
            tmp32 = _mul_round(tmp16a, gain_factor, 13)
            tmp16b = _sat_w32_to_w16(tmp32)
            self.synthesis_buffer[i] = add_sat_w16(
                int(self.synthesis_buffer[i]), tmp16b)
        out = self.synthesis_buffer[:b].copy()
        self.synthesis_buffer[:n - b] = self.synthesis_buffer[b:n]
        self.synthesis_buffer[n - b:n] = 0
        return out

    # -- nsx_core.c:1421-1499 DataSynthesis --
    def _data_synthesis(self) -> np.ndarray:
        n, b = self.ana_len, self.block_len_10ms
        if self.zero_input_signal:
            out = self.synthesis_buffer[:b].copy()
            self.synthesis_buffer[:n - b] = self.synthesis_buffer[b:n]
            self.synthesis_buffer[n - b:n] = 0
            return out
        freq_buf = self._prepare_spectrum()
        rfft_out, out_cifft = real_inverse_fft(freq_buf, self.stages)
        self._denormalize(rfft_out, out_cifft)
        gain_factor = 8192  # Q13(1.0)
        if (self.gain_map == 1 and self.block_index > END_STARTUP_LONG and
                self.energy_in > 0):
            energy_out, scale_energy_out = _energy(self.real[:n])
            if scale_energy_out == 0 and not (energy_out & 0x7F800000):
                energy_out = shift_w32(
                    energy_out, 8 + scale_energy_out - self.scale_energy_in)
            else:
                # x86 sar semantics: shift count masked to 5 bits
                sh = (8 + scale_energy_out - self.scale_energy_in) & 31
                self.energy_in >>= sh
            energy_ratio = (energy_out + self.energy_in // 2) // \
                self.energy_in
            energy_ratio = max(0, min(256, energy_ratio))
            gain_factor1 = int(FACTOR1[energy_ratio])  # Q8
            gain_factor2 = int(self.factor2_table[energy_ratio])  # Q8
            tmp16no1 = w16(((16384 - self.prior_non_speech_prob) *
                            gain_factor1) >> 14)
            tmp16no2 = w16((self.prior_non_speech_prob *
                            gain_factor2) >> 14)
            gain_factor = w16(tmp16no1 + tmp16no2)
        return self._synthesis_update(gain_factor)

    # -- nsx_core_c.c WebRtcNsx_SpeechNoiseProb --
    def _speech_noise_prob(self, prior_loc_snr, post_loc_snr):
        non_speech_prob = np.zeros(self.magn_len, np.int64)
        log_lrt_time_avg_k_sum = 0
        for i in range(self.magn_len):
            bessel_tmp = w32(post_loc_snr[i])  # Q11
            norm_tmp = norm_u32(post_loc_snr[i])
            num = u32(int(post_loc_snr[i]) << norm_tmp)
            if norm_tmp > 10:
                den = u32(int(prior_loc_snr[i]) << (norm_tmp - 11))
            else:
                den = u32(int(prior_loc_snr[i]) >> (11 - norm_tmp))
            if den > 0:
                bessel_tmp = w32(bessel_tmp - num // den)
            else:
                bessel_tmp = 0

            zeros = norm_u32(prior_loc_snr[i])
            frac32 = (u32(int(prior_loc_snr[i]) << zeros) &
                      0x7FFFFFFF) >> 19
            tmp32 = (frac32 * frac32 * -43) >> 19
            tmp32 = w32(tmp32 + ((w16(frac32) * 5412) >> 12))
            frac32 = w32(tmp32 + 37)
            tmp32 = w32(((31 - zeros) << 12) + frac32) - (11 << 12)
            log_tmp = w32(tmp32 * 178) >> 8
            t = w32(log_tmp + int(self.log_lrt_time_avg_w32[i]))
            tmp32no1 = -(-t // 2) if t < 0 else t // 2
            self.log_lrt_time_avg_w32[i] = w32(
                int(self.log_lrt_time_avg_w32[i]) +
                (bessel_tmp - tmp32no1))
            log_lrt_time_avg_k_sum = w32(log_lrt_time_avg_k_sum +
                                         int(self.log_lrt_time_avg_w32[i]))
        self.feature_log_lrt = w32(log_lrt_time_avg_k_sum *
                                   BIN_SIZE_LRT) >> (self.stages + 11)

        # average LRT indicator
        tmp_ind = 16384
        tmp32no1 = w32(log_lrt_time_avg_k_sum - self.threshold_log_lrt)
        n_shifts = 7 - self.stages
        if tmp32no1 < 0:
            tmp_ind = 0
            tmp32no1 = -tmp32no1
            n_shifts += 1
        tmp32no1 = shift_w32(tmp32no1, n_shifts)
        table_index = w16(tmp32no1 >> 14)
        if 0 <= table_index < 16:
            tmp16no2 = int(INDICATOR_TABLE[table_index])
            tmp16no1 = int(INDICATOR_TABLE[table_index + 1]) - \
                int(INDICATOR_TABLE[table_index])
            frac = w16(tmp32no1 & 0x3FFF)
            tmp16no2 += w16((tmp16no1 * frac) >> 14)
            tmp_ind = 8192 - tmp16no2 if tmp_ind == 0 else 8192 + tmp16no2
        ind_prior = w32(self.weight_log_lrt * tmp_ind)

        # spectral flatness indicator
        if self.weight_spec_flat:
            tmp_u32no1 = u32(u32(self.feature_spec_flat) * 400)
            tmp_ind = 16384
            tmp_u32no2 = u32(self.threshold_spec_flat - tmp_u32no1)
            n_shifts = 4
            if self.threshold_spec_flat < tmp_u32no1:
                tmp_ind = 0
                tmp_u32no2 = u32(tmp_u32no1 - self.threshold_spec_flat)
                n_shifts += 1
            tmp_u32no1 = div_u32_u16(u32(tmp_u32no2 << n_shifts), 25)
            table_index = w16(tmp_u32no1 >> 14)
            if table_index < 16:
                tmp16no2 = int(INDICATOR_TABLE[table_index])
                tmp16no1 = int(INDICATOR_TABLE[table_index + 1]) - \
                    int(INDICATOR_TABLE[table_index])
                frac = w16(tmp_u32no1 & 0x3FFF)
                tmp16no2 += w16((tmp16no1 * frac) >> 14)
                tmp_ind = 8192 + tmp16no2 if tmp_ind else 8192 - tmp16no2
            ind_prior = w32(ind_prior + self.weight_spec_flat * tmp_ind)

        # spectral difference indicator
        if self.weight_spec_diff:
            tmp_u32no1 = 0
            if self.feature_spec_diff:
                norm_tmp = min(20 - self.stages,
                               norm_u32(self.feature_spec_diff))
                tmp_u32no1 = u32(int(self.feature_spec_diff) << norm_tmp)
                tmp_u32no2 = u32(self.time_avg_magn_energy) >> \
                    (20 - self.stages - norm_tmp)
                if tmp_u32no2 > 0:
                    tmp_u32no1 //= tmp_u32no2
                else:
                    tmp_u32no1 = 0x7FFFFFFF
            tmp_u32no3 = u32(self.threshold_spec_diff << 17) // 25
            tmp_u32no2 = u32(tmp_u32no1 - tmp_u32no3)
            n_shifts = 1
            tmp_ind = 16384
            if tmp_u32no2 & 0x80000000:
                tmp_ind = 0
                tmp_u32no2 = u32(tmp_u32no3 - tmp_u32no1)
                n_shifts -= 1
            tmp_u32no1 = tmp_u32no2 >> n_shifts
            table_index = w16(tmp_u32no1 >> 14)
            if table_index < 16:
                tmp16no2 = int(INDICATOR_TABLE[table_index])
                tmp16no1 = int(INDICATOR_TABLE[table_index + 1]) - \
                    int(INDICATOR_TABLE[table_index])
                frac = w16(tmp_u32no1 & 0x3FFF)
                tmp16no2 += w16(_mul_round(tmp16no1, frac, 14))
                tmp_ind = 8192 + tmp16no2 if tmp_ind else 8192 - tmp16no2
            ind_prior = w32(ind_prior + self.weight_spec_diff * tmp_ind)

        ind_prior16 = w16(div_w32_w16(w32(98307 - ind_prior), 6))
        tmp16 = w16(ind_prior16 - self.prior_non_speech_prob)
        self.prior_non_speech_prob = w16(
            self.prior_non_speech_prob +
            w16((PRIOR_UPDATE_Q14 * tmp16) >> 14))

        if self.prior_non_speech_prob > 0:
            for i in range(self.magn_len):
                if self.log_lrt_time_avg_w32[i] < 65300:
                    tmp32no1 = w32(int(self.log_lrt_time_avg_w32[i]) *
                                   23637) >> 14
                    int_part = w16(tmp32no1 >> 12)
                    if int_part < -8:
                        int_part = -8
                    frac = w16(tmp32no1 & 0xFFF)
                    tmp32no2 = (frac * frac * 44) >> 19
                    tmp32no2 = w32(tmp32no2 + ((frac * 84) >> 7))
                    inv_lrt = w32((1 << (8 + int_part)) +
                                  shift_w32(tmp32no2, int_part - 4))
                    norm_tmp = norm_w32(inv_lrt)
                    norm_tmp2 = norm_w16(
                        w16(16384 - self.prior_non_speech_prob))
                    if norm_tmp + norm_tmp2 >= 7:
                        if norm_tmp + norm_tmp2 < 15:
                            inv_lrt >>= 15 - norm_tmp2 - norm_tmp
                            tmp32no1 = w32(
                                inv_lrt *
                                (16384 - self.prior_non_speech_prob))
                            inv_lrt = shift_w32(tmp32no1,
                                                7 - norm_tmp - norm_tmp2)
                        else:
                            tmp32no1 = w32(
                                inv_lrt *
                                (16384 - self.prior_non_speech_prob))
                            inv_lrt = tmp32no1 >> 8
                        tmp32no1 = w32(self.prior_non_speech_prob << 8)
                        den = w32(self.prior_non_speech_prob + inv_lrt)
                        if den != 0:
                            q = abs(tmp32no1) // abs(den)
                            if (tmp32no1 < 0) != (den < 0):
                                q = -q
                            non_speech_prob[i] = q & 0xFFFF
        return non_speech_prob

    # -- nsx_core.c:1501-2118 ProcessCore --
    def process(self, speech_frames, out_frames):
        """speech_frames/out_frames: lists of int64 arrays, one per band
        (band 0 = low band; further bands get the time-domain HB gain)."""
        num_bands = len(speech_frames)
        num_high_bands = num_bands - 1
        b = self.block_len_10ms

        magn = self._data_analysis(speech_frames[0])
        if self.zero_input_signal:
            out_frames[0][:] = self._data_synthesis()
            for i in range(num_high_bands):
                n = self.ana_len
                self.data_buf_hb[i][:n - b] = self.data_buf_hb[i][b:n]
                self.data_buf_hb[i][n - b:n] = speech_frames[i + 1]
                out_frames[i + 1][:] = self.data_buf_hb[i][:b]
            return

        self.block_index += 1
        q_magn = self.norm_data - self.stages

        self._compute_spectral_flatness(magn)
        noise_u32, q_noise = self._noise_estimation(magn)

        prev_noise_u16 = np.zeros(self.magn_len, np.int64)
        for i in range(self.magn_len):
            prev_noise_u16[i] = u32(self.prev_noise_u32[i]) >> 11

        noise_sup_filter_tmp = np.zeros(self.magn_len, np.int64)
        if self.block_index < END_STARTUP_SHORT:
            q_domain_to_use = min(int(q_noise),
                                  self.min_norm - self.stages)
            pink_exp_avg = 0
            pink_num_avg = 0
            if self.pink_noise_exp:
                pink_exp_avg = w16(div_w32_w16(self.pink_noise_exp,
                                               self.block_index + 1))
                pink_num_avg = div_w32_w16(self.pink_noise_numerator,
                                           self.block_index + 1)
                noise_estimate, noise_estimate_avg = \
                    self._calc_parametric_noise_estimate(
                        pink_exp_avg, pink_num_avg, K_START_BAND)
            else:
                noise_estimate = u32(self.white_noise_level)
                noise_estimate_avg = noise_estimate // \
                    (self.block_index + 1)
            for i in range(self.magn_len):
                if self.pink_noise_exp and i >= K_START_BAND:
                    noise_estimate, noise_estimate_avg = \
                        self._calc_parametric_noise_estimate(
                            pink_exp_avg, pink_num_avg, i)
                noise_sup_filter_tmp[i] = self.denoise_bound
                if self.init_magn_est[i]:
                    tmp_u32no1 = u32(noise_estimate * self.overdrive)
                    numerator = u32(int(self.init_magn_est[i]) << 8)
                    if numerator > tmp_u32no1:
                        numerator = u32(numerator - tmp_u32no1)
                        n_shifts = norm_u32(numerator)
                        n_shifts = max(0, min(6, n_shifts))
                        numerator = u32(numerator << n_shifts)
                        tmp_u32no1 = u32(self.init_magn_est[i]) >> \
                            (6 - n_shifts)
                        if tmp_u32no1 == 0:
                            tmp_u32no1 = 1
                        tmp_u32no2 = numerator // tmp_u32no1
                        noise_sup_filter_tmp[i] = max(
                            self.denoise_bound, min(16384, tmp_u32no2))
                tmp_u32no1 = u32(noise_u32[i]) >> \
                    (int(q_noise) - q_domain_to_use)
                tmp_u32no2 = u32(noise_estimate_avg) >> \
                    (self.min_norm - self.stages - q_domain_to_use)
                n_shifts = 0
                if tmp_u32no1 & 0xFC000000:
                    tmp_u32no1 >>= 6
                    tmp_u32no2 >>= 6
                    n_shifts = 6
                tmp_u32no1 = u32(tmp_u32no1 * self.block_index)
                tmp_u32no2 = u32(tmp_u32no2 *
                                 (END_STARTUP_SHORT - self.block_index))
                noise_u32[i] = div_u32_u16(u32(tmp_u32no1 + tmp_u32no2),
                                           END_STARTUP_SHORT)
                noise_u32[i] = u32(int(noise_u32[i]) << n_shifts)
            q_noise = q_domain_to_use

        if self.block_index < END_STARTUP_LONG:
            self.time_avg_magn_energy_tmp = u32(
                self.time_avg_magn_energy_tmp +
                (u32(self.magn_energy) >>
                 (2 * self.norm_data + self.stages - 1)))
            self.time_avg_magn_energy = div_u32_u16(
                self.time_avg_magn_energy_tmp, self.block_index + 1)

        # STEP 1: prior and post SNR
        post_shifts = 6 + q_magn - q_noise
        n_shifts = 5 - self.prev_q_magn + self.prev_q_noise
        post_loc_snr = np.zeros(self.magn_len, np.int64)
        prior_loc_snr = np.zeros(self.magn_len, np.int64)
        prev_near_snr = np.zeros(self.magn_len, np.int64)
        for i in range(self.magn_len):
            post_loc_snr[i] = 2048
            tmp_u32no1 = u32(int(magn[i]) << 6)
            if post_shifts < 0:
                tmp_u32no2 = u32(noise_u32[i]) >> -post_shifts
            else:
                tmp_u32no2 = u32(int(noise_u32[i]) << post_shifts)
            if tmp_u32no1 > tmp_u32no2:
                tmp_u32no1 = u32(tmp_u32no1 << 11)
                if tmp_u32no2 > 0:
                    tmp_u32no1 //= tmp_u32no2
                    post_loc_snr[i] = min(_SAT_MAX, tmp_u32no1)
                else:
                    post_loc_snr[i] = _SAT_MAX

            near_magn_est = u32(int(self.prev_magn_u16[i]) *
                                int(self.noise_sup_filter[i]))
            tmp_u32no1 = u32(near_magn_est << 3)
            tmp_u32no2 = u32(self.prev_noise_u32[i]) >> n_shifts
            if tmp_u32no2 > 0:
                tmp_u32no1 //= tmp_u32no2
                tmp_u32no1 = min(_SAT_MAX, tmp_u32no1)
            else:
                tmp_u32no1 = _SAT_MAX
            prev_near_snr[i] = tmp_u32no1

            tmp_u32no1 = u32(int(prev_near_snr[i]) * DD_PR_SNR_Q11)
            tmp_u32no2 = u32((int(post_loc_snr[i]) - 2048) *
                             ONE_MINUS_DD_PR_SNR_Q11)
            prior_snr = u32(tmp_u32no1 + tmp_u32no2 + 512)
            prior_loc_snr[i] = u32(2048 + (prior_snr >> 10))

        # STEP 2: speech/noise likelihood
        self._compute_spectral_difference(magn)
        self.cnt_thres_update += 1
        flag = int(self.cnt_thres_update == self.model_update)
        self._feature_parameter_extraction(flag)
        if flag:
            self.cnt_thres_update = 0
            self.cur_avg_magn_energy = u32(self.cur_avg_magn_energy) >> \
                STAT_UPDATES
            tmp_u32no1 = u32(self.cur_avg_magn_energy +
                             self.time_avg_magn_energy + 1) >> 1
            if (tmp_u32no1 != self.time_avg_magn_energy and
                    self.feature_spec_diff and
                    self.time_avg_magn_energy > 0):
                norm32no1 = 0
                tmp_u32no3 = tmp_u32no1
                while 0xFFFF0000 & tmp_u32no3:
                    tmp_u32no3 >>= 1
                    norm32no1 += 1
                tmp_u32no2 = u32(self.feature_spec_diff)
                while 0xFFFF0000 & tmp_u32no2:
                    tmp_u32no2 >>= 1
                    norm32no1 += 1
                tmp_u32no3 = u32(tmp_u32no3 * tmp_u32no2)
                tmp_u32no3 //= self.time_avg_magn_energy
                if norm_u32(tmp_u32no3) < norm32no1:
                    self.feature_spec_diff = 0x007FFFFF
                else:
                    self.feature_spec_diff = min(
                        0x007FFFFF, u32(tmp_u32no3 << norm32no1))
            self.time_avg_magn_energy = tmp_u32no1
            self.cur_avg_magn_energy = 0

        non_speech_prob = self._speech_noise_prob(prior_loc_snr,
                                                  post_loc_snr)

        # noise update
        gamma_noise = NOISE_UPDATE_Q8
        max_noise_u32 = 0
        post_shifts = self.prev_q_noise - q_magn
        n_shifts = self.prev_q_magn - q_magn
        for i in range(self.magn_len):
            if post_shifts < 0:
                tmp_u32no2 = u32(magn[i]) >> -post_shifts
            else:
                tmp_u32no2 = u32(int(magn[i]) << post_shifts)
            if prev_noise_u16[i] > tmp_u32no2:
                sign = -1
                tmp_u32no1 = u32(int(prev_noise_u16[i]) - tmp_u32no2)
            else:
                sign = 1
                tmp_u32no1 = u32(tmp_u32no2 - int(prev_noise_u16[i]))
            noise_update_u32 = u32(self.prev_noise_u32[i])
            tmp_u32no3 = 0
            if tmp_u32no1 and non_speech_prob[i]:
                tmp_u32no3 = u32(tmp_u32no1 * int(non_speech_prob[i]))
                if 0x7C000000 & tmp_u32no3:
                    tmp_u32no2 = u32((tmp_u32no3 >> 5) * gamma_noise)
                else:
                    tmp_u32no2 = u32(tmp_u32no3 * gamma_noise) >> 5
                if sign > 0:
                    noise_update_u32 = u32(noise_update_u32 + tmp_u32no2)
                else:
                    noise_update_u32 = u32(noise_update_u32 - tmp_u32no2)

            prev_gamma_noise = gamma_noise
            gamma_noise = NOISE_UPDATE_Q8
            if non_speech_prob[i] < ONE_MINUS_PROB_RANGE_Q8:
                gamma_noise = GAMMA_NOISE_TRANS_AND_SPEECH_Q8
            if prev_gamma_noise != gamma_noise:
                if 0x7C000000 & tmp_u32no3:
                    tmp_u32no2 = u32((tmp_u32no3 >> 5) * gamma_noise)
                else:
                    tmp_u32no2 = u32(tmp_u32no3 * gamma_noise) >> 5
                if sign > 0:
                    tmp_u32no1 = u32(int(self.prev_noise_u32[i]) +
                                     tmp_u32no2)
                else:
                    tmp_u32no1 = u32(int(self.prev_noise_u32[i]) -
                                     tmp_u32no2)
                if noise_update_u32 > tmp_u32no1:
                    noise_update_u32 = tmp_u32no1
            noise_u32[i] = noise_update_u32
            if noise_update_u32 > max_noise_u32:
                max_noise_u32 = noise_update_u32

            tmp32no2 = shift_w32(int(self.avg_magn_pause[i]), -n_shifts)
            if non_speech_prob[i] > ONE_MINUS_PROB_RANGE_Q8:
                if n_shifts < 0:
                    tmp32no1 = w32(int(magn[i]) - tmp32no2)
                    tmp32no1 = w32(tmp32no1 * ONE_MINUS_GAMMA_PAUSE_Q8)
                    tmp32no1 = (tmp32no1 + 128) >> 8
                else:
                    tmp32no1 = w32((int(magn[i]) << n_shifts) -
                                   int(self.avg_magn_pause[i]))
                    tmp32no1 = w32(tmp32no1 * ONE_MINUS_GAMMA_PAUSE_Q8)
                    tmp32no1 = w32(tmp32no1 + (128 << n_shifts)) >> \
                        (8 + n_shifts)
                tmp32no2 = w32(tmp32no2 + tmp32no1)
            self.avg_magn_pause[i] = tmp32no2

        norm32no1 = norm_u32(max_noise_u32)
        q_noise = self.prev_q_noise + norm32no1 - 5

        # STEP 3: new DD update with updated noise estimate
        n_shifts = self.prev_q_noise + 11 - q_magn
        for i in range(self.magn_len):
            cur_near_snr = 0
            if n_shifts < 0:
                tmp_magn_u32 = u32(magn[i])
                tmp_noise_u32 = u32(int(noise_u32[i]) << -n_shifts)
            elif n_shifts > 17:
                tmp_magn_u32 = u32(int(magn[i]) << 17)
                tmp_noise_u32 = u32(noise_u32[i]) >> (n_shifts - 17)
            else:
                tmp_magn_u32 = u32(int(magn[i]) << n_shifts)
                tmp_noise_u32 = u32(noise_u32[i])
            if tmp_magn_u32 > tmp_noise_u32:
                tmp_u32no1 = u32(tmp_magn_u32 - tmp_noise_u32)
                norm32no2 = min(11, norm_u32(tmp_u32no1))
                tmp_u32no1 = u32(tmp_u32no1 << norm32no2)
                tmp_u32no2 = tmp_noise_u32 >> (11 - norm32no2)
                if tmp_u32no2 > 0:
                    tmp_u32no1 //= tmp_u32no2
                cur_near_snr = min(_SAT_MAX, tmp_u32no1)

            tmp_u32no1 = u32(int(prev_near_snr[i]) * DD_PR_SNR_Q11)
            tmp_u32no2 = u32(cur_near_snr * ONE_MINUS_DD_PR_SNR_Q11)
            prior_snr = u32(tmp_u32no1 + tmp_u32no2)

            tmp_u32no1 = u32(self.overdrive + ((prior_snr + 8192) >> 14))
            tmp_u16no1 = u32(prior_snr + tmp_u32no1 // 2) // tmp_u32no1
            self.noise_sup_filter[i] = max(
                self.denoise_bound, min(16384, tmp_u16no1))

            if self.block_index < END_STARTUP_SHORT:
                tmp_u32no1 = u32(int(self.noise_sup_filter[i]) *
                                 self.block_index)
                tmp_u32no2 = u32(int(noise_sup_filter_tmp[i]) *
                                 (END_STARTUP_SHORT - self.block_index))
                tmp_u32no1 = u32(tmp_u32no1 + tmp_u32no2)
                self.noise_sup_filter[i] = div_u32_u16(
                    tmp_u32no1, END_STARTUP_SHORT) & 0xFFFF

        # save noise and magnitude spectrum for next frame
        self.prev_q_noise = q_noise
        self.prev_q_magn = q_magn
        if norm32no1 > 5:
            for i in range(self.magn_len):
                self.prev_noise_u32[i] = u32(int(noise_u32[i]) <<
                                             (norm32no1 - 5))
                self.prev_magn_u16[i] = magn[i]
        else:
            for i in range(self.magn_len):
                self.prev_noise_u32[i] = u32(noise_u32[i]) >> \
                    (5 - norm32no1)
                self.prev_magn_u16[i] = magn[i]

        out_frames[0][:] = self._data_synthesis()

        # high band: time-domain gain derived from low band
        if num_bands > 1:
            n = self.ana_len
            for i in range(num_high_bands):
                self.data_buf_hb[i][:n - b] = self.data_buf_hb[i][b:n]
                self.data_buf_hb[i][n - b:n] = speech_frames[i + 1]

            tmp_u32no1 = 0  # Q12
            tmp_u16no1 = 0  # Q8
            for i in range(self.ana_len2 - (self.ana_len2 >> 2),
                           self.ana_len2):
                tmp_u16no1 = (tmp_u16no1 + int(non_speech_prob[i])) & \
                    0xFFFF
                tmp_u32no1 = u32(tmp_u32no1 +
                                 int(self.noise_sup_filter[i]))
            avg_prob_speech_hb = w16(4096 -
                                     (tmp_u16no1 >> (self.stages - 7)))
            avg_filter_gain_hb = w16(tmp_u32no1 >> (self.stages - 3))
            gain_mod_hb = min(avg_prob_speech_hb, 3607)
            if avg_prob_speech_hb < 2048:
                gain_time_domain_hb = w16((gain_mod_hb << 1) +
                                          (avg_filter_gain_hb >> 1))
            else:
                gain_time_domain_hb = w16((3 * avg_filter_gain_hb) >> 2)
                gain_time_domain_hb = w16(gain_time_domain_hb +
                                          gain_mod_hb)
            gain_time_domain_hb = max(w16(self.denoise_bound),
                                      min(16384, gain_time_domain_hb))
            for i in range(num_high_bands):
                for j in range(b):
                    out_frames[i + 1][j] = w16(
                        (gain_time_domain_hb *
                         int(self.data_buf_hb[i][j])) >> 14)


# --------------------------------------------------------------------------
# daemon wrapper (src/webrtc.c ns_* with MAKE_WEBRTC_NSX defined)
# --------------------------------------------------------------------------

class NsxProcessor:
    """ns_init/ns_process with the NSX branch (webrtc.c:511-530): 10 ms
    packages, Analyze is a no-op, and the CHANNELS are passed to
    WebRtcNsx_Process as BANDS — in stereo the left channel receives the
    full spectral analysis and the right channel only the derived
    time-domain high-band gain (webrtc.c:633-646)."""

    def __init__(self, chn: int, freq: int, mode: int = 2):
        if freq > 32000 or freq % 8000 != 0:
            raise ValueError("freq must be 8000/16000/32000")
        self.chn = chn
        self.freq = freq
        self.pkg_frame = freq // 1000 * 10
        self.inst = NoiseSuppressionFixed(freq)
        self.inst.set_policy(mode)

    def process(self, frame: np.ndarray) -> np.ndarray:
        x = np.asarray(frame, np.int16).reshape(-1, self.chn)
        n_frames = x.shape[0]
        out = np.zeros((n_frames, self.chn), np.int16)
        blk = self.inst.block_len_10ms  # 160 even at 32 kHz
        for off in range(0, n_frames, self.pkg_frame):
            # at 32 kHz the 10 ms package is 320 samples but the core's
            # block is 160: only the first half is processed, the rest
            # of the output stays zero (webrtc.c:577 vs nsx InitCore)
            bands_in = [x[off:off + blk, c].astype(np.int64)
                        for c in range(self.chn)]
            bands_out = [np.zeros(blk, np.int64)
                         for _ in range(self.chn)]
            self.inst.process(bands_in, bands_out)
            for c in range(self.chn):
                out[off:off + blk, c] = bands_out[c].astype(np.int16)
        return out.reshape(-1)

"""Batched NSX core (dsp/nsx_jnp.py) vs the host fixed-point port —
bit-exact, all state leaves.

The host port is itself gated sample-for-sample against the compiled C
reference (tests/test_nsx.py); these tests pin the jnp re-derivation to
it across startup transitions, zero-input blocks, all sample-rate
geometries, the 512-block histogram refresh (heavy), and vmap batching.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wmix_tpu.dsp.nsx import NoiseSuppressionFixed
from wmix_tpu.dsp import nsx_jnp


def _mask32(x):
    return np.asarray(x).astype(np.int64) & 0xFFFFFFFF


def _host_state(h):
    ml = h.magn_len
    return {
        "analysis_buffer": h.analysis_buffer[:h.ana_len],
        "synthesis_buffer": h.synthesis_buffer[:h.ana_len],
        "data_buf_hb": h.data_buf_hb[:, :h.ana_len],
        "noise_est_quantile": h.noise_est_quantile[:ml],
        "noise_est_log_quantile":
            h.noise_est_log_quantile.reshape(3, -1)[:, :ml],
        "noise_est_density": h.noise_est_density.reshape(3, -1)[:, :ml],
        "noise_est_counter": h.noise_est_counter,
        "noise_sup_filter": h.noise_sup_filter[:ml],
        "prior_non_speech_prob": h.prior_non_speech_prob,
        "prev_magn_u16": h.prev_magn_u16[:ml],
        "prev_noise_u32": np.asarray(
            [x & 0xFFFFFFFF for x in h.prev_noise_u32[:ml]]),
        "log_lrt_time_avg_w32": h.log_lrt_time_avg_w32[:ml],
        "avg_magn_pause": h.avg_magn_pause[:ml],
        "init_magn_est": np.asarray(
            [x & 0xFFFFFFFF for x in h.init_magn_est[:ml]]),
        "threshold_log_lrt": h.threshold_log_lrt,
        "threshold_spec_diff": h.threshold_spec_diff,
        "threshold_spec_flat": h.threshold_spec_flat & 0xFFFFFFFF,
        "feature_log_lrt": np.int64(h.feature_log_lrt) & 0xFFFFFFFF,
        "feature_spec_flat": h.feature_spec_flat & 0xFFFFFFFF,
        "feature_spec_diff": h.feature_spec_diff & 0xFFFFFFFF,
        "weight_log_lrt": h.weight_log_lrt,
        "weight_spec_flat": h.weight_spec_flat,
        "weight_spec_diff": h.weight_spec_diff,
        "cur_avg_magn_energy": h.cur_avg_magn_energy & 0xFFFFFFFF,
        "time_avg_magn_energy": h.time_avg_magn_energy & 0xFFFFFFFF,
        "time_avg_magn_energy_tmp":
            h.time_avg_magn_energy_tmp & 0xFFFFFFFF,
        "hist_lrt": h.hist_lrt,
        "hist_spec_diff": h.hist_spec_diff,
        "hist_spec_flat": h.hist_spec_flat,
        "block_index": h.block_index,
        "cnt_thres_update": h.cnt_thres_update,
        "prev_q_magn": h.prev_q_magn,
        "q_noise": np.int64(h.q_noise) & 0xFFFFFFFF,
        "prev_q_noise": h.prev_q_noise,
        "white_noise_level": h.white_noise_level & 0xFFFFFFFF,
        "pink_noise_numerator": h.pink_noise_numerator,
        "pink_noise_exp": h.pink_noise_exp,
        "min_norm": h.min_norm,
    }


def _scene(blk, n_blocks, nb, seed, fs):
    rng = np.random.RandomState(seed)
    t = np.arange(blk * n_blocks) / fs
    sigs = []
    for c in range(nb):
        s = (np.sin(2 * np.pi * (300 + 120 * c) * t) * 2500 *
             (np.sin(2 * np.pi * 0.5 * t + c) > -0.3) +
             rng.randn(blk * n_blocks) * 400)
        sigs.append(np.clip(s, -32768, 32767).astype(np.int64))
    sigs[0][18 * blk:21 * blk] = 0
    return sigs


def _run_compare(fs, nb, n_blocks, check_state=False, mode=2):
    host = NoiseSuppressionFixed(fs)
    host.set_policy(mode)
    st = nsx_jnp.init_state(fs, mode)
    blk = host.block_len_10ms
    sigs = _scene(blk, n_blocks, nb, seed=fs % 97, fs=fs)
    fn = jax.jit(lambda s, b: nsx_jnp.process_block(s, b, fs, mode, nb))
    for k in range(n_blocks):
        bands = [s[k * blk:(k + 1) * blk] for s in sigs]
        outs_h = [np.zeros(blk, np.int64) for _ in range(nb)]
        host.process([b.copy() for b in bands], outs_h)
        st, out_d = fn(st, jnp.asarray(np.stack(bands), jnp.int32))
        out_d = np.asarray(out_d)
        for c in range(nb):
            np.testing.assert_array_equal(
                out_d[c].astype(np.int64), outs_h[c],
                err_msg=f"fs={fs} band {c} block {k}")
        if check_state:
            hs = _host_state(host)
            for name in st._fields:
                np.testing.assert_array_equal(
                    _mask32(getattr(st, name)), _mask32(hs[name]),
                    err_msg=f"fs={fs} state {name} block {k}")


def test_16k_mono_full_state():
    _run_compare(16000, 1, 60, check_state=True)


def test_8k_mono():
    _run_compare(8000, 1, 80)


def test_16k_stereo_bands():
    _run_compare(16000, 2, 60)


def test_32k_stereo_bands():
    _run_compare(32000, 2, 60)


def test_mode0_no_gainmap():
    _run_compare(16000, 1, 60, mode=0)


@pytest.mark.heavy
def test_startup_and_histogram_refresh_transitions():
    """Crosses END_STARTUP_SHORT (50), END_STARTUP_LONG (200) and the
    512-block feature refresh, with zero-input patches, full state."""
    _run_compare(16000, 1, 530, check_state=True)


def test_vmap_equals_per_stream():
    fs, B, blk, n_blocks = 16000, 4, 160, 40
    rng = np.random.RandomState(3)
    sigs = (rng.randn(B, blk * n_blocks) * 600 +
            np.sin(2 * np.pi * np.arange(blk * n_blocks) / fs *
                   (200 + np.arange(B)[:, None] * 80)) * 2000
            ).astype(np.int16).astype(np.int32)
    sigs[1, 8 * blk:11 * blk] = 0
    sts = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[nsx_jnp.init_state(fs, 2) for _ in range(B)])
    vfn = jax.jit(jax.vmap(
        lambda s, b: nsx_jnp.process_block(s, b, fs, 2, 1)))
    sfn = jax.jit(lambda s, b: nsx_jnp.process_block(s, b, fs, 2, 1))
    singles = [nsx_jnp.init_state(fs, 2) for _ in range(B)]
    for k in range(n_blocks):
        blkk = sigs[:, k * blk:(k + 1) * blk]
        sts, out_b = vfn(sts, jnp.asarray(blkk[:, None, :]))
        for b in range(B):
            singles[b], o1 = sfn(singles[b],
                                 jnp.asarray(blkk[b][None, :]))
            np.testing.assert_array_equal(
                np.asarray(out_b)[b], np.asarray(o1),
                err_msg=f"stream {b} block {k}")

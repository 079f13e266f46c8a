"""Batched device AAC filterbank vs the host decoder, bit-exact.

The host codecs/aac.py is itself bit-exact vs the compiled faad2
reference (tests/test_aac.py); these tests pin the device-batched
filterbank (codecs/aac_batch.py) to the host path bitwise on the CPU
backend, where every jnp op rounds to float32 exactly like numpy.
"""
import os

import numpy as np
import pytest

FIXDIR = "/root/reference/audio"
FIX = os.path.join(FIXDIR, "2x44100.aac")

pytestmark = pytest.mark.skipif(not os.path.exists(FIX),
                                reason="reference fixture missing")


def _frames(data, n):
    """First n ADTS frames of the fixture."""
    out = []
    pos = 0
    for _ in range(n):
        if pos + 7 > len(data):
            break
        flen = ((data[pos + 3] & 0x3) << 11) | (data[pos + 4] << 3) | \
            (data[pos + 5] >> 5)
        out.append(data[pos:pos + flen])
        pos += flen
    return out


def _host_decode(frames):
    from wmix_tpu.codecs.aac import AacDecoder
    dec = AacDecoder()
    pcms = []
    for f in frames:
        pcm, _c, _n, _f = dec.decode(f)
        pcms.append(pcm)
    return pcms


def test_imdct_matches_host():
    from wmix_tpu.codecs.aac import faad_imdct
    from wmix_tpu.codecs.aac_batch import imdct_jnp
    rng = np.random.RandomState(0)
    for N in (2048, 256):
        x = (rng.randn(3, N // 2) * 100).astype(np.float32)
        want = np.stack([faad_imdct(N, x[i]) for i in range(3)])
        got = np.asarray(imdct_jnp(N, x))
        np.testing.assert_array_equal(got, want)


def test_filterbank_combos_match_host():
    """Every window sequence x shape combo, random spectra, vs the host
    ifilter_bank over multi-frame state evolution."""
    from wmix_tpu.codecs.aac import ifilter_bank
    from wmix_tpu.codecs.aac_batch import BatchedFilterbank
    rng = np.random.RandomState(1)
    # frame sequence exercising transitions: long, start, short, short,
    # stop, long with shape changes
    seqs = [(0, 0), (1, 0), (2, 1), (2, 1), (3, 0), (0, 0), (1, 1),
            (2, 0), (3, 1), (0, 1)]
    B = 3
    fb = BatchedFilterbank(B)
    host_ov = [np.zeros(1024, np.float32) for _ in range(B)]
    host_prev = [0] * B
    for seq, shape in seqs:
        specs = (rng.randn(B, 1024) * 50).astype(np.float32)
        jobs = [(b, seq, shape, specs[b]) for b in range(B)]
        outs = fb.frame(jobs)
        for b in range(B):
            want, new_ov = ifilter_bank(seq, shape, host_prev[b],
                                        specs[b], host_ov[b])
            host_ov[b] = new_ov
            host_prev[b] = shape
            np.testing.assert_array_equal(outs[b], want)


def test_batch_decoder_matches_host_staggered():
    """3 concurrent decodes of the LC fixture with staggered starts,
    bitwise vs the per-stream host decoder."""
    from wmix_tpu.codecs.aac_batch import AacBatchDecoder
    data = open(FIX, "rb").read()
    # 30 frames reaches the fixture's KBD-window (shape=1) region at
    # frame ~22, which a shorter run would miss
    frames = _frames(data, 30)
    n_frames = len(frames)
    assert n_frames >= 25
    want = _host_decode(frames)

    B = 3
    dec = AacBatchDecoder(B)
    starts = [0, 2, 5]
    got = {b: [] for b in range(B)}
    blob = b"".join(frames)
    for t in range(n_frames + max(starts)):
        for b, s in enumerate(starts):
            if t == s:
                dec.start(b, blob)
        pcms, _done = dec.tick()
        for b, pcm in pcms.items():
            got[b].append(pcm)
    for b, s in enumerate(starts):
        have = got[b]
        # host emits an empty pcm for the suppressed first frame
        want_b = [w for w in want if w.size][:len(have)]
        assert len(have) == n_frames - 1
        for h, w in zip(have, want_b):
            np.testing.assert_array_equal(h, w)

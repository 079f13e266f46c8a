"""Device-resident AAC-LC inverse filterbank, batched over streams
(VERDICT r2 next-round #2 / SURVEY §7 step 5: host-side bitstream
parsing, transform math on the TPU as batched array programs).

The faad2 pipeline (vendored mdct.c / filtbank.c, driven from the
daemon's aac tasks via src/aacType.c:125-255) ends in the IMDCT +
window-overlap-add filterbank — the FLOPs of an LC decode.  Huffman,
requantization, MS/IS/PNS and TNS stay on host per stream
(control-heavy, data-dependent bitstream work; codecs/aac.py
decode_deferred); the filterbank runs here as batched jitted programs:

  * the IMDCT is the host decoder's exact dataflow — pre-twiddle,
    the cfft.c cfftf1pos radix-4/2 pass sequence, post-twiddle, and
    the output interleave as one gather — with a leading stream axis;
  * the 4 window sequences x window-shape combinations are separate
    compiled programs; streams are grouped per tick by
    (sequence, shape, prev_shape) and dispatched per group;
  * overlap (fb_intermed) state lives on device, [slots, 1024] f32.

On the CPU backend every op rounds to float32 exactly like the host
numpy path, so output is bit-identical (tests/test_aac_batch.py); on
TPU the VPU may contract mul+add pairs, worth low-LSB deviations in
the final int16 like the record chain's fast mode.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from wmix_tpu.codecs import _aac_tables as T
from wmix_tpu.codecs.aac import (EIGHT_SHORT_SEQUENCE, LONG_START_SEQUENCE,
                                 LONG_STOP_SEQUENCE, ONLY_LONG_SEQUENCE,
                                 _cfft_plan, to_pcm_16bit)
from wmix_tpu.dsp.floatops import fast_mode, gm, guard_zero

F32 = jnp.float32


# ------------------------------------------------------------------ cfft

def _passf2pos_jnp(ido, l1, cre, cim, wre, wim, z):
    """passf2pos (cfft.c:56-105) with a leading batch axis."""
    B = cre.shape[0]
    cc_re = cre.reshape(B, l1, 2, ido)
    cc_im = cim.reshape(B, l1, 2, ido)
    o0_re = cc_re[:, :, 0] + cc_re[:, :, 1]
    o0_im = cc_im[:, :, 0] + cc_im[:, :, 1]
    t2_re = cc_re[:, :, 0] - cc_re[:, :, 1]
    t2_im = cc_im[:, :, 0] - cc_im[:, :, 1]
    if ido == 1:
        o1_re, o1_im = t2_re, t2_im
    else:
        o1_im = gm(t2_im, wre, z) + gm(t2_re, wim, z)
        o1_re = gm(t2_re, wre, z) - gm(t2_im, wim, z)
    out_re = jnp.stack([o0_re, o1_re], axis=1)
    out_im = jnp.stack([o0_im, o1_im], axis=1)
    return out_re.reshape(B, -1), out_im.reshape(B, -1)


def _passf4pos_jnp(ido, l1, cre, cim, w1re, w1im, w2re, w2im,
                   w3re, w3im, z):
    """passf4pos (cfft.c:334-430) with a leading batch axis."""
    B = cre.shape[0]
    cc_re = cre.reshape(B, l1, 4, ido)
    cc_im = cim.reshape(B, l1, 4, ido)
    t2_re = cc_re[:, :, 0] + cc_re[:, :, 2]
    t1_re = cc_re[:, :, 0] - cc_re[:, :, 2]
    t2_im = cc_im[:, :, 0] + cc_im[:, :, 2]
    t1_im = cc_im[:, :, 0] - cc_im[:, :, 2]
    t3_re = cc_re[:, :, 1] + cc_re[:, :, 3]
    t4_im = cc_re[:, :, 1] - cc_re[:, :, 3]
    t3_im = cc_im[:, :, 3] + cc_im[:, :, 1]
    t4_re = cc_im[:, :, 3] - cc_im[:, :, 1]

    o0_re = t2_re + t3_re
    o0_im = t2_im + t3_im
    c3_re = t2_re - t3_re
    c3_im = t2_im - t3_im
    c2_re = t1_re + t4_re
    c2_im = t1_im + t4_im
    c4_re = t1_re - t4_re
    c4_im = t1_im - t4_im
    if ido == 1:
        o1_re, o1_im = c2_re, c2_im
        o2_re, o2_im = c3_re, c3_im
        o3_re, o3_im = c4_re, c4_im
    else:
        o1_im = gm(c2_im, w1re, z) + gm(c2_re, w1im, z)
        o1_re = gm(c2_re, w1re, z) - gm(c2_im, w1im, z)
        o2_im = gm(c3_im, w2re, z) + gm(c3_re, w2im, z)
        o2_re = gm(c3_re, w2re, z) - gm(c3_im, w2im, z)
        o3_im = gm(c4_im, w3re, z) + gm(c4_re, w3im, z)
        o3_re = gm(c4_re, w3re, z) - gm(c4_im, w3im, z)
    out_re = jnp.stack([o0_re, o1_re, o2_re, o3_re], axis=1)
    out_im = jnp.stack([o0_im, o1_im, o2_im, o3_im], axis=1)
    return out_re.reshape(B, -1), out_im.reshape(B, -1)


def _cfftb_jnp(n, re, im, z):
    """cfftb (cfft.c:858-861) — same pass sequence as the host
    codecs/aac.cfftb, batched: re/im [B, n]."""
    ifac, wa_re, wa_im = _cfft_plan(n)
    l1 = 1
    iw = 0
    for ip in ifac:
        l2 = ip * l1
        ido = n // l2
        if ip == 4:
            re, im = _passf4pos_jnp(
                ido, l1, re, im,
                wa_re[iw:iw + ido], wa_im[iw:iw + ido],
                wa_re[iw + ido:iw + 2 * ido], wa_im[iw + ido:iw + 2 * ido],
                wa_re[iw + 2 * ido:iw + 3 * ido],
                wa_im[iw + 2 * ido:iw + 3 * ido], z)
        elif ip == 2:
            re, im = _passf2pos_jnp(ido, l1, re, im,
                                    wa_re[iw:iw + ido],
                                    wa_im[iw:iw + ido], z)
        else:
            raise ValueError(f"cfft radix {ip} not needed for LC")
        l1 = l2
        iw += (ip - 1) * ido
    return re, im


# ----------------------------------------------------------------- imdct

@functools.lru_cache(maxsize=4)
def _imdct_interleave(N: int):
    """(src, sign): out[j] = sign[j] * concat(z_re, z_im)[src[j]]
    replicating the mdct.c:168-230 output stores."""
    N2, N4, N8 = N // 2, N // 4, N // 8
    src = np.zeros(N, np.int32)
    sign = np.zeros(N, np.float32)
    k = np.arange(N8)
    IM = N4  # z_im offset in the concatenated [z_re | z_im] vector

    def put(sl, idx, sg):
        src[sl] = idx
        sign[sl] = sg

    put(np.arange(0, N4, 2), IM + N8 + k, 1.0)
    put(np.arange(1, N4, 2), N8 - 1 - k, -1.0)
    put(np.arange(N4, N2, 2), k, 1.0)
    put(np.arange(N4 + 1, N2, 2), IM + N4 - 1 - k, -1.0)
    put(np.arange(N2, N2 + N4, 2), N8 + k, 1.0)
    put(np.arange(N2 + 1, N2 + N4, 2), IM + N8 - 1 - k, -1.0)
    put(np.arange(N2 + N4, N, 2), IM + k, -1.0)
    put(np.arange(N2 + N4 + 1, N, 2), N4 - 1 - k, 1.0)
    return src, sign


def imdct_jnp(N: int, x_in, z=None):
    """faad_imdct (mdct.c:122-230) batched: x_in [B, N/2] -> [B, N].

    `z` is the floatops.gm FMA guard (exact mode blocks XLA:CPU's
    mul+add contraction so output matches the host numpy bitwise);
    derived from the input when not supplied."""
    if z is None:
        z = guard_zero(x_in)
    tab = np.asarray(T.MDCT_TAB_2048 if N == 2048 else T.MDCT_TAB_256,
                     np.float32)
    N2, N4 = N // 2, N // 4
    sc_re = tab[:, 0]
    sc_im = tab[:, 1]

    a = x_in[:, 0:N2:2].astype(F32)
    b = x_in[:, N2 - 1::-2][:, :N4].astype(F32)
    z_im = gm(a, sc_re, z) + gm(b, sc_im, z)
    z_re = gm(b, sc_re, z) - gm(a, sc_im, z)

    z_re, z_im = _cfftb_jnp(N4, z_re, z_im, z)

    new_im = gm(z_im, sc_re, z) + gm(z_re, sc_im, z)
    new_re = gm(z_re, sc_re, z) - gm(z_im, sc_im, z)

    src, sign = _imdct_interleave(N)
    zcat = jnp.concatenate([new_re, new_im], axis=1)
    return zcat[:, src] * sign


# ----------------------------------------------------------- filter bank

@functools.lru_cache(maxsize=None)
def _fb_fn(window_sequence: int, window_shape: int,
           window_shape_prev: int, frame_len: int = 1024,
           fast: bool = False):
    """One jitted batched ifilter_bank (filtbank.c:165-330) program per
    (sequence, shape, prev) combo: (freq [G, 1024], overlap [G, 1024])
    -> (time_out, new_overlap).  `fast` keys the cache on
    floatops.fast_mode() — the guarded and plain programs differ."""
    nlong = frame_len
    nshort = frame_len // 8
    trans = nshort // 2
    nflat_ls = (nlong - nshort) // 2

    long_w = [np.asarray(T.SINE_LONG_1024, np.float32),
              np.asarray(T.KBD_LONG_1024, np.float32)]
    short_w = [np.asarray(T.SINE_SHORT_128, np.float32),
               np.asarray(T.KBD_SHORT_128, np.float32)]
    window_long = long_w[window_shape]
    window_long_prev = long_w[window_shape_prev]
    window_short = short_w[window_shape]
    window_short_prev = short_w[window_shape_prev]
    wl_rev = window_long[::-1].copy()
    ws_rev = window_short[::-1].copy()

    def fn(freq_in, overlap):
        G = freq_in.shape[0]
        z = guard_zero(freq_in)
        if window_sequence == ONLY_LONG_SEQUENCE:
            transf = imdct_jnp(2 * nlong, freq_in, z)
            time_out = overlap + gm(transf[:, :nlong], window_long_prev, z)
            new_overlap = transf[:, nlong:] * wl_rev
        elif window_sequence == LONG_START_SEQUENCE:
            transf = imdct_jnp(2 * nlong, freq_in, z)
            time_out = overlap + gm(transf[:, :nlong], window_long_prev, z)
            new_overlap = jnp.concatenate([
                transf[:, nlong:nlong + nflat_ls],
                transf[:, nlong + nflat_ls:nlong + nflat_ls + nshort] *
                ws_rev,
                jnp.zeros((G, nlong - nflat_ls - nshort), F32)], axis=1)
        elif window_sequence == EIGHT_SHORT_SEQUENCE:
            # 8 short IMDCTs folded into the batch axis: [G*8, 256]
            sub = freq_in.reshape(G, 8, nshort).reshape(G * 8, nshort)
            transf = imdct_jnp(2 * nshort, sub, z).reshape(G, 16 * nshort)
            ws, wsp = window_short, window_short_prev
            parts = [overlap[:, :nflat_ls],
                     overlap[:, nflat_ls:nflat_ls + nshort] +
                     gm(transf[:, :nshort], wsp, z)]
            for blk in range(1, 4):
                parts.append(
                    overlap[:, nflat_ls + blk * nshort:
                            nflat_ls + (blk + 1) * nshort] +
                    gm(transf[:, (2 * blk - 1) * nshort:
                              2 * blk * nshort], ws_rev, z) +
                    gm(transf[:, 2 * blk * nshort:
                              (2 * blk + 1) * nshort], ws, z))
            parts.append(
                overlap[:, nflat_ls + 4 * nshort:nflat_ls + 4 * nshort +
                        trans] +
                gm(transf[:, 7 * nshort:7 * nshort + trans],
                   ws_rev[:trans], z) +
                gm(transf[:, 8 * nshort:8 * nshort + trans],
                   ws[:trans], z))
            time_out = jnp.concatenate(parts, axis=1)

            ov = [gm(transf[:, 7 * nshort + trans:8 * nshort],
                     ws_rev[trans:], z) +
                  gm(transf[:, 8 * nshort + trans:9 * nshort],
                     ws[trans:], z)]
            for blk in range(5, 8):
                ov.append(
                    gm(transf[:, (2 * blk - 1) * nshort:2 * blk * nshort],
                       ws_rev, z) +
                    gm(transf[:, 2 * blk * nshort:
                              (2 * blk + 1) * nshort], ws, z))
            ov.append(transf[:, 15 * nshort:] * ws_rev)
            # [trans + 4*nshort, nlong) stays zero = nflat_ls samples
            new_overlap = jnp.concatenate(
                ov + [jnp.zeros((G, nflat_ls), F32)], axis=1)
        elif window_sequence == LONG_STOP_SEQUENCE:
            transf = imdct_jnp(2 * nlong, freq_in, z)
            time_out = jnp.concatenate([
                overlap[:, :nflat_ls],
                overlap[:, nflat_ls:nflat_ls + nshort] +
                gm(transf[:, nflat_ls:nflat_ls + nshort],
                   window_short_prev, z),
                overlap[:, nflat_ls + nshort:] +
                transf[:, nflat_ls + nshort:nlong]], axis=1)
            new_overlap = transf[:, nlong:] * wl_rev
        else:
            raise ValueError("bad window sequence")
        return time_out, new_overlap

    return jax.jit(fn)


class BatchedFilterbank:
    """Device-resident fb_intermed state for `slots` channel slots and
    grouped-per-combo dispatch of one frame's filterbank jobs."""

    def __init__(self, slots: int, frame_len: int = 1024):
        self.slots = slots
        self.frame_len = frame_len
        self.overlap = jnp.zeros((slots, frame_len), F32)
        self.shape_prev = np.zeros(slots, np.int32)

    def reset(self, idx) -> None:
        self.overlap = self.overlap.at[np.asarray(idx)].set(0.0)
        self.shape_prev[np.asarray(idx)] = 0

    def frame_stacked(self, idx, seq: int, shape: int, specs):
        """Fast path for a homogeneous frame: all `idx` slots share one
        (sequence, shape) and their shape_prev agree; `specs` is an
        already-stacked [len(idx), frame_len] f32 array (device or
        host).  Returns the device time_out [len(idx), frame_len] —
        everything stays on device."""
        idx = np.asarray(idx, np.int32)
        prev = int(self.shape_prev[idx[0]])
        assert (self.shape_prev[idx] == prev).all(), \
            "mixed shape_prev: use frame()"
        from wmix_tpu.dsp.floatops import fast_mode
        fn = _fb_fn(int(seq), int(shape), prev, self.frame_len,
                    fast_mode())
        time_out, new_ov = fn(jnp.asarray(specs, F32),
                              self.overlap[idx])
        self.overlap = self.overlap.at[idx].set(new_ov)
        self.shape_prev[idx] = shape
        return time_out

    def frame(self, jobs):
        """jobs: [(slot, window_sequence, window_shape,
        spec_f32 [frame_len]), ...] — one per active channel slot.
        Returns {slot: time_out np.float32 [frame_len]}."""
        groups = {}
        for slot, seq, shape, spec in jobs:
            key = (int(seq), int(shape), int(self.shape_prev[slot]))
            groups.setdefault(key, []).append((slot, spec))
        out = {}
        for (seq, shape, prev), members in groups.items():
            idx = np.asarray([m[0] for m in members], np.int32)
            freq = jnp.asarray(np.stack([m[1] for m in members])
                               .astype(np.float32))
            fn = _fb_fn(seq, shape, prev, self.frame_len,
                        fast_mode())
            time_out, new_ov = fn(freq, self.overlap[idx])
            self.overlap = self.overlap.at[idx].set(new_ov)
            self.shape_prev[idx] = shape
            t_np = np.asarray(time_out)
            for j, (slot, _spec) in enumerate(members):
                out[slot] = t_np[j]
        return out


# ---------------------------------------------------------------- driver

class AacBatchDecoder:
    """N concurrent plain-LC AAC decodes: per-stream host front-ends
    (ADTS parse, huffman, requantize, MS/IS/PNS, TNS) and batched
    device filterbank dispatches per tick — the AAC counterpart of
    codecs/mp3_batch.Mp3BatchDecoder.  Streams with SBR (HE-AAC) are
    rejected by decode_deferred and must use the host AacDecoder."""

    MAX_CH = 2

    def __init__(self, batch: int):
        from wmix_tpu.codecs.aac import AacDecoder
        self.batch = batch
        self.front = [AacDecoder() for _ in range(batch)]
        self.fb = BatchedFilterbank(batch * self.MAX_CH)
        self._bufs = [b""] * batch
        self._active = [False] * batch
        self._native = [None] * batch

    def start(self, b: int, data: bytes) -> None:
        """Begin decoding `data` on stream b.  The bitstream front-end
        is the native C decoder (codecs/aacfe.py, ~200x real time per
        core); it raises Unsupported on non-LC streams mid-stream, in
        which case the stream restarts on the Python front-end."""
        from wmix_tpu.codecs import aacfe
        from wmix_tpu.codecs.aac import AacDecoder
        self.front[b] = AacDecoder()
        self.fb.reset([b * self.MAX_CH, b * self.MAX_CH + 1])
        self._bufs[b] = data
        self._active[b] = True
        self._native[b] = None
        if aacfe.available():
            try:
                self._native[b] = aacfe.NativeAacFront(data)
            except Exception:
                self._native[b] = None

    def _next_frame(self, b: int):
        """One frame from stream b via the native front-end (falling
        back to Python transparently); returns (jobs, nch, emit) or
        None at end of stream."""
        from wmix_tpu.codecs import aacfe
        if self._native[b] is not None:
            try:
                r = self._native[b].next_frame()
            except aacfe.Unsupported:
                # restart the stream on the Python front-end (the
                # first frame decides: LC streams never switch)
                self._native[b] = None
                return self._next_frame(b)
            if r is None:
                return None
            jobs, nch, _freq, emit = r
            return jobs, nch, emit
        buf = self._bufs[b]
        if len(buf) < 7:
            return None
        fjobs, consumed, nch, _freq, emit = \
            self.front[b].decode_deferred(buf)
        if consumed == 0:
            return None
        self._bufs[b] = buf[consumed:]
        return fjobs, nch, emit

    def tick(self):
        """Decode ONE ADTS frame on every active stream; returns
        ({stream: pcm int16 interleaved}, finished list)."""
        jobs = []
        meta = {}
        done = []
        for b in range(self.batch):
            if not self._active[b]:
                continue
            try:
                r = self._next_frame(b)
            except Exception:
                r = None
            if r is None:
                self._active[b] = False
                done.append(b)
                continue
            fjobs, nch, emit = r
            slot_jobs = [(b * self.MAX_CH + ch, seq, shape, spec)
                         for ch, seq, shape, spec in fjobs]
            jobs.extend(slot_jobs)
            meta[b] = (nch, [sj[0] for sj in slot_jobs], emit)
        if not jobs:
            return {}, done
        outs = self.fb.frame(jobs)
        pcms = {}
        for b, (nch, slots, emit) in meta.items():
            if not emit:
                continue
            chans = [outs[s] for s in slots]
            if nch == 2 and len(chans) == 1:
                # PS-capable build's mono upmatrix (decoder.c:1056-1063)
                chans = [chans[0], chans[0]]
            pcms[b] = to_pcm_16bit(chans)
        return pcms, done

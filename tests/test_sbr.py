"""SBR / PS decode parity (HE-AAC, faad2 sbr_*.c + ps_*.c).

The 2x32000.aac fixture only exercises the upsample path (no SBR
payload), so the full reconstruction pipeline — envelope/noise huffman,
frequency band tables, HF patch generation, gain adjustment, noise/
sinusoid assembly, and parametric stereo — is driven with CRAFTED
HE-AAC streams: the fixture's LC core frames get hand-built SBR fill
elements spliced in at the bit level (header, FIXFIX grid, envelope +
noise floors, optionally a PS extension).  Both this port and the
compiled reference (libfaad_sbr_probe.so via NeAACDec*) decode the same
bytes; outputs must match bit for bit.
"""
import ctypes as C
import os

import numpy as np
import pytest

from wmix_tpu.codecs import aac, sbr
from wmix_tpu.codecs import _sbr_tables as TBL

PROBE = "/root/repo/.oracle/libfaad_sbr_probe.so"
FIXTURE = "/root/reference/audio/2x32000.aac"

pytestmark = [
    pytest.mark.heavy,
    pytest.mark.skipif(not os.path.exists(PROBE),
                       reason="sbr probe not built"),
]


# -- bit writer ------------------------------------------------------------

class BW:
    def __init__(self):
        self.bits = []

    def put(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def extend(self, bits):
        self.bits.extend(bits)


def _huff_path(table, leaf, index=0, path=()):
    """Find the bit path decoding to `leaf` (the raw negative index)."""
    for bit in (0, 1):
        nxt = int(table[index][bit])
        if nxt == leaf:
            return path + (bit,)
        if nxt >= 0:
            r = _huff_path(table, leaf, nxt, path + (bit,))
            if r is not None:
                return r
    return None


def _sbr_code(table, delta):
    """Envelope/noise huffman: decoder returns leaf+64 = delta."""
    return _huff_path(table, delta - 64)


def _ps_code(table, delta):
    """PS huffman: decoder returns leaf+31 = delta."""
    return _huff_path(table, delta - 31)


# -- SBR payload construction ---------------------------------------------

def _craft_sbr_payload(first, with_ps, n_q, n_low, env_start=30,
                       noise_start=6):
    """One sbr_extension_data worth of bits (without the 4-bit
    bs_extension_type, which fill_element peeks then sbr re-reads)."""
    w = BW()
    w.put(13, 4)                 # bs_extension_type = EXT_SBR_DATA
    w.put(1 if first else 0, 1)  # bs_header_flag
    if first:
        w.put(1, 1)              # bs_amp_res
        w.put(5, 4)              # bs_start_freq
        w.put(3, 4)              # bs_stop_freq
        w.put(0, 3)              # bs_xover_band
        w.put(0, 2)              # reserved
        w.put(0, 1)              # header_extra_1
        w.put(0, 1)              # header_extra_2
    # sbr_single_channel_element
    w.put(0, 1)                  # bs_data_extra
    # grid: FIXFIX, 1 envelope, LO_RES
    w.put(0, 2)                  # frame_class FIXFIX
    w.put(0, 2)                  # bs_num_env_raw -> 1 env
    w.put(0, 1)                  # freq_res LO
    # dtdf
    w.put(0, 1)                  # df_env
    w.put(0, 1)                  # df_noise
    # invf per noise band
    for _ in range(n_q):
        w.put(2, 2)              # MID
    # envelope: L_E==1 & FIXFIX -> amp_res forced 0 -> 7-bit start
    w.put(env_start, 7)
    for _ in range(1, n_low):
        w.extend(_sbr_code(TBL.F_HUFF_ENV_1_5, 0))  # delta 0
    # noise: 5-bit start + deltas
    w.put(noise_start, 5)
    for _ in range(1, n_q):
        w.extend(_sbr_code(TBL.F_HUFF_ENV_3_0, 0))
    w.put(0, 1)                  # bs_add_harmonic_flag
    if not with_ps:
        w.put(0, 1)              # bs_extended_data
    else:
        w.put(1, 1)              # bs_extended_data
        ps = BW()
        ps.put(2, 2)             # bs_extension_id = EXTENSION_ID_PS
        if first:
            ps.put(1, 1)         # PS header present
            ps.put(1, 1)         # enable_iid
            ps.put(0, 3)         # iid_mode 0 (10 bands)
            ps.put(1, 1)         # enable_icc
            ps.put(0, 3)         # icc_mode 0
            ps.put(0, 1)         # enable_ext
        else:
            ps.put(0, 1)         # no header
        ps.put(0, 1)             # frame_class
        ps.put(1, 2)             # num_env_idx -> 1 envelope
        ps.put(0, 1)             # iid_dt (freq)
        for k in range(10):
            ps.extend(_ps_code(TBL.F_HUFF_IID_DEF,
                               3 if k == 2 else 0))
        ps.put(0, 1)             # icc_dt
        for k in range(10):
            ps.extend(_ps_code(TBL.F_HUFF_ICC, 2 if k < 4 else 0))
        n_ps_bits = len(ps.bits)
        cnt = (n_ps_bits + 7) // 8
        w.put(cnt, 4)            # bs_extension_size (< 15 here)
        w.extend(ps.bits)
        w.put(0, 8 * cnt - n_ps_bits)   # ps fill bits
    return w.bits


def _splice_stream(n_frames=40, with_ps=False):
    """Take LC core frames from the fixture and splice an SBR fill
    element into each, rebuilding the ADTS headers."""
    data = open(FIXTURE, "rb").read()
    frames = []
    pos = 0
    while pos < len(data) - 7 and len(frames) < n_frames:
        off, flen = aac._find_adts(data[pos:])
        if off is None or flen == 0:
            break
        frames.append(data[pos + off:pos + off + flen])
        pos += off + flen

    sr_index = 8  # 16 kHz
    out = bytearray()
    for fi, fr in enumerate(frames):
        # parse to locate the bit position right after the SCE
        ld = aac.Bits(fr)
        dec = aac.AacDecoder()
        dec.init(fr)
        dec._adts_header(ld)
        payload_start_bit = ld.pos
        sce_end = None
        while True:
            el = ld.get(3)
            if el == aac.ID_SCE:
                ld.get(4)
                ics = aac.ICStream()
                dec._individual_channel_stream(ld, ics, False)
                sce_end = ld.pos
                break
            elif el == aac.ID_FIL:
                cnt = ld.get(4)
                if cnt == 15:
                    cnt += ld.get(8) - 1
                for _ in range(cnt):
                    ld.get(8)
            elif el == aac.ID_END:
                break
            else:
                raise AssertionError(f"unexpected element {el}")
        assert sce_end is not None

        # original bits from payload start to end of SCE
        body = BW()
        for p in range(payload_start_bit, sce_end):
            body.put((fr[p >> 3] >> (7 - (p & 7))) & 1, 1)
        # fill element with SBR payload (band counts from the real
        # frequency table calculation for this header)
        probe_sbr = sbr.SbrInfo(1024, 0, 32000, 0)
        sbr.calc_sbr_tables(probe_sbr, 5, 3, 1, 2, 1, 0)
        sbr_bits = _craft_sbr_payload(fi == 0, with_ps,
                                      n_q=probe_sbr.N_Q,
                                      n_low=probe_sbr.N_low)
        count = (len(sbr_bits) + 7) // 8
        body.put(aac.ID_FIL, 3)
        if count >= 15:
            # 4-bit count escape: cnt = 15, then esc_count with
            # cnt += esc_count - 1 (syntax.c fill_element)
            body.put(15, 4)
            body.put(count - 14, 8)
        else:
            body.put(count, 4)
        body.extend(sbr_bits)
        body.put(0, 8 * count - len(sbr_bits))  # sbr align bits
        body.put(aac.ID_END, 3)
        while len(body.bits) % 8:
            body.put(0, 1)
        payload = bytearray()
        for i in range(0, len(body.bits), 8):
            b = 0
            for bit in body.bits[i:i + 8]:
                b = (b << 1) | bit
            payload.append(b)
        frame_len = 7 + len(payload)
        hdr = BW()
        hdr.put(0xFFF, 12)
        hdr.put(1, 1)            # id (MPEG-2 style like the fixture)
        hdr.put(0, 2)            # layer
        hdr.put(1, 1)            # protection absent
        hdr.put(1, 2)            # profile LC
        hdr.put(sr_index, 4)
        hdr.put(0, 1)            # private
        hdr.put(1, 3)            # channel config mono
        hdr.put(0, 1)
        hdr.put(0, 1)
        hdr.put(0, 1)
        hdr.put(0, 1)
        hdr.put(frame_len, 13)
        hdr.put(0x7FF, 11)       # buffer fullness
        hdr.put(0, 2)            # raw data blocks
        hb = bytearray()
        for i in range(0, 56, 8):
            b = 0
            for bit in hdr.bits[i:i + 8]:
                b = (b << 1) | bit
            hb.append(b)
        out += hb + payload
    return bytes(out)


# -- reference decode through the probe ------------------------------------

def _probe_decode(data: bytes):
    lib = C.CDLL(PROBE)
    lib.NeAACDecOpen.restype = C.c_void_p
    lib.NeAACDecInit.restype = C.c_long
    lib.NeAACDecInit.argtypes = [C.c_void_p, C.c_void_p, C.c_ulong,
                                 C.POINTER(C.c_ulong), C.POINTER(C.c_ubyte)]
    lib.NeAACDecDecode.restype = C.c_void_p
    lib.NeAACDecDecode.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p,
                                   C.c_ulong]

    hdl = lib.NeAACDecOpen()
    buf = np.zeros(len(data) + (1 << 16), np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    sr = C.c_ulong(0)
    ch = C.c_ubyte(0)
    n = lib.NeAACDecInit(C.c_void_p(hdl), buf.ctypes.data_as(C.c_void_p),
                         len(data), C.byref(sr), C.byref(ch))
    assert n >= 0
    pos = int(n)
    info = (C.c_ubyte * 256)()
    outs = []
    chn = freq = 0
    while pos < len(data) - 7:
        p = lib.NeAACDecDecode(
            C.c_void_p(hdl), C.byref(info),
            C.c_void_p(buf.ctypes.data + pos), len(data) - pos)
        # NeAACDecFrameInfo offsets (x86_64): bytesconsumed=0,
        # samples=8, channels=16, error=17, samplerate=24
        consumed = int.from_bytes(bytes(info[0:8]), "little")
        samples = int.from_bytes(bytes(info[8:16]), "little")
        channels = info[16]
        error = info[17]
        samplerate = int.from_bytes(bytes(info[24:32]), "little")
        if error != 0 or consumed == 0:
            break
        if p and samples:
            pcm = np.ctypeslib.as_array(
                C.cast(p, C.POINTER(C.c_int16)), (samples,)).copy()
            outs.append(pcm)
            chn, freq = channels, samplerate
        pos += consumed
    lib.NeAACDecClose(C.c_void_p(hdl))
    return (np.concatenate(outs) if outs else np.zeros(0, np.int16),
            chn, freq)


def _my_decode(data: bytes):
    dec = None
    pos = 0
    outs = []
    chn = freq = 0
    while pos < len(data) - 7:
        dec, pcm, consumed, c, f = aac.aac_decode(dec, data[pos:])
        if pcm is None:
            break
        if pcm:
            outs.append(np.frombuffer(pcm, np.int16))
            chn, freq = c, f
        pos += consumed
    return (np.concatenate(outs) if outs else np.zeros(0, np.int16),
            chn, freq)


def test_sbr_reconstruction_bit_exact():
    """Crafted SBR payload (header + envelopes, no PS): the full HF
    generation/adjustment path must match the reference decoder."""
    data = _splice_stream(n_frames=30, with_ps=False)
    ref, rchn, rfreq = _probe_decode(data)
    assert len(ref) > 0, "probe rejected the crafted stream"
    mine, chn, freq = _my_decode(data)
    assert (chn, freq) == (rchn, rfreq)
    np.testing.assert_array_equal(mine, ref)


def test_sbr_ps_bit_exact():
    """Crafted SBR+PS payload: decorrelator + mixing must match."""
    data = _splice_stream(n_frames=30, with_ps=True)
    ref, rchn, rfreq = _probe_decode(data)
    assert len(ref) > 0, "probe rejected the crafted stream"
    mine, chn, freq = _my_decode(data)
    assert (chn, freq) == (rchn, rfreq)
    np.testing.assert_array_equal(mine, ref)


def test_upsample_only_fixture():
    """The shipped fixture (no SBR payload): QMF upsample + upmatrix
    path must match the probe build too."""
    data = open(FIXTURE, "rb").read()
    ref, rchn, rfreq = _probe_decode(data)
    mine, chn, freq = _my_decode(data)
    assert (chn, freq) == (rchn, rfreq) == (2, 32000)
    np.testing.assert_array_equal(mine, ref)

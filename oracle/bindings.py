"""ctypes bindings over the C-reference oracle libraries.

The oracle is the reference implementation (wexiangis/wmix) compiled in place
from /root/reference by ``oracle/build_oracle.sh`` into per-geometry shared
libraries under ``.oracle/``.  The parity test-suite uses it to generate
golden outputs; it is NOT part of the shipped framework.

Reference APIs exercised (citations into /root/reference):
  - mixer/resampler: src/wmix.c:49-222,1639-1957 (via shim)
  - G.711: src/g711codec.c:154-216
  - webrtc wrappers: src/webrtc.{h,c}
  - AAC: src/aacType.c:125-366; MP3: libmad driver in oracle/shim.c
  - FFT: math/fft.c
"""
from __future__ import annotations

import ctypes as C
import os
from pathlib import Path

import numpy as np

ORACLE_DIR = Path(__file__).resolve().parent.parent / ".oracle"


def available(chn: int = 1, freq: int = 8000, variant: str = "") -> bool:
    tag = f"{variant}_" if variant else ""
    return (ORACLE_DIR / f"liboracle_{tag}{chn}x{freq}.so").exists()


_libs: dict[tuple[int, int, str], C.CDLL] = {}


def _lib(chn: int, freq: int, variant: str = "") -> C.CDLL:
    key = (chn, freq, variant)
    if key not in _libs:
        tag = f"{variant}_" if variant else ""
        path = ORACLE_DIR / f"liboracle_{tag}{chn}x{freq}.so"
        if not path.exists():
            raise FileNotFoundError(
                f"{path} missing — run oracle/build_oracle.sh first")
        _libs[key] = C.CDLL(str(path))
    return _libs[key]


def _i16(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int16))


def _ptr(a, typ):
    return a.ctypes.data_as(C.POINTER(typ))


class Oracle:
    """One engine-geometry instance of the compiled reference."""

    def __init__(self, chn: int = 1, freq: int = 8000, variant: str = ""):
        """variant "" = the deployed default build (float NS + float AEC,
        /root/reference/Makefile:55-62); "intdsp" = the NSX + AECM
        integer-DSP switches (src/webrtc.c:173,512)."""
        self.lib = _lib(chn, freq, variant)
        geo = (C.c_int32 * 8)()
        self.lib.shim_geometry(geo)
        (self.chn, self.sample, self.freq, self.aec_interval_ms,
         self.play_correct, self.buff_size, self.pkg_size,
         self.frame_num) = list(geo)
        self._bind()

    def _bind(self):
        lib = self.lib
        lib.shim_load_data.restype = C.c_int64
        lib.shim_load_data.argtypes = [
            C.POINTER(C.c_uint8), C.c_int64, C.c_uint32, C.c_uint32,
            C.c_uint8, C.POINTER(C.c_uint8), C.c_uint32,
            C.c_uint16, C.c_uint8, C.c_uint8, C.c_uint8,
            C.POINTER(C.c_uint32)]
        lib.wmix_len_of_out.restype = C.c_uint32
        lib.wmix_len_of_in.restype = C.c_uint32
        lib.wmix_pcm_zoom.restype = C.c_uint32
        lib.shim_mp3_decode.restype = C.c_int64
        for name in ("vad_init", "aec_init", "ns_init", "agc_init"):
            getattr(lib, name).restype = C.c_void_p

    # ---------------- mixer / resampler ----------------

    def load_data(self, ring: np.ndarray, head_off: int, wmix_head_off: int,
                  wmix_tick: int, reduce_mode: int, src: bytes | np.ndarray,
                  freq: int, chn: int, sample: int = 16, reduce: int = 0,
                  tick: int = 0):
        """Drive wmix_load_data; mutates `ring` (uint8[buff_size+4]) in place.

        Returns (new_head_off, new_tick)."""
        assert ring.dtype == np.uint8 and ring.size >= self.buff_size + 4
        src = np.frombuffer(bytes(src), dtype=np.uint8) \
            if isinstance(src, (bytes, bytearray)) else \
            np.ascontiguousarray(src, dtype=np.uint8)
        n = src.size
        # The reference's repair interpolation reads one sample past the end
        # of the source (src/wmix.c:1858,1915 dereference pSrc after the last
        # copy); pad with zeros so that read is defined for parity purposes.
        src = np.concatenate([src, np.zeros(8, np.uint8)])
        t = C.c_uint32(tick)
        new_head = self.lib.shim_load_data(
            _ptr(ring, C.c_uint8), head_off, wmix_head_off, wmix_tick,
            reduce_mode, _ptr(src, C.c_uint8), n,
            freq, chn, sample, reduce, C.byref(t))
        return new_head, t.value

    def len_of_out(self, in_chn, in_freq, in_len, out_chn, out_freq) -> int:
        return self.lib.wmix_len_of_out(in_chn, in_freq, in_len,
                                        out_chn, out_freq)

    def len_of_in(self, in_chn, in_freq, out_chn, out_freq, out_len) -> int:
        return self.lib.wmix_len_of_in(in_chn, in_freq, out_chn, out_freq,
                                       out_len)

    def pcm_zoom(self, in_chn, in_freq, data: bytes, out_chn, out_freq
                 ) -> bytes:
        src = np.frombuffer(bytes(data), dtype=np.uint8)
        # worst case output length: upsampling ratio + channel doubling
        cap = int(len(data) * (max(out_freq / in_freq, 1.0)) *
                  max(out_chn / in_chn, 1) * 2 + 64)
        out = np.zeros(cap, dtype=np.uint8)
        n = self.lib.wmix_pcm_zoom(in_chn, in_freq, _ptr(src, C.c_uint8),
                                   src.size, out_chn, out_freq,
                                   _ptr(out, C.c_uint8))
        return out[:n].tobytes()

    # ---------------- G.711 ----------------

    def g711a_encode(self, pcm) -> np.ndarray:
        pcm = _i16(pcm)
        out = np.zeros(pcm.size, dtype=np.uint8)
        self.lib.g711a_encode(_ptr(out, C.c_uint8), _ptr(pcm, C.c_int16),
                              pcm.size)
        return out

    def g711a_decode(self, alaw) -> np.ndarray:
        alaw = np.ascontiguousarray(alaw, dtype=np.uint8)
        out = np.zeros(alaw.size, dtype=np.int16)
        self.lib.g711a_decode(_ptr(out, C.c_int16), _ptr(alaw, C.c_uint8),
                              alaw.size)
        return out

    def g711u_encode(self, pcm) -> np.ndarray:
        pcm = _i16(pcm)
        out = np.zeros(pcm.size, dtype=np.uint8)
        self.lib.g711u_encode(_ptr(out, C.c_uint8), _ptr(pcm, C.c_int16),
                              pcm.size)
        return out

    def g711u_decode(self, ulaw) -> np.ndarray:
        ulaw = np.ascontiguousarray(ulaw, dtype=np.uint8)
        out = np.zeros(ulaw.size, dtype=np.int16)
        self.lib.g711u_decode(_ptr(out, C.c_int16), _ptr(ulaw, C.c_uint8),
                              ulaw.size)
        return out

    # ---------------- webrtc wrapper modules ----------------

    def vad(self, chn=None, freq=None, interval_ms=20):
        return _Vad(self.lib, chn or self.chn, freq or self.freq, interval_ms)

    def ns(self, chn=None, freq=None):
        return _Ns(self.lib, chn or self.chn, freq or self.freq)

    def agc(self, chn=None, freq=None, interval_ms=20, value=0):
        return _Agc(self.lib, chn or self.chn, freq or self.freq,
                    interval_ms, value)

    def aec(self, chn=None, freq=None, interval_ms=20):
        return _Aec(self.lib, chn or self.chn, freq or self.freq, interval_ms)

    # ---------------- codecs ----------------

    def mp3_decode(self, data: bytes):
        # libmad has no bounds check on Layer I/II sample reads: corrupt
        # frames can over-read far past the buffer (the guard only covers
        # header peeks).  A C binary's static buffer is zero-tailed, so
        # pad generously to make the in-python result match the binary.
        n_real = len(data)
        data_a = np.zeros(n_real + (1 << 20), dtype=np.uint8)
        data_a[:n_real] = np.frombuffer(bytes(data), dtype=np.uint8)
        cap = 1 << 26  # 64M samples is plenty for the fixtures
        out = np.zeros(cap, dtype=np.int16)
        freq = C.c_uint32(0)
        chn = C.c_uint16(0)
        n = self.lib.shim_mp3_decode(_ptr(data_a, C.c_uint8), n_real,
                                     _ptr(out, C.c_int16), cap,
                                     C.byref(freq), C.byref(chn))
        return out[:n].copy(), freq.value, chn.value

    def aac_decode(self, data: bytes):
        """Decode a full ADTS stream; returns (pcm int16, chn, freq)."""
        dec = C.c_void_p(None)
        buf = bytes(data)
        pos = 0
        chunks = []
        chn = C.c_uint8(0)
        freq = C.c_uint16(0)
        out = np.zeros(8192 * 4, dtype=np.uint8)
        consumed = C.c_int(0)
        while pos < len(buf):
            chunk = np.frombuffer(buf[pos:pos + 4096], dtype=np.uint8)
            ret = self.lib.aac_decode(
                C.byref(dec), _ptr(chunk, C.c_uint8), chunk.size,
                _ptr(out, C.c_uint8), C.byref(consumed),
                C.byref(chn), C.byref(freq))
            if ret > 0:
                chunks.append(out[:ret].copy())
                pos += consumed.value
            elif ret == 0 and consumed.value > 0:
                # ambiguous C return: either the first frame (faad
                # suppresses its output; bytesconsumed = frame bytes) or
                # insufficient data (bytesConsumed = MISSING bytes).  If
                # another ADTS sync follows the consumed span, it was a
                # decoded frame - advance; else we are at stream end.
                nxt = pos + consumed.value
                if nxt + 7 <= len(buf) and buf[nxt] == 0xFF and \
                        (buf[nxt + 1] & 0xF0) == 0xF0:
                    pos = nxt
                else:
                    break
            else:
                pos += max(consumed.value, 1)
        self.lib.aac_decodeRelease(C.byref(dec))
        pcm = (np.concatenate(chunks).view(np.int16)
               if chunks else np.zeros(0, np.int16))
        return pcm, chn.value, freq.value

    def aac_encode(self, pcm: np.ndarray, chn: int, freq: int) -> bytes:
        """Encode int16 PCM to ADTS AAC, 1024 samples/chn per call."""
        enc = C.c_void_p(None)
        pcm = _i16(pcm)
        step = 1024 * chn
        blobs = []
        out = np.zeros(8192, dtype=np.uint8)
        for i in range(0, pcm.size - step + 1, step):
            block = np.ascontiguousarray(pcm[i:i + step])
            n = self.lib.aac_encode(
                C.byref(enc), _ptr(block.view(np.uint8), C.c_uint8),
                block.size * 2, _ptr(out, C.c_uint8), out.size, chn, freq)
            if n > 0:
                blobs.append(out[:n].tobytes())
        self.lib.aac_encodeRelease(C.byref(enc))
        return b"".join(blobs)

    def rdft(self, data, inverse: bool = False) -> np.ndarray:
        """WebRtc_rdft from the vendored Ooura fft4g.c (compiled into the
        webrtc NS lib)."""
        a = np.ascontiguousarray(data, np.float32).copy()
        n = a.size
        ip = np.zeros(n // 2 + 2, np.int32)  # ip[0]=0 triggers table init
        w = np.zeros(n // 2, np.float32)
        self.lib.WebRtc_rdft(n, -1 if inverse else 1,
                             _ptr(a, C.c_float), _ptr(ip, C.c_int32),
                             _ptr(w, C.c_float))
        return a

    def aec_rdft(self, data, inverse: bool = False) -> np.ndarray:
        """aec_rdft_forward_128/inverse_128 (C scalar paths)."""
        if not getattr(self, "_aec_rdft_ready", False):
            self.lib.aec_rdft_init()
            self._aec_rdft_ready = True
        a = np.ascontiguousarray(data, np.float32).copy()
        assert a.size == 128
        if inverse:
            self.lib.aec_rdft_inverse_128(_ptr(a, C.c_float))
        else:
            self.lib.aec_rdft_forward_128(_ptr(a, C.c_float))
        return a

    # ---------------- math/fft.c ----------------

    def fft(self, real, imag=None):
        n = len(real)
        r = np.ascontiguousarray(real, dtype=np.float32)
        i = (np.zeros(n, np.float32) if imag is None
             else np.ascontiguousarray(imag, dtype=np.float32))
        outr = np.zeros(n, np.float32)
        outi = np.zeros(n, np.float32)
        self.lib.FFT(_ptr(r, C.c_float), _ptr(i, C.c_float),
                     _ptr(outr, C.c_float), _ptr(outi, C.c_float),
                     None, None, n)
        return outr, outi

    def ifft(self, real, imag):
        n = len(real)
        r = np.ascontiguousarray(real, dtype=np.float32)
        i = np.ascontiguousarray(imag, dtype=np.float32)
        outr = np.zeros(n, np.float32)
        outi = np.zeros(n, np.float32)
        self.lib.IFFT(_ptr(r, C.c_float), _ptr(i, C.c_float),
                      _ptr(outr, C.c_float), _ptr(outi, C.c_float), n)
        return outr, outi


class _WebrtcModule:
    def __init__(self):
        self.handle = None

    def __del__(self):
        try:
            if self.handle:
                self._release(C.c_void_p(self.handle))
        except Exception:
            pass


class _Vad(_WebrtcModule):
    def __init__(self, lib, chn, freq, interval_ms):
        super().__init__()
        self.lib, self.chn, self.freq = lib, chn, freq
        self.debug = C.c_bool(False)
        self.handle = lib.vad_init(chn, freq, interval_ms,
                                   C.byref(self.debug))
        self._release = lib.vad_release

    def process(self, frame) -> np.ndarray:
        """In-place progressive mute; frameNum = samples per channel."""
        f = _i16(frame).copy()
        self.lib.vad_process(C.c_void_p(self.handle), _ptr(f, C.c_int16),
                             f.size // self.chn)
        return f


class _Ns(_WebrtcModule):
    def __init__(self, lib, chn, freq):
        super().__init__()
        self.lib, self.chn, self.freq = lib, chn, freq
        self.debug = C.c_bool(False)
        self.handle = lib.ns_init(chn, freq, C.byref(self.debug))
        self._release = lib.ns_release

    def process(self, frame) -> np.ndarray:
        f = _i16(frame)
        out = np.zeros_like(f)
        self.lib.ns_process(C.c_void_p(self.handle), _ptr(f, C.c_int16),
                            _ptr(out, C.c_int16), f.size // self.chn)
        return out


class _Agc(_WebrtcModule):
    def __init__(self, lib, chn, freq, interval_ms, value):
        super().__init__()
        self.lib, self.chn, self.freq = lib, chn, freq
        self.debug = C.c_bool(False)
        self.handle = lib.agc_init(chn, freq, interval_ms, value,
                                   C.byref(self.debug))
        self._release = lib.agc_release

    def process(self, frame) -> np.ndarray:
        f = _i16(frame)
        out = np.zeros_like(f)
        self.lib.agc_process(C.c_void_p(self.handle), _ptr(f, C.c_int16),
                             _ptr(out, C.c_int16), f.size // self.chn)
        return out

    def set_gain(self, value: int):
        self.lib.agc_addition(C.c_void_p(self.handle), value)


class _Aec(_WebrtcModule):
    def __init__(self, lib, chn, freq, interval_ms):
        super().__init__()
        self.lib, self.chn, self.freq = lib, chn, freq
        self.debug = C.c_bool(False)
        self.handle = lib.aec_init(chn, freq, interval_ms,
                                   C.byref(self.debug))
        self._release = lib.aec_release

    def process2(self, far, near, delay_ms: int = 0) -> np.ndarray:
        far = _i16(far)
        near = _i16(near)
        out = np.zeros_like(near)
        self.lib.aec_process2(C.c_void_p(self.handle), _ptr(far, C.c_int16),
                              _ptr(near, C.c_int16), _ptr(out, C.c_int16),
                              near.size // self.chn, delay_ms)
        return out

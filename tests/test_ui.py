"""UI layer parity: BMP writer/reader and the oscilloscope renderer are
byte-exact vs the compiled reference (ui/bmp.c, ui/wave.c)."""
import ctypes as C

import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.ui import bmp
from wmix_tpu.ui.wave import WAVE_CHN, Wave


def _lib():
    from oracle.bindings import Oracle
    return Oracle().lib


@requires_oracle
@pytest.mark.parametrize("w,h", [(64, 32), (63, 17), (62, 9), (61, 5),
                                 (40, -20)])
def test_bmp_create_parity(w, h, tmp_path):
    lib = _lib()
    rng = np.random.RandomState(abs(w * h))
    data = rng.randint(0, 256, abs(h) * w * 3, dtype=np.uint8)
    cpath = str(tmp_path / f"c_{w}x{h}.bmp").encode()
    lib.bmp_create(C.c_char_p(cpath),
                   data.ctypes.data_as(C.POINTER(C.c_uint8)),
                   C.c_int(w), C.c_int(h), C.c_int(3))
    want = open(cpath, "rb").read()
    got = bmp.create(None, data, w, h, 3)
    assert got == want, f"{w}x{h}: {len(got)} vs {len(want)} bytes"


@requires_oracle
def test_bmp_get_parity(tmp_path):
    lib = _lib()
    lib.bmp_get.restype = C.POINTER(C.c_uint8)
    rng = np.random.RandomState(7)
    w, h = 64, 32   # multiple-of-4 row so create/get pads agree
    data = rng.randint(0, 256, h * w * 3, dtype=np.uint8)
    p = str(tmp_path / "rt.bmp")
    bmp.create(p, data, w, h, 3)

    size = C.c_int(0)
    cw = C.c_int(0)
    ch = C.c_int(0)
    cper = C.c_int(0)
    ptr = lib.bmp_get(C.c_char_p(p.encode()), C.byref(size), C.byref(cw),
                      C.byref(ch), C.byref(cper))
    assert ptr
    c_pix = np.ctypeslib.as_array(ptr, shape=(size.value,)).copy()
    my_pix, mw, mh, mper = bmp.get(p)
    assert (mw, mh, mper) == (cw.value, ch.value, cper.value)
    assert np.array_equal(my_pix, c_pix[:my_pix.size])
    # and the round trip recovers the original pixels
    assert np.array_equal(my_pix, data)


class _CWave:
    def __init__(self, lib, w, h):
        self.lib = lib
        lib.wave_init.restype = C.c_void_p
        self.ws = lib.wave_init(0, 0, w, h)

    def load(self, chn, value):
        self.lib.wave_load(C.c_void_p(self.ws), C.c_int(chn),
                           C.c_short(value))

    def output2(self, path):
        self.lib.wave_output2(C.c_void_p(self.ws), C.c_char_p(path.encode()))


@requires_oracle
def test_wave_render_parity(tmp_path):
    lib = _lib()
    w, h = 120, 80
    cw = _CWave(lib, w, h)
    pw = Wave(0, 0, w, h)
    rng = np.random.RandomState(3)
    for frame in range(5):
        for ch in range(WAVE_CHN):
            v = int(rng.randint(-32768, 32768))
            cw.load(ch, v)
            pw.load(ch, v)
        cpath = str(tmp_path / f"c{frame}.bmp")
        ppath = str(tmp_path / f"p{frame}.bmp")
        cw.output2(cpath)
        pw.output2(ppath)
        a = open(cpath, "rb").read()
        b = open(ppath, "rb").read()
        assert a == b, f"frame {frame}: wave render differs"


def test_wave_rolls_after_full_width():
    w = 8
    pw = Wave(0, 0, w, 16)
    for i in range(20):
        pw.load(0, i * 100)
        pw.skip()
    assert pw.output_count == w - 1
    assert pw.chn[0, -1] == 1900

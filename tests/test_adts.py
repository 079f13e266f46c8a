"""ADTS header + id3_len parity vs the compiled reference."""
import ctypes as C

import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.codecs import adts


@requires_oracle
@pytest.mark.parametrize("chn,freq,rate,dlen", [
    (1, 8000, 0, 256), (2, 44100, 128, 1024), (2, 32000, 64, 500),
    (1, 16000, 0, 7), (2, 96000, 4095, 8000),
])
def test_create_header_parity(chn, freq, rate, dlen):
    from oracle.bindings import Oracle
    lib = Oracle().lib
    buf = np.zeros(7, np.uint8)
    total = lib.aac_createHeader(buf.ctypes.data_as(C.c_void_p),
                                 C.c_uint8(chn), C.c_uint16(freq),
                                 C.c_uint16(rate), C.c_uint16(dlen))
    mine, mtotal = adts.create_header(chn, freq, rate, dlen)
    assert mtotal == total
    assert mine == bytes(buf), (mine.hex(), bytes(buf).hex())


@requires_oracle
def test_parse_header_parity():
    from oracle.bindings import Oracle
    lib = Oracle().lib
    for chn, freq, rate, dlen in [(2, 44100, 100, 900), (1, 8000, 0, 64)]:
        raw, _ = adts.create_header(chn, freq, rate, dlen)
        c_chn = C.c_uint8(0)
        c_freq = C.c_uint16(0)
        c_flen = C.c_uint16(0)
        ret = lib.aac_parseHeader(C.c_char_p(raw), C.byref(c_chn),
                                  C.byref(c_freq), C.byref(c_flen),
                                  C.c_uint8(0))
        assert ret == 0
        info = adts.parse_header(raw)
        assert info is not None
        assert (info.chn, info.freq, info.frame_len) == \
            (c_chn.value, c_freq.value, c_flen.value)
    assert adts.parse_header(b"\x12\x34\x00\x00\x00\x00\x00") is None


@requires_oracle
def test_id3_len_parity(tmp_path):
    from oracle.bindings import Oracle
    lib = Oracle().lib
    cases = {
        "v2.mp3": b"ID3\x04\x00\x00\x00\x01\x02\x03" + b"x" * 200,
        "v1.mp3": b"TAG" + b"y" * 200,
        "none.mp3": b"\xff\xfb" + b"z" * 200,
        "short.mp3": b"ID",
    }
    for name, data in cases.items():
        p = tmp_path / name
        p.write_bytes(data)
        want = lib.id3_len(str(p).encode())
        got = adts.id3_len(str(p))
        assert got == want, name
        assert adts.id3_len(data) == want, name


def test_id3_on_fixture():
    import pathlib
    fx = pathlib.Path(__file__).parent / "2x44100.mp3"
    if fx.exists():
        n = adts.id3_len(str(fx))
        assert n >= 0

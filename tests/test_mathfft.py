"""math/fft.c parity: bit-exact vs the compiled reference functions."""
import ctypes as C

import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.ops import mathfft


def _lib():
    from oracle.bindings import Oracle
    return Oracle().lib


def _fp(a):
    return a.ctypes.data_as(C.POINTER(C.c_float))


def _c_fft(lib, name, re_in, im_in, N, af_pf=True):
    out_r = np.zeros(N, np.float32)
    out_i = np.zeros(N, np.float32)
    fn = getattr(lib, name)
    if name in ("FFT", "FFTR"):
        af = np.zeros(N, np.float32)
        pf = np.zeros(N, np.float32)
        fn(_fp(re_in) if re_in is not None else None,
           _fp(im_in) if im_in is not None else None,
           _fp(out_r), _fp(out_i), _fp(af), _fp(pf), C.c_uint(N))
        return out_r, out_i, af, pf
    fn(_fp(re_in) if re_in is not None else None,
       _fp(im_in) if im_in is not None else None,
       _fp(out_r), _fp(out_i), C.c_uint(N))
    return out_r, out_i


def _eq(a, b, what):
    assert np.array_equal(np.asarray(a, np.float32).view(np.uint32),
                          np.asarray(b, np.float32).view(np.uint32)), what


@requires_oracle
@pytest.mark.parametrize("N", [8, 64, 256, 1024])
def test_fft_complex(N):
    lib = _lib()
    rng = np.random.RandomState(N)
    re = (rng.randn(N) * 1000).astype(np.float32)
    im = (rng.randn(N) * 500).astype(np.float32)
    cr, ci, caf, cpf = _c_fft(lib, "FFT", re.copy(), im.copy(), N)
    pr, pi, paf, ppf = mathfft.fft(re, im, N, want_af=True, want_pf=True)
    _eq(pr, cr, "re")
    _eq(pi, ci, "im")
    _eq(paf, caf, "af")
    _eq(ppf, cpf, "pf")


@requires_oracle
@pytest.mark.parametrize("N", [8, 256, 1024])
def test_fft_real_input(N):
    lib = _lib()
    rng = np.random.RandomState(N + 1)
    re = (rng.randn(N) * 3000).astype(np.float32)
    cr, ci, caf, cpf = _c_fft(lib, "FFTR", re.copy(), None, N)
    pr, pi, paf, ppf = mathfft.fftr(re, None, N, want_af=True, want_pf=True)
    _eq(pr, cr, "re")
    _eq(pi, ci, "im")
    _eq(paf, caf, "af")
    _eq(ppf, cpf, "pf")


@requires_oracle
@pytest.mark.parametrize("N", [8, 256, 1024])
def test_ifft(N):
    lib = _lib()
    rng = np.random.RandomState(N + 2)
    re = (rng.randn(N) * 1000).astype(np.float32)
    im = (rng.randn(N) * 1000).astype(np.float32)
    cr, ci = _c_fft(lib, "IFFT", re.copy(), im.copy(), N)
    pr, pi = mathfft.ifft(re, im, N)
    _eq(pr, cr, "re")
    _eq(pi, ci, "im")


@requires_oracle
@pytest.mark.parametrize("N", [8, 256])
def test_ifftr(N):
    lib = _lib()
    rng = np.random.RandomState(N + 3)
    re = (rng.randn(N) * 1000).astype(np.float32)
    cr, ci = _c_fft(lib, "IFFTR", re.copy(), None, N)
    pr, pi = mathfft.ifftr(re, None, N)
    _eq(pr, cr, "re")
    _eq(pi, ci, "im")


@requires_oracle
def test_fft_stream():
    lib = _lib()
    st_len, in_len = 1024, 256
    rng = np.random.RandomState(0)
    c_stream = np.zeros(st_len, np.float32)
    p_stream = np.zeros(st_len, np.float32)
    caf = np.zeros(st_len, np.float32)
    cpf = np.zeros(st_len, np.float32)
    for it in range(5):
        block = (rng.randn(in_len) * 2000).astype(np.float32)
        lib.fft_stream(_fp(block), C.c_uint(in_len), _fp(c_stream),
                       C.c_uint(st_len), _fp(caf), _fp(cpf))
        paf, ppf = mathfft.fft_stream(block, p_stream, want_pf=True)
        _eq(p_stream, c_stream, f"pool it{it}")
        _eq(paf, caf, f"af it{it}")
        _eq(ppf, cpf, f"pf it{it}")

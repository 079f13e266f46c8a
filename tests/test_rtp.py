"""RTP wire-format parity vs the C reference (src/rtp.c) over loopback
UDP sockets, driving the oracle's compiled functions via ctypes."""
import ctypes as C
import os

import numpy as np
import pytest

from tests.conftest import requires_oracle
from wmix_tpu.io_ import rtp


class _CRtpPacket(C.Structure):
    _fields_ = [("raw", C.c_uint8 * (12 + 4096))]


def _oracle_lib():
    from oracle.bindings import Oracle
    return Oracle().lib


def _c_header(lib, pkt, pt, seq, ts, ssrc, m=0):
    lib.rtp_header(C.byref(pkt), 0, 0, 0, rtp.RTP_VERSION, pt, m,
                   seq, ts, ssrc)


@requires_oracle
def test_c_send_to_python_recv():
    lib = _oracle_lib()
    lib.rtp_socket.restype = C.c_void_p
    rx = rtp.RtpSocket("127.0.0.1", 43310, bind_mode=True)
    ss = lib.rtp_socket(b"127.0.0.1", 43310, False)
    assert ss

    pkt = _CRtpPacket()
    _c_header(lib, pkt, rtp.PT_PCMA, 100, 777777, 0xABCD1234)
    payload = bytes(range(160))
    C.memmove(C.byref(pkt, 12), payload, 160)
    for i in range(3):
        assert lib.rtp_send(C.c_void_p(ss), C.byref(pkt), 160) > 0
        got = rx.recv()
        assert got is not None
        hdr, raw, size = got
        assert (hdr.v, hdr.pt, hdr.m) == (2, rtp.PT_PCMA, 0)
        assert hdr.seq == 100 + i          # C auto-increments after send
        assert hdr.timestamp == 777777
        assert hdr.ssrc == 0xABCD1234
        assert size == 160 and raw[:160] == payload


@requires_oracle
def test_python_send_to_c_recv_pcma_and_aac():
    lib = _oracle_lib()
    lib.rtp_socket.restype = C.c_void_p
    ss = lib.rtp_socket(b"127.0.0.1", 43311, True)
    assert ss
    tx = rtp.RtpSocket("127.0.0.1", 43311, bind_mode=False)
    tx.header = rtp.RtpHeader(pt=rtp.PT_PCMA, seq=7, timestamp=123,
                              ssrc=0x11223344)
    payload = bytes((x * 3) & 0xFF for x in range(160))
    assert tx.send(payload) > 0
    assert tx.header.seq == 8

    pkt = _CRtpPacket()
    size = C.c_uint32(0)
    n = lib.rtp_recv(C.c_void_p(ss), C.byref(pkt), C.byref(size))
    assert n == 12 + 160
    assert size.value == 160
    raw = bytes(pkt.raw)
    # the C receiver leaves seq/ts/ssrc in network order (src/rtp.c:72-99)
    assert raw[0] == 0x80 and raw[1] == rtp.PT_PCMA
    assert raw[2:4] == (7).to_bytes(2, "big")
    assert raw[4:8] == (123).to_bytes(4, "big")
    assert raw[8:12] == (0x11223344).to_bytes(4, "big")
    assert raw[12:12 + 160] == payload

    # AAC: AU header added by the sender, size recovered by the receiver
    tx.header = rtp.RtpHeader(pt=rtp.PT_AAC, seq=1, timestamp=0, ssrc=1)
    aac = bytes(range(100))
    assert tx.send(aac) > 0
    n = lib.rtp_recv(C.c_void_p(ss), C.byref(pkt), C.byref(size))
    assert n == 12 + 4 + 100
    assert size.value == 100
    raw = bytes(pkt.raw)
    assert raw[12:16] == rtp.aac_au_header(100)
    assert raw[16:16 + 100] == aac


@requires_oracle
def test_sdp_parity(tmp_path):
    lib = _oracle_lib()
    for chn, freq, pt in [(2, 44100, rtp.PT_AAC), (1, 8000, rtp.PT_PCMA),
                          (2, 32000, rtp.PT_AAC)]:
        cf = str(tmp_path / f"c_{freq}_{pt}.sdp")
        lib.rtp_create_sdp(cf.encode(), b"192.168.1.10", 9832, chn, freq,
                           pt)
        want = open(cf).read()
        got = rtp.create_sdp("", "192.168.1.10", 9832, chn, freq, pt)
        assert got == want, f"{chn}ch {freq}Hz pt{pt}:\n{got!r}\n{want!r}"


def test_roundtrip_python_only():
    rx = rtp.RtpSocket("127.0.0.1", 43312, bind_mode=True)
    tx = rtp.RtpSocket("127.0.0.1", 43312, bind_mode=False)
    tx.header = rtp.RtpHeader(pt=rtp.PT_PCMU, seq=65535, timestamp=42,
                              ssrc=5)
    tx.send(b"\x00" * 160)
    assert tx.header.seq == 0   # 16-bit wrap
    hdr, raw, size = rx.recv()
    assert hdr.pt == rtp.PT_PCMU and hdr.seq == 65535 and size == 160
    assert rx.recv() is None    # nonblocking empty

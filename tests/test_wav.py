"""WAV container tests against the reference fixtures and header math
(src/wav.{h,c})."""
import os
import struct

import numpy as np

from wmix_tpu.codecs import wav


def test_read_fixture_1x8000(fixture_dir):
    hdr, pcm = wav.read(os.path.join(fixture_dir, "1x8000.wav"))
    assert hdr.channels == 1
    assert hdr.sample_rate == 8000
    assert hdr.sample_bits == 16
    assert len(pcm) == hdr.data_bytes


def test_read_fixture_2x16000(fixture_dir):
    hdr, pcm = wav.read(os.path.join(fixture_dir, "2x16000.wav"))
    assert hdr.channels == 2
    assert hdr.sample_rate == 16000
    assert len(pcm) == hdr.data_bytes


def test_params_roundtrip():
    hdr = wav.WavHeader.params(5, 1, 16, 8000)
    assert hdr.data_bytes == 5 * 2 * 8000
    assert hdr.bytes_per_second == 16000
    packed = hdr.pack()
    assert len(packed) == wav.HEADER_SIZE
    back = wav.WavHeader.unpack(packed)
    assert back.channels == 1 and back.sample_rate == 8000
    assert back.data_bytes == hdr.data_bytes


def test_write_len(tmp_path):
    p = tmp_path / "x.wav"
    pcm = np.arange(1000, dtype=np.int16).tobytes()
    hdr = wav.WavHeader(channels=1, sample_rate=8000, sample_bits=16,
                        data_bytes=0)
    with open(p, "wb") as f:
        f.write(hdr.pack())
        f.write(pcm)
        wav.write_len(f)
    blob = p.read_bytes()
    total, = struct.unpack("<I", blob[4:8])
    data_len, = struct.unpack("<I", blob[40:44])
    assert total == len(blob) - 8
    assert data_len == len(pcm)

"""Native AAC-LC front-end (wmix_tpu/native/aacfe.c) parity: the C port
of the bitstream/TNS pipeline against the Python decoder (itself gated
vs the compiled faad2, tests/test_aac.py), plus the HE-AAC fallback."""
import numpy as np
import pytest

from wmix_tpu.codecs import aacfe
from wmix_tpu.codecs.aac import AacDecoder

pytestmark = pytest.mark.skipif(not aacfe.available(),
                                reason="native aacfe not built")


def _py_jobs(data, n):
    py = AacDecoder()
    buf = data
    out = []
    for _ in range(n):
        jobs, consumed, nch, freq, emit = py.decode_deferred(buf)
        buf = buf[consumed:]
        out.append((jobs, nch, emit))
    return out


def test_fixture_bit_exact(fixture_dir):
    """(ch, seq, shape, spec) of every job matches the Python front-end
    on the LC fixture (first 150 frames)."""
    with open(f"{fixture_dir}/2x44100.aac", "rb") as f:
        data = f.read()
    N = 150
    want = _py_jobs(data, N)
    fe = aacfe.NativeAacFront(data)
    for i in range(N):
        r = fe.next_frame()
        assert r is not None, i
        jobs, nch, _freq, emit = r
        wjobs, wnch, wemit = want[i]
        assert (nch, emit) == (wnch, wemit), i
        assert len(jobs) == len(wjobs), i
        for (ch, seq, sh, sp), (wch, wseq, wsh, wsp) in zip(jobs, wjobs):
            assert (ch, seq, sh) == (wch, wseq, wsh), i
            np.testing.assert_array_equal(sp, wsp, err_msg=f"frame {i}")


def test_heaac_raises_unsupported(fixture_dir):
    """The HE-AAC fixture (SBR) must refuse deferred mode, like the
    Python front-end does."""
    with open(f"{fixture_dir}/2x32000.aac", "rb") as f:
        data = f.read()
    fe = aacfe.NativeAacFront(data)
    with pytest.raises(aacfe.Unsupported):
        fe.next_frame()


@pytest.mark.heavy
def test_batch_decoder_native_vs_host(fixture_dir):
    """AacBatchDecoder (native front + device filterbank) == the host
    AacDecoder's full decode, bit-exact, 40 frames x 2 streams."""
    from wmix_tpu.codecs.aac_batch import AacBatchDecoder
    with open(f"{fixture_dir}/2x44100.aac", "rb") as f:
        data = f.read()
    n_frames = 40

    host = AacDecoder()
    buf = data
    want = []
    for _ in range(n_frames):
        pcm, consumed, nch, freq = host.decode(buf)
        buf = buf[consumed:]
        want.append(pcm)

    dec = AacBatchDecoder(2)
    dec.start(0, data)
    dec.start(1, data)
    assert dec._native[0] is not None, "native front-end not engaged"
    for i in range(n_frames):
        pcms, done = dec.tick()
        assert not done
        if want[i].size == 0:
            assert 0 not in pcms
            continue
        for b in range(2):
            np.testing.assert_array_equal(
                pcms[b], want[i], err_msg=f"frame {i} stream {b}")

"""Native MP3 front-end (wmix_tpu/native/mp3fe.c) parity: the C port of
the bitstream/IMDCT pipeline against the Python decoder (itself
bit-exact vs the compiled libmad, tests/test_mp3.py), plus the Layer
I/II fallback path in the batched decoder."""
import numpy as np
import pytest

from wmix_tpu.codecs import mp3fe
from wmix_tpu.codecs.mp3 import Mp3Decoder

pytestmark = pytest.mark.skipif(not mp3fe.available(),
                                reason="native mp3fe not built")


def test_fixture_bit_exact(fixture_dir):
    """Every frame's (header, sbsample) matches the Python front-end on
    the reference fixture (first 120 frames)."""
    with open(f"{fixture_dir}/2x44100.mp3", "rb") as f:
        data = f.read()
    N = 120
    want = list(Mp3Decoder()._frames_sbsample(data, N))
    got = []
    for h, sb in mp3fe.frames_sbsample(data):
        got.append((h, sb))
        if len(got) >= N:
            break
    assert len(got) == len(want)
    for i, ((hw, sw), (hg, sg)) in enumerate(zip(want, got)):
        assert (hw.nchannels, hw.nbsamples, hw.samplerate) == \
            (hg.nchannels, hg.nbsamples, hg.samplerate), f"frame {i}"
        np.testing.assert_array_equal(sw, sg, err_msg=f"frame {i}")


def test_full_stream_frame_count(fixture_dir):
    """The C sync loop finds the same number of frames as the Python
    one over the whole fixture (incl. trailing-garbage handling)."""
    with open(f"{fixture_dir}/2x44100.mp3", "rb") as f:
        data = f.read()
    n_py = sum(1 for _ in Mp3Decoder()._frames_sbsample(data))
    n_c = sum(1 for _ in mp3fe.frames_sbsample(data))
    assert n_c == n_py


def test_garbage_resync(fixture_dir):
    """Mid-stream garbage: both front-ends resync to the same frames."""
    with open(f"{fixture_dir}/2x44100.mp3", "rb") as f:
        data = f.read()
    corrupted = data[:3000] + b"\x00" * 37 + data[3000:20000]
    want = list(Mp3Decoder()._frames_sbsample(corrupted))
    got = list(mp3fe.frames_sbsample(corrupted))
    assert len(got) == len(want) > 0
    for i, ((_, sw), (_, sg)) in enumerate(zip(want, got)):
        np.testing.assert_array_equal(sw, sg, err_msg=f"frame {i}")


def test_layer2_raises_unsupported():
    """A Layer II stream raises UnsupportedLayer (the batched decoder
    falls back to the Python front-end)."""
    from tests.test_mp3_l12 import _stream
    data = _stream(2, 6, 0, 0, frames=3, seed=1)
    with pytest.raises(mp3fe.UnsupportedLayer):
        list(mp3fe.frames_sbsample(data))


def test_batch_decoder_l2_fallback():
    """Mp3BatchDecoder on a Layer II stream decodes via the Python
    fallback and matches the host decoder."""
    from wmix_tpu.codecs.mp3 import mad_scale
    from wmix_tpu.codecs.mp3_batch import Mp3BatchDecoder
    from tests.test_mp3_l12 import _stream
    data = _stream(2, 6, 0, 0, frames=4, seed=2)
    ref = Mp3Decoder()
    want = [pcm for pcm, _, _ in ref.frames(data)]
    dec = Mp3BatchDecoder(1)
    dec.start(0, data)
    for i, w in enumerate(want):
        pcm, done = dec.tick()
        assert pcm is not None
        np.testing.assert_array_equal(pcm[0, :w.shape[0]], w,
                                      err_msg=f"frame {i}")

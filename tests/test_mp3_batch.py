"""Device-batched MP3 synthesis parity (codecs/mp3_batch.py): the jnp
dct32 + windowing-MAC scan against the host Synth (itself bit-exact vs
the compiled libmad on the full fixture, tests/test_mp3.py)."""
import numpy as np
import pytest

from wmix_tpu.codecs.mp3 import Synth, mad_scale
from wmix_tpu.codecs.mp3_batch import BatchedSynth, Mp3BatchDecoder


def test_batched_synth_random_frames():
    """Random Q28 subband frames, stereo + mono, phases advancing."""
    rng = np.random.RandomState(0)
    B = 3
    for nch in (2, 1):
        hosts = [Synth() for _ in range(B)]
        batched = BatchedSynth(B)
        for frame in range(4):
            ns = 36
            sb = rng.randint(-(1 << 28), 1 << 28,
                             size=(B, 2, ns, 32)).astype(np.int32)
            got = np.asarray(batched.frame(sb, nch, ns))
            for b in range(B):
                want = mad_scale(hosts[b].frame(sb[b], nch, ns))
                np.testing.assert_array_equal(
                    got[b, :nch], want,
                    err_msg=f"nch={nch} frame {frame} stream {b}")


def test_batched_synth_mixed_phases():
    """Streams at different synthesis phases share one program."""
    rng = np.random.RandomState(1)
    B, ns, nch = 4, 36, 2
    hosts = [Synth() for _ in range(B)]
    batched = BatchedSynth(B)
    # advance stream phases unevenly via resets after some frames
    for frame in range(5):
        sb = rng.randint(-(1 << 28), 1 << 28,
                         size=(B, 2, ns, 32)).astype(np.int32)
        if frame == 2:
            hosts[1] = Synth()
            batched.reset([1])
        got = np.asarray(batched.frame(sb, nch, ns))
        for b in range(B):
            want = mad_scale(hosts[b].frame(sb[b], nch, ns))
            np.testing.assert_array_equal(got[b], want,
                                          err_msg=f"f{frame} s{b}")


@pytest.mark.heavy
def test_batch_decoder_vs_host_on_fixture(fixture_dir):
    """Mp3BatchDecoder (host front-end + device synth) == Mp3Decoder on
    the reference fixture, bit-exact, 25 frames x 2 streams."""
    from wmix_tpu.codecs.mp3 import Mp3Decoder
    with open(f"{fixture_dir}/2x44100.mp3", "rb") as f:
        data = f.read()
    n_frames = 25

    ref = Mp3Decoder()
    want_frames = [pcm for pcm, _, _ in ref.frames(data, n_frames)]

    dec = Mp3BatchDecoder(2)
    dec.start(0, data)
    dec.start(1, data)
    for i in range(n_frames):
        pcm, done = dec.tick()
        assert pcm is not None and not done
        for b in range(2):
            np.testing.assert_array_equal(pcm[b], want_frames[i],
                                          err_msg=f"frame {i} stream {b}")

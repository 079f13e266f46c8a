"""ALSA HAL (platform/alsa/plat.c equivalent).

No sound hardware exists in CI, so the ctypes-level behavior is driven
against a scripted fake libasound verifying the reference's setup
sequence (S16_LE interleaved on "default", 500 ms buffer cap, period =
buffer/4) and the write/read recovery loop (recover -> EPIPE prepare ->
wait on short writes).  A final test confirms graceful gating when
libasound is absent.
"""
import ctypes as C

import numpy as np
import pytest

from wmix_tpu.service import hal_alsa


class FakeAsound:
    """Callable-attribute stub standing in for the CDLL."""

    def __init__(self):
        self.calls = []
        self.written = bytearray()
        self.mic = bytearray()
        self.fail_first_write = 0
        self.short_write = 0

    def __getattr__(self, name):
        def fn(*a):
            self.calls.append(name)
            return self._dispatch(name, a)
        return fn

    def _dispatch(self, name, a):
        if name == "snd_pcm_open":
            a[0]._obj.value = 1234
            return 0
        if name == "snd_pcm_hw_params_malloc":
            a[0]._obj.value = 5678
            return 0
        if name == "snd_pcm_hw_params_get_buffer_time_max":
            a[1]._obj.value = 4000000   # 4 s: must be capped to 500 ms
            return 0
        if name == "snd_pcm_hw_params_set_buffer_time_near":
            self.buffer_time = a[2]._obj.value
            return 0
        if name == "snd_pcm_hw_params_set_period_time_near":
            self.period_time = a[2]._obj.value
            return 0
        if name == "snd_pcm_hw_params_set_rate_near":
            return 0
        if name == "snd_pcm_writei":
            nframes = a[2]
            if self.fail_first_write:
                self.fail_first_write -= 1
                return -32              # EPIPE
            if self.short_write:
                take = min(nframes, self.short_write)
            else:
                take = nframes
            self.written += bytes(C.cast(
                a[1], C.POINTER(C.c_char * (take * 2))).contents)
            return take
        if name == "snd_pcm_readi":
            nframes = a[2]
            take = min(nframes, len(self.mic) // 2)
            if take == 0:
                return -32              # EPIPE once drained
            C.memmove(a[1], bytes(self.mic[:take * 2]), take * 2)
            del self.mic[:take * 2]
            return take
        if name == "snd_pcm_recover":
            return a[1].value if hasattr(a[1], "value") else a[1]
        if name == "snd_mixer_first_elem":
            return 0                    # no mixer element
        return 0


@pytest.fixture
def hal():
    h = hal_alsa.AlsaHal.__new__(hal_alsa.AlsaHal)
    h.lib = FakeAsound()
    return h


def test_setup_sequence_and_buffer_cap(hal):
    pcm = hal.ao_init(1, 16000)
    assert pcm is not None
    lib = hal.lib
    assert "snd_pcm_open" in lib.calls
    assert "snd_pcm_hw_params_set_access" in lib.calls
    assert "snd_pcm_hw_params_set_format" in lib.calls
    assert lib.buffer_time == 500000, "500 ms Ubuntu cap (plat.c:89)"
    assert lib.period_time == 125000, "period = buffer/4 (plat.c:91)"


def test_write_loop_delivers_all_frames(hal):
    pcm = hal.ao_init(1, 16000)
    data = np.arange(320, dtype=np.int16).tobytes()
    n = hal.ao_write(pcm, data)
    assert n == len(data)
    assert bytes(hal.lib.written) == data


def test_write_recovers_from_epipe(hal):
    pcm = hal.ao_init(1, 16000)
    hal.lib.fail_first_write = 1
    data = np.arange(160, dtype=np.int16).tobytes()
    n = hal.ao_write(pcm, data)
    assert n == len(data)
    assert "snd_pcm_prepare" in hal.lib.calls
    assert bytes(hal.lib.written) == data


def test_read_loop(hal):
    pcm = hal.ai_init(1, 16000)
    mic = np.arange(160, dtype=np.int16).tobytes()
    hal.lib.mic += mic
    got = hal.ai_read(pcm, len(mic))
    assert got == mic


def test_graceful_gate_without_libasound():
    import ctypes.util
    if ctypes.util.find_library("asound"):
        pytest.skip("libasound present")
    with pytest.raises(RuntimeError):
        hal_alsa.AlsaHal()

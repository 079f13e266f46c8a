"""wmix_tpu — a TPU-native batched streaming audio-DSP framework.

A ground-up rebuild of the capabilities of wexiangis/wmix (an embedded-Linux
audio mixer / audio-hosting daemon in C) as a batched streaming DSP engine
in JAX: thousands of concurrent streams are processed per TPU chip as
vectorized per-frame kernels over HBM-resident ring buffers, while a host
frontend preserves wmix's client semantics (play/mix/record/FIFO/RTP) with
bit-faithful PCM outputs against the C reference.

Layout:
  config    — engine geometry (the reference's compile-time plat.h constants)
  ops       — exact array ops: mixer, resampler, G.711, FFT
  dsp       — the webrtc-chain rebuilt as batched JAX kernels (NS/AEC/AGC/VAD)
  codecs    — WAV/ADTS/ID3 containers, MP3/AAC transforms
  engine    — the batched device engine + host daemon/scheduler
  io        — host transports: SysV msg queues, shm rings, FIFOs, RTP
  parallel  — multi-chip sharding of the stream batch
"""

from wmix_tpu.config import EngineConfig

__version__ = "0.1.0"
__all__ = ["EngineConfig", "__version__"]

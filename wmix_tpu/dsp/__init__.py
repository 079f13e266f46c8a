from wmix_tpu.dsp import intops, vad  # noqa: F401

from wmix_tpu.ops import g711, mixer, resample, stepper  # noqa: F401

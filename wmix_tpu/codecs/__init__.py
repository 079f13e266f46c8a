from wmix_tpu.codecs import wav  # noqa: F401

from lidiff_tpu.parallel import mesh  # noqa: F401

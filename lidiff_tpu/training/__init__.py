from lidiff_tpu.training import trainer  # noqa: F401

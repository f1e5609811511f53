from lidiff_tpu.train import trainer  # noqa: F401

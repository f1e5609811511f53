from lidiff_tpu.ops import keys, grid, sparse_conv  # noqa: F401

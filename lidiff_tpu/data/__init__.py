from lidiff_tpu.data import preprocess, transforms, collation  # noqa: F401

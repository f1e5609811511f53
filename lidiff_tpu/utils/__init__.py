from lidiff_tpu.utils import natsort, ply  # noqa: F401

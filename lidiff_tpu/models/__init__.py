from lidiff_tpu.models import blocks, minkunet, diffusion, refine  # noqa: F401

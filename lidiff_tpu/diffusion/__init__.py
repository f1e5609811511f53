from lidiff_tpu.diffusion import schedules, ddpm, dpm_solver  # noqa: F401

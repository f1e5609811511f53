"""lidiff_tpu — TPU-native LiDAR scene-completion diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PRBonn/LiDiff
(CVPR'24): conditional point-local DDPM scene completion with a sparse-voxel
UNet denoiser, a refinement/upsampling network, DPM-Solver++(2M,SDE) fast
sampling, SemanticKITTI data pipeline, and the full metric suite.

Everything on the device path is built around *static shapes*: fixed-capacity
voxel sets, padded kernel maps, and `lax.scan` sampling loops, so one XLA
compilation serves every step.
"""

__version__ = "0.1.0"

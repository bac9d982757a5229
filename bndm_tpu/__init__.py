"""bndm-tpu: TPU-native framework for Blue Noise Diffusion Models.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of xchhuang/bndm
(SIGGRAPH 2024, "Blue noise for diffusion models"): the time-varying
white-to-blue/red Gaussian noise engine, IADB/BNDM and DDIM pipelines,
conditional super-resolution, and VAE-backed latent diffusion — designed
TPU-first (static shapes, lax.scan sampling loops, Mesh/shard_map data
parallelism, Pallas kernels for the noise hot path).
"""

__version__ = "0.1.0"

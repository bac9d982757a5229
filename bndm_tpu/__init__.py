"""bndm-tpu: TPU-native framework for Blue Noise Diffusion Models.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of xchhuang/bndm
(SIGGRAPH 2024, "Blue noise for diffusion models"): the time-varying
white-to-blue/red Gaussian noise engine, IADB/BNDM and DDIM pipelines,
conditional super-resolution, and VAE-backed latent diffusion — designed
TPU-first (static shapes, lax.scan sampling loops, Mesh/shard_map data
parallelism, Pallas kernels for the noise hot path).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level re-exports (keeps `import bndm_tpu` light)."""
    surface = {
        "get_noise": ("bndm_tpu.ops.noise", "get_noise"),
        "get_noise_v2": ("bndm_tpu.ops.noise", "get_noise_v2"),
        "alpha_schedule": ("bndm_tpu.ops.schedules", "alpha_schedule"),
        "gamma_schedule": ("bndm_tpu.ops.schedules", "gamma_schedule"),
        "make_cov_L": ("bndm_tpu.ops.cov", "make_cov_L"),
        "load_cov_L": ("bndm_tpu.ops.cov", "load_cov_L"),
        "UNet2D": ("bndm_tpu.models.unet2d", "UNet2D"),
        "UNet2DConfig": ("bndm_tpu.models.unet2d", "UNet2DConfig"),
        "unet_config_for_res": ("bndm_tpu.models.unet2d", "unet_config_for_res"),
        "AutoencoderKL": ("bndm_tpu.models.vae", "AutoencoderKL"),
        "sample_iadb": ("bndm_tpu.samplers.iadb", "sample_iadb"),
        "sample_iadb_microbatched": ("bndm_tpu.samplers.iadb",
                                     "sample_iadb_microbatched"),
        "sample_iadb_cached": ("bndm_tpu.samplers.iadb", "sample_iadb_cached"),
        "make_serving_sampler": ("bndm_tpu.serving", "make_serving_sampler"),
        "make_validated_serving_sampler": ("bndm_tpu.serving",
                                           "make_validated_serving_sampler"),
        "serving_model_pair": ("bndm_tpu.serving", "serving_model_pair"),
        "make_serving_sampler_ddim": ("bndm_tpu.serving",
                                      "make_serving_sampler_ddim"),
        "IADBScheduler": ("bndm_tpu.samplers.iadb", "IADBScheduler"),
        "DDIMScheduler": ("bndm_tpu.samplers.ddim", "DDIMScheduler"),
        "sample_ddim": ("bndm_tpu.samplers.ddim", "sample_ddim"),
        "sample_ddim_cached": ("bndm_tpu.samplers.ddim", "sample_ddim_cached"),
        "PixelTrainer": ("bndm_tpu.train.pixel", "PixelTrainer"),
        "TrainConfig": ("bndm_tpu.train.pixel", "TrainConfig"),
        "CheckpointManager": ("bndm_tpu.ckpt.manager", "CheckpointManager"),
    }
    if name in surface:
        import importlib

        module, attr = surface[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'bndm_tpu' has no attribute {name!r}")

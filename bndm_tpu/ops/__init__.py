from bndm_tpu.ops.schedules import alpha_schedule, gamma_schedule
from bndm_tpu.ops.noise import get_noise, get_noise_v2, noise_padding, NoiseResult
from bndm_tpu.ops.cov import load_cov_L, make_cov_L, radial_spectrum_profile

__all__ = [
    "alpha_schedule",
    "gamma_schedule",
    "get_noise",
    "get_noise_v2",
    "noise_padding",
    "NoiseResult",
    "load_cov_L",
    "make_cov_L",
    "radial_spectrum_profile",
]

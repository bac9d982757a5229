from bndm_tpu.utils.spectrum import compute_fft, radial_power_profile
from bndm_tpu.utils.metrics import ssim, psnr
from bndm_tpu.utils.timing import Timer, timed_call

__all__ = ["compute_fft", "radial_power_profile", "ssim", "psnr", "Timer", "timed_call"]

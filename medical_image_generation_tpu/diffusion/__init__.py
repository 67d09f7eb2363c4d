from medical_image_generation_tpu.diffusion.schedule import NoiseSchedule
from medical_image_generation_tpu.diffusion.sampler import ddpm_sample, ddim_sample

__all__ = ["NoiseSchedule", "ddpm_sample", "ddim_sample"]

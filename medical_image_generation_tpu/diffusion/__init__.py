from medical_image_generation_tpu.diffusion.schedule import NoiseSchedule
from medical_image_generation_tpu.diffusion.sampler import (
    DDIMSampler,
    SegmentedDDPMSampler,
    ddim_sample,
    ddpm_sample,
)

__all__ = ["NoiseSchedule", "ddpm_sample", "ddim_sample",
           "DDIMSampler", "SegmentedDDPMSampler"]

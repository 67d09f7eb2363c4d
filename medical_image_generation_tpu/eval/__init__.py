from medical_image_generation_tpu.eval.ssim import ssim, ms_ssim
from medical_image_generation_tpu.eval.fid import frechet_distance, fid_from_features

__all__ = ["ssim", "ms_ssim", "frechet_distance", "fid_from_features"]

from medical_image_generation_tpu.io.nifti import NiftiImage, load_nifti, save_nifti
from medical_image_generation_tpu.io.volstore import VolStore, write_volume, open_volume

__all__ = [
    "NiftiImage",
    "load_nifti",
    "save_nifti",
    "VolStore",
    "write_volume",
    "open_volume",
]

from medical_image_generation_tpu.planning.planner import (
    compute_downsample_parameters,
    compute_output_size,
    snap_patch_size,
    create_autoencoder_dict,
    create_ddpm_dict,
    create_config_dict,
)

__all__ = [
    "compute_downsample_parameters",
    "compute_output_size",
    "snap_patch_size",
    "create_autoencoder_dict",
    "create_ddpm_dict",
    "create_config_dict",
]

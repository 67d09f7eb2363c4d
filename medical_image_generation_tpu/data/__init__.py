from medical_image_generation_tpu.data.splits import create_split_files, get_data_ids
from medical_image_generation_tpu.data.loader import PatchDataset, PrefetchLoader, get_data_loaders

__all__ = [
    "create_split_files",
    "get_data_ids",
    "PatchDataset",
    "PrefetchLoader",
    "get_data_loaders",
]

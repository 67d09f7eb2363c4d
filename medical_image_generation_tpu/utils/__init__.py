from medical_image_generation_tpu.utils.profiling import (
    StepTimer,
    profile_trace,
    maybe_progress,
)

__all__ = ["StepTimer", "profile_trace", "maybe_progress"]

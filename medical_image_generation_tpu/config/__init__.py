from medical_image_generation_tpu.config.run import (
    load_config,
    get_config_for_current_task,
    create_save_path_dict,
    print_configuration,
    setup_logging,
    filter_config_by_mode,
)

__all__ = [
    "load_config",
    "get_config_for_current_task",
    "create_save_path_dict",
    "print_configuration",
    "setup_logging",
    "filter_config_by_mode",
]

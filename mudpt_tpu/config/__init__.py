from mudpt_tpu.config.config import (
    Config,
    default_config,
    load_config,
    merge_from_file,
    merge_from_list,
)

__all__ = [
    "Config",
    "default_config",
    "load_config",
    "merge_from_file",
    "merge_from_list",
]

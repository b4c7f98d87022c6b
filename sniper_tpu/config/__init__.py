from sniper_tpu.config.defaults import (
    AttrDict,
    default_config,
    load_config,
    update_config,
    update_config_from_list,
)

__all__ = [
    "AttrDict",
    "default_config",
    "load_config",
    "update_config",
    "update_config_from_list",
]

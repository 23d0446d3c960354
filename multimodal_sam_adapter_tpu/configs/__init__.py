from .registry import get_config, list_configs

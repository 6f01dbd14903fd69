from .config import load_config, config_to_dict, dump_config  # noqa: F401

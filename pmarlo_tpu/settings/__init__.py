from .loader import load_defaults, REQUIRED_CONFIG_KEYS, ENV_CONFIG_FILE

__all__ = ["load_defaults", "REQUIRED_CONFIG_KEYS", "ENV_CONFIG_FILE"]

from .model_zoo import (
    MODELS,
    get,
    get_checkpoint_url,
    get_config,
    get_config_file,
)

__all__ = ["MODELS", "get", "get_checkpoint_url", "get_config", "get_config_file"]

from gdrnet_tpu.config.config import Config, load_config
from gdrnet_tpu.config.defaults import base_config

__all__ = ["Config", "load_config", "base_config"]

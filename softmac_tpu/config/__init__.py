from softmac_tpu.config.node import CN, ConfigNode
from softmac_tpu.config.default_config import get_cfg_defaults
from softmac_tpu.config.utils import load, make_cls_config, purge_cfg

__all__ = ["CN", "ConfigNode", "get_cfg_defaults", "load", "make_cls_config", "purge_cfg"]

"""Config loading helpers (parity with reference ``softmac/config/utils.py``)."""
from __future__ import annotations

from pathlib import Path

from softmac_tpu.config.node import ConfigNode


def make_cls_config(self, cfg=None, **kwargs) -> ConfigNode:
    """Merge a class's default_config with an override cfg and kwargs."""
    _cfg = self.default_config()
    if cfg is not None:
        if isinstance(cfg, (str, Path)):
            _cfg.merge_from_file(cfg)
        else:
            _cfg.merge_from_other_cfg(cfg)
    if len(kwargs) > 0:
        _cfg.merge_from_list(sum(list(kwargs.items()), ()))
    return _cfg


def purge_cfg(cfg: ConfigNode) -> None:
    """Remove sibling CfgNode children not selected by a 'TYPE' key."""
    target_key = cfg.get("TYPE", None)
    removed = []
    for k, v in cfg.items():
        if isinstance(v, ConfigNode):
            if target_key is not None and k != target_key:
                removed.append(k)
            else:
                purge_cfg(v)
    for k in removed:
        del cfg[k]


def load(path=None, opts=None) -> ConfigNode:
    """Load defaults, merge a python config file and CLI opts, freeze."""
    from softmac_tpu.config.default_config import get_cfg_defaults

    cfg = get_cfg_defaults()
    if path is not None:
        cfg.merge_from_file(path)
    if opts is not None:
        cfg.merge_from_list(opts)
    purge_cfg(cfg)
    cfg.freeze()
    return cfg

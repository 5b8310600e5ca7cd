"""fvcore.common.config.CfgNode shim: yacs CfgNode + load_yaml_with_base."""
import yaml

from yacs.config import CfgNode as _YacsCfgNode


class CfgNode(_YacsCfgNode):
    @classmethod
    def load_yaml_with_base(cls, filename, allow_unsafe=False):
        with open(filename) as f:
            cfg = yaml.safe_load(f) or {}
        base = cfg.pop("_BASE_", None)
        if base:
            import os
            if not os.path.isabs(base):
                base = os.path.join(os.path.dirname(filename), base)
            base_cfg = cls.load_yaml_with_base(base, allow_unsafe)
            _deep_update(base_cfg, cfg)
            return base_cfg
        return cfg

    def merge_from_file(self, cfg_filename, allow_unsafe=False):
        loaded = self.load_yaml_with_base(cfg_filename, allow_unsafe)
        self.merge_from_other_cfg(_YacsCfgNode(loaded))


def _deep_update(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst

"""omegaconf shim: d2 config/lazy.py imports these names; LazyConfig is not
used by the parity harness, so the classes are import-compatible stubs."""


class DictConfig(dict):
    def __init__(self, content=None, flags=None):
        super().__init__(content or {})


class ListConfig(list):
    pass


class OmegaConf:
    @staticmethod
    def create(obj=None, flags=None):
        if isinstance(obj, dict):
            return DictConfig(obj)
        if isinstance(obj, list):
            return ListConfig(obj)
        return DictConfig({})

    @staticmethod
    def to_container(cfg, resolve=False):
        return dict(cfg) if isinstance(cfg, dict) else list(cfg)

    @staticmethod
    def is_config(obj):
        return isinstance(obj, (DictConfig, ListConfig))

    @staticmethod
    def merge(*configs):
        out = {}
        for c in configs:
            out.update(dict(c))
        return DictConfig(out)

    @staticmethod
    def register_new_resolver(*a, **k):
        pass

"""Minimal yacs.config.CfgNode (see package docstring)."""

import copy


class CfgNode(dict):
    IMMUTABLE = "__immutable__"
    NEW_ALLOWED = "__new_allowed__"

    def __init__(self, init_dict=None, key_list=None, new_allowed=False):
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        object.__setattr__(self, CfgNode.NEW_ALLOWED, new_allowed)
        init_dict = init_dict or {}
        for k, v in init_dict.items():
            if isinstance(v, dict) and not isinstance(v, CfgNode):
                v = CfgNode(v, new_allowed=new_allowed)
            dict.__setitem__(self, k, v)

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, name):
        if name in self:
            return self[name]
        raise AttributeError(
            f"Non-existent config key: {name} (have {sorted(self.keys())[:20]})")

    def __setattr__(self, name, value):
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"CfgNode is frozen; cannot set {name}")
        dict.__setitem__(self, name, value)

    def __setitem__(self, name, value):
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"CfgNode is frozen; cannot set {name}")
        dict.__setitem__(self, name, value)

    # -- yacs API -----------------------------------------------------------
    def is_frozen(self):
        return object.__getattribute__(self, CfgNode.IMMUTABLE)

    def is_new_allowed(self):
        return object.__getattribute__(self, CfgNode.NEW_ALLOWED)

    def set_new_allowed(self, val):
        object.__setattr__(self, CfgNode.NEW_ALLOWED, bool(val))
        for v in self.values():
            if isinstance(v, CfgNode):
                v.set_new_allowed(val)

    def freeze(self):
        self._immutable(True)

    def defrost(self):
        self._immutable(False)

    def _immutable(self, val):
        object.__setattr__(self, CfgNode.IMMUTABLE, val)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._immutable(val)

    def clone(self):
        return copy.deepcopy(self)

    def merge_from_other_cfg(self, other):
        _merge(other, self)

    def merge_from_file(self, filename):
        import yaml
        with open(filename) as f:
            d = yaml.safe_load(f) or {}
        d.pop("_BASE_", None)
        _merge(CfgNode(d), self)

    def merge_from_list(self, opts):
        assert len(opts) % 2 == 0, opts
        for k, v in zip(opts[::2], opts[1::2]):
            node = self
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            cur = node.get(parts[-1], None)
            node[parts[-1]] = _coerce(v, cur)
        return self

    def dump(self, **kwargs):
        import yaml
        return yaml.safe_dump(_to_dict(self))

    def __deepcopy__(self, memo):
        # type(self), not CfgNode: d2's CfgNode subclasses this (via fvcore);
        # clone() must preserve the subclass or @configurable's
        # _called_with_cfg isinstance dispatch silently fails.
        new = type(self).__new__(type(self))
        object.__setattr__(new, CfgNode.IMMUTABLE, False)
        object.__setattr__(new, CfgNode.NEW_ALLOWED, self.is_new_allowed())
        for k, v in self.items():
            dict.__setitem__(new, k, copy.deepcopy(v, memo))
        return new

    def __repr__(self):
        return f"CfgNode({dict.__repr__(self)})"


def _to_dict(node):
    return {k: _to_dict(v) if isinstance(v, CfgNode) else v
            for k, v in node.items()}


def _merge(src, dst):
    for k, v in src.items():
        if isinstance(v, CfgNode) and isinstance(dst.get(k), CfgNode):
            _merge(v, dst[k])
        else:
            if k not in dst and not dst.is_new_allowed():
                raise KeyError(f"Non-existent config key: {k}")
            dst[k] = copy.deepcopy(v)


def _coerce(v, cur):
    if not isinstance(v, str):
        return v
    try:
        import ast
        parsed = ast.literal_eval(v)
    except (ValueError, SyntaxError):
        parsed = v
    if cur is not None and isinstance(cur, bool) and isinstance(parsed, str):
        return parsed.lower() in ("true", "1", "yes")
    return parsed

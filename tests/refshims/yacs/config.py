"""Minimal yacs.config.CfgNode: attribute-style nested config dict.

Implements the subset the reference configs use: attribute get/set,
clone(), merge_from_file (YAML), merge_from_other_cfg, merge_from_list,
freeze/defrost (no-ops here), items() iteration (used by lower_config).
"""

from __future__ import annotations

import copy


class CfgNode(dict):
    def __init__(self, init_dict=None, **kwargs):
        init_dict = dict(init_dict or {}, **kwargs)
        super().__init__()
        for k, v in init_dict.items():
            self[k] = self._coerce(v)

    @classmethod
    def _coerce(cls, v):
        if isinstance(v, dict) and not isinstance(v, CfgNode):
            return cls(v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = self._coerce(value)

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def freeze(self):
        return self

    def defrost(self):
        return self

    def is_frozen(self) -> bool:
        return False

    def merge_from_other_cfg(self, other: "CfgNode"):
        _merge(other, self)

    def merge_from_file(self, filename: str):
        import yaml

        with open(filename) as f:
            loaded = yaml.safe_load(f)
        _merge(CfgNode(loaded or {}), self)

    def merge_from_list(self, opts):
        assert len(opts) % 2 == 0, "override list must be key/value pairs"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            old = node.get(parts[-1])
            if isinstance(value, str) and old is not None \
                    and not isinstance(old, str):
                import ast

                value = ast.literal_eval(value)
            node[parts[-1]] = self._coerce(value)

    def dump(self, **kwargs) -> str:
        import yaml

        def plain(n):
            return {k: plain(v) if isinstance(v, CfgNode) else v
                    for k, v in n.items()}

        return yaml.safe_dump(plain(self))


def _merge(src: CfgNode, dst: CfgNode):
    for k, v in src.items():
        if isinstance(v, CfgNode) and isinstance(dst.get(k), CfgNode):
            _merge(v, dst[k])
        else:
            dst[k] = v

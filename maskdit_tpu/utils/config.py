"""YAML config system compatible with the reference's OmegaConf usage.

The reference loads OmegaConf YAML files (reference: train.py:37) with groups
data/model/train/eval/log/wandb and overlays argparse values by attribute
assignment (reference: train.py:39-42). We reimplement the needed surface
(load / dot access / merge / dotlist overrides / to_container) on top of
PyYAML so the reference's shipped configs port 1:1.

Unlike OmegaConf, unknown-key access raises immediately with the full path,
and `validate()` lets CLIs check schemas at load time (the reference shipped
a config with a key typo — 'cos4' vs 'cosine4' — that only failed at runtime;
see SURVEY.md §5 config row).
"""

from __future__ import annotations

import copy
from typing import Any, Iterator, Mapping

import yaml

_MISSING = object()


class ConfigNode(Mapping):
    """A dot-accessible, mutable mapping over nested dicts."""

    def __init__(self, data: dict | None = None):
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self[k] = v

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        if isinstance(value, Mapping) and not isinstance(value, ConfigNode):
            value = ConfigNode(dict(value))
        self._data[key] = value

    def __delitem__(self, key: str) -> None:
        del self._data[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: object) -> bool:
        return key in self._data

    # -- attribute access --------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return self._data[key]
        except KeyError:
            raise AttributeError(
                f"config has no key '{key}' (available: {sorted(self._data)})"
            ) from None

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    # -- helpers -----------------------------------------------------------
    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def select(self, path: str, default: Any = _MISSING) -> Any:
        """Fetch a dotted path, e.g. cfg.select('model.mask_ratio')."""
        node: Any = self
        for part in path.split("."):
            if isinstance(node, ConfigNode) and part in node:
                node = node[part]
            elif default is not _MISSING:
                return default
            else:
                raise KeyError(f"config path '{path}' not found at '{part}'")
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], ConfigNode):
                node[part] = ConfigNode()
            node = node[part]
        node[parts[-1]] = value

    def to_container(self) -> dict:
        out = {}
        for k, v in self._data.items():
            out[k] = v.to_container() if isinstance(v, ConfigNode) else copy.deepcopy(v)
        return out

    def __repr__(self) -> str:
        return f"ConfigNode({self.to_container()!r})"

    def __deepcopy__(self, memo):
        return ConfigNode(copy.deepcopy(self.to_container(), memo))


def load(path: str) -> ConfigNode:
    """Load a YAML file into a ConfigNode (OmegaConf.load equivalent)."""
    with open(path, "r") as f:
        data = yaml.safe_load(f) or {}
    return ConfigNode(data)


def loads(text: str) -> ConfigNode:
    return ConfigNode(yaml.safe_load(text) or {})


def save(cfg: ConfigNode, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_container(), f, sort_keys=False)


def merge(base: ConfigNode, *overrides: Mapping) -> ConfigNode:
    """Deep-merge override mappings into a copy of base (later wins)."""
    out = ConfigNode(base.to_container())

    def _merge(dst: ConfigNode, src: Mapping) -> None:
        for k, v in src.items():
            if (
                k in dst
                and isinstance(dst[k], ConfigNode)
                and isinstance(v, Mapping)
            ):
                _merge(dst[k], v)
            else:
                dst[k] = v

    for o in overrides:
        _merge(out, o)
    return out


def _parse_value(text: str) -> Any:
    """Parse a CLI override value with YAML semantics ('None' -> None too)."""
    if text in ("None", "none", "null"):
        return None
    return yaml.safe_load(text)


def apply_dotlist(cfg: ConfigNode, dotlist: list[str]) -> ConfigNode:
    """Apply 'a.b.c=value' overrides in place; returns cfg."""
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override '{item}' is not of the form key=value")
        key, _, value = item.partition("=")
        cfg.set_path(key.strip(), _parse_value(value.strip()))
    return cfg


def validate(cfg: ConfigNode, required: list[str]) -> None:
    """Raise with all missing dotted paths at once."""
    missing = [p for p in required if cfg.select(p, default=_MISSING) is _MISSING]
    if missing:
        raise KeyError(f"config is missing required keys: {missing}")

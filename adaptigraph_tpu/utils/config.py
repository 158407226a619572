"""Nested-YAML config system.

Mirrors the reference's plain-YAML config surface (src/config/{data_gen,
dynamics,planning}/*.yaml; loaded at src/sim/utils.py:5-7 and
src/dynamics/train/train.py:156-157) but adds:

  * attribute access (``cfg.train.batch_size``) with dict semantics,
  * deep-merge overrides (``cfg.override({...})``),
  * a bundled default config tree under ``adaptigraph_tpu/configs/``.

Configs remain plain data (dicts/lists/scalars) so they can be hashed into
jit static args where needed.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Mapping

import yaml

_CONFIG_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


class Config(dict):
    """A dict with attribute access and deep merge. Values stay plain."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs):
        super().__init__()
        merged = dict(data or {})
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = _wrap(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def override(self, other: Mapping[str, Any] | None = None, **kwargs) -> "Config":
        """Return a new Config with `other` (then kwargs) deep-merged on top."""
        out = copy.deepcopy(self)
        for src in (other or {}), kwargs:
            _deep_merge(out, src)
        return out

    def to_dict(self) -> dict:
        return _unwrap(self)


def _wrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, Mapping):
        return Config(v)
    if isinstance(v, list):
        return [_wrap(x) for x in v]
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, Mapping):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unwrap(x) for x in v]
    return v


def _deep_merge(dst: Config, src: Mapping[str, Any]) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], Mapping) and isinstance(v, Mapping):
            _deep_merge(dst[k], v)
        else:
            dst[k] = _wrap(v)


def load_yaml(path: str) -> Config:
    with open(path, "r") as f:
        return Config(yaml.safe_load(f) or {})


def load_config(name_or_path: str) -> Config:
    """Load a config by bundled name ('dynamics/rope') or filesystem path."""
    if os.path.exists(name_or_path):
        return load_yaml(name_or_path)
    path = os.path.join(_CONFIG_ROOT, name_or_path)
    if not path.endswith(".yaml"):
        path += ".yaml"
    if not os.path.exists(path):
        raise FileNotFoundError(f"no config named {name_or_path!r} (looked in {_CONFIG_ROOT})")
    return load_yaml(path)

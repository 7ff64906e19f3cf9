"""Experiment configuration: YAML multi-file inheritance -> immutable Config.

Reproduces the experiment-file UX of the reference config system
(/root/reference/utils/commons/hparams.py:26-134): YAML files may list parent
files under ``base_config:`` (depth-first merge, visited-set cycle guard,
relative paths resolved against the including file), and the CLI may override
dotted keys (``a=1,b.c=2``).  Unlike the reference — which populates a global
mutable dict imported everywhere — the result here is an *immutable* mapping
passed explicitly, which is required for sane jit tracing and caching.
"""

from __future__ import annotations

import ast
import os
from typing import Any, Iterator, Mapping

import yaml


class Config(Mapping):
    """Immutable nested mapping with attribute access.

    ``cfg.hidden_size`` and ``cfg["hidden_size"]`` are equivalent; nested
    dicts are wrapped lazily.  Hashable only by identity (configs are compared
    by content with ``==``) — do not use as jit static args; extract leaves.
    """

    __slots__ = ("_data",)

    def __init__(self, data: Mapping[str, Any]):
        object.__setattr__(self, "_data", dict(data))

    # Mapping interface -----------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        val = self._data[key]
        if isinstance(val, dict):
            return Config(val)
        if isinstance(val, list):
            return tuple(Config(v) if isinstance(v, dict) else v for v in val)
        return val

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    # Attribute access ------------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        # guard dunder/underscore lookups (e.g. during unpickling, before
        # _data exists __getattr__('_data') would recurse forever)
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    # pickling (Mapping's default pickle path would hit __getattr__)
    def __getstate__(self):
        return self._data

    def __setstate__(self, state):
        object.__setattr__(self, "_data", state)

    def __setattr__(self, key: str, value: Any):
        raise TypeError("Config is immutable; use .replace(**updates)")

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    def replace(self, **updates: Any) -> "Config":
        """Return a new Config with top-level keys replaced."""
        data = dict(self._data)
        data.update(updates)
        return Config(data)

    def to_dict(self) -> dict:
        return _deep_copy_plain(self._data)

    def __repr__(self) -> str:
        return f"Config({self._data!r})"

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, Config):
            return self._data == other._data
        return self._data == other


def _deep_copy_plain(d: Any) -> Any:
    if isinstance(d, dict):
        return {k: _deep_copy_plain(v) for k, v in d.items()}
    if isinstance(d, (list, tuple)):
        return [_deep_copy_plain(v) for v in d]
    return d


def _deep_merge(dst: dict, src: Mapping) -> dict:
    """Merge src into dst recursively (src wins); mirrors reference
    ``override_config`` (hparams.py:18-23)."""
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = _deep_copy_plain(v)
    return dst


def _load_yaml_chain(path: str, visited: set[str]) -> dict:
    """Depth-first base_config inheritance (hparams.py:53-74 semantics)."""
    path = os.path.normpath(path)
    if not os.path.exists(path):
        raise FileNotFoundError(f"config file not found: {path}")
    visited.add(path)
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    bases = raw.pop("base_config", [])
    if not isinstance(bases, list):
        bases = [bases]
    merged: dict = {}
    for base in bases:
        if base.startswith("."):
            base = os.path.normpath(os.path.join(os.path.dirname(path), base))
        if base not in visited:
            _deep_merge(merged, _load_yaml_chain(base, visited))
    _deep_merge(merged, raw)
    return merged


def parse_overrides(spec: str) -> dict:
    """Parse ``"a=1,b.c=2,d=[1, 2, 3]"`` into a nested dict.

    Values are parsed with ast.literal_eval when possible, else kept as
    strings.  Commas inside brackets belong to the value, not the separator
    (an improvement over the reference's space-separated list syntax,
    hparams.py:96-109).
    """
    out: dict = {}
    if not spec:
        return out
    # Split on commas not inside brackets.
    parts, depth, cur = [], 0, []
    for ch in spec:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    for part in parts:
        if not part.strip():
            continue
        k, _, v = part.partition("=")
        k, v = k.strip(), v.strip().strip("'\"")
        try:
            val = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            val = v
        node = out
        keys = k.split(".")
        for kk in keys[:-1]:
            node = node.setdefault(kk, {})
        node[keys[-1]] = val
    return out


_DEFAULTS_DIR = os.path.join(os.path.dirname(__file__), "defaults")


def load_config(
    path: str | None = None,
    overrides: str | dict | None = None,
    name: str | None = None,
) -> Config:
    """Load an experiment config.

    Args:
      path: YAML file (supports base_config inheritance). Mutually exclusive
        with ``name``.
      overrides: dotted-key override string or nested dict (applied last).
      name: one of the built-in configs in ``config/defaults`` (e.g.
        ``"visinger"``, ``"visinger_csd"``).
    """
    if path is None:
        name = name or "visinger_csd"
        path = os.path.join(_DEFAULTS_DIR, f"{name}.yaml")
    merged = _load_yaml_chain(path, set())
    if overrides:
        if isinstance(overrides, str):
            overrides = parse_overrides(overrides)
        _deep_merge(merged, overrides)
    return Config(merged)

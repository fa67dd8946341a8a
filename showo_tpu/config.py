"""Config/flag system: YAML files merged with CLI dotted-key overrides.

Same UX as the reference (training/utils.py:12-17, show-o2/utils.py:15-20):

    python -m showo_tpu.inference_t2i config=configs/showo_demo.yaml mode=t2i \
        training.batch_size=4

CLI keys override YAML keys; ``${a.b}`` interpolation is resolved against
the merged tree.  Self-contained (pyyaml only).
"""

from __future__ import annotations

import re
from typing import Any, Iterator, List, Tuple

import yaml

_INTERP = re.compile(r"^\$\{([^}]+)\}$")
_INTERP_SUB = re.compile(r"\$\{([^}]+)\}")


class Config(dict):
    """Attribute-accessible nested dict."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node = self
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = Config()
                node[p] = nxt
            node = nxt
        node[parts[-1]] = value


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def _parse_value(text: str) -> Any:
    return yaml.safe_load(text)


def _resolve(node: Any, root: Config) -> Any:
    if isinstance(node, dict):
        for k in list(node.keys()):
            node[k] = _resolve(node[k], root)
        return node
    if isinstance(node, list):
        return [_resolve(v, root) for v in node]
    if isinstance(node, str):
        m = _INTERP.match(node)
        if m:  # full-value interpolation preserves type
            return _resolve(root.get_path(m.group(1)), root)
        return _INTERP_SUB.sub(
            lambda m: str(_resolve(root.get_path(m.group(1)), root)), node)
    return node


def _merge(base: Any, override: Any) -> Any:
    if isinstance(base, dict) and isinstance(override, dict):
        out = Config(base)
        for k, v in override.items():
            out[k] = _merge(base.get(k), v) if k in base else _wrap(v)
        return out
    return _wrap(override)


def load_config(path: str, overrides: List[str] | None = None) -> Config:
    with open(path) as f:
        conf = _wrap(yaml.safe_load(f) or {})
    for item in overrides or []:
        key, _, val = item.partition("=")
        conf.set_path(key.strip(), _parse_value(val))
    _resolve(conf, conf)
    return conf


def get_config(argv: List[str] | None = None) -> Config:
    """``config=<yaml> a.b=v ...`` CLI convention."""
    import sys

    args = list(argv if argv is not None else sys.argv[1:])
    cfg_path = None
    rest = []
    for a in args:
        if a.startswith("config="):
            cfg_path = a.split("=", 1)[1]
        else:
            rest.append(a)
    if cfg_path is None:
        raise SystemExit("usage: <tool> config=<yaml> [dotted.key=value ...]")
    conf = load_config(cfg_path, rest)
    conf["config"] = cfg_path
    return conf


def snapshot_config(cfg: Any, output_dir: str, tracker=None) -> str:
    """Persist the merged config into the run directory and (optionally)
    attach the flattened key/values to a tracker — the reference snapshots
    its OmegaConf the same way (train.py:153-157, training/utils.py:20-48)."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "config.yaml")

    def plain(x):
        if isinstance(x, dict):
            return {k: plain(v) for k, v in x.items()}
        if isinstance(x, list):
            return [plain(v) for v in x]
        return x

    with open(path, "w") as f:
        yaml.safe_dump(plain(cfg), f, sort_keys=False)
    if tracker is not None and hasattr(tracker, "log_config"):
        tracker.log_config(dict(flatten_config(cfg)))
    return path


def flatten_config(cfg: Any, prefix: str = "") -> Iterator[Tuple[str, Any]]:
    """Flatten to dotted (key, value) pairs for logging."""
    if isinstance(cfg, dict):
        for k, v in cfg.items():
            yield from flatten_config(v, f"{prefix}{k}.")
    elif isinstance(cfg, list):
        for i, v in enumerate(cfg):
            yield from flatten_config(v, f"{prefix}{i}.")
    else:
        yield prefix[:-1], cfg

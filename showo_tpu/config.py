"""Config/flag system: YAML files merged with CLI dotted-key overrides.

Same UX as the reference (training/utils.py:12-17, show-o2/utils.py:15-20):

    python -m showo_tpu.inference_t2i config=configs/showo_demo.yaml mode=t2i \
        training.batch_size=4

CLI keys override YAML keys; OmegaConf interpolation (``${a.b}``) is
supported in the YAML files.
"""

from __future__ import annotations

from typing import Any, List, Tuple

from omegaconf import DictConfig, ListConfig, OmegaConf


def get_config(argv: list | None = None) -> DictConfig:
    """Load ``config=<yaml>`` and merge dotted-key CLI overrides on top."""
    if argv is None:
        cli_conf = OmegaConf.from_cli()
    else:
        cli_conf = OmegaConf.from_dotlist(list(argv))
    yaml_conf = OmegaConf.load(cli_conf.config)
    return OmegaConf.merge(yaml_conf, cli_conf)


def load_config(path: str, overrides: list | None = None) -> DictConfig:
    """Programmatic variant of :func:`get_config`."""
    conf = OmegaConf.load(path)
    if overrides:
        conf = OmegaConf.merge(conf, OmegaConf.from_dotlist(list(overrides)))
    return conf


def flatten_config(cfg: Any, resolve: bool = False) -> List[Tuple[str, Any]]:
    """Flatten a nested config into dotted (key, value) pairs for logging."""
    out: List[Tuple[str, Any]] = []

    def rec(prefix: str, node: Any) -> None:
        if isinstance(node, DictConfig):
            for k in node.keys():
                v = node._get_node(k) if not resolve else node[k]
                rec(f"{prefix}{k}.", OmegaConf.select(node, str(k)))
        elif isinstance(node, ListConfig):
            for i, v in enumerate(node):
                rec(f"{prefix}{i}.", v)
        else:
            out.append((prefix[:-1], node))

    rec("", cfg)
    return out

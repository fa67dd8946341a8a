"""Device mesh + sharding rules: the TPU-native replacement for the
reference's NCCL/accelerate/DeepSpeed stack (SURVEY.md §2.3).

* data parallelism  -> batch axis sharded over ("dp", "fsdp")
* ZeRO-2 analogue   -> parameters and optimizer state sharded over "fsdp"
  (XLA all-gathers weights per layer and reduce-scatters grads; with the
  stacked-layer scan layout one layer's gather overlaps the previous
  layer's compute)
* tensor parallelism -> optional "tp" axis on attention/MLP kernels

No rendezvous config: `jax.distributed.initialize()` + one Mesh replaces
accelerate_configs/* entirely.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def constrain(x, *spec):
    """``with_sharding_constraint(x, P(*spec))`` iff an ambient mesh (via
    ``jax.set_mesh``) carries every axis named in ``spec``; identity on
    single-chip paths.  Lets model code pin internal shardings (e.g. the
    CE loss's logits) without threading mesh objects through."""
    mesh = jax.sharding.get_abstract_mesh()
    names = set(getattr(mesh, "axis_names", ()) or ())

    def ok(e):
        parts = e if isinstance(e, tuple) else (e,)
        return e is None or all(p in names for p in parts)

    if not names or not all(ok(e) for e in spec):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def make_mesh(dp: Optional[int] = None, fsdp: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    """Create a ("dp", "fsdp", "tp") mesh. dp=None fills all devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (fsdp * tp)
    assert dp * fsdp * tp == n, f"{dp}*{fsdp}*{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


# Sharding rules for the stacked-parameter pytrees used across the
# framework.  Matched by path suffix; first match wins.  Kernels shard the
# largest contraction-free axis over fsdp, attention/MLP output axes over tp.
_DEFAULT_RULES: Sequence[tuple] = (
    # stacked transformer layers (phi/qwen2/dit/siglip): [L, in, out];
    # win/wout are the fuse_parallel_mlp fused kernels (models/phi.py)
    (r"layers/(q|k|v|qkv|fc1|gate|up|gu|win)/kernel$",
     P(None, None, ("fsdp", "tp"))),
    (r"layers/(dense|o|out|fc2|down|wout)/kernel$",
     P(None, ("fsdp", "tp"), None)),
    (r"layers/adaln/kernel$", P(None, None, ("fsdp", "tp"))),
    (r"layers/.*/bias$", P()),
    (r"layers/.*/scale$", P()),
    (r"embed$", P("fsdp", None)),
    (r"lm_head/kernel$", P(None, ("fsdp", "tp"))),
    (r"lm_head/bias$", P()),
    # unstacked 2D projections (fusion_proj, diff_proj, time_embed,
    # final-layer adaln, ...)
    (r"(fc1|fc2|linear|adaln|proj|kernel)/kernel$", P(None, ("fsdp", "tp"))),
    # conv codecs: [kh, kw, I, O] or [kT, kH, kW, I, O]
    (r"kernel$", P(None, None, None, "fsdp")),
    (r".*", P()),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_sharding_rules(params: Dict[str, Any], mesh: Mesh,
                         rules: Sequence[tuple] = _DEFAULT_RULES):
    """PyTree of NamedShardings matching ``params``' structure."""

    def pick(path, leaf):
        s = _path_str(path)
        # stacked-layer params are scanned over axis 0: relocating a
        # sharding there would put collectives inside every lax.scan
        # iteration, so dim 0 is never a relocation candidate for them
        excl = (0,) if "layers/" in s else ()
        for pat, spec in rules:
            if re.search(pat, s):
                # drop axes that don't divide the dim evenly -> replicate them
                fixed = _fit_spec(spec, leaf.shape if hasattr(leaf, "shape") else (), mesh,
                                  exclude_dims=excl)
                return NamedSharding(mesh, fixed)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(pick, params)


def _fit_spec(spec: P, shape, mesh: Mesh, exclude_dims=()) -> P:
    if len(spec) > len(shape):
        return P()
    out = []
    dropped = []
    for dim, axes in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axes is None:
            out.append(None)
            continue
        axes_t = axes if isinstance(axes, tuple) else (axes,)
        size = int(np.prod([mesh.shape[a] for a in axes_t]))
        if dim % size == 0:
            out.append(axes)
        else:
            # axis doesn't divide evenly -> try to relocate the sharding
            # instead of silently replicating (e.g. Qwen's vocab 151940 is
            # not divisible by 8, but the hidden axis is)
            out.append(None)
            dropped.append(axes)
    for axes in dropped:
        axes_t = axes if isinstance(axes, tuple) else (axes,)
        size = int(np.prod([mesh.shape[a] for a in axes_t]))
        # biggest still-unsharded divisible dim, if any
        cands = [i for i, (dim, cur) in enumerate(zip(shape, out))
                 if cur is None and dim % size == 0 and dim >= size
                 and i not in exclude_dims]
        if cands:
            out[max(cands, key=lambda i: shape[i])] = axes
    return P(*out)


def shard_params(params, mesh: Mesh, rules=_DEFAULT_RULES):
    shardings = param_sharding_rules(params, mesh, rules)
    return jax.device_put(params, shardings)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading batch axis over (dp, fsdp)."""
    spec = P(("dp", "fsdp"))

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

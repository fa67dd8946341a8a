"""Checkpoint IO: orbax-backed save/restore with the reference's layout.

Mirrors training/train.py:851-889 ``save_checkpoint``:
  * ``<output_dir>/checkpoint-<step>/`` directories;
  * ``metadata.json`` carrying ``global_step``;
  * ring-buffer pruning by ``checkpoints_total_limit``;
  * ``resume_from_checkpoint='latest'`` scans ``checkpoint-*`` dirs and
    derives the step from the dir name (train.py:429-443).

Unlike the reference (weights only), the full train state (params +
optimizer state + step) is saved so resume is exact.  HF/torch-format
reference weights are imported through showo_tpu.utils.torch_import.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dirs(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    dirs = [d for d in os.listdir(output_dir) if re.match(r"checkpoint-\d+$", d)]
    return sorted(dirs, key=lambda d: int(d.split("-")[1]))


def save_checkpoint(state: Any, output_dir: str, global_step: int,
                    checkpoints_total_limit: Optional[int] = None) -> str:
    """Save a pytree train state under checkpoint-<step>/ and prune."""
    import orbax.checkpoint as ocp

    if checkpoints_total_limit is not None:
        dirs = _ckpt_dirs(output_dir)
        while len(dirs) >= checkpoints_total_limit:
            shutil.rmtree(os.path.join(output_dir, dirs.pop(0)))

    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{global_step}"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "state"), jax.device_get(state))
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump({"global_step": global_step}, f)
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    dirs = _ckpt_dirs(output_dir)
    return os.path.join(output_dir, dirs[-1]) if dirs else None


def restore_checkpoint(path: str, target: Any = None):
    """Restore (state, global_step) from a checkpoint-<N> dir."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    item = ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                         item=jax.device_get(target) if target is not None else None)
    with open(os.path.join(path, "metadata.json")) as f:
        step = json.load(f)["global_step"]
    return item, step


def resume_latest(output_dir: str, target: Any = None,
                  params_only_fallback: bool = False):
    """resume_from_checkpoint='latest' semantics; returns (state, step) or
    (None, 0).

    params_only_fallback: when the saved state's optimizer pytree no
    longer matches the current one (e.g. the two-phase mixed-modality
    recipe changes frozen_params between invocations,
    show-o2/README.md:293-309), restore only the params (element 0 of the
    (params, opt_state) tuple) and keep the caller's fresh optimizer
    state — the reference's weights-only resume behavior."""
    path = latest_checkpoint(output_dir)
    if path is None:
        return None, 0
    try:
        return restore_checkpoint(path, target)
    except Exception as e:
        if not params_only_fallback or not isinstance(target, (tuple, list)):
            raise
        import logging

        # loud: a weights-only resume resets optimizer moments (and any
        # grad-accum counters) — intended for deliberate recipe changes,
        # but this branch also catches genuine restore corruption
        logging.getLogger(__name__).warning(
            "full-state restore from %s failed (%s: %s); falling back to "
            "WEIGHTS-ONLY resume — optimizer state resets to fresh",
            path, type(e).__name__, e)
        import orbax.checkpoint as ocp

        try:
            ckptr = ocp.PyTreeCheckpointer()
            raw = ckptr.restore(os.path.join(os.path.abspath(path), "state"))
            with open(os.path.join(path, "metadata.json")) as f:
                step = json.load(f)["global_step"]
        except Exception:
            raise e  # genuine corruption: surface the original failure
        # re-verify the params half actually restored: a truncated /
        # corrupted checkpoint must not silently degrade to weights-only
        want = jax.tree_util.tree_structure(jax.device_get(target[0]))
        got = jax.tree_util.tree_structure(raw[0])
        if want != got:
            raise e
        return (raw[0],) + tuple(target[1:]), step


# ---------------------------------------------------------------------------
# HF / torch reference-weight import entry points
# ---------------------------------------------------------------------------

def load_showo_weights(path: str, num_layers: int = 24) -> dict:
    """Load reference `showlab/show-o` weights (pytorch_model.bin or
    safetensors dir/file) into the jax Showo param pytree."""
    from showo_tpu.utils.torch_import import load_torch_weights, phi_params_from_torch

    sd = _load_dir_or_file(path)
    params = {"showo": phi_params_from_torch(sd, num_layers=num_layers)}
    if "mm_projector.0.weight" in sd:
        from showo_tpu.utils.torch_import import linear_kernel

        params["mm_projector"] = {
            "fc1": {"kernel": linear_kernel(sd["mm_projector.0.weight"]),
                    "bias": sd["mm_projector.0.bias"]},
            "fc2": {"kernel": linear_kernel(sd["mm_projector.2.weight"]),
                    "bias": sd["mm_projector.2.bias"]},
        }
    return params


def load_magvit_weights(path: str) -> dict:
    from showo_tpu.utils.torch_import import magvit_params_from_torch

    return magvit_params_from_torch(_load_dir_or_file(path))


def load_clip_weights(path: str, num_layers: int = 24) -> dict:
    """Load an HF CLIPVisionModel checkpoint (openai/clip-vit-large-patch14-336,
    inference_mmu.py:73-75) into the jax clip_vit param pytree."""
    from showo_tpu.utils.torch_import import clip_vit_params_from_torch

    return clip_vit_params_from_torch(_load_dir_or_file(path), num_layers)


def load_wan_vae_weights(path: str, cfg=None) -> dict:
    from showo_tpu.utils.torch_import import wan_vae_params_from_torch

    return wan_vae_params_from_torch(_load_dir_or_file(path), cfg)


def _load_dir_or_file(path: str) -> dict:
    from showo_tpu.utils.torch_import import load_torch_weights

    if os.path.isdir(path):
        cands = [f for f in os.listdir(path)
                 if f.endswith((".safetensors", ".bin", ".pth"))]
        sd: dict = {}
        for f in sorted(cands):
            sd.update(load_torch_weights(os.path.join(path, f)))
        return sd
    return load_torch_weights(path)

"""Export jax param pytrees back to reference-layout state dicts.

Inverse of showo_tpu.utils.torch_import: weights trained in this framework
can be written as safetensors files with the reference's tensor names and
layouts, loadable by the original PyTorch code (the `save_pretrained`
analogue of the vendored ModelMixin, models/modeling_utils.py:270-966).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _lin(kernel) -> np.ndarray:
    return np.transpose(np.asarray(kernel), (1, 0))


def phi_state_dict(params: Dict, num_layers: int = 24,
                   prefix: str = "showo.") -> Dict[str, np.ndarray]:
    """Inverse of phi_params_from_torch."""
    p = params
    sd: Dict[str, np.ndarray] = {}
    sd[f"{prefix}model.embed_tokens.weight"] = np.asarray(p["embed"])
    L = p["layers"]
    for i in range(num_layers):
        base = f"{prefix}model.layers.{i}"
        for ours, theirs in (("q", "self_attn.q_proj"),
                             ("k", "self_attn.k_proj"),
                             ("v", "self_attn.v_proj"),
                             ("dense", "self_attn.dense"),
                             ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            sd[f"{base}.{theirs}.weight"] = _lin(L[ours]["kernel"][i])
            sd[f"{base}.{theirs}.bias"] = np.asarray(L[ours]["bias"][i])
        for ours, theirs in (("ln", "input_layernorm"),
                             ("q_ln", "self_attn.q_layernorm"),
                             ("k_ln", "self_attn.k_layernorm")):
            sd[f"{base}.{theirs}.weight"] = np.asarray(L[ours]["scale"][i])
            sd[f"{base}.{theirs}.bias"] = np.asarray(L[ours]["bias"][i])
    sd[f"{prefix}model.final_layernorm.weight"] = np.asarray(
        p["final_ln"]["scale"])
    sd[f"{prefix}model.final_layernorm.bias"] = np.asarray(
        p["final_ln"]["bias"])
    sd[f"{prefix}lm_head.weight"] = _lin(p["lm_head"]["kernel"])
    sd[f"{prefix}lm_head.bias"] = np.asarray(p["lm_head"]["bias"])
    return sd


def showo_state_dict(params: Dict, num_layers: int = 24) -> Dict[str, np.ndarray]:
    sd = phi_state_dict(params["showo"], num_layers, prefix="showo.")
    if "mm_projector" in params:
        mp = params["mm_projector"]
        sd["mm_projector.0.weight"] = _lin(mp["fc1"]["kernel"])
        sd["mm_projector.0.bias"] = np.asarray(mp["fc1"]["bias"])
        sd["mm_projector.2.weight"] = _lin(mp["fc2"]["kernel"])
        sd["mm_projector.2.bias"] = np.asarray(mp["fc2"]["bias"])
    return sd


def save_safetensors(sd: Dict[str, np.ndarray], path: str,
                     metadata: Dict[str, str] | None = None) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in sd.items()}, path, metadata=metadata)

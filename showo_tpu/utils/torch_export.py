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


def qwen2_state_dict(params: Dict, num_layers: int = 28,
                     prefix: str = "showo.", tied: bool = True
                     ) -> Dict[str, np.ndarray]:
    """Inverse of qwen2_params_from_torch."""
    sd: Dict[str, np.ndarray] = {}
    sd[f"{prefix}model.embed_tokens.weight"] = np.asarray(params["embed"])
    L = params["layers"]
    for i in range(num_layers):
        base = f"{prefix}model.layers.{i}"
        for ours, theirs, bias in (("q", "self_attn.q_proj", True),
                                   ("k", "self_attn.k_proj", True),
                                   ("v", "self_attn.v_proj", True),
                                   ("o", "self_attn.o_proj", False),
                                   ("gate", "mlp.gate_proj", False),
                                   ("up", "mlp.up_proj", False),
                                   ("down", "mlp.down_proj", False)):
            sd[f"{base}.{theirs}.weight"] = _lin(L[ours]["kernel"][i])
            if bias:
                sd[f"{base}.{theirs}.bias"] = np.asarray(L[ours]["bias"][i])
        sd[f"{base}.input_layernorm.weight"] = np.asarray(
            L["input_ln"]["scale"][i])
        sd[f"{base}.post_attention_layernorm.weight"] = np.asarray(
            L["post_ln"]["scale"][i])
    sd[f"{prefix}model.norm.weight"] = np.asarray(params["final_ln"]["scale"])
    if not tied and "lm_head" in params:
        sd[f"{prefix}lm_head.weight"] = _lin(params["lm_head"]["kernel"])
    return sd


def showo2_state_dict(params: Dict, num_llm_layers: int = 28,
                      num_siglip_layers: int = 26,
                      num_dit_layers: int = 10) -> Dict[str, np.ndarray]:
    """Inverse of showo2_params_from_torch (reference
    modeling_showo2_qwen2_5 layout)."""

    def conv_back(kernel) -> np.ndarray:
        return np.transpose(np.asarray(kernel), (3, 2, 0, 1))

    sd = qwen2_state_dict(params["showo"], num_llm_layers, "showo.")
    sd["image_embedder_und.proj.weight"] = conv_back(
        params["image_embedder_und"]["kernel"])
    sd["image_embedder_und.proj.bias"] = np.asarray(
        params["image_embedder_und"]["bias"])
    sd["image_embedder_gen.proj.weight"] = conv_back(
        params["image_embedder_gen"]["kernel"])
    sd["image_embedder_gen.proj.bias"] = np.asarray(
        params["image_embedder_gen"]["bias"])
    sd["position_embedding.weight"] = np.asarray(
        params["und_trans"]["pos_embed"])

    SL = params["und_trans"]["layers"]
    for i in range(num_siglip_layers):
        base = f"und_trans.layers.{i}"
        for ours, theirs in (("q", "self_attn.q_proj"),
                             ("k", "self_attn.k_proj"),
                             ("v", "self_attn.v_proj"),
                             ("out", "self_attn.out_proj"),
                             ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            sd[f"{base}.{theirs}.weight"] = _lin(SL[ours]["kernel"][i])
            sd[f"{base}.{theirs}.bias"] = np.asarray(SL[ours]["bias"][i])
        for ours, theirs in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
            sd[f"{base}.{theirs}.weight"] = np.asarray(SL[ours]["scale"][i])
            sd[f"{base}.{theirs}.bias"] = np.asarray(SL[ours]["bias"][i])

    fp = params["fusion_proj"]
    sd["fusion_proj.0.weight"] = np.asarray(fp["norm"]["scale"])
    sd["fusion_proj.1.weight"] = _lin(fp["fc1"]["kernel"])
    sd["fusion_proj.1.bias"] = np.asarray(fp["fc1"]["bias"])
    sd["fusion_proj.3.weight"] = _lin(fp["fc2"]["kernel"])
    sd["fusion_proj.3.bias"] = np.asarray(fp["fc2"]["bias"])

    te = params["time_embed"]
    sd["time_embed.mlp.0.weight"] = _lin(te["fc1"]["kernel"])
    sd["time_embed.mlp.0.bias"] = np.asarray(te["fc1"]["bias"])
    sd["time_embed.mlp.2.weight"] = _lin(te["fc2"]["kernel"])
    sd["time_embed.mlp.2.bias"] = np.asarray(te["fc2"]["bias"])

    DL = params["diffusion_head_a"]["layers"]
    for i in range(num_dit_layers):
        base = f"diffusion_head_a.{i}"
        for ours, theirs in (("q", "self_attn.q_proj"),
                             ("k", "self_attn.k_proj"),
                             ("v", "self_attn.v_proj"),
                             ("o", "self_attn.o_proj"),
                             ("gate", "mlp.gate_proj"),
                             ("up", "mlp.up_proj"),
                             ("down", "mlp.down_proj")):
            sd[f"{base}.{theirs}.weight"] = _lin(DL[ours]["kernel"][i])
        sd[f"{base}.self_attn.q_norm.weight"] = np.asarray(
            DL["q_norm"]["scale"][i])
        sd[f"{base}.self_attn.k_norm.weight"] = np.asarray(
            DL["k_norm"]["scale"][i])
        sd[f"{base}.input_layernorm.weight"] = np.asarray(
            DL["input_ln"]["scale"][i])
        sd[f"{base}.post_attention_layernorm.weight"] = np.asarray(
            DL["post_ln"]["scale"][i])
        sd[f"{base}.adaLN_modulation.1.weight"] = _lin(DL["adaln"]["kernel"][i])
        sd[f"{base}.adaLN_modulation.1.bias"] = np.asarray(
            DL["adaln"]["bias"][i])

    fl = params["diffusion_head_b"]
    sd["diffusion_head_b.norm_final.weight"] = np.asarray(fl["norm"]["scale"])
    sd["diffusion_head_b.linear.weight"] = _lin(fl["linear"]["kernel"])
    sd["diffusion_head_b.linear.bias"] = np.asarray(fl["linear"]["bias"])
    sd["diffusion_head_b.adaLN_modulation.1.weight"] = _lin(
        fl["adaln"]["kernel"])
    sd["diffusion_head_b.adaLN_modulation.1.bias"] = np.asarray(
        fl["adaln"]["bias"])

    if "diff_proj" in params:
        dp = params["diff_proj"]
        sd["diff_proj.0.weight"] = _lin(dp["fc1"]["kernel"])
        sd["diff_proj.0.bias"] = np.asarray(dp["fc1"]["bias"])
        sd["diff_proj.2.weight"] = _lin(dp["fc2"]["kernel"])
        sd["diff_proj.2.bias"] = np.asarray(dp["fc2"]["bias"])
        tp = params["time_embed_proj"]
        sd["time_embed_proj.weight"] = _lin(tp["kernel"])
        sd["time_embed_proj.bias"] = np.asarray(tp["bias"])
    return sd


def save_safetensors(sd: Dict[str, np.ndarray], path: str,
                     metadata: Dict[str, str] | None = None) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in sd.items()}, path, metadata=metadata)

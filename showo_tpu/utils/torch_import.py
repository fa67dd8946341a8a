"""Convert PyTorch state_dicts (numpy arrays) into flax param pytrees.

Importers here consume a ``{name: np.ndarray}`` mapping — obtained from a
``.bin``/``.safetensors``/``.pth`` checkpoint — so torch itself is only
needed at load time, never inside the compute path.

Layout conversions:
  conv2d  (O, I, kH, kW) -> (kH, kW, I, O)
  conv3d  (O, I, kT, kH, kW) -> (kT, kH, kW, I, O)
  linear  (O, I) -> (I, O)
  norms   weight -> scale
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def load_torch_weights(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy arrays (host-side only)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if v.dtype.is_floating_point else v.numpy()
            for k, v in sd.items()}


def _set(tree: dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_into(tree: dict, flax_name: str, sd: Mapping, torch_name: str) -> None:
    _set(tree, (flax_name, "kernel"), conv2d_kernel(np.asarray(sd[f"{torch_name}.weight"])))
    _set(tree, (flax_name, "bias"), np.asarray(sd[f"{torch_name}.bias"]))


def _norm_into(tree: dict, flax_name: str, sd: Mapping, torch_name: str) -> None:
    _set(tree, (flax_name, "scale"), np.asarray(sd[f"{torch_name}.weight"]))
    _set(tree, (flax_name, "bias"), np.asarray(sd[f"{torch_name}.bias"]))


def magvit_params_from_torch(
    sd: Mapping[str, np.ndarray],
    enc_ch_mult=(1, 2, 2, 4, 4),
    enc_blocks=(4, 3, 4, 3, 4),
    dec_ch_mult=(1, 1, 2, 2, 4),
    dec_blocks=(4, 4, 3, 4, 3),
    ch: int = 128,
) -> dict:
    """Map the reference MAGVITv2 state_dict (modeling_magvitv2.py) onto
    :class:`showo_tpu.models.magvit.MagvitV2` params."""
    enc: dict = {}
    _conv_into(enc, "conv_in", sd, "encoder.conv_in")
    block_in = ch
    for i, mult in enumerate(enc_ch_mult):
        block_out = ch * mult
        for j in range(enc_blocks[i]):
            _resblock_into(enc, f"down_{i}_block_{j}", sd,
                           f"encoder.down.{i}.block.{j}", block_in != block_out)
            block_in = block_out
        if i != len(enc_ch_mult) - 1:
            _conv_into(enc, f"down_{i}_downsample", sd,
                       f"encoder.down.{i}.downsample.conv")
            # flax submodule holds conv under name "conv"
            enc[f"down_{i}_downsample"] = {"conv": enc.pop(f"down_{i}_downsample")}
    _resblock_into(enc, "mid_block_1", sd, "encoder.mid.block_1", False)
    _attn_into(enc, "mid_attn_1", sd, "encoder.mid.attn_1")
    _resblock_into(enc, "mid_block_2", sd, "encoder.mid.block_2", False)
    _norm_into(enc, "norm_out", sd, "encoder.norm_out")
    _conv_into(enc, "conv_out", sd, "encoder.conv_out")
    _conv_into(enc, "quant_conv", sd, "encoder.quant_conv")

    dec: dict = {}
    _conv_into(dec, "post_quant_conv", sd, "decoder.post_quant_conv")
    _conv_into(dec, "conv_in", sd, "decoder.conv_in")
    _resblock_into(dec, "mid_block_1", sd, "decoder.mid.block_1", False)
    _attn_into(dec, "mid_attn_1", sd, "decoder.mid.attn_1")
    _resblock_into(dec, "mid_block_2", sd, "decoder.mid.block_2", False)
    block_in = ch * dec_ch_mult[-1]
    for i in reversed(range(len(dec_ch_mult))):
        block_out = ch * dec_ch_mult[i]
        for j in range(dec_blocks[i]):
            _resblock_into(dec, f"up_{i}_block_{j}", sd,
                           f"decoder.up.{i}.block.{j}", block_in != block_out)
            block_in = block_out
        if i != 0:
            _conv_into(dec, f"up_{i}_upsample_conv", sd, f"decoder.up.{i}.upsample.conv")
            dec[f"up_{i}_upsample"] = {"conv": dec.pop(f"up_{i}_upsample_conv")}
    _norm_into(dec, "norm_out", sd, "decoder.norm_out")
    _conv_into(dec, "conv_out", sd, "decoder.conv_out")

    return {"encoder": enc, "decoder": dec}


def phi_params_from_torch(sd: Mapping[str, np.ndarray], num_layers: int = 24,
                          prefix: str = "showo.") -> dict:
    """Map the reference Showo/Phi state_dict (models/phi.py HF layout,
    wrapped under ``showo.`` by models/modeling_showo.py) onto the stacked
    pytree consumed by :func:`showo_tpu.models.phi.phi_forward`."""

    def g(name):
        return np.asarray(sd[f"{prefix}{name}"])

    def stack_linear(fmt):
        kern = np.stack([linear_kernel(g(fmt.format(i=i) + ".weight"))
                         for i in range(num_layers)])
        bias = np.stack([g(fmt.format(i=i) + ".bias") for i in range(num_layers)])
        return {"kernel": kern, "bias": bias}

    def stack_norm(fmt):
        return {
            "scale": np.stack([g(fmt.format(i=i) + ".weight") for i in range(num_layers)]),
            "bias": np.stack([g(fmt.format(i=i) + ".bias") for i in range(num_layers)]),
        }

    L = "model.layers.{i}"
    return {
        "embed": g("model.embed_tokens.weight"),
        "layers": {
            "ln": stack_norm(f"{L}.input_layernorm"),
            "q": stack_linear(f"{L}.self_attn.q_proj"),
            "k": stack_linear(f"{L}.self_attn.k_proj"),
            "v": stack_linear(f"{L}.self_attn.v_proj"),
            "q_ln": stack_norm(f"{L}.self_attn.q_layernorm"),
            "k_ln": stack_norm(f"{L}.self_attn.k_layernorm"),
            "dense": stack_linear(f"{L}.self_attn.dense"),
            "fc1": stack_linear(f"{L}.mlp.fc1"),
            "fc2": stack_linear(f"{L}.mlp.fc2"),
        },
        "final_ln": {"scale": g("model.final_layernorm.weight"),
                     "bias": g("model.final_layernorm.bias")},
        "lm_head": {"kernel": linear_kernel(g("lm_head.weight")),
                    "bias": g("lm_head.bias")},
    }


def qwen2_params_from_torch(sd: Mapping[str, np.ndarray], num_layers: int,
                            prefix: str = "", tied: bool = True) -> dict:
    """Map an HF Qwen2 state_dict onto the stacked pytree consumed by
    :func:`showo_tpu.show_o2.qwen2.qwen2_forward`."""

    def g(name):
        return np.asarray(sd[f"{prefix}{name}"])

    def stack_lin(fmt, bias: bool):
        kern = np.stack([linear_kernel(g(fmt.format(i=i) + ".weight"))
                         for i in range(num_layers)])
        out = {"kernel": kern}
        if bias:
            out["bias"] = np.stack([g(fmt.format(i=i) + ".bias")
                                    for i in range(num_layers)])
        return out

    def stack_scale(fmt):
        return {"scale": np.stack([g(fmt.format(i=i) + ".weight")
                                   for i in range(num_layers)])}

    L = "model.layers.{i}"
    params = {
        "embed": g("model.embed_tokens.weight"),
        "layers": {
            "input_ln": stack_scale(f"{L}.input_layernorm"),
            "post_ln": stack_scale(f"{L}.post_attention_layernorm"),
            "q": stack_lin(f"{L}.self_attn.q_proj", True),
            "k": stack_lin(f"{L}.self_attn.k_proj", True),
            "v": stack_lin(f"{L}.self_attn.v_proj", True),
            "o": stack_lin(f"{L}.self_attn.o_proj", False),
            "gate": stack_lin(f"{L}.mlp.gate_proj", False),
            "up": stack_lin(f"{L}.mlp.up_proj", False),
            "down": stack_lin(f"{L}.mlp.down_proj", False),
        },
        "final_ln": {"scale": g("model.norm.weight")},
    }
    if not tied:
        params["lm_head"] = {"kernel": linear_kernel(g("lm_head.weight"))}
    return params


def dit_params_from_torch(sd: Mapping[str, np.ndarray], num_layers: int,
                          prefix: str = "diffusion_head_a.") -> dict:
    """Map reference ModulatedAttentionBlock stack weights
    (show-o2/models/modules.py) onto showo_tpu.show_o2.dit pytrees.

    Expects names ``{prefix}{i}.self_attn.q_proj.weight`` etc.
    """

    def g(name):
        return np.asarray(sd[f"{prefix}{name}"])

    def stack_lin(fmt, bias=False):
        out = {"kernel": np.stack([linear_kernel(g(fmt.format(i=i) + ".weight"))
                                   for i in range(num_layers)])}
        if bias:
            out["bias"] = np.stack([g(fmt.format(i=i) + ".bias")
                                    for i in range(num_layers)])
        return out

    def stack_scale(fmt):
        return {"scale": np.stack([g(fmt.format(i=i) + ".weight")
                                   for i in range(num_layers)])}

    return {
        "layers": {
            "input_ln": stack_scale("{i}.input_layernorm"),
            "post_ln": stack_scale("{i}.post_attention_layernorm"),
            "q": stack_lin("{i}.self_attn.q_proj"),
            "k": stack_lin("{i}.self_attn.k_proj"),
            "v": stack_lin("{i}.self_attn.v_proj"),
            "o": stack_lin("{i}.self_attn.o_proj"),
            "q_norm": stack_scale("{i}.self_attn.q_norm"),
            "k_norm": stack_scale("{i}.self_attn.k_norm"),
            "gate": stack_lin("{i}.mlp.gate_proj"),
            "up": stack_lin("{i}.mlp.up_proj"),
            "down": stack_lin("{i}.mlp.down_proj"),
            "adaln": stack_lin("{i}.adaLN_modulation.1", bias=True),
        },
    }


def final_layer_params_from_torch(sd: Mapping[str, np.ndarray],
                                  prefix: str = "diffusion_head_b.") -> dict:
    def g(name):
        return np.asarray(sd[f"{prefix}{name}"])

    return {
        "norm": {"scale": g("norm_final.weight")},
        "linear": {"kernel": linear_kernel(g("linear.weight")),
                   "bias": g("linear.bias")},
        "adaln": {"kernel": linear_kernel(g("adaLN_modulation.1.weight")),
                  "bias": g("adaLN_modulation.1.bias")},
    }


def time_embed_params_from_torch(sd: Mapping[str, np.ndarray],
                                 prefix: str = "time_embed.") -> dict:
    def g(name):
        return np.asarray(sd[f"{prefix}{name}"])

    return {
        "fc1": {"kernel": linear_kernel(g("mlp.0.weight")), "bias": g("mlp.0.bias")},
        "fc2": {"kernel": linear_kernel(g("mlp.2.weight")), "bias": g("mlp.2.bias")},
    }


def siglip_params_from_torch(sd: Mapping[str, np.ndarray], num_layers: int,
                             prefix: str = "",
                             pos_embed: np.ndarray | None = None) -> dict:
    """Map an HF/vendored SiglipEncoder state_dict (``layers.{i}.*``) onto
    showo_tpu.show_o2.siglip pytrees."""

    def g(name):
        return np.asarray(sd[f"{prefix}{name}"])

    def stack_lin(fmt):
        return {
            "kernel": np.stack([linear_kernel(g(fmt.format(i=i) + ".weight"))
                                for i in range(num_layers)]),
            "bias": np.stack([g(fmt.format(i=i) + ".bias")
                              for i in range(num_layers)]),
        }

    def stack_norm(fmt):
        return {
            "scale": np.stack([g(fmt.format(i=i) + ".weight")
                               for i in range(num_layers)]),
            "bias": np.stack([g(fmt.format(i=i) + ".bias")
                              for i in range(num_layers)]),
        }

    L = "layers.{i}"
    params = {
        "layers": {
            "ln1": stack_norm(f"{L}.layer_norm1"),
            "ln2": stack_norm(f"{L}.layer_norm2"),
            "q": stack_lin(f"{L}.self_attn.q_proj"),
            "k": stack_lin(f"{L}.self_attn.k_proj"),
            "v": stack_lin(f"{L}.self_attn.v_proj"),
            "out": stack_lin(f"{L}.self_attn.out_proj"),
            "fc1": stack_lin(f"{L}.mlp.fc1"),
            "fc2": stack_lin(f"{L}.mlp.fc2"),
        },
    }
    if pos_embed is not None:
        params["pos_embed"] = pos_embed
    return params


def wan_vae_params_from_torch(sd: Mapping[str, np.ndarray], cfg=None) -> dict:
    """Map the Wan2.1 VAE state_dict (show-o2/models/wan21_vae.py /
    Wan2.1_VAE.pth layout) onto showo_tpu.show_o2.wan_vae pytrees."""
    from showo_tpu.show_o2.wan_vae import (
        WanVAEConfig, decoder_structure, encoder_structure)

    cfg = cfg or WanVAEConfig()

    def c3(name):
        return {"kernel": conv3d_kernel(np.asarray(sd[f"{name}.weight"])),
                "bias": np.asarray(sd[f"{name}.bias"])}

    def c2(name):
        return {"kernel": conv2d_kernel(np.asarray(sd[f"{name}.weight"])),
                "bias": np.asarray(sd[f"{name}.bias"])}

    def gamma(name):
        return {"gamma": np.asarray(sd[f"{name}.gamma"]).reshape(-1)}

    def res(prefix):
        p = {
            "norm1": gamma(f"{prefix}.residual.0"),
            "conv1": c3(f"{prefix}.residual.2"),
            "norm2": gamma(f"{prefix}.residual.3"),
            "conv2": c3(f"{prefix}.residual.6"),
        }
        if f"{prefix}.shortcut.weight" in sd:
            p["shortcut"] = c3(f"{prefix}.shortcut")
        return p

    def attn(prefix):
        return {"norm": gamma(f"{prefix}.norm"),
                "to_qkv": c2(f"{prefix}.to_qkv"),
                "proj": c2(f"{prefix}.proj")}

    def stack(side: str, plan, seq_name: str):
        out = {"conv1": c3(f"{side}.conv1")}
        for idx, (kind, meta) in enumerate(plan):
            pref = f"{side}.{seq_name}.{idx}"
            if kind == "res":
                out[f"b{idx}"] = res(pref)
            elif kind in ("downsample2d", "upsample2d"):
                out[f"b{idx}"] = {"conv": c2(f"{pref}.resample.1")}
            else:
                out[f"b{idx}"] = {"conv": c2(f"{pref}.resample.1"),
                                  "time": c3(f"{pref}.time_conv")}
        out["mid_res1"] = res(f"{side}.middle.0")
        out["mid_attn"] = attn(f"{side}.middle.1")
        out["mid_res2"] = res(f"{side}.middle.2")
        out["head_norm"] = gamma(f"{side}.head.0")
        out["head_conv"] = c3(f"{side}.head.2")
        return out

    return {
        "encoder": stack("encoder", encoder_structure(cfg), "downsamples"),
        "conv1": c3("conv1"),
        "conv2": c3("conv2"),
        "decoder": stack("decoder", decoder_structure(cfg), "upsamples"),
    }


def clip_vit_params_from_torch(sd: Mapping[str, np.ndarray],
                               num_layers: int,
                               prefix: str = "vision_model.") -> dict:
    """Map an HF CLIPVisionModel state_dict onto
    showo_tpu.models.clip_vit pytrees."""

    def g(name):
        return np.asarray(sd[f"{prefix}{name}"])

    def stack_lin(fmt):
        return {
            "kernel": np.stack([linear_kernel(g(fmt.format(i=i) + ".weight"))
                                for i in range(num_layers)]),
            "bias": np.stack([g(fmt.format(i=i) + ".bias")
                              for i in range(num_layers)]),
        }

    def stack_norm(fmt):
        return {
            "scale": np.stack([g(fmt.format(i=i) + ".weight")
                               for i in range(num_layers)]),
            "bias": np.stack([g(fmt.format(i=i) + ".bias")
                              for i in range(num_layers)]),
        }

    L = "encoder.layers.{i}"
    return {
        "patch_embed": {"kernel": conv2d_kernel(
            g("embeddings.patch_embedding.weight"))},
        "class_embed": g("embeddings.class_embedding"),
        "pos_embed": g("embeddings.position_embedding.weight"),
        "pre_ln": {"scale": g("pre_layrnorm.weight"),
                   "bias": g("pre_layrnorm.bias")},
        "layers": {
            "ln1": stack_norm(f"{L}.layer_norm1"),
            "ln2": stack_norm(f"{L}.layer_norm2"),
            "q": stack_lin(f"{L}.self_attn.q_proj"),
            "k": stack_lin(f"{L}.self_attn.k_proj"),
            "v": stack_lin(f"{L}.self_attn.v_proj"),
            "out": stack_lin(f"{L}.self_attn.out_proj"),
            "fc1": stack_lin(f"{L}.mlp.fc1"),
            "fc2": stack_lin(f"{L}.mlp.fc2"),
        },
    }


def showo2_params_from_torch(sd: Mapping[str, np.ndarray],
                             num_llm_layers: int = 28,
                             num_siglip_layers: int = 26,
                             num_dit_layers: int = 10,
                             tied: bool = True,
                             has_diff_proj: bool = True) -> dict:
    """Map a full reference Showo2Qwen2_5 state_dict
    (show-o2/models/modeling_showo2_qwen2_5.py) onto
    showo_tpu.show_o2.showo2 pytrees."""

    def g(name):
        return np.asarray(sd[name])

    def lin(name):
        return {"kernel": linear_kernel(g(f"{name}.weight")),
                "bias": g(f"{name}.bias")}

    params = {
        "showo": qwen2_params_from_torch(sd, num_llm_layers, "showo.", tied),
        "image_embedder_und": {
            "kernel": conv2d_kernel(g("image_embedder_und.proj.weight")),
            "bias": g("image_embedder_und.proj.bias")},
        "image_embedder_gen": {
            "kernel": conv2d_kernel(g("image_embedder_gen.proj.weight")),
            "bias": g("image_embedder_gen.proj.bias")},
        "und_trans": siglip_params_from_torch(
            sd, num_siglip_layers, "und_trans.",
            pos_embed=g("position_embedding.weight")),
        "fusion_proj": {
            "norm": {"scale": g("fusion_proj.0.weight")},
            "fc1": lin("fusion_proj.1"),
            "fc2": lin("fusion_proj.3"),
        },
        "time_embed": time_embed_params_from_torch(sd, "time_embed."),
        "diffusion_head_a": dit_params_from_torch(sd, num_dit_layers,
                                                  "diffusion_head_a."),
        "diffusion_head_b": final_layer_params_from_torch(
            sd, "diffusion_head_b."),
    }
    if has_diff_proj and "diff_proj.0.weight" in sd:
        params["diff_proj"] = {"fc1": lin("diff_proj.0"),
                               "fc2": lin("diff_proj.2")}
        params["time_embed_proj"] = lin("time_embed_proj")
    return params


def _resblock_into(tree: dict, flax_name: str, sd: Mapping, torch_name: str,
                   has_shortcut: bool) -> None:
    sub: dict = {}
    _norm_into(sub, "norm1", sd, f"{torch_name}.norm1")
    _conv_into(sub, "conv1", sd, f"{torch_name}.conv1")
    _norm_into(sub, "norm2", sd, f"{torch_name}.norm2")
    _conv_into(sub, "conv2", sd, f"{torch_name}.conv2")
    if has_shortcut or f"{torch_name}.nin_shortcut.weight" in sd:
        _conv_into(sub, "nin_shortcut", sd, f"{torch_name}.nin_shortcut")
    tree[flax_name] = sub


def _attn_into(tree: dict, flax_name: str, sd: Mapping, torch_name: str) -> None:
    sub: dict = {}
    _norm_into(sub, "norm", sd, f"{torch_name}.norm")
    for p in ("q", "k", "v", "proj_out"):
        _conv_into(sub, p, sd, f"{torch_name}.{p}")
    tree[flax_name] = sub


# ---------------------------------------------------------------------------
# Full-size value-map fingerprinting (import-wiring regression gate)
# ---------------------------------------------------------------------------

def value_map_fingerprint(import_fn: Callable[[Mapping], dict],
                          manifest: Mapping[str, tuple]) -> Dict[str, Dict[str, int]]:
    """Run ``import_fn`` on a synthetic state dict where every tensor is
    filled with its key's 1-based ordinal (sorted key order), then record,
    per imported leaf, the multiset {source ordinal -> element count}.

    This fingerprints the full key->leaf VALUE WIRING at real checkpoint
    scale: a swapped same-shape source (q/k mixed up), a wrong slice
    boundary in a fused-qkv split, or a dropped/duplicated row changes
    the counts.  Ordinals stay exact in float16 (<= 2048), and broadcast
    views keep the synthetic dict itself memory-free.  Complements the
    tiny-dim golden tests (which verify numerics through the real torch
    reference) and the shape manifests (tests/test_import_manifests.py).
    """
    import jax

    keys = sorted(manifest)
    assert len(keys) < 2040, "ordinals must stay exact in float16"
    sd = {k: np.broadcast_to(np.float16(i + 1), tuple(manifest[k]))
          for i, k in enumerate(keys)}
    params = import_fn(sd)
    out: Dict[str, Dict[str, int]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        flat = np.asarray(leaf).ravel().astype(np.int32)
        counts = np.bincount(flat, minlength=len(keys) + 1)
        nz = np.nonzero(counts)[0]
        out[name] = {str(int(i)): int(counts[i]) for i in nz}
    return out

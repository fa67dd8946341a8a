"""Dump the state-dict KEY->SHAPE manifests of every released reference
checkpoint by instantiating the reference model code at full size on
torch's meta device (no weights, no memory).

The released checkpoints are state_dicts of these exact module trees:
  * showlab/show-o, show-o-512x512          -> Showo(phi-1.5, vocab 58498)
    (models/modeling_showo.py:23-54; phi fork models/phi.py:1084-1096)
  * showlab/show-o-w-clip-vit[-512x512]     -> + mm_projector (1024->2048->2048)
  * showlab/magvitv2                        -> MAGVITv2 (modeling_magvitv2.py:402)
  * Wan2.1_VAE.pth                          -> WanVAE_ (wan21_vae.py:597-608 cfg)
  * showlab/show-o2-1.5B / 7B               -> Showo2Qwen2_5
    (modeling_showo2_qwen2_5.py:34-108)

    python tools/make_key_manifests.py
"""

import importlib.machinery as _mach
import importlib.util
import json
import os
import sys
import types

import torch
import torch.nn as _nn

# mean-resizing computes an embedding covariance, which cannot run on the
# meta device; the key/shape manifest is identical either way
from transformers.modeling_utils import PreTrainedModel as _PTM

_orig_resize = _PTM.resize_token_embeddings
_PTM.resize_token_embeddings = (
    lambda self, n, pad_to_multiple_of=None, mean_resizing=True:
    _orig_resize(self, n, pad_to_multiple_of, mean_resizing=False))

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "manifests")


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = _mach.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


# timm stub (only to_2tuple is used by the reference modules)
timm = _stub("timm")
tl = _stub("timm.layers")
th = _stub("timm.layers.helpers",
           to_2tuple=lambda x: x if isinstance(x, tuple) else (x, x))
timm.layers = tl
tl.helpers = th


class _ModelMixin(_nn.Module):
    def register_to_config(self, **kw):
        pass


def _register_to_config(fn):
    import functools
    import inspect

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        ba = inspect.signature(fn).bind(self, *args, **kwargs)
        ba.apply_defaults()
        cfgd = {k: v for k, v in ba.arguments.items()
                if k not in ("self", "kwargs")}
        cfgd.update(ba.arguments.get("kwargs", {}))
        object.__setattr__(self, "config", types.SimpleNamespace(**cfgd))
        for k, v in cfgd.items():
            object.__setattr__(self, k, v)
        return fn(self, *args, **kwargs)

    return wrapper


def _pkg(name, path):
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    sys.modules[name] = pkg
    mu = _stub(f"{name}.modeling_utils", ModelMixin=_ModelMixin,
               ConfigMixin=object, register_to_config=_register_to_config)
    setattr(pkg, "modeling_utils", mu)
    return pkg


def _load(pkg, name, path):
    spec = importlib.util.spec_from_file_location(
        f"{pkg}.{name}", f"{path}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{pkg}.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def _manifest(module: _nn.Module) -> dict:
    return {k: list(v.shape) for k, v in module.state_dict().items()}


def _write(name, man):
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, f"{name}.json"), "w") as f:
        json.dump(man, f, indent=0, sort_keys=True)
    print(f"{name}: {len(man)} keys")


def showo_v1():
    """showlab/show-o: Showo wraps PhiForCausalLM resized to 58498
    (modeling_showo.py:40-46); phi-1.5 dims from microsoft/phi-1_5."""
    from transformers.models.phi.configuration_phi import PhiConfig

    ref_phi = _load("refphi", "phi", "/root/reference/models")
    cfg = PhiConfig(
        vocab_size=51200, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=24, num_attention_heads=32,
        partial_rotary_factor=0.5, hidden_act="gelu_new",
        max_position_embeddings=2048, layer_norm_eps=1e-5)
    with torch.device("meta"):
        llm = ref_phi.PhiForCausalLM(cfg)
        llm.resize_token_embeddings(58498)
    man = {f"showo.{k}": list(v.shape) for k, v in llm.state_dict().items()}
    _write("showo_v1", man)
    # w_clip_vit variant adds the mm_projector (modeling_showo.py:49-54)
    man_clip = dict(man)
    man_clip.update({
        "mm_projector.0.weight": [2048, 1024], "mm_projector.0.bias": [2048],
        "mm_projector.2.weight": [2048, 2048], "mm_projector.2.bias": [2048],
    })
    _write("showo_v1_clip", man_clip)


def magvitv2():
    _pkg("refv1models", "/root/reference/models")
    import typing

    # misc.py re-exports typing/jaxtyping names used by magvitv2 (List etc.)
    _stub("refv1models.misc", **{n: getattr(typing, n) for n in
          ("List", "Optional", "Tuple", "Union", "Dict", "Any", "Callable")})
    _load("refv1models", "common_modules", "/root/reference/models")
    mag = _load("refv1models", "modeling_magvitv2", "/root/reference/models")
    with torch.device("meta"):
        m = mag.MAGVITv2()
    _write("magvitv2", _manifest(m))


def wan_vae():
    pkg = types.ModuleType("refwan")
    sys.modules["refwan"] = pkg
    wv = _load("refwan", "wan21_vae", "/root/reference/show-o2/models")
    with torch.device("meta"):
        m = wv.WanVAE_(dim=96, z_dim=16, dim_mult=[1, 2, 4, 4],
                       num_res_blocks=2, attn_scales=[],
                       temperal_downsample=[False, True, True], dropout=0.0)
    _write("wan21_vae", _manifest(m))


def showo2(size: str):
    """showlab/show-o2-{1.5B,7B}: Qwen2.5 backbone + dual-path embedders +
    SigLIP-so400m semantic layers + fusion_proj + DiT head."""
    import transformers
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config
    from transformers.models.siglip.configuration_siglip import (
        SiglipConfig,
        SiglipTextConfig,
        SiglipVisionConfig,
    )

    _pkg("ref2models", "/root/reference/show-o2/models")
    ref_modules = _load("ref2models", "modules",
                        "/root/reference/show-o2/models")
    ref_siglip = _load("ref2models", "modeling_siglip",
                       "/root/reference/show-o2/models")
    _load("ref2models", "misc", "/root/reference/show-o2/models")
    _load("ref2models", "qwen2", "/root/reference/show-o2/models")
    ref_showo2 = _load("ref2models", "modeling_showo2_qwen2_5",
                       "/root/reference/show-o2/models")

    if size == "1.5b":
        qwen = Qwen2Config(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12,
            num_key_value_heads=2, head_dim=128, rope_theta=1e6,
            rms_norm_eps=1e-6, tie_word_embeddings=True, use_cache=False)
        hidden = 1536
    else:
        qwen = Qwen2Config(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28,
            num_key_value_heads=4, head_dim=128, rope_theta=1e6,
            rms_norm_eps=1e-6, tie_word_embeddings=False, use_cache=False)
        hidden = 3584
    qwen._attn_implementation = "eager"

    # google/siglip-so400m-patch14-384 vision dims
    sig_vis = SiglipVisionConfig(
        hidden_size=1152, intermediate_size=4304, num_hidden_layers=27,
        num_attention_heads=16, image_size=384, patch_size=14,
        hidden_act="gelu_pytorch_tanh")
    sig_cfg = SiglipConfig(
        text_config=SiglipTextConfig().to_dict(),
        vision_config=sig_vis.to_dict())

    transformers.AutoConfig.from_pretrained = classmethod(
        lambda cls, *a, **k: qwen)
    with torch.device("meta"):
        sig = ref_siglip.SiglipModel(sig_cfg)
    ref_siglip.SiglipModel.from_pretrained = classmethod(
        lambda cls, *a, **k: sig)
    ref_showo2.SiglipModel = ref_siglip.SiglipModel

    # reset_parameters uses nn.init on meta tensors; make them no-ops
    ref_showo2.Showo2Qwen2_5.reset_parameters = lambda self: None
    with torch.device("meta"):
        model = ref_showo2.Showo2Qwen2_5(
            llm_vocab_size=151940,  # 151936 + [PAD] <image> vid_start/end
            llm_model_path="unused", load_from_showo=True,
            image_latent_dim=16, image_latent_height=27,
            image_latent_width=27, patch_size=2, hidden_size=hidden,
            clip_latent_dim=1152, num_diffusion_layers=10,
            add_time_embeds=True)
    _write(f"showo2_{size}", _manifest(model))


if __name__ == "__main__":
    showo_v1()
    magvitv2()
    wan_vae()
    showo2("1.5b")
    showo2("7b")

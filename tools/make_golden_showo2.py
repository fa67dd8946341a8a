"""Golden full-model Showo2 fixtures from the reference
(show-o2/models/modeling_showo2_qwen2_5.py) at tiny dimensions.

Patches: AutoConfig -> tiny Qwen2Config, SiglipModel.from_pretrained ->
locally-constructed tiny SiglipModel, DiffusionHeadConfig -> tiny dims.

    python tools/make_golden_showo2.py
"""

import importlib.util
import sys
import types
import typing as _typing

import numpy as np
import torch
import torch.nn as _nn

import importlib.machinery as _mach


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = _mach.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


# timm stub
timm = _stub("timm")
tl = _stub("timm.layers")
th = _stub("timm.layers.helpers", to_2tuple=lambda x: x if isinstance(x, tuple) else (x, x))
timm.layers = tl
tl.helpers = th

# package scaffolding for show-o2/models
pkg = types.ModuleType("ref2models")
pkg.__path__ = ["/root/reference/show-o2/models"]
sys.modules["ref2models"] = pkg

mu = types.ModuleType("ref2models.modeling_utils")


class _ModelMixin(_nn.Module):
    def register_to_config(self, **kw):
        self._cfg.update(kw)
        self.config = types.SimpleNamespace(**self._cfg)


class _ConfigMixin:
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
        object.__setattr__(self, "_cfg", dict(cfgd))
        object.__setattr__(self, "config", types.SimpleNamespace(**cfgd))
        for k, v in cfgd.items():
            object.__setattr__(self, k, v)
        return fn(self, *args, **kwargs)

    return wrapper


mu.ModelMixin = _ModelMixin
mu.ConfigMixin = _ConfigMixin
mu.register_to_config = _register_to_config
sys.modules["ref2models.modeling_utils"] = mu


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"ref2models.{name}", f"/root/reference/show-o2/models/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"ref2models.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


ref_modules = _load("modules")
ref_siglip = _load("modeling_siglip")
_load("misc")
_load("qwen2")
ref_showo2 = _load("modeling_showo2_qwen2_5")

from transformers.models.qwen2.configuration_qwen2 import Qwen2Config  # noqa: E402
from transformers.models.siglip.configuration_siglip import (  # noqa: E402
    SiglipConfig, SiglipTextConfig, SiglipVisionConfig)
import transformers  # noqa: E402

# --- tiny configs
QWEN_TINY = Qwen2Config(
    vocab_size=200, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, rope_theta=1e6, rms_norm_eps=1e-6,
    tie_word_embeddings=True, use_cache=False)
QWEN_TINY._attn_implementation = "eager"

SIGLIP_VISION_TINY = SiglipVisionConfig(
    hidden_size=48, intermediate_size=96, num_hidden_layers=3,
    num_attention_heads=4, image_size=32, patch_size=8,
    hidden_act="gelu_pytorch_tanh")
SIGLIP_TINY = SiglipConfig(
    text_config=SiglipTextConfig(hidden_size=48, intermediate_size=96,
                                 num_hidden_layers=2,
                                 num_attention_heads=4).to_dict(),
    vision_config=SIGLIP_VISION_TINY.to_dict())


class TinyDHC(ref_modules.DiffusionHeadConfig):
    def __init__(self):
        super().__init__(hidden_size=96, head_dim=24, intermediate_size=192)
        self.num_attention_heads = 4
        self.num_key_value_heads = 2


def main() -> None:
    torch.manual_seed(0)
    transformers.AutoConfig.from_pretrained = classmethod(
        lambda cls, *a, **k: QWEN_TINY)
    sig_tiny = ref_siglip.SiglipModel(SIGLIP_TINY)
    ref_siglip.SiglipModel.from_pretrained = classmethod(
        lambda cls, *a, **k: sig_tiny)
    ref_showo2.SiglipModel = ref_siglip.SiglipModel
    ref_showo2.DiffusionHeadConfig = TinyDHC

    model = ref_showo2.Showo2Qwen2_5(
        llm_vocab_size=200,
        llm_model_path="unused",
        load_from_showo=True,
        image_latent_dim=8,
        image_latent_height=8,
        image_latent_width=8,
        patch_size=2,
        hidden_size=64,
        clip_latent_dim=48,
        num_diffusion_layers=2,
        add_time_embeds=True,
    ).eval()

    gen = torch.Generator().manual_seed(41)
    sd = {}
    for name, p in model.named_parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.04)
        sd[name] = p.detach().numpy().copy()

    B, L, M = 2, 32, 1
    N_IMG = 17  # 16 patches + time token
    text = torch.randint(2, 190, (B, L), generator=gen)
    mp = torch.tensor([[[4, N_IMG]], [[6, N_IMG]]])
    latents = torch.randn(B, 8, 8, 8, generator=gen)
    t = torch.rand(B, generator=gen)
    labels = torch.where(text > 100, text, torch.tensor(-100))
    img_mask = torch.zeros(B, L, dtype=torch.long)
    img_mask[0, 4:4 + N_IMG] = 1
    img_mask[1, 6:6 + N_IMG] = 1
    ut = torch.randn(B, 8, 8, 8, generator=gen)

    causal = torch.tril(torch.ones(L, L, dtype=torch.bool))
    mb = causal[None, None].expand(B, 1, L, L).clone()
    for b in range(B):
        off, ln = mp[b, 0]
        mb[b, :, off:off + ln, off:off + ln] = True
    bias = torch.where(mb, 0.0, torch.finfo(torch.float32).min)

    with torch.no_grad():
        logits, loss_ntp, loss_flow = model(
            text_tokens=text, image_latents=latents, t=t,
            attention_mask=bias, text_labels=labels, image_labels=ut,
            image_masks=img_mask.clone(), modality_positions=mp,
            max_seq_len=L, device="cpu")
        v = model.t2i_generate(image_latents=latents, t=t.clone(),
                               text_tokens=text, attention_mask=bias,
                               modality_positions=mp, max_seq_len=L,
                               guidance_scale=0.0)

    store = {
        "text": text.numpy(), "mp": mp.numpy(), "latents": latents.numpy(),
        "t": t.numpy(), "labels": labels.numpy(),
        "img_mask": img_mask.numpy(), "ut": ut.numpy(),
        "mask_bool": mb.numpy(),
        "logits": logits.numpy(), "loss_ntp": loss_ntp.numpy(),
        "loss_flow": loss_flow.numpy(), "v": v.numpy(),
    }
    store.update({f"w::{k}": v2 for k, v2 in sd.items()})
    np.savez_compressed("tests/golden/showo2_full.npz", **store)
    print("wrote tests/golden/showo2_full.npz; loss_ntp",
          float(loss_ntp), "loss_flow", float(loss_flow), "v", v.shape)


if __name__ == "__main__":
    main()

"""Golden MaskGIT fixtures: run the reference t2i_generate with injected
gumbel noise (RNG-bridging harness) so the jax loop can be compared
token-for-token.

torch.multinomial and sampling.gumbel_noise are monkeypatched to consume
pre-drawn noise queues; the same arrays are stored in the fixture and fed
to maskgit_generate(injected_noise=...).

    python tools/make_golden_maskgit.py
"""

import importlib.util
import sys
import types
import typing as _typing

import numpy as np
import torch
import torch.nn as _nn

# --- stub package scaffolding (same pattern as make_golden_magvit.py)
pkg = types.ModuleType("refmodels")
pkg.__path__ = ["/root/reference/models"]
sys.modules["refmodels"] = pkg

mu = types.ModuleType("refmodels.modeling_utils")


class _ModelMixin(_nn.Module):
    def register_to_config(self, **kw):
        for k, v in kw.items():
            self._cfg[k] = v
        self._sync()

    def _sync(self):
        self.config = types.SimpleNamespace(**self._cfg)


class _ConfigMixin:
    pass


def _register_to_config(fn):
    import functools
    import inspect

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(fn)
        ba = sig.bind(self, *args, **kwargs)
        ba.apply_defaults()
        cfgd = {k: v for k, v in ba.arguments.items() if k not in ("self", "kwargs")}
        object.__setattr__(self, "_cfg", dict(cfgd))
        for k, v in cfgd.items():
            object.__setattr__(self, k, v)
        _ModelMixin._sync(self)
        return fn(self, *args, **kwargs)

    return wrapper


mu.ModelMixin = _ModelMixin
mu.ConfigMixin = _ConfigMixin
mu.register_to_config = _register_to_config
sys.modules["refmodels.modeling_utils"] = mu

misc = types.ModuleType("refmodels.misc")
for _n in ("List", "Tuple", "Optional", "Dict", "Any", "Union", "Callable"):
    setattr(misc, _n, getattr(_typing, _n))
sys.modules["refmodels.misc"] = misc


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"refmodels.{name}", f"/root/reference/models/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refmodels.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


ref_sampling = _load("sampling")
_load("phi")
# patch AutoConfig lookup before loading modeling_showo
from transformers.models.phi.configuration_phi import PhiConfig  # noqa: E402
import transformers  # noqa: E402

TINY = dict(
    vocab_size=120,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    partial_rotary_factor=0.5,
    hidden_act="gelu_new",
    max_position_embeddings=128,
)

_tiny_cfg = PhiConfig(**TINY)
_tiny_cfg._attn_implementation = "eager"
_orig_from_pretrained = transformers.AutoConfig.from_pretrained
transformers.AutoConfig.from_pretrained = classmethod(lambda cls, *a, **k: _tiny_cfg)

ref_showo_mod = _load("modeling_showo")
# keep the patch active: Showo ctor calls AutoConfig.from_pretrained at runtime

LLM_VOCAB = 100
NUM_SPECIAL = 3
CODEBOOK = 16
NUM_VQ = 9
MAX_SEQ = 5  # text tokens incl. task token is MAX_SEQ+1
MASK_ID = 119
TIMESTEPS = 4
B = 2


def main() -> None:
    torch.manual_seed(0)
    model = ref_showo_mod.Showo(
        w_clip_vit=False,
        vocab_size=120,
        llm_vocab_size=LLM_VOCAB,
        llm_model_path="unused",
        codebook_size=CODEBOOK,
        num_vq_tokens=NUM_VQ,
        load_from_showo=True,
    ).eval()

    gen = torch.Generator().manual_seed(11)
    sd = {}
    for name, p in model.named_parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        sd[name] = p.detach().numpy().copy()

    # --- build t2i_gen-style sequences: [text MAX_SEQ+1][soi][mask x NUM_VQ][eoi]
    SOI, EOI = 101, 102
    text = torch.randint(2, LLM_VOCAB, (B, MAX_SEQ + 1), generator=gen)
    uncond_text = torch.randint(2, LLM_VOCAB, (B, MAX_SEQ + 1), generator=gen)
    img = torch.full((B, NUM_VQ), MASK_ID)

    def assemble(prefix):
        return torch.cat(
            [prefix, torch.full((B, 1), SOI), img, torch.full((B, 1), EOI)], dim=1
        )

    input_ids = assemble(text)
    uncond_ids = assemble(uncond_text)
    L = input_ids.shape[1]

    # dense bidirectional-within-image omni mask for [cond; uncond]
    sys.path.insert(0, "/root/reference")
    from training.prompting_utils import create_attention_mask_predict_next

    full = torch.cat([input_ids, uncond_ids], dim=0)
    bias = create_attention_mask_predict_next(
        full, pad_id=99, soi_id=SOI, eoi_id=EOI, rm_pad_in_image=True,
        return_inverse_mask=True,
    )  # int64 additive; convert to float
    bias_f = torch.where(bias < 0, torch.tensor(torch.finfo(torch.float32).min),
                         torch.tensor(0.0))

    # --- noise queues
    g = torch.Generator().manual_seed(42)

    def gumbel(*shape):
        u = torch.rand(*shape, generator=g).clamp(1e-6, 1 - 1e-6)
        return -torch.log(-torch.log(u))

    g_sample = gumbel(TIMESTEPS, B, NUM_VQ, CODEBOOK)
    g_conf = gumbel(TIMESTEPS, B, NUM_VQ)

    step_box = {"s": 0}
    orig_multinomial = torch.multinomial

    def fake_multinomial(probs, num, generator=None):
        t = step_box["s"]
        noisy = torch.log(probs.clamp_min(1e-20)) + g_sample[t].reshape(-1, CODEBOOK)
        return noisy.argmax(dim=-1, keepdim=True)

    def fake_gumbel_noise(t, generator=None):
        s = step_box["s"]
        step_box["s"] += 1
        return g_conf[s].to(t.dtype)

    torch.multinomial = fake_multinomial
    ref_sampling.gumbel_noise = fake_gumbel_noise

    ns = types.SimpleNamespace
    cfg = ns(
        model=ns(showo=ns(num_vq_tokens=NUM_VQ,
                          num_new_special_tokens=NUM_SPECIAL,
                          llm_vocab_size=LLM_VOCAB)),
        dataset=ns(preprocessing=ns(max_seq_length=MAX_SEQ)),
    )

    with torch.no_grad():
        tokens = model.t2i_generate(
            input_ids=input_ids.clone(),
            uncond_input_ids=uncond_ids.clone(),
            attention_mask=bias_f,
            temperature=1.1,
            timesteps=TIMESTEPS,
            guidance_scale=1.75,
            noise_schedule=ref_sampling.cosine_schedule,
            config=cfg,
        )
    torch.multinomial = orig_multinomial

    store = {
        "input_ids": input_ids.numpy(),
        "uncond_ids": uncond_ids.numpy(),
        "bias": bias_f.numpy(),
        "g_sample": g_sample.numpy(),
        "g_conf": g_conf.numpy(),
        "tokens": tokens.numpy(),
    }
    store.update({f"w::{k}": v for k, v in sd.items()})

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/maskgit_tiny.npz", **store)
    print("wrote tests/golden/maskgit_tiny.npz; tokens:\n", tokens.numpy())


if __name__ == "__main__":
    main()

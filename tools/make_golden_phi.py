"""Generate golden Phi-transformer fixtures from the reference fork.

Builds a tiny torch PhiForCausalLM (reference models/phi.py, eager
attention) with seeded random weights, runs it with an omni 4D mask, and
dumps weights + logits to tests/golden/phi_tiny.npz.

    python tools/make_golden_phi.py
"""

import importlib.util
import sys
import types

import numpy as np
import torch

# Load reference phi.py standalone (it only needs transformers internals).
spec = importlib.util.spec_from_file_location("ref_phi", "/root/reference/models/phi.py")
ref_phi = importlib.util.module_from_spec(spec)
sys.modules["ref_phi"] = ref_phi
spec.loader.exec_module(ref_phi)

from transformers.models.phi.configuration_phi import PhiConfig  # noqa: E402

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


def main() -> None:
    torch.manual_seed(0)
    cfg = PhiConfig(**TINY)
    cfg._attn_implementation = "eager"
    model = ref_phi.PhiForCausalLM(cfg).eval()  # forces qk_layernorm=True

    gen = torch.Generator().manual_seed(7)
    sd = {}
    for name, p in model.named_parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        sd[name] = p.detach().numpy().copy()

    B, S = 2, 24
    ids = torch.randint(0, TINY["vocab_size"], (B, S), generator=gen)

    # an omni-style mask: causal with a bidirectional block in [10, 18)
    causal = torch.tril(torch.ones(S, S, dtype=torch.bool))
    block = torch.zeros(S, S, dtype=torch.bool)
    block[10:18, 10:18] = True
    mask_bool = (causal | block)[None, None].expand(B, 1, S, S)
    bias = torch.where(mask_bool, 0.0, torch.finfo(torch.float32).min)

    with torch.no_grad():
        out = model(input_ids=ids, attention_mask=bias)
    logits = out.logits.numpy()

    store = {"ids": ids.numpy(), "mask": mask_bool.numpy(), "logits": logits}
    store.update({f"w::showo.{k}": v for k, v in sd.items()})

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/phi_tiny.npz", **store)
    print("wrote tests/golden/phi_tiny.npz, logits", logits.shape)


if __name__ == "__main__":
    main()

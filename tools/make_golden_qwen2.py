"""Golden Qwen2 fixtures from the reference fork (show-o2/models/qwen2.py).

Tiny config, seeded weights, omni 4D mask -> logits + last hidden state.

    python tools/make_golden_qwen2.py
"""

import importlib.util
import sys

import numpy as np
import torch

spec = importlib.util.spec_from_file_location(
    "ref_qwen2", "/root/reference/show-o2/models/qwen2.py")
ref_qwen2 = importlib.util.module_from_spec(spec)
sys.modules["ref_qwen2"] = ref_qwen2
spec.loader.exec_module(ref_qwen2)

from transformers.models.qwen2.configuration_qwen2 import Qwen2Config  # noqa: E402

TINY = dict(
    vocab_size=160,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    rope_theta=1e6,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
    max_position_embeddings=512,
    use_cache=False,
)


def main() -> None:
    torch.manual_seed(0)
    cfg = Qwen2Config(**TINY)
    cfg._attn_implementation = "eager"
    model = ref_qwen2.Qwen2ForCausalLM(cfg).eval()

    gen = torch.Generator().manual_seed(13)
    sd = {}
    for name, p in model.named_parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        sd[name] = p.detach().numpy().copy()

    B, S = 2, 20
    ids = torch.randint(0, TINY["vocab_size"], (B, S), generator=gen)

    causal = torch.tril(torch.ones(S, S, dtype=torch.bool))
    block = torch.zeros(S, S, dtype=torch.bool)
    block[8:15, 8:15] = True
    mask_bool = (causal | block)[None, None].expand(B, 1, S, S)
    bias = torch.where(mask_bool, 0.0, torch.finfo(torch.float32).min)

    with torch.no_grad():
        out = model(input_ids=ids, attention_mask=bias,
                    output_hidden_states=True)

    store = {
        "ids": ids.numpy(),
        "mask": mask_bool.numpy(),
        "logits": out.logits.numpy(),
        "last_hidden": out.hidden_states[-1].numpy(),
    }
    store.update({f"w::{k}": v for k, v in sd.items()})

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/qwen2_tiny.npz", **store)
    print("wrote tests/golden/qwen2_tiny.npz", out.logits.shape)


if __name__ == "__main__":
    main()

"""Golden SigLIP-encoder fixtures from the reference vendored copy
(show-o2/models/modeling_siglip.py): tiny config, seeded weights.

    python tools/make_golden_siglip.py
"""

import importlib.util
import sys

import numpy as np
import torch

spec = importlib.util.spec_from_file_location(
    "ref_siglip", "/root/reference/show-o2/models/modeling_siglip.py")
ref_siglip = importlib.util.module_from_spec(spec)
sys.modules["ref_siglip"] = ref_siglip
spec.loader.exec_module(ref_siglip)

from transformers.models.siglip.configuration_siglip import SiglipVisionConfig  # noqa: E402

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    image_size=32,
    patch_size=16,
    hidden_act="gelu_pytorch_tanh",
)


def main() -> None:
    torch.manual_seed(0)
    cfg = SiglipVisionConfig(**TINY)
    cfg._attn_implementation = "eager"
    enc = ref_siglip.SiglipEncoder(cfg).eval()
    del enc.layers[-1]  # Show-o2 deletes the last layer

    gen = torch.Generator().manual_seed(23)
    sd = {}
    for name, p in enc.named_parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        sd[name] = p.detach().numpy().copy()

    x = torch.randn(2, 9, TINY["hidden_size"], generator=gen)
    with torch.no_grad():
        out = enc(inputs_embeds=x)["last_hidden_state"]

    store = {"x": x.numpy(), "out": out.numpy()}
    store.update({f"w::{k}": v for k, v in sd.items()})

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/siglip_tiny.npz", **store)
    print("wrote tests/golden/siglip_tiny.npz", out.shape)


if __name__ == "__main__":
    main()

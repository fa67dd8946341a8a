"""Golden CLIP-ViT fixtures from HF transformers (the reference wraps
transformers.CLIPVisionModel, models/clip_encoder.py:6-83).

    python tools/make_golden_clip.py
"""

import numpy as np
import torch
from transformers.models.clip.configuration_clip import CLIPVisionConfig
from transformers.models.clip.modeling_clip import CLIPVisionModel

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    image_size=32,
    patch_size=16,
    hidden_act="quick_gelu",
)


def main() -> None:
    torch.manual_seed(0)
    cfg = CLIPVisionConfig(**TINY)
    cfg._attn_implementation = "eager"
    model = CLIPVisionModel(cfg).eval()

    gen = torch.Generator().manual_seed(37)
    sd = {}
    for name, p in model.named_parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        sd[name] = p.detach().numpy().copy()

    x = torch.randn(2, 3, 32, 32, generator=gen)
    with torch.no_grad():
        out = model(x, output_hidden_states=True)
    # reference feature_select: hidden_states[-2][:, 1:]
    feats = out.hidden_states[-2][:, 1:]

    store = {"x": x.numpy(), "feats": feats.numpy()}
    store.update({f"w::{k}": v for k, v in sd.items()})

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/clip_tiny.npz", **store)
    print("wrote tests/golden/clip_tiny.npz", feats.shape)


if __name__ == "__main__":
    main()

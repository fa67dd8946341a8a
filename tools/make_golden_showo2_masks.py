"""Golden fixtures for the v2 omni mask and the modality scatter.

The mask comes from the reference ``omni_attn_mask_naive``
(show-o2/models/omni_attention.py).  The scatter fixture replays the
reference's per-sample loop semantics (modeling_showo2_qwen2_5.py:350-371)
on random embeddings.

    python tools/make_golden_showo2_masks.py
"""

import sys

import numpy as np
import torch

# load omni_attention.py directly, bypassing the package __init__ (which
# pulls heavyweight deps like timm)
import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "ref_omni", "/root/reference/show-o2/models/omni_attention.py")
ref_omni = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref_omni)
omni_attn_mask_naive = ref_omni.omni_attn_mask_naive

B, L, M, D, N = 2, 24, 2, 8, 5  # N tokens per image incl. time slot


def main() -> None:
    g = torch.Generator().manual_seed(0)
    modality_positions = torch.tensor([
        [[3, N], [12, N]],
        [[5, N], [0, 0]],   # second entry is (0,0) padding
    ])

    mask = omni_attn_mask_naive(B, L, modality_positions, "cpu", inverted=False)

    # scatter: reference loop from modeling_showo2_qwen2_5.py:350-371
    input_embeds = torch.randn(B, L, D, generator=g)
    image_embeds = torch.randn(B * M, N - 1, D, generator=g)
    time_embeds = torch.randn(B * M, D, generator=g)

    out = input_embeds.clone()
    for i, modality_batch in enumerate(modality_positions):
        for j, (offset, length) in enumerate(modality_batch):
            idx = i * M + j
            out[i, offset] = time_embeds[idx]
            out[i, offset + 1: offset + 1 + length - 1] = \
                image_embeds[idx, :max(length - 1, 0)]

    np.savez_compressed(
        "tests/golden/showo2_masks.npz",
        modality_positions=modality_positions.numpy(),
        mask=mask.numpy(),
        input_embeds=input_embeds.numpy(),
        image_embeds=image_embeds.numpy(),
        time_embeds=time_embeds.numpy(),
        scattered=out.numpy(),
    )
    print("wrote tests/golden/showo2_masks.npz; mask", mask.shape)


if __name__ == "__main__":
    main()

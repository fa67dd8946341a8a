"""Generate golden attention-mask fixtures from the reference implementation.

Run once in the build environment (requires /root/reference + torch CPU):

    python tools/make_golden_masks.py

Writes tests/golden/masks.npz.  Tests only depend on the npz, keeping the
repo standalone.
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from training.prompting_utils import (  # noqa: E402
    create_attention_mask_predict_next,
    create_attention_mask_for_mmu,
    create_attention_mask_for_mmu_vit,
    create_attention_mask_lvg,
    create_attention_mask_lvg_v2,
)

PAD, SOI, EOI, SOT, EOT = 58497 - 1, 50296, 50297, 50256, 50256
# use the actual Show-o ids: pad=50295? Use synthetic small ids instead for clarity.
PAD, SOI, EOI = 900, 901, 902
SOT, EOT = 903, 903  # sot == eot exercises the paired-marker branch in lvg_v2

rng = np.random.default_rng(0)


def t2i_row(L_text: int, n_img: int, n_pad: int) -> list:
    text = rng.integers(5, 800, size=L_text).tolist()
    img = rng.integers(5, 800, size=n_img).tolist()
    return [PAD] * n_pad + text + [SOI] + img + [EOI]


def main() -> None:
    out = {}

    # --- predict_next: batch of 3, varying pad counts (incl. zero)
    rows = [t2i_row(6 - p, 8, p) for p in (0, 2, 3)]
    seq = torch.tensor(rows, dtype=torch.int64)
    for rm in (False, True):
        m = create_attention_mask_predict_next(
            seq, pad_id=PAD, soi_id=SOI, eoi_id=EOI,
            rm_pad_in_image=rm, return_inverse_mask=False,
        )
        out[f"predict_next_rm{int(rm)}"] = m.numpy()
    out["predict_next_seq"] = seq.numpy()

    # --- mmu: [mmu][soi]img[eoi] text...
    rows = []
    for _ in range(2):
        img = rng.integers(5, 800, size=8).tolist()
        text = rng.integers(5, 800, size=6).tolist()
        rows.append([905, SOI] + img + [EOI] + text)
    seq_mmu = torch.tensor(rows, dtype=torch.int64)
    out["mmu_seq"] = seq_mmu.numpy()
    out["mmu"] = create_attention_mask_for_mmu(
        seq_mmu, eoi_id=EOI, return_inverse_mask=False
    ).numpy()

    # --- mmu_vit: embeddings input, shape-only
    emb = torch.zeros((2, 40, 4))
    out["mmu_vit"] = create_attention_mask_for_mmu_vit(
        emb, return_inverse_mask=False, system_prompt_len=3
    ).numpy()
    # num_patches=576 exceeds L=40 -> span [5, 40)

    # --- lvg: two images per row
    rows = []
    for n_pad in (0, 2):
        text = rng.integers(5, 800, size=4 - n_pad).tolist()
        img1 = rng.integers(5, 800, size=5).tolist()
        img2 = rng.integers(5, 800, size=5).tolist()
        rows.append([PAD] * n_pad + text + [SOI] + img1 + [EOI] + [SOI] + img2 + [EOI])
    seq_lvg = torch.tensor(rows, dtype=torch.int64)
    out["lvg_seq"] = seq_lvg.numpy()
    out["lvg"] = create_attention_mask_lvg(
        seq_lvg, pad_id=PAD, soi_id=SOI, eoi_id=EOI, return_inverse_mask=False
    ).numpy()

    # --- lvg_v2: text spans delimited by sot==eot markers
    rows = []
    for n_pad in (0, 1):
        t1 = rng.integers(5, 800, size=3 - n_pad).tolist()
        t2 = rng.integers(5, 800, size=3).tolist()
        img1 = rng.integers(5, 800, size=4).tolist()
        img2 = rng.integers(5, 800, size=4).tolist()
        rows.append(
            [PAD] * n_pad
            + [SOT] + t1 + [EOT] + [SOI] + img1 + [EOI]
            + [SOT] + t2 + [EOT] + [SOI] + img2 + [EOI]
        )
    seq_v2 = torch.tensor(rows, dtype=torch.int64)
    out["lvg_v2_seq"] = seq_v2.numpy()
    out["lvg_v2"] = create_attention_mask_lvg_v2(
        seq_v2, pad_id=PAD, soi_id=SOI, eoi_id=EOI, sot_id=SOT, eot_id=EOT,
        return_inverse_mask=False,
    ).numpy()

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/masks.npz", **out)
    print("wrote tests/golden/masks.npz:", {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()

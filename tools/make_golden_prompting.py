"""Golden UniversalPrompting fixtures from the reference implementation.

Runs training/prompting_utils.py UniversalPrompting with the shared fake
tokenizer (cond_dropout_prob=0 for determinism) over t2i / t2i_gen / lm /
mmu tasks and stores all outputs.

    python tools/make_golden_prompting.py
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo/tools")

from training.prompting_utils import UniversalPrompting  # noqa: E402
from fake_tokenizer import FakeTokenizer  # noqa: E402

TEXTS = ["a photo of a cat", "an oil painting of mountains at dusk", ""]
MAX_TEXT = 8  # max_seq_length analogue
N_IMG = 6


def main() -> None:
    tok = FakeTokenizer()
    uni = UniversalPrompting(tok, max_text_len=MAX_TEXT,
                             ignore_id=-100, cond_dropout_prob=0.0)

    rng = np.random.default_rng(3)
    image_ids = torch.tensor(rng.integers(2000, 2100, size=(3, N_IMG)))
    labels = torch.tensor(rng.integers(2000, 2100, size=(3, N_IMG)))

    out = {}
    ids, masks, labs = uni((TEXTS, image_ids, labels), "t2i")
    out.update(t2i_ids=ids.numpy(), t2i_masks=masks.numpy(), t2i_labels=labs.numpy())

    ids, masks = uni((TEXTS, image_ids), "t2i_gen")
    out.update(t2i_gen_ids=ids.numpy(), t2i_gen_masks=masks.numpy())

    ids, masks, labs = uni((TEXTS, 12), "lm")
    out.update(lm_ids=ids.numpy(), lm_masks=masks.numpy(), lm_labels=labs.numpy())

    ids, masks, labs = uni((image_ids, TEXTS), "mmu")
    out.update(mmu_ids=ids.numpy(), mmu_masks=masks.numpy(), mmu_labels=labs.numpy())

    ids, masks, labs = uni((TEXTS, image_ids, labels), "t2v")
    out.update(t2v_ids=ids.numpy(), t2v_masks=masks.numpy(),
               t2v_labels=labs.numpy())

    ids, masks = uni((TEXTS, image_ids), "t2v_gen")
    out.update(t2v_gen_ids=ids.numpy(), t2v_gen_masks=masks.numpy())

    ids, masks, labs = uni((TEXTS, image_ids, labels), "lvg")
    out.update(lvg_ids=ids.numpy(), lvg_masks=masks.numpy(),
               lvg_labels=labs.numpy())

    ids, masks = uni((TEXTS, image_ids), "lvg_gen")
    out.update(lvg_gen_ids=ids.numpy(), lvg_gen_masks=masks.numpy())

    out["image_ids"] = image_ids.numpy()
    out["labels"] = labels.numpy()

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/prompting.npz", **out)
    print("wrote tests/golden/prompting.npz",
          {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()

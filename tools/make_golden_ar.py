"""Golden AR-decode fixtures: reference mmu_generate with injected gumbel.

Reuses the maskgit tool's module scaffolding; patches torch.multinomial to
the argmax(logits+gumbel) trick so the jax KV-cache decode can be compared
token-for-token (the reference is cacheless — same math).

    python tools/make_golden_ar.py
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/repo/tools")
import make_golden_maskgit as H  # noqa: E402  (scaffolding + tiny model setup)

ref_showo_mod = H.ref_showo_mod

LLM_VOCAB, NUM_SPECIAL, CODEBOOK = H.LLM_VOCAB, H.NUM_SPECIAL, H.CODEBOOK
VOCAB = 120
MAX_NEW = 6
B = 1


def main() -> None:
    torch.manual_seed(0)
    # the reference decode loop squeezes the mask to 2D and relies on SDPA
    # broadcasting (modeling_showo.py:203-217), so use the sdpa attn impl
    H._tiny_cfg._attn_implementation = "sdpa"
    model = ref_showo_mod.Showo(
        w_clip_vit=False,
        vocab_size=VOCAB,
        llm_vocab_size=LLM_VOCAB,
        llm_model_path="unused",
        codebook_size=CODEBOOK,
        num_vq_tokens=9,
        load_from_showo=True,
    ).eval()

    gen = torch.Generator().manual_seed(21)
    sd = {}
    for name, p in model.named_parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        sd[name] = p.detach().numpy().copy()

    # mmu-style prompt: [mmu][soi]img x 9[eoi]text x 5
    SOI, EOI, MMU = 101, 102, 103
    img = torch.randint(104, 104 + CODEBOOK, (B, 9), generator=gen)
    text = torch.randint(2, LLM_VOCAB, (B, 5), generator=gen)
    prompt = torch.cat([torch.full((B, 1), MMU), torch.full((B, 1), SOI), img,
                        torch.full((B, 1), EOI), text], dim=1)

    sys.path.insert(0, "/root/reference")
    from training.prompting_utils import create_attention_mask_for_mmu

    bias = create_attention_mask_for_mmu(prompt, eoi_id=EOI,
                                         return_inverse_mask=True)
    bias_f = torch.where(bias < 0,
                         torch.tensor(torch.finfo(torch.float32).min),
                         torch.tensor(0.0))

    g = torch.Generator().manual_seed(5)
    u = torch.rand(MAX_NEW + 1, B, VOCAB, generator=g).clamp(1e-6, 1 - 1e-6)
    gumbel = -torch.log(-torch.log(u))

    step_box = {"s": 0}
    orig_multinomial = torch.multinomial

    def fake_multinomial(probs, num_samples=1, generator=None, **kw):
        s = step_box["s"]
        step_box["s"] += 1
        noisy = torch.log(probs.clamp_min(1e-20)) + gumbel[s]
        return noisy.argmax(dim=-1, keepdim=True)

    torch.multinomial = fake_multinomial
    with torch.no_grad():
        out = model.mmu_generate(idx=prompt.clone(),
                                 attention_mask=bias_f.clone(),
                                 max_new_tokens=MAX_NEW, temperature=0.9,
                                 top_k=12)
    torch.multinomial = orig_multinomial
    tokens = np.array([int(t) for t in out])

    store = {
        "prompt": prompt.numpy(),
        "bias": bias_f.numpy(),
        "gumbel": gumbel.numpy(),
        "tokens": tokens,
    }
    store.update({f"w::{k}": v for k, v in sd.items()})

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/ar_tiny.npz", **store)
    print("wrote tests/golden/ar_tiny.npz; tokens:", tokens)


if __name__ == "__main__":
    main()

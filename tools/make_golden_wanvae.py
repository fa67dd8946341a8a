"""Golden Wan2.1-VAE fixtures: tiny config, streaming reference encode/decode.

    python tools/make_golden_wanvae.py
"""

import importlib.util
import sys

import numpy as np
import torch

spec = importlib.util.spec_from_file_location(
    "ref_wan", "/root/reference/show-o2/models/wan21_vae.py")
ref_wan = importlib.util.module_from_spec(spec)
sys.modules["ref_wan"] = ref_wan
spec.loader.exec_module(ref_wan)

TINY = dict(
    dim=16,
    z_dim=4,
    dim_mult=[1, 2],
    num_res_blocks=1,
    attn_scales=[],
    temperal_downsample=[True],
    dropout=0.0,
)


def main() -> None:
    torch.manual_seed(0)
    model = ref_wan.WanVAE_(**TINY).eval()

    gen = torch.Generator().manual_seed(31)
    sd = {}
    for name, p in model.named_parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.08)
        sd[name] = p.detach().numpy().copy()

    # video: 1 + 4k frames; also a single image
    video = torch.randn(2, 3, 9, 16, 16, generator=gen)
    image = torch.randn(2, 3, 1, 16, 16, generator=gen)

    scale = [0.0, 1.0]
    with torch.no_grad():
        mu_v, logvar_v, _ = model.encode(video, scale)
        recon_v = model.decode(mu_v, scale)
        mu_i, logvar_i, _ = model.encode(image, scale)
        recon_i = model.decode(mu_i, scale)

    store = {
        "video": video.numpy(), "image": image.numpy(),
        "mu_v": mu_v.numpy(), "logvar_v": logvar_v.numpy(),
        "recon_v": recon_v.numpy(),
        "mu_i": mu_i.numpy(), "logvar_i": logvar_i.numpy(),
        "recon_i": recon_i.numpy(),
    }
    store.update({f"w::{k}": v for k, v in sd.items()})

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/wanvae_tiny.npz", **store)
    print("wrote tests/golden/wanvae_tiny.npz; mu_v", mu_v.shape,
          "recon_v", recon_v.shape)


if __name__ == "__main__":
    main()

"""Golden DiT-head fixtures from the reference ModulatedAttentionBlock /
FinalLayer / TimestepEmbedder (show-o2/models/modules.py).

    python tools/make_golden_dit.py
"""

import importlib.util
import sys
import types

import numpy as np
import torch

# stub timm.layers.helpers.to_2tuple
import importlib.machinery  # noqa: E402


def _stub_module(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


timm = _stub_module("timm")
timm_layers = _stub_module("timm.layers")
timm_helpers = _stub_module("timm.layers.helpers")
timm_helpers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
timm.layers = timm_layers
timm_layers.helpers = timm_helpers

spec = importlib.util.spec_from_file_location(
    "ref_modules", "/root/reference/show-o2/models/modules.py")
ref_modules = importlib.util.module_from_spec(spec)
sys.modules["ref_modules"] = ref_modules
spec.loader.exec_module(ref_modules)

B, L, M = 2, 16, 2
HID, HEADS, KV, DH, INTER = 64, 4, 2, 16, 128
NLAYERS = 2
P, C = 2, 4


def tiny_cfg():
    cfg = ref_modules.DiffusionHeadConfig(hidden_size=HID, head_dim=DH,
                                          intermediate_size=INTER)
    cfg.num_attention_heads = HEADS
    cfg.num_key_value_heads = KV
    return cfg


def main() -> None:
    torch.manual_seed(0)
    cfg = tiny_cfg()
    blocks = torch.nn.ModuleList([
        ref_modules.ModulatedAttentionBlock(cfg, i) for i in range(NLAYERS)
    ]).eval()
    final = ref_modules.FinalLayer(HID, P, C).eval()
    temb = ref_modules.TimestepEmbedder(HID).eval()

    gen = torch.Generator().manual_seed(17)
    sd = {}
    mods = {"blocks": blocks, "final": final, "temb": temb}
    for mname, m in mods.items():
        for name, p in m.named_parameters():
            with torch.no_grad():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
            sd[f"{mname}.{name}"] = p.detach().numpy().copy()

    modality_positions = torch.tensor([
        [[3, 5], [10, 5]],
        [[2, 5], [0, 0]],
    ])
    x = torch.randn(B, L, HID, generator=gen)
    t = torch.rand(B * M, generator=gen)
    adaln = temb(t, torch.float32)

    causal = torch.tril(torch.ones(L, L, dtype=torch.bool))
    blockm = torch.zeros(L, L, dtype=torch.bool)
    for b in range(B):
        pass
    mask_bool = causal[None, None].expand(B, 1, L, L).clone()
    for b in range(B):
        for off, ln in modality_positions[b]:
            mask_bool[b, :, off:off + ln, off:off + ln] = True
    bias = torch.where(mask_bool, 0.0, torch.finfo(torch.float32).min)

    pos_ids = torch.arange(L)[None]
    h = x
    with torch.no_grad():
        for blk in blocks:
            h = blk(hidden_states=h, adaln_input=adaln, attention_mask=bias,
                    position_ids=pos_ids,
                    modality_positions=modality_positions)[0]
        v = final(h, adaln, modality_positions)

    store = {
        "x": x.numpy(), "t": t.numpy(), "adaln": adaln.detach().numpy(),
        "modality_positions": modality_positions.numpy(),
        "mask": mask_bool.numpy(),
        "h_out": h.numpy(), "v_out": v.numpy(),
    }
    store.update({f"w::{k}": v for k, v in sd.items()})

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/dit_tiny.npz", **store)
    print("wrote tests/golden/dit_tiny.npz", v.shape)


if __name__ == "__main__":
    main()

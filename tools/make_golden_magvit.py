"""Generate golden VQ-codec fixtures from the reference implementation.

Builds a tiny-config torch MAGVIT (reference modules) with seeded random
weights, runs encode/decode on a random image, and dumps weights + tensors
to tests/golden/magvit_tiny.npz.

    python tools/make_golden_magvit.py
"""

import sys

import numpy as np
import torch

# Import the reference modules directly by path, stubbing the heavyweight
# diffusers-backed mixins (irrelevant for numerics) to avoid missing deps.
import importlib.util  # noqa: E402
import types  # noqa: E402

import torch.nn as _nn  # noqa: E402

pkg = types.ModuleType("refmodels")
pkg.__path__ = ["/root/reference/models"]
sys.modules["refmodels"] = pkg

mu = types.ModuleType("refmodels.modeling_utils")


class _ModelMixin(_nn.Module):
    pass


class _ConfigMixin:
    pass


def _register_to_config(fn):
    return fn


mu.ModelMixin = _ModelMixin
mu.ConfigMixin = _ConfigMixin
mu.register_to_config = _register_to_config
sys.modules["refmodels.modeling_utils"] = mu

misc = types.ModuleType("refmodels.misc")
import typing as _typing  # noqa: E402

for _n in ("List", "Tuple", "Optional", "Dict", "Any", "Union", "Callable"):
    setattr(misc, _n, getattr(_typing, _n))
sys.modules["refmodels.misc"] = misc


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"refmodels.{name}", f"/root/reference/models/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refmodels.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


_load("common_modules")
_mag = _load("modeling_magvitv2")
VQGANEncoder = _mag.VQGANEncoder
VQGANDecoder = _mag.VQGANDecoder
LFQuantizer = _mag.LFQuantizer

TINY = dict(
    ch=32,
    z_channels=4,
    resolution=32,
)
ENC = dict(ch_mult=[1, 2], num_res_blocks=[1, 1], attn_resolutions=[5], **TINY)
DEC = dict(ch_mult=[1, 2], num_res_blocks=[1, 2], attn_resolutions=[5], **TINY)


def main() -> None:
    torch.manual_seed(0)
    enc = VQGANEncoder(**ENC).eval()
    dec = VQGANDecoder(**DEC).eval()
    quant = LFQuantizer(codebook_dim=TINY["z_channels"])

    # randomize weights deterministically (default init is fine but make sure
    # norms aren't identity so parity is meaningful)
    gen = torch.Generator().manual_seed(1)
    sd = {}
    for name, p in list(enc.named_parameters()) + [
        (f"dec::{n}", p) for n, p in dec.named_parameters()
    ]:
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        sd[name] = p.detach().numpy().copy()

    x = torch.randn(2, 3, 32, 32, generator=gen)
    with torch.no_grad():
        z = enc(x)
        q = quant(z)
        codes = quant.get_indices(q["z"]).reshape(x.shape[0], -1)
        z_q = quant.get_codebook_entry(codes, shape=(16, 16))
        recon = dec(z_q)["output"]

    out = {
        "x": x.numpy(),
        "z": z.numpy(),
        "codes": codes.numpy(),
        "recon": recon.numpy(),
        "entropy_loss": q["entropy_loss"].numpy(),
        "quantizer_loss": q["quantizer_loss"].numpy(),
    }
    # prefix weights
    full_sd = {f"encoder.{k}": v for k, v in sd.items() if not k.startswith("dec::")}
    full_sd.update({f"decoder.{k[5:]}": v for k, v in sd.items() if k.startswith("dec::")})
    out.update({f"w::{k}": v for k, v in full_sd.items()})

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/magvit_tiny.npz", **out)
    total = sum(v.size for v in full_sd.values())
    print(f"wrote tests/golden/magvit_tiny.npz ({total} weight elems)")


if __name__ == "__main__":
    main()

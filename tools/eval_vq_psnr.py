"""BASELINE.md verification config (1): MAGVIT-v2 VQ roundtrip PSNR on
mmu_validation/dog.png at 256^2.

    python tools/eval_vq_psnr.py [vq_model_path=<dir-or-file>] \
        [image=<path>] [resolution=256]

Defaults to the in-tree assets/validation/test_image.png (falls back to
the reference checkout's mmu_validation/dog.png if present).

With a real checkpoint (showlab/magvitv2 weights imported via
showo_tpu.utils.checkpoint.load_magvit_weights) this reproduces the
reference codec's reconstruction quality; without one it reports the
random-init PSNR as a smoke run.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(10 * np.log10(peak ** 2 / max(mse, 1e-12)))


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    if args.get("platform"):  # e.g. platform=cpu for test runs
        jax.config.update("jax_platforms", args["platform"])
    from showo_tpu.utils.assets import validation_image

    image_path = validation_image(args.get("image"))
    if image_path is None:
        raise SystemExit("no validation image found (pass image=...)")
    res = int(args.get("resolution", 256))

    from PIL import Image

    from showo_tpu.models.magvit import MagvitV2, VQConfig
    from showo_tpu.utils.image import image_transform

    pixels = image_transform(Image.open(image_path).convert("RGB"),
                             resolution=res)[None]  # [1, H, W, 3] in [-1, 1]

    vq = MagvitV2(VQConfig())
    ckpt = args.get("vq_model_path", "")
    if ckpt and os.path.exists(ckpt):
        from showo_tpu.utils.checkpoint import load_magvit_weights

        params = jax.tree.map(jnp.asarray, load_magvit_weights(ckpt))
        tag = "pretrained"
    else:
        params = vq.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, res, res, 3)))["params"]
        tag = "random-init"

    @jax.jit
    def roundtrip(params, pixels):
        codes = vq.apply({"params": params}, pixels, method=vq.get_code)
        return vq.apply({"params": params}, codes, method=vq.decode_code)

    recon = np.asarray(roundtrip(params, jnp.asarray(pixels)))
    recon = np.clip(recon, -1, 1)
    print(f"vq_roundtrip_psnr={psnr(pixels, recon):.2f} dB "
          f"({tag}, {os.path.basename(image_path)} @{res})")


if __name__ == "__main__":
    main()

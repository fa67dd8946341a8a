"""In-tree validation assets (``assets/validation/``).

The reference ships its verification inputs as repo content —
``mmu_validation/`` (natural images for the VQ/MMU gates),
``validation_prompts/text2image_prompts.txt`` (trainer validation and the
t2i entry point), ``inpainting_validation/`` (source+mask pairs) — so its
quality gates run out of the box.  This repo vendors minimal synthetic
equivalents (a generated 512x512 scene, a 24-prompt list, an inpainting
pair; all created in-repo, nothing copied) and resolves paths through
here: configured path if it exists, else the in-tree asset, else the
``/root/reference`` checkout as a last resort.  This keeps the BASELINE
verification gates (tools/eval_vq_psnr.py, tests/test_real_weights_e2e.py)
and the trainer validation hooks runnable without the reference tree.
"""

import os
from typing import Optional, Sequence

ASSETS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "validation")


def asset_path(*names: str) -> str:
    """Absolute path of an in-tree validation asset (may not exist)."""
    return os.path.join(ASSETS_DIR, *names)


def resolve(preferred: Optional[str], asset: str,
            reference: Optional[Sequence[str]] = None) -> Optional[str]:
    """First existing path among: ``preferred``, the in-tree asset
    ``assets/validation/<asset>``, then each ``/root/reference/<r>``."""
    if preferred and os.path.exists(str(preferred)):
        return str(preferred)
    cand = asset_path(asset)
    if os.path.exists(cand):
        return cand
    for rel in reference or ():
        ref = os.path.join("/root/reference", rel)
        if os.path.exists(ref):
            return ref
    return None


def validation_image(preferred: Optional[str] = None) -> Optional[str]:
    """Natural test image for the VQ PSNR gate (reference:
    mmu_validation/dog.png)."""
    return resolve(preferred, "test_image.png",
                   ("mmu_validation/dog.png",))


def validation_prompts_file(preferred: Optional[str] = None) -> Optional[str]:
    """t2i prompt list (reference: validation_prompts/text2image_prompts.txt)."""
    return resolve(preferred, "text2image_prompts.txt",
                   ("validation_prompts/text2image_prompts.txt",))


def inpainting_pair(image: Optional[str] = None,
                    mask: Optional[str] = None):
    """(source, mask) for the inpainting entry (reference:
    inpainting_validation/bedroom{,_mask})."""
    src = resolve(image, os.path.join("inpainting", "source.png"),
                  ("inpainting_validation/bedroom.jpg",))
    msk = resolve(mask, os.path.join("inpainting", "mask.png"),
                  ("inpainting_validation/bedroom_mask.webp",))
    return src, msk

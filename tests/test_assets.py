"""In-tree validation assets (showo_tpu/utils/assets.py).

The reference ships verification inputs as repo content
(mmu_validation/, validation_prompts/, inpainting_validation/); this
repo vendors synthetic equivalents under assets/validation/ so the
BASELINE gates and trainer validation hooks run without the reference
checkout."""

import os

from showo_tpu.utils.assets import (inpainting_pair, validation_image,
                                    validation_prompts_file)


def test_assets_exist_and_resolve():
    img = validation_image()
    assert img and os.path.exists(img) and "assets/validation" in img

    vp = validation_prompts_file()
    assert vp and os.path.exists(vp)
    with open(vp) as f:
        prompts = [ln.strip() for ln in f if ln.strip()]
    assert len(prompts) >= 16

    src, mask = inpainting_pair()
    assert src and mask and os.path.exists(src) and os.path.exists(mask)


def test_preferred_path_wins(tmp_path):
    p = tmp_path / "mine.txt"
    p.write_text("a prompt\n")
    assert validation_prompts_file(str(p)) == str(p)
    # a configured-but-missing path falls back to the in-tree asset
    got = validation_prompts_file("validation_prompts/text2image_prompts.txt")
    assert got and os.path.exists(got)


def test_images_decode():
    from PIL import Image

    img = Image.open(validation_image())
    assert img.size[0] >= 256 and img.size[1] >= 256
    src, mask = inpainting_pair()
    assert Image.open(src).size == Image.open(mask).size

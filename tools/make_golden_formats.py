"""Golden v2 sequence-format fixtures from the reference
(show-o2/datasets/utils.py + show-o2/models/misc.py prepare_gen_input).

    python tools/make_golden_formats.py
"""

import importlib.util
import sys
import types

import numpy as np
import torch

sys.path.insert(0, "/root/repo/tools")
from fake_tokenizer import FakeTokenizer  # noqa: E402


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# stub torchvision (only image transforms use it; formats don't)
import importlib.machinery as _mach


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = _mach.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_tv = _stub("torchvision")
_tvt = _stub("torchvision.transforms",
             Resize=object, CenterCrop=object, ToTensor=object,
             Normalize=object, InterpolationMode=types.SimpleNamespace(BICUBIC=3))
_tvf = _stub("torchvision.transforms.functional",
             InterpolationMode=types.SimpleNamespace(BICUBIC=3))
_tv.transforms = _tvt
_tvt.functional = _tvf

du = _load("ref_ds_utils", "/root/reference/show-o2/datasets/utils.py")

IDS = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5, img_pad_id=6)


def main() -> None:
    out = {}
    text = [11, 12, 13, 14]

    t, l, mp, tm, im = du.format_sequence_gen_qwen2_5(
        list(text), None, system_token_len=0, num_image_tokens=5,
        max_seq_len=20, **IDS)
    out.update(gen_tokens=t.numpy(), gen_labels=l.numpy(), gen_mp=mp.numpy(),
               gen_tm=tm.numpy(), gen_im=im.numpy())

    t, l, mp, tm, im = du.format_sequence_und(
        list(text), num_image_tokens=5, max_seq_len=20, **IDS)
    out.update(und_tokens=t.numpy(), und_labels=l.numpy(), und_mp=mp.numpy(),
               und_tm=tm.numpy(), und_im=im.numpy())

    t, l, mp, tm, im = du.format_interleaved_sequence(
        [None, "img", "img"], [[21, 22], [23], None],
        num_image_tokens=3, max_seq_len=30, max_num_images=3, **IDS)
    out.update(int_tokens=t.numpy(), int_labels=l.numpy(), int_mp=mp.numpy(),
               int_tm=tm.numpy(), int_im=im.numpy())

    # prepare_gen_input needs timm stub for models.misc import
    import importlib.machinery

    def stub(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = m
        return m

    timm = stub("timm")
    tl = stub("timm.layers")
    th = stub("timm.layers.helpers")
    th.to_2tuple = lambda x: (x, x)
    timm.layers = tl
    tl.helpers = th
    # models.misc imports .modules -> heavy; emulate by loading misc with a
    # stub package providing modules.modulate/RMSNorm
    pkg = types.ModuleType("refm2")
    pkg.__path__ = ["/root/reference/show-o2/models"]
    sys.modules["refm2"] = pkg
    mods = types.ModuleType("refm2.modules")
    mods.modulate = lambda *a, **k: None
    mods.RMSNorm = object
    sys.modules["refm2.modules"] = mods
    spec = importlib.util.spec_from_file_location(
        "refm2.misc", "/root/reference/show-o2/models/misc.py")
    misc = importlib.util.module_from_spec(spec)
    sys.modules["refm2.misc"] = misc
    spec.loader.exec_module(misc)

    tok = FakeTokenizer()
    # reference calls tokenizer(prompt, add_special_tokens=False)['input_ids']
    # with a single string -> list of ids; FakeTokenizer returns nested list
    class Tok:
        def __call__(self, text, add_special_tokens=False):
            ids = tok(text)["input_ids"][0]
            return {"input_ids": ids}

    bt, btn, mp_, mpn = misc.prepare_gen_input(
        ["a cat on a mat", "hello world"], Tok(), num_image_tokens=5,
        bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5, img_pad_id=6,
        max_text_len=10, device="cpu")
    out.update(pg_tokens=bt.numpy(), pg_null=btn.numpy(),
               pg_mp=mp_.numpy(), pg_mp_null=mpn.numpy())

    import os

    os.makedirs("tests/golden", exist_ok=True)
    np.savez_compressed("tests/golden/formats.npz", **out)
    print("wrote tests/golden/formats.npz",
          {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()

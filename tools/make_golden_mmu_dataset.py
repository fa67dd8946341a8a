"""Golden fixture for format_multi_sequence_und_qwen2_5 from the reference
MMUDataset (show-o2/datasets/mmu_dataset.py), constructed via __new__ with
just the attributes the method reads.

    python tools/make_golden_mmu_dataset.py
"""

import importlib.util
import sys
import types

import numpy as np
import torch

sys.path.insert(0, "/root/repo/tools")
from fake_tokenizer import FakeTokenizer  # noqa: E402

# stub torchvision for datasets.utils import chain
import importlib.machinery as _mach  # noqa: E402


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = _mach.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_tv = _stub("torchvision")
_tvt = _stub("torchvision.transforms", Resize=object, CenterCrop=object,
             ToTensor=object, Normalize=object,
             InterpolationMode=types.SimpleNamespace(BICUBIC=3))
_tvf = _stub("torchvision.transforms.functional",
             InterpolationMode=types.SimpleNamespace(BICUBIC=3))
_tv.transforms = _tvt
_tvt.functional = _tvf
_tvd = _stub("torchvision.datasets")
_tvdf = _stub("torchvision.datasets.folder", default_loader=lambda p: None)
_tv.datasets = _tvd
_tvd.folder = _tvdf

pkg = types.ModuleType("refds")
pkg.__path__ = ["/root/reference/show-o2/datasets"]
sys.modules["refds"] = pkg
spec0 = importlib.util.spec_from_file_location(
    "refds.utils", "/root/reference/show-o2/datasets/utils.py")
u = importlib.util.module_from_spec(spec0)
sys.modules["refds.utils"] = u
spec0.loader.exec_module(u)

# shadow the installed HF `datasets` package with the reference's local one
_ds_pkg = types.ModuleType("datasets")
_ds_pkg.__path__ = ["/root/reference/show-o2/datasets"]
_ds_pkg.__spec__ = _mach.ModuleSpec("datasets", loader=None,
                                    is_package=True)
sys.modules["datasets"] = _ds_pkg
sys.modules["datasets.utils"] = u

spec = importlib.util.spec_from_file_location(
    "refds.mmu_dataset", "/root/reference/show-o2/datasets/mmu_dataset.py")
mmu = importlib.util.module_from_spec(spec)
sys.modules["refds.mmu_dataset"] = mmu
spec.loader.exec_module(mmu)


class Tok:
    def __init__(self):
        self._t = FakeTokenizer()

    def __call__(self, text, add_special_tokens=False, max_length=None,
                 truncation=False):
        ids = self._t(text)["input_ids"][0]
        if max_length:
            ids = ids[:max_length]
        return {"input_ids": ids}


def main() -> None:
    ds = mmu.MMUDataset.__new__(mmu.MMUDataset)
    tok = Tok()
    ds.text_tokenizer = tok
    ds.stage = "tuning"
    ds.default_system_prompt = "system\nYou are a helpful assistant.<|im_end|>"
    ds.bos_id, ds.eos_id, ds.boi_id, ds.eoi_id = 1, 2, 3, 4
    ds.pad_id, ds.img_pad_id, ds.img_id = 5, 6, 7
    ds.num_image_tokens = 5
    ds.max_seq_len = 64

    sources = [tok("what is in the picture")["input_ids"],
               tok("and the color")["input_ids"]]
    # first source has the <image> marker at position 0
    sources[0] = [7] + sources[0]
    targets = [tok("a small cat")["input_ids"],
               tok("black and white")["input_ids"]]

    t, l, mp, tm, im = ds.format_multi_sequence_und_qwen2_5(sources, targets)
    np.savez_compressed(
        "tests/golden/mmu_dataset.npz",
        sources_0=np.asarray(sources[0]), sources_1=np.asarray(sources[1]),
        targets_0=np.asarray(targets[0]), targets_1=np.asarray(targets[1]),
        tokens=t.numpy(), labels=l.numpy(), mp=mp.numpy(),
        tm=tm.numpy(), im=im.numpy())
    print("wrote tests/golden/mmu_dataset.npz", t.shape, mp.numpy())


if __name__ == "__main__":
    main()

"""MMU conversation formatting parity vs reference fixture."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.data.mmu_dataset import format_multi_sequence_und_qwen2_5  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "mmu_dataset.npz")


class Tok:
    def __init__(self):
        self._t = FakeTokenizer()

    def __call__(self, text, add_special_tokens=False, max_length=None):
        ids = self._t(text)["input_ids"][0]
        if max_length:
            ids = ids[:max_length]
        return {"input_ids": ids}


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_mmu_dataset.py")
    return np.load(GOLDEN)


def test_format_parity(golden):
    tok = Tok()
    sources = [golden["sources_0"].tolist(), golden["sources_1"].tolist()]
    targets = [golden["targets_0"].tolist(), golden["targets_1"].tolist()]
    sys_ids = tok("system\nYou are a helpful assistant.<|im_end|>",
                  max_length=100)["input_ids"]
    role_a = tok("\n<|im_start|>user\n")["input_ids"]
    role_b = tok("\n<|im_start|>assistant\n")["input_ids"]

    t, l, mp, tm, im = format_multi_sequence_und_qwen2_5(
        sources, targets, bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5,
        img_pad_id=6, img_id=7, num_image_tokens=5, max_seq_len=64,
        system_prompt_ids=sys_ids, role_a=role_a, role_b=role_b)
    np.testing.assert_array_equal(t, golden["tokens"])
    np.testing.assert_array_equal(l, golden["labels"])
    np.testing.assert_array_equal(mp, golden["mp"])
    np.testing.assert_array_equal(tm, golden["tm"])
    np.testing.assert_array_equal(im, golden["im"])

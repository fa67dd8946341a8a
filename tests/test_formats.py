"""v2 sequence-format parity tests."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.show_o2.formats import (  # noqa: E402
    format_interleaved_sequence,
    format_sequence_gen_qwen2_5,
    format_sequence_und,
    prepare_gen_input,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "formats.npz")
IDS = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5, img_pad_id=6)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_formats.py")
    return np.load(GOLDEN)


def _check(prefix, golden, got):
    t, l, mp, tm, im = got
    np.testing.assert_array_equal(t, golden[f"{prefix}_tokens"])
    np.testing.assert_array_equal(l, golden[f"{prefix}_labels"])
    np.testing.assert_array_equal(mp, golden[f"{prefix}_mp"])
    np.testing.assert_array_equal(tm, golden[f"{prefix}_tm"])
    np.testing.assert_array_equal(im, golden[f"{prefix}_im"])


def test_gen(golden):
    _check("gen", golden, format_sequence_gen_qwen2_5(
        [11, 12, 13, 14], num_image_tokens=5, max_seq_len=20, **IDS))


def test_und(golden):
    _check("und", golden, format_sequence_und(
        [11, 12, 13, 14], num_image_tokens=5, max_seq_len=20, **IDS))


def test_interleaved(golden):
    _check("int", golden, format_interleaved_sequence(
        [None, "img", "img"], [[21, 22], [23], None],
        num_image_tokens=3, max_seq_len=30, max_num_images=3, **IDS))


def test_prepare_gen_input(golden):
    tok = FakeTokenizer()

    class Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": tok(text)["input_ids"][0]}

    t, tn, mp, mpn = prepare_gen_input(
        ["a cat on a mat", "hello world"], Tok(), num_image_tokens=5,
        max_text_len=10, **IDS)
    np.testing.assert_array_equal(t, golden["pg_tokens"])
    np.testing.assert_array_equal(tn, golden["pg_null"])
    np.testing.assert_array_equal(mp, golden["pg_mp"])
    np.testing.assert_array_equal(mpn, golden["pg_mp_null"])

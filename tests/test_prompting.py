"""UniversalPrompting parity vs. reference-generated fixtures."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.prompting import UniversalPrompting  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "prompting.npz")

TEXTS = ["a photo of a cat", "an oil painting of mountains at dusk", ""]


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures missing; run tools/make_golden_prompting.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def uni():
    return UniversalPrompting(FakeTokenizer(), max_text_len=8,
                              cond_dropout_prob=0.0)


def test_t2i(golden, uni):
    ids, masks, labs = uni((TEXTS, golden["image_ids"], golden["labels"]), "t2i")
    np.testing.assert_array_equal(ids, golden["t2i_ids"])
    np.testing.assert_array_equal(masks, golden["t2i_masks"])
    np.testing.assert_array_equal(labs, golden["t2i_labels"])


def test_t2i_gen(golden, uni):
    ids, masks = uni((TEXTS, golden["image_ids"]), "t2i_gen")
    np.testing.assert_array_equal(ids, golden["t2i_gen_ids"])
    np.testing.assert_array_equal(masks, golden["t2i_gen_masks"])


def test_lm(golden, uni):
    ids, masks, labs = uni((TEXTS, 12), "lm")
    np.testing.assert_array_equal(ids, golden["lm_ids"])
    np.testing.assert_array_equal(masks, golden["lm_masks"])
    np.testing.assert_array_equal(labs, golden["lm_labels"])


def test_mmu(golden, uni):
    ids, masks, labs = uni((golden["image_ids"], TEXTS), "mmu")
    np.testing.assert_array_equal(ids, golden["mmu_ids"])
    np.testing.assert_array_equal(masks, golden["mmu_masks"])
    np.testing.assert_array_equal(labs, golden["mmu_labels"])


def test_t2v_and_lvg(golden, uni):
    for task, n in (("t2v", 3), ("lvg", 3)):
        ids, masks, labs = uni((TEXTS, golden["image_ids"],
                                golden["labels"]), task)
        np.testing.assert_array_equal(ids, golden[f"{task}_ids"])
        np.testing.assert_array_equal(masks, golden[f"{task}_masks"])
        np.testing.assert_array_equal(labs, golden[f"{task}_labels"])
        g_ids, g_masks = uni((TEXTS, golden["image_ids"]), f"{task}_gen")
        np.testing.assert_array_equal(g_ids, golden[f"{task}_gen_ids"])
        np.testing.assert_array_equal(g_masks, golden[f"{task}_gen_masks"])


def test_cond_dropout():
    uni = UniversalPrompting(FakeTokenizer(), max_text_len=8,
                             cond_dropout_prob=1.0)
    img = np.zeros((2, 4), np.int64)
    ids, _, _ = uni((TEXTS[:2], img, img), "t2i")
    tok = uni.text_tokenizer
    # with dropout, the non-pad text collapses to [task][bos][eos]
    row = ids[0]
    nonpad = row[row != uni.pad_id]
    assert list(nonpad[:3]) == [uni.sptids["<|t2i|>"], tok.bos_token_id,
                                tok.eos_token_id]


def test_t2i_plus_lm(golden, uni):
    """t2i_plus_lm (reference prompting_utils.py:415-422): first B texts go
    through the t2i layout with the image ids, the rest through lm."""
    texts = TEXTS + ["some plain language modelling text", "another doc"]
    (a_ids, a_masks, a_labs), (b_ids, b_masks, b_labs) = uni(
        (texts, golden["image_ids"], golden["labels"], 16), "t2i_plus_lm",
        t2i_batch_size=3)
    np.testing.assert_array_equal(a_ids, golden["t2i_ids"])
    np.testing.assert_array_equal(a_labs, golden["t2i_labels"])
    ref_ids, _, ref_labs = uni((texts[3:], 16), "lm")
    np.testing.assert_array_equal(b_ids, ref_ids)
    np.testing.assert_array_equal(b_labs, ref_labs)


def test_i2v_layout():
    """i2v dispatch: the reference declares the task
    (prompting_utils.py:447-450) but its i2v_prompt (:301-310) is an empty
    stub — this framework completes it as [v2v][soi]img[eoi][sov]vid[eov]
    with mmu-style label masking over the conditioning prefix."""
    uni = UniversalPrompting(FakeTokenizer(), max_text_len=8)
    img = np.arange(8, dtype=np.int64).reshape(2, 4) + 200
    vid = np.arange(12, dtype=np.int64).reshape(2, 6) + 300
    labels = np.where(vid % 2 == 0, vid, -100)

    ids, masks, labs = uni((img, vid, labels), "i2v")
    sp = uni.sptids
    assert ids.shape == (2, 4 + 6 + 5)
    row = ids[0]
    assert row[0] == sp["<|v2v|>"] and row[1] == sp["<|soi|>"]
    np.testing.assert_array_equal(row[2:6], img[0])
    assert row[6] == sp["<|eoi|>"] and row[7] == sp["<|sov|>"]
    np.testing.assert_array_equal(row[8:14], vid[0])
    assert row[14] == sp["<|eov|>"]
    # labels: prefix ignored, video labels pass through, eov supervised
    assert (labs[:, :8] == -100).all()
    np.testing.assert_array_equal(labs[:, 8:14], labels)
    assert (labs[:, 14] == sp["<|eov|>"]).all()
    assert (masks == 1).all()

    # gen form (no labels)
    g_ids, g_masks = uni((img, vid), "i2v")
    np.testing.assert_array_equal(g_ids, ids)

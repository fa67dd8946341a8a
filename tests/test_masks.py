"""Golden tests: vectorized mask builders vs. reference-generated fixtures.

Fixtures in tests/golden/masks.npz were produced by tools/make_golden_masks.py
running the reference's python-loop builders (training/prompting_utils.py).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from showo_tpu.ops import (
    omni_mask_predict_next,
    omni_mask_mmu,
    omni_mask_mmu_vit,
    omni_mask_lvg,
    omni_mask_lvg_v2,
    to_additive,
    NEG_INF,
)

PAD, SOI, EOI = 900, 901, 902
SOT = EOT = 903

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "masks.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures missing; run tools/make_golden_masks.py")
    return np.load(GOLDEN)


def test_predict_next(golden):
    seq = jnp.asarray(golden["predict_next_seq"])
    for rm in (False, True):
        got = omni_mask_predict_next(
            seq, pad_id=PAD, soi_id=SOI, eoi_id=EOI,
            rm_pad_in_image=rm, return_inverse_mask=False,
        )
        want = golden[f"predict_next_rm{int(rm)}"].astype(bool)
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=f"rm={rm}")


def test_mmu(golden):
    seq = jnp.asarray(golden["mmu_seq"])
    got = omni_mask_mmu(seq, eoi_id=EOI, return_inverse_mask=False)
    np.testing.assert_array_equal(np.asarray(got), golden["mmu"].astype(bool))


def test_mmu_vit(golden):
    got = omni_mask_mmu_vit(N=2, L=40, system_prompt_len=3,
                            return_inverse_mask=False)
    np.testing.assert_array_equal(np.asarray(got), golden["mmu_vit"].astype(bool))


def test_lvg(golden):
    seq = jnp.asarray(golden["lvg_seq"])
    got = omni_mask_lvg(seq, pad_id=PAD, soi_id=SOI, eoi_id=EOI,
                        num_images=2, return_inverse_mask=False)
    np.testing.assert_array_equal(np.asarray(got), golden["lvg"].astype(bool))


def test_lvg_v2(golden):
    seq = jnp.asarray(golden["lvg_v2_seq"])
    got = omni_mask_lvg_v2(
        seq, pad_id=PAD, soi_id=SOI, eoi_id=EOI, sot_id=SOT, eot_id=EOT,
        num_images=2, num_texts=2, return_inverse_mask=False,
    )
    np.testing.assert_array_equal(np.asarray(got), golden["lvg_v2"].astype(bool))


def test_additive_form():
    m = jnp.array([[True, False]])
    add = to_additive(m)
    assert add[0, 0] == 0.0 and add[0, 1] == NEG_INF

"""phi_forward with Pallas attn_meta matches the dense path (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp
from unittest import mock

from showo_tpu.models.phi import PhiConfig, init_phi_params, phi_forward
from showo_tpu.ops import flash_attention as fa
from showo_tpu.ops.masks import omni_mask_predict_next

PAD, SOI, EOI = 120, 121, 122

TINY = PhiConfig(vocab_size=140, hidden_size=64, intermediate_size=128,
                 num_layers=2, num_heads=4)


def test_phi_pallas_matches_dense():
    rng = np.random.default_rng(0)
    rows = []
    for p in (0, 2):
        text = rng.integers(5, 100, size=8 - p).tolist()
        img = rng.integers(5, 100, size=10).tolist()
        rows.append([PAD] * p + text + [SOI] + img + [EOI])
    ids = jnp.asarray(rows)

    params = init_phi_params(TINY, jax.random.PRNGKey(0))
    bias = omni_mask_predict_next(ids, pad_id=PAD, soi_id=SOI, eoi_id=EOI,
                                  rm_pad_in_image=True)
    dense_logits, _ = phi_forward(TINY, params, input_ids=ids,
                                  attention_bias=bias)

    meta = fa.metadata_predict_next(ids, PAD, SOI, EOI)
    orig = fa.omni_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.setdefault("block_q", 8)
        return orig(*args, **kw)

    with mock.patch.object(fa, "omni_attention", interp):
        pallas_logits, _ = phi_forward(TINY, params, input_ids=ids,
                                       attn_meta=meta)
    # non-pad rows must agree (pad-row outputs are don't-care)
    valid = np.asarray(ids != PAD)
    np.testing.assert_allclose(np.asarray(pallas_logits)[valid],
                               np.asarray(dense_logits)[valid],
                               atol=2e-4, rtol=1e-3)

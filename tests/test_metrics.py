"""Bucketed entropy diagnostics (training_utils.py:299-431)."""

import jax.numpy as jnp


def test_bucketed_entropy_metrics():
    import numpy as np

    from showo_tpu.training.metrics import (
        average_by_buckets, image_entropy_per_percent_masked_bucket,
        input_ids_to_masked_buckets, pixel_entropy_per_percent_masked_bucket)

    rng = np.random.default_rng(0)
    B, N, V = 4, 10, 8
    mask_id = 99
    ids = rng.integers(0, 8, size=(B, N))
    # sample i has i+1 masked tokens -> different buckets
    for i in range(B):
        ids[i, : (i + 1) * 2] = mask_id
    logits = jnp.asarray(rng.normal(size=(B, N, V)), jnp.float32)
    ids = jnp.asarray(ids)

    buckets = input_ids_to_masked_buckets(ids, mask_id)
    assert list(np.asarray(buckets)) == [2, 4, 6, 8]

    vals = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    avg = np.asarray(average_by_buckets(vals, buckets))
    assert avg[2] == 1.0 and avg[8] == 4.0 and avg[0] == 0.0

    pe = np.asarray(pixel_entropy_per_percent_masked_bucket(logits, ids,
                                                            mask_id))
    ie = np.asarray(image_entropy_per_percent_masked_bucket(logits, ids,
                                                            mask_id))
    assert pe.shape == ie.shape == (10,)
    # uniform-ish logits -> entropy near log(V) on populated buckets
    assert 0 < pe[2] <= np.log(8) + 1e-3
    # averaged distribution has entropy >= mean per-pixel entropy
    assert ie[2] >= pe[2] - 1e-4

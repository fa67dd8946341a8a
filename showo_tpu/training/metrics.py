"""Training diagnostics (models/training_utils.py equivalents).

soft_target_cross_entropy (training/utils.py:55-71) and the
masking-rate-bucketed CE/entropy diagnostics
(models/training_utils.py:299-431) as pure jnp functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_target_cross_entropy(logits, targets, soft_targets):
    """training/utils.py:55-71: CE against soft targets, first token
    dropped, padding (-100) masked."""
    logits = logits[:, 1:]
    targets = targets[:, 1:]
    logits = logits[..., : soft_targets.shape[-1]]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    padding_mask = targets == -100
    loss = jnp.sum(-soft_targets * log_probs, axis=-1)
    loss = jnp.where(padding_mask, 0.0, loss)
    num_active = padding_mask.size - padding_mask.sum()
    return loss.sum() / jnp.maximum(num_active, 1)


def masked_bucket_cross_entropy(logits, labels, mask_prob, num_buckets=10,
                                ignore_id=-100):
    """Per-masking-rate-bucket mean CE (training_utils.py:299-431 style):
    returns (bucket_ce [num_buckets], bucket_count [num_buckets])."""
    B = logits.shape[0]
    valid = labels != ignore_id
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    per_sample = (jnp.where(valid, nll, 0.0).sum(-1)
                  / jnp.maximum(valid.sum(-1), 1))

    bucket = jnp.clip((mask_prob * num_buckets).astype(jnp.int32), 0,
                      num_buckets - 1)
    one_hot = jax.nn.one_hot(bucket, num_buckets)
    counts = one_hot.sum(0)
    sums = (one_hot * per_sample[:, None]).sum(0)
    return sums / jnp.maximum(counts, 1), counts


def per_param_grad_norms(grads, prefix: str = "grad_norm/") -> dict:
    """Per-parameter L2 grad norms (train.py:892-897 log_grad_norm)."""
    import jax

    out = {}

    def visit(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        out[prefix + name] = jnp.linalg.norm(leaf.reshape(-1))
        return leaf

    jax.tree_util.tree_map_with_path(visit, grads)
    return out


def token_entropy(logits, mask=None):
    """Mean predictive entropy over (optionally masked) positions."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ent = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
    if mask is not None:
        ent = jnp.where(mask, ent, 0.0)
        return ent.sum() / jnp.maximum(mask.sum(), 1)
    return ent.mean()


def input_ids_to_masked_buckets(input_ids, mask_id, total_buckets=10):
    """Masking-rate decile per sample (training_utils.py:418-431)."""
    frac = (input_ids == mask_id).sum(-1) / input_ids.shape[-1]
    return jnp.clip((frac * total_buckets).astype(jnp.int32), 0,
                    total_buckets - 1)


def average_by_buckets(values, buckets, total_buckets=10):
    """Scatter-mean by bucket; empty buckets report 0
    (training_utils.py:400-415)."""
    one_hot = jax.nn.one_hot(buckets, total_buckets)
    counts = one_hot.sum(0)
    sums = (one_hot * values[:, None]).sum(0)
    return sums / jnp.maximum(counts, 1)


def pixel_entropy_per_percent_masked_bucket(logits, input_ids, mask_id,
                                            total_buckets=10):
    """Mean per-token predictive entropy over masked positions, bucketed by
    masking rate (training_utils.py:299-320)."""
    masked = input_ids == mask_id
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ent = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
    ent = jnp.where(masked, ent, 0.0)
    per_image = ent.sum(-1) / jnp.maximum(masked.sum(-1), 1)
    return average_by_buckets(
        per_image, input_ids_to_masked_buckets(input_ids, mask_id,
                                               total_buckets), total_buckets)


def image_entropy_per_percent_masked_bucket(logits, input_ids, mask_id,
                                            total_buckets=10):
    """Entropy of the masked-position-averaged distribution per image,
    bucketed by masking rate (training_utils.py:324-345)."""
    masked = input_ids == mask_id
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.where(masked[..., None], probs, 0.0)
    image_probs = probs.sum(-2) / jnp.maximum(masked.sum(-1)[..., None], 1)
    ent = -jnp.sum(image_probs * jnp.log(jnp.clip(image_probs, 1e-20)),
                   axis=-1)
    return average_by_buckets(
        ent, input_ids_to_masked_buckets(input_ids, mask_id, total_buckets),
        total_buckets)

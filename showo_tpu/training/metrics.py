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

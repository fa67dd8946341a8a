"""MaskGIT discrete-diffusion sampling as a single ``lax.scan`` loop.

Faithful to the reference loop (models/modeling_showo.py:104-181 +
models/sampling.py:31-36), including its compounding temperature decay
(``temperature = temperature * (1 - ratio)`` reassigns the loop variable
each step).  The cond/uncond CFG forward is one batched call; the whole
``timesteps``-step loop compiles to one XLA program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from showo_tpu.sampling.schedules import cosine_schedule


def _log(t, eps=1e-20):
    return jnp.log(jnp.clip(t, eps))


def gumbel_noise(key, shape, dtype=jnp.float32):
    u = jax.random.uniform(key, shape, dtype=dtype)
    return -_log(-_log(u))


def mask_by_random_topk(key, mask_len, probs, temperature):
    """models/sampling.py:31-36: re-mask the lowest-confidence tokens.

    mask_len: [B, 1] ints; probs: [B, N] selected-token probabilities.
    """
    confidence = _log(probs) + temperature * gumbel_noise(key, probs.shape)
    sorted_confidence = jnp.sort(confidence, axis=-1)
    cut_off = jnp.take_along_axis(sorted_confidence, mask_len.astype(jnp.int32),
                                  axis=-1)
    return confidence < cut_off


def maskgit_generate(
    forward_fn: Callable[[jnp.ndarray], jnp.ndarray],
    input_ids: jnp.ndarray,
    key: jax.Array,
    *,
    uncond_input_ids: Optional[jnp.ndarray] = None,
    num_vq_tokens: int,
    mask_token_id: int,
    codebook_offset: int,
    codebook_size: int,
    prompt_len: int,
    timesteps: int = 18,
    guidance_scale: float = 0.0,
    temperature: float = 1.0,
    noise_schedule=cosine_schedule,
    injected_noise=None,
    forward_returns_sliced: bool = False,
):
    """Generate image tokens by iterative parallel decoding.

    forward_fn: ids [B', L] -> logits [B', L, V] (the fused Showo forward,
        mask already baked in).
    input_ids: [B, L] with the image slice (positions L-1-num_vq_tokens ..
        L-2) initialized to ``mask_token_id`` (or partially-known tokens for
        inpainting).
    codebook_offset: llm_vocab_size + num_new_special_tokens.
    prompt_len: max_seq_length + 1 (text prefix length incl. task token).
    injected_noise: optional (g_sample [T,B,N,C], g_conf [T,B,N]) gumbel
        arrays for the RNG-bridging parity harness — categorical sampling
        becomes argmax(log p + g) with the provided noise, so token outputs
        can be compared bit-for-bit against a reference run driven by the
        same noise.
    Returns final image tokens in codebook space, [B, num_vq_tokens].
    """
    B, L = input_ids.shape
    img_lo = L - num_vq_tokens - 1  # image slice [img_lo, L-1)

    img = input_ids[:, img_lo:L - 1]
    codes = jnp.where(img == mask_token_id, mask_token_id, img - codebook_offset)

    use_cfg = uncond_input_ids is not None and guidance_scale > 0
    if uncond_input_ids is not None:
        uncond_prefix = uncond_input_ids[:, :prompt_len]

    def step(carry, step_idx):
        input_ids, codes, temp, key = carry
        key, k_sample, k_mask = jax.random.split(key, 3)

        if use_cfg:
            uncond_ids = jnp.concatenate(
                [uncond_prefix, input_ids[:, prompt_len:]], axis=1)
            model_input = jnp.concatenate([input_ids, uncond_ids], axis=0)
            logits_all = forward_fn(model_input)
            cond_logits, uncond_logits = jnp.split(logits_all, 2, axis=0)
            logits = (1 + guidance_scale) * cond_logits - guidance_scale * uncond_logits
        else:
            logits = forward_fn(input_ids)
        if not forward_returns_sliced:
            # image rows, codebook columns (excl. the trailing mask token)
            logits = logits[:, img_lo:L - 1,
                            codebook_offset:codebook_offset + codebook_size]

        probs = jax.nn.softmax(logits, axis=-1)
        if injected_noise is not None:
            g_sample, g_conf = injected_noise
            sampled = jnp.argmax(_log(probs) + g_sample[step_idx], axis=-1)
        else:
            sampled = jax.random.categorical(k_sample, _log(probs), axis=-1)

        unknown = codes == mask_token_id
        sampled = jnp.where(unknown, sampled, codes)

        ratio = (step_idx + 1).astype(jnp.float32) / timesteps
        mask_ratio = noise_schedule(ratio)

        selected = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        selected = jnp.where(unknown, selected, jnp.finfo(selected.dtype).max)

        mask_len = jnp.floor(num_vq_tokens * mask_ratio)[None, None]
        mask_len = jnp.maximum(
            1.0, jnp.minimum(unknown.sum(axis=-1, keepdims=True) - 1.0, mask_len)
        )

        temp = temp * (1.0 - ratio)  # compounding decay, as in the reference
        if injected_noise is not None:
            confidence = _log(selected) + temp * g_conf[step_idx]
            cut_off = jnp.take_along_axis(jnp.sort(confidence, axis=-1),
                                          mask_len.astype(jnp.int32), axis=-1)
            masking = confidence < cut_off
        else:
            masking = mask_by_random_topk(k_mask, mask_len, selected, temp)

        new_img = jnp.where(masking, mask_token_id, sampled + codebook_offset)
        input_ids = jax.lax.dynamic_update_slice(
            input_ids, new_img.astype(input_ids.dtype), (0, img_lo))
        codes = jnp.where(masking, mask_token_id, sampled)
        return (input_ids, codes, temp, key), sampled

    (_, _, _, _), sampled_hist = jax.lax.scan(
        step, (input_ids, codes, jnp.asarray(temperature, jnp.float32), key),
        jnp.arange(timesteps))
    return sampled_hist[-1]

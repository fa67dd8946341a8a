"""Show-o v1 trainer variant with CLIP-ViT continuous MMU features
(training/train_w_clip_vit.py equivalent).

Differences from the base trainer (train_w_clip_vit.py:216-219, 512-619):
  * MMU uses frozen CLIP ViT penultimate features projected by
    ``mm_projector`` and spliced into token embeddings after
    [mmu][system][soi] (576 patches);
  * the fused forward runs on embeddings for all three flows;
  * mmu mask = ``create_attention_mask_for_mmu_vit``;
  * ``mm_projector`` can take a separate (2x) learning rate via an optax
    multi_transform, mirroring the reference's optimizer groups (:205-212).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from showo_tpu.models.clip_vit import ClipVitConfig, clip_vit_features
from showo_tpu.models.magvit import MagvitV2, VQConfig
from showo_tpu.models.showo import ShowoConfig, mm_project, showo_losses
from showo_tpu.ops.masks import omni_mask_mmu_vit, omni_mask_predict_next
from showo_tpu.sampling.schedules import get_mask_schedule
from showo_tpu.training.corruption import mask_or_random_replace_tokens
from showo_tpu.training.train_showo import assemble_t2i
from showo_tpu.training.train_step import TrainConfig, TrainState


def make_projector_lr_optimizer(tc: TrainConfig, params,
                                projector_lr_scale: float = 2.0):
    """mm_projector gets `projector_lr_scale` x the base LR
    (train_w_clip_vit.py:205-212)."""

    def label(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return "proj" if "mm_projector" in name else "base"

    labels = jax.tree_util.tree_map_with_path(label, params)

    def adamw(lr):
        return optax.chain(optax.clip_by_global_norm(tc.max_grad_norm),
                           optax.adamw(lr, b1=tc.adam_beta1, b2=tc.adam_beta2,
                                       eps=tc.adam_eps,
                                       weight_decay=tc.weight_decay))

    from showo_tpu.training.train_step import with_grad_accum

    return with_grad_accum(optax.multi_transform(
        {"base": adamw(tc.learning_rate),
         "proj": adamw(tc.learning_rate * projector_lr_scale)}, labels),
        tc.grad_accum_steps)


def make_fused_clip_train_step(cfg: ShowoConfig, vq_cfg: VQConfig,
                               clip_cfg: ClipVitConfig, tc: TrainConfig,
                               optimizer, sp: Dict[str, int],
                               batch_size_t2i: int, batch_size_lm: int,
                               batch_size_mmu: int, mask_schedule,
                               system_prompt_len: int,
                               min_masking_rate: float = 0.0):
    vq = MagvitV2(vq_cfg)
    codebook_offset = cfg.codebook_offset
    mask_id = cfg.mask_token_id
    pad, soi, eoi, mmu_tok = (sp["<|pad|>"], sp["<|soi|>"], sp["<|eoi|>"],
                              sp["<|mmu|>"])

    def step(state: TrainState, vq_params, clip_params,
             t2i_pixels, t2i_text_block,
             lm_ids, lm_labels,
             mmu_clip_pixels, mmu_ids_with_system, mmu_labels, key):
        """mmu_ids_with_system: [B, S_txt] = [mmu][system][soi][eoi]question
        ids (the feature splice goes between soi and eoi)."""
        k_corrupt, = jax.random.split(key, 1)
        embed = state.params["showo"]["embed"]

        # --- t2i (token path)
        img_tokens = vq.apply({"params": vq_params}, t2i_pixels,
                              method=vq.get_code)
        noised, img_labels, _, mask_prob = mask_or_random_replace_tokens(
            k_corrupt, img_tokens, mask_id, mask_schedule,
            min_masking_rate=min_masking_rate,
            codebook_size=cfg.codebook_size)
        img_unified = jnp.where(noised == mask_id, mask_id,
                                noised + codebook_offset)
        img_lab_unified = jnp.where(img_labels == -100, -100,
                                    img_labels + codebook_offset)
        t2i_ids, t2i_labels = assemble_t2i(t2i_text_block, img_unified,
                                           img_lab_unified, soi, eoi, pad)
        bias_t2i = omni_mask_predict_next(t2i_ids, pad_id=pad, soi_id=soi,
                                          eoi_id=eoi, rm_pad_in_image=True)
        bias_lm = omni_mask_predict_next(lm_ids, pad_id=pad, soi_id=soi,
                                         eoi_id=eoi)

        # --- mmu (continuous path): CLIP features -> mm_projector -> splice
        feats = clip_vit_features(clip_cfg, clip_params, mmu_clip_pixels)
        feats = mm_project(state.params, feats)
        text_emb = embed[mmu_ids_with_system]
        lo = 2 + system_prompt_len  # after [mmu][system][soi]
        mmu_embeds = jnp.concatenate(
            [text_emb[:, :lo], feats, text_emb[:, lo:]], axis=1)
        n_patch = feats.shape[1]
        Bm, Sm, _ = mmu_embeds.shape
        bias_mmu = omni_mask_mmu_vit(Bm, Sm,
                                     system_prompt_len=system_prompt_len,
                                     num_patches=n_patch)
        mmu_full_labels = jnp.concatenate(
            [jnp.full((Bm, lo), -100, mmu_labels.dtype),
             jnp.full((Bm, n_patch), -100, mmu_labels.dtype),
             mmu_labels[:, lo:]], axis=1)

        # --- pad everything to the widest sequence, embed, fuse
        L = max(t2i_ids.shape[1], lm_ids.shape[1], Sm)

        def pad_to(x, fill, width):
            return jnp.pad(x, ((0, 0), (0, width - x.shape[1])),
                           constant_values=fill)

        def pad_bias(b, width):
            d = width - b.shape[-1]
            b = jnp.pad(b, ((0, 0), (0, 0), (0, 0), (0, d)),
                        constant_values=-1e9)
            return jnp.pad(b, ((0, 0), (0, 0), (0, d), (0, 0)))

        t2i_emb = embed[pad_to(t2i_ids, pad, L)]
        lm_emb = embed[pad_to(lm_ids, pad, L)]
        mmu_emb = jnp.pad(mmu_embeds, ((0, 0), (0, L - Sm), (0, 0)))

        embeds = jnp.concatenate([t2i_emb, lm_emb, mmu_emb], axis=0)
        labels = jnp.concatenate([
            pad_to(t2i_labels, -100, L), pad_to(lm_labels, -100, L),
            pad_to(mmu_full_labels, -100, L)], axis=0)
        bias = jnp.concatenate([pad_bias(bias_t2i, L), pad_bias(bias_lm, L),
                                pad_bias(bias_mmu, L)], axis=0)

        def loss_fn(params):
            _, l_t2i, l_lm, l_mmu = showo_losses(
                cfg, params, None, labels, bias, batch_size_t2i,
                batch_size_lm, batch_size_mmu,
                max_seq_length=tc.max_seq_length, remat=True,
                input_embeds=embeds)
            total = (tc.t2i_coeff * l_t2i + tc.lm_coeff * l_lm
                     + tc.mmu_coeff * l_mmu)
            return total, (l_t2i, l_lm, l_mmu)

        (total, (l_t2i, l_lm, l_mmu)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, "loss_t2i": l_t2i, "loss_lm": l_lm,
                   "loss_mmu": l_mmu, "masking_rate": mask_prob.mean()}
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))

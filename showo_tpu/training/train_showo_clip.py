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
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from showo_tpu.models.clip_vit import ClipVitConfig, clip_vit_features
from showo_tpu.models.magvit import MagvitV2, VQConfig
from showo_tpu.models.showo import ShowoConfig, mm_project, showo_losses
from showo_tpu.ops.masks import omni_mask_mmu_vit, omni_mask_predict_next
from showo_tpu.sampling.schedules import get_mask_schedule
from showo_tpu.training.corruption import mask_or_random_replace_tokens
from showo_tpu.training.train_showo import ShowoTrainer, assemble_t2i
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

        # --- mmu (continuous path): frozen CLIP features (the tower is
        # frozen in the reference, train_w_clip_vit.py:216-219); the
        # mm_projector projection and ALL embedding lookups happen inside
        # loss_fn so the projector and the embedding table get gradients
        feats_clip = clip_vit_features(clip_cfg, clip_params,
                                       mmu_clip_pixels)
        feats_clip = jax.lax.stop_gradient(feats_clip)
        lo = 2 + system_prompt_len  # after [mmu][system][soi]
        n_patch = feats_clip.shape[1]
        Bm = mmu_ids_with_system.shape[0]
        Sm = mmu_ids_with_system.shape[1] + n_patch
        bias_mmu = omni_mask_mmu_vit(Bm, Sm,
                                     system_prompt_len=system_prompt_len,
                                     num_patches=n_patch)
        mmu_full_labels = jnp.concatenate(
            [jnp.full((Bm, lo), -100, mmu_labels.dtype),
             jnp.full((Bm, n_patch), -100, mmu_labels.dtype),
             mmu_labels[:, lo:]], axis=1)

        # --- pad everything to the widest sequence
        L = max(t2i_ids.shape[1], lm_ids.shape[1], Sm)

        def pad_to(x, fill, width):
            return jnp.pad(x, ((0, 0), (0, width - x.shape[1])),
                           constant_values=fill)

        def pad_bias(b, width):
            d = width - b.shape[-1]
            b = jnp.pad(b, ((0, 0), (0, 0), (0, 0), (0, d)),
                        constant_values=-1e9)
            return jnp.pad(b, ((0, 0), (0, 0), (0, d), (0, 0)))

        t2i_ids_p = pad_to(t2i_ids, pad, L)
        lm_ids_p = pad_to(lm_ids, pad, L)
        labels = jnp.concatenate([
            pad_to(t2i_labels, -100, L), pad_to(lm_labels, -100, L),
            pad_to(mmu_full_labels, -100, L)], axis=0)
        bias = jnp.concatenate([pad_bias(bias_t2i, L), pad_bias(bias_lm, L),
                                pad_bias(bias_mmu, L)], axis=0)

        def loss_fn(params):
            embed = params["showo"]["embed"]
            feats = mm_project(params, feats_clip)
            text_emb = embed[mmu_ids_with_system]
            mmu_embeds = jnp.concatenate(
                [text_emb[:, :lo], feats, text_emb[:, lo:]], axis=1)
            embeds = jnp.concatenate([
                embed[t2i_ids_p], embed[lm_ids_p],
                jnp.pad(mmu_embeds, ((0, 0), (0, L - Sm), (0, 0)))], axis=0)
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

@dataclasses.dataclass
class ClipShowoTrainer(ShowoTrainer):
    """CLIP-ViT variant trainer (train_w_clip_vit.py:73-920): MMU batches
    are LLaVA conversations whose images become frozen CLIP penultimate
    features, projected by mm_projector (2x LR) and spliced after
    [mmu][system][soi]."""

    clip_cfg: Any = None
    clip_params: Any = None
    system_prompt_len: int = 28   # llava_tuning offset (train_w_clip_vit.py:551)
    mmu_text_len: int = 128

    def __post_init__(self):
        from showo_tpu.training.train_step import TrainConfig
        from showo_tpu.utils.logging import Tracker

        c = self.config
        tr = c.training
        self.tc = TrainConfig(
            learning_rate=tr.get("learning_rate", 1e-4),
            max_grad_norm=tr.get("max_grad_norm", 1.0),
            t2i_coeff=tr.get("t2i_coeff", 1.0),
            lm_coeff=tr.get("lm_coeff", 0.1),
            mmu_coeff=tr.get("mmu_coeff", 1.0),
            max_seq_length=c.dataset.preprocessing.max_seq_length,
            grad_accum_steps=int(tr.get("gradient_accumulation_steps", 1)),
        )
        self.optimizer = make_projector_lr_optimizer(
            self.tc, self.params,
            projector_lr_scale=float(tr.get("projector_lr_scale", 2.0)))
        self.state = TrainState(self.params,
                                self.optimizer.init(self.params),
                                jnp.zeros((), jnp.int32))
        from showo_tpu.sampling.schedules import get_mask_schedule

        schedule = get_mask_schedule(tr.get("mask_schedule", "cosine"))
        self.step_fn = make_fused_clip_train_step(
            self.cfg, self.vq_cfg, self.clip_cfg, self.tc, self.optimizer,
            self.uni_prompting.sptids,
            tr.batch_size_t2i, tr.batch_size_lm, tr.batch_size_mmu,
            schedule, system_prompt_len=self.system_prompt_len,
            min_masking_rate=tr.get("min_masking_rate", 0.0))
        from showo_tpu.utils.logging import resolve_wandb_run_id

        wandb_on = bool(c.get("wandb_enabled", False))
        run_id, resume = resolve_wandb_run_id(c, c.experiment.output_dir,
                                              enabled=wandb_on)
        self.tracker = Tracker(project=c.experiment.project,
                               name=c.experiment.name,
                               enabled=wandb_on,
                               run_id=run_id, resume=resume)
        self.global_step = 0
        self._init_ema(tr)

    def mmu_clip_block(self, mmu_batch):
        """LLaVA samples -> fixed-shape [mmu][system][soi][eoi]conversation
        id/label blocks (the CLIP feature splice goes between soi and eoi,
        train_w_clip_vit.py:512-589)."""
        sp = self.uni_prompting.sptids
        pad = sp["<|pad|>"]
        ids_list = mmu_batch["input_ids"]
        labels_list = mmu_batch["labels"]
        sys_list = mmu_batch.get("input_ids_system")
        B = len(ids_list)
        S = self.system_prompt_len
        W = self.mmu_text_len
        ids = np.full((B, 3 + S + W), pad, np.int32)
        labels = np.full((B, 3 + S + W), -100, np.int32)
        ids[:, 0] = sp["<|mmu|>"]
        ids[:, 1 + S] = sp["<|soi|>"]
        ids[:, 2 + S] = sp["<|eoi|>"]
        for i in range(B):
            if S:
                sys_ids = np.asarray(sys_list[i])[:S]
                ids[i, 1:1 + len(sys_ids)] = sys_ids
            row = np.asarray(ids_list[i])[:W]
            lab = np.asarray(labels_list[i])[:W]
            ids[i, 3 + S:3 + S + len(row)] = row
            labels[i, 3 + S:3 + S + len(lab)] = lab
        return ids, labels

    def train_step(self, t2i_batch, lm_texts, mmu_batch, key):
        uni = self.uni_prompting
        t2i_text = uni.t2i_text_block(t2i_batch["text"])
        L = t2i_text.shape[1] + self.cfg.num_vq_tokens + 2
        lm_ids, _, lm_labels = uni.lm_prompt(
            uni.text_tokenizer(list(lm_texts))["input_ids"], L)
        mmu_ids, mmu_labels = self.mmu_clip_block(mmu_batch)

        self.state, metrics = self.step_fn(
            self.state, self.vq_params, self.clip_params,
            jnp.asarray(t2i_batch["image"]), jnp.asarray(t2i_text),
            jnp.asarray(lm_ids), jnp.asarray(lm_labels),
            jnp.asarray(mmu_batch["image"]), jnp.asarray(mmu_ids),
            jnp.asarray(mmu_labels), key)
        self.global_step += 1
        return metrics


def collate_llava(samples):
    """Variable-length LLaVA samples: stack images, keep id/label lists."""
    out = {"image": np.stack([s["image"] for s in samples]),
           "input_ids": [s["input_ids"] for s in samples],
           "labels": [s["labels"] for s in samples]}
    if "input_ids_system" in samples[0]:
        out["input_ids_system"] = [s["input_ids_system"] for s in samples]
    return out


def main() -> None:
    """CLI: python -m showo_tpu.training.train_showo_clip
    config=configs/showo_instruction_tuning_1_w_clip_vit.yaml
    (train_w_clip_vit.py:73-920 equivalent)."""
    from showo_tpu.config import get_config, snapshot_config
    from showo_tpu.data.llava import LLaVADataset, LLaVAPretrainDataset
    from showo_tpu.data.loader import DataLoader
    from showo_tpu.data.refinedweb import RefinedWebDataset
    from showo_tpu.data.tar_shards import Text2ImageTarDataset
    from showo_tpu.inference_t2i import (build_showo_config, load_params,
                                         load_tokenizer, load_vq)
    from showo_tpu.models.clip_vit import ClipVitConfig, init_clip_vit_params
    from showo_tpu.parallel.mesh import make_mesh, shard_params
    from showo_tpu.prompting import UniversalPrompting
    from showo_tpu.training.train_showo import load_validation_prompts
    from showo_tpu.utils.logging import get_logger

    logger = get_logger(__name__)
    config = get_config()
    cfg = build_showo_config(config)
    params = load_params(config, cfg)
    vq_cfg, vq_params = load_vq(config)
    tokenizer = load_tokenizer(config)
    uni = UniversalPrompting(
        tokenizer, max_text_len=config.dataset.preprocessing.max_seq_length,
        cond_dropout_prob=config.training.cond_dropout_prob)

    # frozen CLIP tower (train_w_clip_vit.py:216-219)
    clip_cfg = ClipVitConfig()
    tower = config.model.showo.get("vision_tower_path", "")
    if tower and os.path.exists(str(tower)):
        from showo_tpu.utils.checkpoint import _load_dir_or_file
        from showo_tpu.utils.torch_import import clip_vit_params_from_torch

        clip_params = jax.tree.map(jnp.asarray, clip_vit_params_from_torch(
            _load_dir_or_file(str(tower)), clip_cfg))
    else:
        logger.warning("random-init CLIP tower (%s)", tower)
        clip_params = init_clip_vit_params(clip_cfg, jax.random.PRNGKey(7))

    # mm_projector params if absent (clip hidden -> llm hidden MLP)
    if "mm_projector" not in params:
        k1, k2 = jax.random.split(jax.random.PRNGKey(11))
        d_in, d = clip_cfg.hidden_size, cfg.llm.hidden_size
        params["mm_projector"] = {
            "fc1": {"kernel": jax.random.normal(k1, (d_in, d)) * 0.02,
                    "bias": jnp.zeros((d,))},
            "fc2": {"kernel": jax.random.normal(k2, (d, d)) * 0.02,
                    "bias": jnp.zeros((d,))},
        }

    par = config.get("parallel", {}) or {}
    mesh = make_mesh(dp=par.get("dp"), fsdp=par.get("fsdp", 1),
                     tp=par.get("tp", 1))
    p = config.dataset.params
    tr = config.training
    stage = config.dataset.get("und_type", "llava_tuning")
    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)

        # mmu loader: llava pretrain (plain captions, splice at 2) or
        # tuning (conversations + system prompt, splice at 2+28)
        if stage == "llava_pretrain":
            mmu_ds = LLaVAPretrainDataset(
                p.train_mmu_shards_path_or_url, p.get("mmu_image_root", ""),
                tokenizer, resolution=clip_cfg.image_size)
            system_prompt_len = 0
        else:
            mmu_ds = LLaVADataset(
                p.train_mmu_shards_path_or_url, p.get("mmu_image_root", ""),
                tokenizer, resolution=clip_cfg.image_size)
            sys_len = len(mmu_ds[0]["input_ids_system"])
            system_prompt_len = int(config.dataset.preprocessing.get(
                "system_prompt_len", sys_len))
        mmu_loader = DataLoader(lambda: iter(mmu_ds), tr.batch_size_mmu,
                                collate_fn=collate_llava)

        trainer = ClipShowoTrainer(
            config=config, cfg=cfg, vq_cfg=vq_cfg, params=params,
            vq_params=vq_params, uni_prompting=uni, mesh=mesh,
            clip_cfg=clip_cfg, clip_params=clip_params,
            system_prompt_len=system_prompt_len,
            mmu_text_len=int(config.dataset.preprocessing.get(
                "max_mmu_text_len", 128)))

        if config.experiment.get("resume_from_checkpoint") == "latest":
            from showo_tpu.utils.checkpoint import resume_latest

            state, step = resume_latest(config.experiment.output_dir,
                                        trainer.state)
            if state is not None:
                trainer.state = jax.tree.map(jnp.asarray, state)
                trainer.global_step = step
                logger.info("resumed from step %d", step)

        snapshot_config(config, config.experiment.output_dir)

        if config.dataset.gen_type == "imagenet1k":
            from showo_tpu.data.imagenet import ImageNetDataset

            t2i_ds = ImageNetDataset(p.train_t2i_shards_path_or_url,
                                     p.resolution)
        else:
            t2i_ds = Text2ImageTarDataset(p.train_t2i_shards_path_or_url,
                                          p.resolution,
                                          p.get("shuffle_buffer_size", 1000))
        t2i_loader = DataLoader(lambda: iter(t2i_ds), tr.batch_size_t2i)
        lm_ds = RefinedWebDataset(p.train_lm_shards_path_or_url,
                                  rank=jax.process_index(),
                                  world_size=jax.process_count())
        lm_loader = DataLoader(lambda: iter(lm_ds), tr.batch_size_lm)

        trainer.fit(t2i_loader, lm_loader, mmu_loader,
                    max_steps=tr.max_train_steps,
                    log_every=config.experiment.get("log_every", 50),
                    save_every=config.experiment.get("save_every"),
                    output_dir=config.experiment.output_dir,
                    checkpoints_total_limit=config.experiment.get(
                        "checkpoints_total_limit"),
                    seed=tr.get("seed", 0),
                    generate_every=config.experiment.get("generate_every"),
                    validation_prompts=load_validation_prompts(config))


if __name__ == "__main__":
    main()

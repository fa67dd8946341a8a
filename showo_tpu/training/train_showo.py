"""Show-o v1 unified trainer (training/train.py equivalent, TPU-native).

One compiled "mega-step" fuses everything the reference does per step
(train.py:467-618): VQ encode of t2i and mmu pixels, mask/replace
corruption, on-device sequence assembly ([text][soi]img[eoi] /
[mmu][soi]img[eoi][text]), the three omni masks, the fused 3-loss
forward/backward, grad clip, and the AdamW update — over a
("dp","fsdp","tp") mesh.  Host work is limited to tokenization and batch
marshalling.

Run:  python -m showo_tpu.training.train_showo config=configs/showo_pretraining_stage1.yaml
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.magvit import MagvitV2, VQConfig
from showo_tpu.models.showo import ShowoConfig, init_showo_params, showo_losses
from showo_tpu.ops.masks import omni_mask_mmu, omni_mask_predict_next
from showo_tpu.sampling.schedules import get_mask_schedule
from showo_tpu.training.corruption import mask_or_random_replace_tokens
from showo_tpu.training.train_step import TrainConfig, TrainState, make_optimizer
from showo_tpu.utils.logging import AverageMeter, Stopwatch, Tracker, get_logger

logger = get_logger(__name__)


def max_size_cycle_zip(*loaders):
    """Zip loaders, restarting exhausted ones until every loader has
    completed at least one pass (Lightning CombinedLoader
    'max_size_cycle', reference train.py:414-421) — a finite t2i epoch no
    longer silently ends training when the lm/mmu streams are longer."""
    its = [iter(ld) for ld in loaders]
    exhausted = [False] * len(its)
    while True:
        out = []
        for i in range(len(its)):
            try:
                b = next(its[i])
            except StopIteration:
                exhausted[i] = True
                if all(exhausted):
                    return
                its[i] = iter(loaders[i])
                try:
                    b = next(its[i])
                except StopIteration:
                    # PEP 479 would turn this into an opaque RuntimeError
                    raise ValueError(
                        f"loader {i} yielded no batches after restart "
                        "(empty dataset or shard?)") from None
            out.append(b)
        if all(exhausted):
            return
        yield tuple(out)


def assemble_t2i(text_block, img_ids, img_labels, soi, eoi, pad_id,
                 ignore_id=-100):
    """[pad..text][soi]img[eoi] ids + labels (prompting_utils.py:59-90),
    fully on device."""
    B = text_block.shape[0]
    soi_col = jnp.full((B, 1), soi, text_block.dtype)
    eoi_col = jnp.full((B, 1), eoi, text_block.dtype)
    ids = jnp.concatenate([text_block, soi_col, img_ids, eoi_col], axis=1)
    labels = jnp.concatenate([text_block, soi_col, img_labels, eoi_col], axis=1)
    labels = jnp.where(labels == pad_id, ignore_id, labels)
    return ids, labels


def assemble_mmu(text_block, text_labels, img_ids, mmu, soi, eoi,
                 ignore_id=-100):
    """[mmu][soi]img[eoi][text] (train.py:541-583 captioning path)."""
    B, n_img = img_ids.shape
    ones = lambda v: jnp.full((B, 1), v, text_block.dtype)
    ids = jnp.concatenate([ones(mmu), ones(soi), img_ids, ones(eoi),
                           text_block], axis=1)
    lab_prefix = jnp.full((B, n_img + 3), ignore_id, text_block.dtype)
    labels = jnp.concatenate([lab_prefix, text_labels], axis=1)
    return ids, labels


def make_fused_train_step(cfg: ShowoConfig, vq_cfg: VQConfig, tc: TrainConfig,
                          optimizer, sp: Dict[str, int],
                          batch_size_t2i: int, batch_size_lm: int,
                          batch_size_mmu: int, mask_schedule,
                          min_masking_rate: float = 0.0,
                          noise_type: str = "mask",
                          predict_all_tokens: bool = False):
    vq = MagvitV2(vq_cfg)
    codebook_offset = cfg.codebook_offset
    mask_id = cfg.mask_token_id
    pad, soi, eoi, mmu_tok = sp["<|pad|>"], sp["<|soi|>"], sp["<|eoi|>"], sp["<|mmu|>"]

    def step(state: TrainState, vq_params, t2i_pixels, t2i_text_block,
             lm_ids, lm_labels, mmu_pixels, mmu_text_block, mmu_text_labels,
             key):
        k_corrupt, = jax.random.split(key, 1)

        # --- t2i: frozen VQ encode + corruption + assembly
        img_tokens = vq.apply({"params": vq_params}, t2i_pixels,
                              method=vq.get_code)
        noised, img_labels, _, mask_prob = mask_or_random_replace_tokens(
            k_corrupt, img_tokens, mask_id, mask_schedule,
            min_masking_rate=min_masking_rate, noise_type=noise_type,
            predict_all_tokens=predict_all_tokens,
            codebook_size=cfg.codebook_size)
        img_unified = jnp.where(noised == mask_id, mask_id,
                                noised + codebook_offset)
        img_label_unified = jnp.where(img_labels == -100, -100,
                                      img_labels + codebook_offset)
        t2i_ids, t2i_labels = assemble_t2i(t2i_text_block, img_unified,
                                           img_label_unified, soi, eoi, pad)

        # --- mmu: frozen VQ encode + assembly
        mmu_img = vq.apply({"params": vq_params}, mmu_pixels,
                           method=vq.get_code) + codebook_offset
        mmu_ids, mmu_labels = assemble_mmu(mmu_text_block, mmu_text_labels,
                                           mmu_img, mmu_tok, soi, eoi)

        input_ids = jnp.concatenate([t2i_ids, lm_ids, mmu_ids], axis=0)
        labels = jnp.concatenate([t2i_labels, lm_labels, mmu_labels], axis=0)

        attn_meta, bias = None, None
        if tc.attn_impl.startswith("pallas"):
            # per-row O(S) kernel metadata instead of the three dense
            # S x S biases: t2i rows prune pads (rm_pad_in_image=True),
            # lm rows keep pads visible (pad map zeroed), mmu rows get
            # the batch-first-eoi prefix quirk
            from showo_tpu.ops.flash_attention import (metadata_mmu,
                                                       metadata_predict_next,
                                                       seg_from_soi_eoi)

            seg_t, pad_t, lp_t, pf_t = metadata_predict_next(
                t2i_ids, pad, soi, eoi)
            Bl = lm_ids.shape[0]
            seg_l = seg_from_soi_eoi(lm_ids, soi, eoi)
            pad_l = jnp.zeros_like(seg_l)
            lp_l = jnp.full((Bl,), -1, jnp.int32)
            pf_l = jnp.zeros((Bl,), jnp.int32)
            seg_m, pad_m, lp_m, pf_m = metadata_mmu(mmu_ids, eoi)
            attn_meta = (
                tc.attn_impl,
                jnp.concatenate([seg_t, seg_l, seg_m], axis=0),
                jnp.concatenate([pad_t, pad_l, pad_m], axis=0),
                jnp.concatenate([lp_t, lp_l, lp_m], axis=0),
                jnp.concatenate([pf_t, pf_l, pf_m], axis=0))
        else:
            bias_t2i = omni_mask_predict_next(t2i_ids, pad_id=pad,
                                              soi_id=soi, eoi_id=eoi,
                                              rm_pad_in_image=True)
            bias_lm = omni_mask_predict_next(lm_ids, pad_id=pad, soi_id=soi,
                                             eoi_id=eoi,
                                             rm_pad_in_image=False)
            bias_mmu = omni_mask_mmu(mmu_ids, eoi_id=eoi)
            bias = jnp.concatenate([bias_t2i, bias_lm, bias_mmu], axis=0)

        def loss_fn(params):
            _, l_t2i, l_lm, l_mmu = showo_losses(
                cfg, params, input_ids, labels, bias,
                batch_size_t2i, batch_size_lm, batch_size_mmu,
                max_seq_length=tc.max_seq_length, attn_meta=attn_meta,
                remat=tc.remat)
            total = (tc.t2i_coeff * l_t2i + tc.lm_coeff * l_lm
                     + tc.mmu_coeff * l_mmu)
            return total, (l_t2i, l_lm, l_mmu)

        import optax

        (total, (l_t2i, l_lm, l_mmu)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, "loss_t2i": l_t2i, "loss_lm": l_lm,
                   "loss_mmu": l_mmu, "grad_norm": grad_norm,
                   "masking_rate": mask_prob.mean()}
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))


@dataclasses.dataclass
class ShowoTrainer:
    """Orchestration: data -> fused step -> metrics/checkpoints."""

    config: Any
    cfg: ShowoConfig
    vq_cfg: VQConfig
    params: Any
    vq_params: Any
    uni_prompting: Any
    mesh: Any = None

    def __post_init__(self):
        c = self.config
        tr = c.training
        opt_params = c.get_path("optimizer.params", {}) or {}
        self.tc = TrainConfig(
            learning_rate=tr.get("learning_rate",
                                 opt_params.get("learning_rate", 1e-4)),
            max_grad_norm=tr.get("max_grad_norm", 1.0),
            t2i_coeff=tr.get("t2i_coeff", 1.0),
            lm_coeff=tr.get("lm_coeff", 0.1),
            mmu_coeff=tr.get("mmu_coeff", 1.0),
            max_seq_length=c.dataset.preprocessing.max_seq_length,
            grad_accum_steps=int(tr.get("gradient_accumulation_steps", 1)),
            attn_impl=str(tr.get("attn_impl", "dense")),
            remat=str(tr.get("remat", "full")),
            optimizer=str(tr.get("optimizer", "adamw")),
        )
        from showo_tpu.training.lr_schedules import get_lr_schedule

        lr_cfg = c.get("lr_scheduler", {}) or {}
        lr = get_lr_schedule(
            lr_cfg.get("scheduler", "constant"),
            self.tc.learning_rate,
            num_warmup_steps=lr_cfg.get("params", {}).get("warmup_steps", 0),
            num_training_steps=tr.get("max_train_steps", 1),
        )
        self.optimizer = make_optimizer(self.tc, lr)
        self.state = TrainState(self.params, self.optimizer.init(self.params),
                                jnp.zeros((), jnp.int32))
        schedule = get_mask_schedule(tr.get("mask_schedule", "cosine"))
        self.step_fn = make_fused_train_step(
            self.cfg, self.vq_cfg, self.tc, self.optimizer,
            self.uni_prompting.sptids,
            tr.batch_size_t2i, tr.batch_size_lm, tr.batch_size_mmu,
            schedule, min_masking_rate=tr.get("min_masking_rate", 0.0),
            noise_type=tr.get("noise_type", "mask"),
            predict_all_tokens=tr.get("predict_all_tokens", False))
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

    def _init_ema(self, tr) -> None:
        """Optional parameter EMA (training.ema config block) — the
        reference ships EMAModel unwired (training_utils.py:61); here it
        is a config flag (beyond-parity)."""
        self.ema_state = None
        ema_cfg = tr.get("ema") or {}
        if ema_cfg.get("enabled", False):
            from showo_tpu.training.ema import (EMAConfig, ema_init,
                                                ema_update)

            ec = EMAConfig(
                decay=float(ema_cfg.get("decay", 0.9999)),
                min_decay=float(ema_cfg.get("min_decay", 0.0)),
                update_after_step=int(ema_cfg.get("update_after_step", 0)),
                use_ema_warmup=bool(ema_cfg.get("use_ema_warmup", False)))
            self.ema_state = ema_init(self.state.params)
            self._ema_update = jax.jit(
                lambda s, p: ema_update(ec, s, p), donate_argnums=(0,))

    def train_step(self, t2i_batch, lm_texts, mmu_batch, key):
        """One optimizer step from raw host batches."""
        uni = self.uni_prompting
        t2i_text = uni.t2i_text_block(t2i_batch["text"])
        L = t2i_text.shape[1] + self.cfg.num_vq_tokens + 2
        lm_ids, _, lm_labels = uni.lm_prompt(
            uni.text_tokenizer(list(lm_texts))["input_ids"], L)
        mmu_text, mmu_text_labels = uni.mmu_text_block(mmu_batch["text"])

        self.state, metrics = self.step_fn(
            self.state, self.vq_params,
            jnp.asarray(t2i_batch["image"]), jnp.asarray(t2i_text),
            jnp.asarray(lm_ids), jnp.asarray(lm_labels),
            jnp.asarray(mmu_batch["image"]), jnp.asarray(mmu_text),
            jnp.asarray(mmu_text_labels), key)
        # EMA tracks OPTIMIZER steps, not micro-steps: with gradient
        # accumulation the MultiSteps optimizer only changes params every
        # grad_accum_steps calls, so applying decay per micro-step would
        # shrink the configured decay horizon by that factor
        k = max(1, self.tc.grad_accum_steps)
        if self.ema_state is not None and (self.global_step + 1) % k == 0:
            self.ema_state = self._ema_update(self.ema_state,
                                              self.state.params)
        self.global_step += 1
        return metrics

    def generate_validation_images(self, prompts, key, output_dir: str):
        """Periodic T2I sampling during training (train.py:671-693,
        766-848 ``generate_images``)."""
        import os

        from showo_tpu.pipelines.t2i import T2IPipeline
        from showo_tpu.utils.image import to_pil_images

        tr = self.config.training
        pipe = T2IPipeline(
            cfg=self.cfg, params=self.state.params, vq_cfg=self.vq_cfg,
            vq_params=self.vq_params, uni_prompting=self.uni_prompting,
            guidance_scale=tr.get("guidance_scale", 1.5),
            timesteps=tr.get("generation_timesteps", 12),
            max_seq_length=self.tc.max_seq_length,
            resolution=self.config.dataset.params.get("resolution", 256))
        images = pipe.generate(list(prompts), key)
        gen_dir = os.path.join(output_dir, "samples")
        os.makedirs(gen_dir, exist_ok=True)
        pils = to_pil_images(images)
        for i, im in enumerate(pils):
            im.save(os.path.join(
                gen_dir, f"step{self.global_step:07d}_{i:02d}.png"))
        self.tracker.log({"val_images": len(pils)}, step=self.global_step)
        return images

    def visualize_predictions(self, t2i_batch, key, output_dir: str):
        """[original | VQ reconstruction | predicted] triptychs from the
        current t2i batch (train.py:715-763): re-run the step's corruption
        with the SAME key, take argmax over the codebook logits slice at
        the masked positions, decode all three."""
        import os

        from showo_tpu.models.showo import showo_forward
        from showo_tpu.utils.image import to_pil_images

        vq = MagvitV2(self.vq_cfg)
        cfg, tc = self.cfg, self.tc
        sp = self.uni_prompting.sptids
        pad, soi, eoi = sp["<|pad|>"], sp["<|soi|>"], sp["<|eoi|>"]
        tr = self.config.training
        schedule = get_mask_schedule(tr.get("mask_schedule", "cosine"))

        # jitted once per trainer: a fresh closure per call would be a
        # jit-cache miss and recompile the full forward every trigger
        if getattr(self, "_viz_fn", None) is not None:
            viz = self._viz_fn
            pixels = jnp.asarray(t2i_batch["image"])
            text_block = jnp.asarray(
                self.uni_prompting.t2i_text_block(t2i_batch["text"]))
            recon, predicted, mask_ratio = viz(
                self.state.params, self.vq_params, pixels, text_block, key)
            return self._save_viz(pixels, recon, predicted, mask_ratio,
                                  output_dir)

        @jax.jit
        def viz(params, vq_params, pixels, text_block, key):
            k_corrupt, = jax.random.split(key, 1)
            tokens = vq.apply({"params": vq_params}, pixels,
                              method=vq.get_code)
            noised, _, _, _ = mask_or_random_replace_tokens(
                k_corrupt, tokens, cfg.mask_token_id, schedule,
                min_masking_rate=tr.get("min_masking_rate", 0.0),
                codebook_size=cfg.codebook_size)
            img_unified = jnp.where(noised == cfg.mask_token_id,
                                    cfg.mask_token_id,
                                    noised + cfg.codebook_offset)
            ids, _ = assemble_t2i(text_block, img_unified, img_unified,
                                  soi, eoi, pad)
            bias = omni_mask_predict_next(ids, pad_id=pad, soi_id=soi,
                                          eoi_id=eoi, rm_pad_in_image=True)
            logits, _ = showo_forward(cfg, params, input_ids=ids,
                                      attention_bias=bias)
            n_vq = cfg.num_vq_tokens
            pred = jnp.argmax(
                logits[:, -(n_vq + 1):-1,
                       cfg.codebook_offset:cfg.codebook_offset
                       + cfg.codebook_size], axis=-1)
            is_masked = noised == cfg.mask_token_id
            predicted_tokens = jnp.where(is_masked, pred, tokens)
            mask_ratio = is_masked.mean(axis=-1)
            recon = vq.apply({"params": vq_params}, tokens,
                             method=vq.decode_code)
            predicted = vq.apply({"params": vq_params}, predicted_tokens,
                                 method=vq.decode_code)
            return recon, predicted, mask_ratio

        self._viz_fn = viz
        pixels = jnp.asarray(t2i_batch["image"])
        text_block = jnp.asarray(
            self.uni_prompting.t2i_text_block(t2i_batch["text"]))
        recon, predicted, mask_ratio = viz(self.state.params, self.vq_params,
                                           pixels, text_block, key)
        return self._save_viz(pixels, recon, predicted, mask_ratio,
                              output_dir)

    def _save_viz(self, pixels, recon, predicted, mask_ratio,
                  output_dir: str):
        import os

        from showo_tpu.utils.image import to_pil_images

        panel = np.concatenate([np.asarray(pixels, np.float32),
                                np.asarray(recon, np.float32),
                                np.asarray(predicted, np.float32)], axis=2)
        viz_dir = os.path.join(output_dir, "predictions")
        os.makedirs(viz_dir, exist_ok=True)
        for i, im in enumerate(to_pil_images(panel)):
            im.save(os.path.join(
                viz_dir, f"step{self.global_step:07d}_{i:02d}"
                f"_mask{float(mask_ratio[i]):.2f}.png"))
        self.tracker.log({"viz_mask_ratio": float(mask_ratio.mean())},
                         step=self.global_step)
        return panel

    def fit(self, t2i_loader, lm_loader, mmu_loader, max_steps: int,
            log_every: int = 50, save_every: Optional[int] = None,
            output_dir: str = "output",
            checkpoints_total_limit: Optional[int] = None, seed: int = 0,
            generate_every: Optional[int] = None,
            validation_prompts=None):
        from showo_tpu.utils.checkpoint import save_checkpoint

        base_key = jax.random.PRNGKey(seed)
        watch = Stopwatch()
        batch_time = AverageMeter()
        it = max_size_cycle_zip(t2i_loader, lm_loader, mmu_loader)
        for (t2i_b, lm_b, mmu_b) in it:
            # step key depends only on (seed, global_step): RNG-exact resume
            k, kg = jax.random.split(
                jax.random.fold_in(base_key, self.global_step))
            metrics = self.train_step(t2i_b, lm_b["input_ids"], mmu_b, k)
            batch_time.update(watch.lap())
            if self.global_step % log_every == 0:
                m = {k2: float(v) for k2, v in metrics.items()}
                m["batch_time"] = batch_time.avg
                m["samples_per_sec"] = (
                    (self.config.training.batch_size_t2i
                     + self.config.training.batch_size_lm
                     + self.config.training.batch_size_mmu)
                    / max(batch_time.avg, 1e-9))
                self.tracker.log(m, step=self.global_step)
                logger.info("step %d: %s", self.global_step, m)
            if save_every and self.global_step % save_every == 0:
                save_checkpoint(self.state, output_dir, self.global_step,
                                checkpoints_total_limit)
                if self.ema_state is not None:
                    import orbax.checkpoint as ocp

                    ocp.PyTreeCheckpointer().save(
                        os.path.join(os.path.abspath(output_dir),
                                     f"checkpoint-{self.global_step}",
                                     "ema_state"),
                        {"params": jax.device_get(self.ema_state.params),
                         "step": jax.device_get(self.ema_state.step)})
                from showo_tpu.data.loader import save_loader_state

                for name, ld in (("t2i", t2i_loader), ("lm", lm_loader),
                                 ("mmu", mmu_loader)):
                    if hasattr(ld, "state_dict"):
                        save_loader_state(ld, output_dir, self.global_step,
                                          name=name)
            if generate_every and self.global_step % generate_every == 0:
                if validation_prompts:
                    self.generate_validation_images(validation_prompts, kg,
                                                    output_dir)
                # original/recon/predicted triptych on the live batch
                # (train.py:683-693 visualize_predictions)
                self.visualize_predictions(t2i_b, k, output_dir)
            if self.global_step >= max_steps:
                break
        return self.state


def _build_loaders(config, tokenizer):
    """Dataloaders per config (train.py:271-412): t2i from ImageNet folder
    or tar shards, mmu from tar shards, lm from parquet."""
    from showo_tpu.data.loader import DataLoader
    from showo_tpu.data.refinedweb import RefinedWebDataset
    from showo_tpu.data.tar_shards import Text2ImageTarDataset

    p = config.dataset.params
    res = p.resolution
    tr = config.training

    if config.dataset.gen_type == "imagenet1k":
        from showo_tpu.data.imagenet import ImageNetDataset

        t2i_ds = ImageNetDataset(p.train_t2i_shards_path_or_url, res)
        t2i_iter = lambda: iter(t2i_ds)
    else:
        t2i_ds = Text2ImageTarDataset(p.train_t2i_shards_path_or_url, res,
                                      p.get("shuffle_buffer_size", 1000))
        t2i_iter = lambda: iter(t2i_ds)
    t2i_loader = DataLoader(t2i_iter, tr.batch_size_t2i)

    mmu_ds = Text2ImageTarDataset(p.train_mmu_shards_path_or_url, res,
                                  p.get("shuffle_buffer_size", 1000))
    mmu_loader = DataLoader(lambda: iter(mmu_ds), tr.batch_size_mmu)

    import jax

    lm_ds = RefinedWebDataset(p.train_lm_shards_path_or_url,
                              rank=jax.process_index(),
                              world_size=jax.process_count())
    lm_loader = DataLoader(lambda: iter(lm_ds), tr.batch_size_lm)
    return t2i_loader, lm_loader, mmu_loader


def main() -> None:
    """CLI: python -m showo_tpu.training.train_showo config=configs/showo_pretraining_stage1.yaml"""
    from showo_tpu.config import get_config
    from showo_tpu.inference_t2i import (build_showo_config, load_params,
                                         load_tokenizer, load_vq)
    from showo_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from showo_tpu.prompting import UniversalPrompting

    config = get_config()
    cfg = build_showo_config(config)
    params = load_params(config, cfg)
    vq_cfg, vq_params = load_vq(config)
    tokenizer = load_tokenizer(config)
    uni = UniversalPrompting(
        tokenizer, max_text_len=config.dataset.preprocessing.max_seq_length,
        cond_dropout_prob=config.training.cond_dropout_prob)

    par = config.get("parallel", {}) or {}
    mesh = make_mesh(dp=par.get("dp"), fsdp=par.get("fsdp", 1),
                     tp=par.get("tp", 1))
    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        trainer = ShowoTrainer(config=config, cfg=cfg, vq_cfg=vq_cfg,
                               params=params, vq_params=vq_params,
                               uni_prompting=uni, mesh=mesh)

        # resume
        if config.experiment.get("resume_from_checkpoint") == "latest":
            from showo_tpu.utils.checkpoint import resume_latest

            state, step = resume_latest(config.experiment.output_dir,
                                        trainer.state)
            if state is not None:
                trainer.state = jax.tree.map(jnp.asarray, state)
                trainer.global_step = step
                logger.info("resumed from step %d", step)
                if trainer.ema_state is not None:
                    # the EMA average must resume too — otherwise it
                    # silently restarts from the raw resumed params
                    import orbax.checkpoint as ocp

                    from showo_tpu.training.ema import EMAState

                    ema_path = os.path.join(
                        os.path.abspath(config.experiment.output_dir),
                        f"checkpoint-{step}", "ema_state")
                    if os.path.isdir(ema_path):
                        restored = ocp.PyTreeCheckpointer().restore(ema_path)
                        if isinstance(restored, dict) and "step" in restored:
                            trainer.ema_state = EMAState(
                                jax.tree.map(jnp.asarray, restored["params"]),
                                jnp.asarray(restored["step"], jnp.int32))
                        else:  # legacy params-only layout
                            trainer.ema_state = EMAState(
                                jax.tree.map(jnp.asarray, restored),
                                jnp.asarray(step, jnp.int32))
                        logger.info("restored EMA state at step %d", step)
                    else:
                        logger.warning(
                            "no ema_state in checkpoint-%d; EMA restarts "
                            "from the resumed raw params", step)

        from showo_tpu.config import snapshot_config

        snapshot_config(config, config.experiment.output_dir)
        t2i_loader, lm_loader, mmu_loader = _build_loaders(config, tokenizer)
        if trainer.global_step > 0:  # resumed: fast-forward data streams
            from showo_tpu.data.loader import restore_loader_state

            for name, ld in (("t2i", t2i_loader), ("lm", lm_loader),
                             ("mmu", mmu_loader)):
                if hasattr(ld, "load_state_dict"):
                    restore_loader_state(ld, config.experiment.output_dir,
                                         trainer.global_step, name=name)
        trainer.fit(t2i_loader, lm_loader, mmu_loader,
                    max_steps=config.training.max_train_steps,
                    log_every=config.experiment.get("log_every", 50),
                    save_every=config.experiment.get("save_every"),
                    output_dir=config.experiment.output_dir,
                    checkpoints_total_limit=config.experiment.get(
                        "checkpoints_total_limit"),
                    seed=config.training.get("seed", 0),
                    generate_every=config.experiment.get("generate_every"),
                    validation_prompts=load_validation_prompts(config))


def load_validation_prompts(config):
    """validation_prompts from config: inline list or a prompts file
    (train.py:672-683 config.dataset.params.validation_prompts_file)."""
    vp = config.dataset.params.get("validation_prompts_file")
    if vp:
        if not os.path.exists(str(vp)):
            # configured but absent (relative reference path): fall back
            # to the in-tree assets/validation list so trainer validation
            # hooks work without the reference checkout
            from showo_tpu.utils.assets import validation_prompts_file

            vp = validation_prompts_file(str(vp))
        if vp:
            with open(str(vp)) as f:
                return [ln.strip() for ln in f if ln.strip()]
    inline = config.get("validation_prompts")
    return list(inline) if inline else None


if __name__ == "__main__":
    main()

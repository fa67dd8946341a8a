"""Show-o2 stage-1 trainer (show-o2/train_stage_one.py equivalent).

One fused jitted step covers prepare_latents_and_labels + forward + update
(train_stage_one.py:345-471): frozen Wan-VAE encode, per-sample transport
corruption with the ``und_max_t0`` dampening for und samples (flow loss
zeroed when und_max_t0 == 1.0), the v2 omni mask from modality positions,
the Qwen2+DiT forward with NTP + flow losses, and AdamW with
substring-based parameter freezing (utils.py:75-80 ``_freeze_params``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.showo2 import Showo2Config, showo2_forward
from showo_tpu.show_o2.transport import Transport
from showo_tpu.show_o2.wan_vae import WanVAEConfig, wan_encode
from showo_tpu.utils.logging import Stopwatch, Tracker, get_logger

logger = get_logger(__name__)


def trainable_mask(params, frozen_substrings: Sequence[str]):
    """optax mask pytree: False where any substring matches the param path
    (the _freeze_params analogue)."""

    def pick(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return not any(s in name for s in frozen_substrings)

    return jax.tree_util.tree_map_with_path(pick, params)


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    learning_rate: float = 1e-4
    max_grad_norm: float = 1.0
    ntp_coeff: float = 0.2
    flow_coeff: float = 1.0
    und_max_t0: float = 1.0        # showo2_1.5b_stage_1_a.yaml und_max_t0
    weight_decay: float = 0.01
    warmup_steps: int = 0
    grad_accum_steps: int = 1      # gradient_accumulation_steps
    # "dense" | "pallas_trainable": the flash custom-VJP kernel — no
    # S x S scores in HBM; the lever for max_mixed_modal_seq_length=5120
    # and video training (showo2_1.5b_stage_1_a.yaml:66-75)
    attn_impl: str = "dense"
    # "adamw" (reference parity, fp32-dtype moments follow the params'
    # dtype) | "adamw_bf16" (bf16 moments: halves optimizer state) |
    # "adafactor" (factored second moment, ~zero state: the TPU-native
    # lever that fits 1.5B stage-1 training on ONE 16 GB chip, where
    # bf16-AdamW state alone is 14.4 GB — see STATUS.md)
    optimizer: str = "adamw"
    # remat ladder (utils/remat.py): "full" | "dots" | "qkv" | "qkv_fc1"
    # | "none" — lighter policies trade HBM for less backward recompute
    remat: str = "full"


def make_stage1_optimizer(sc: Stage1Config, params,
                          frozen_substrings: Sequence[str] = ()):
    lr = (optax.linear_schedule(0.0, sc.learning_rate, sc.warmup_steps)
          if sc.warmup_steps > 0 else sc.learning_rate)
    from showo_tpu.training.train_step import with_grad_accum

    if sc.optimizer == "adafactor":
        # factored second moment, no first moment: optimizer state is
        # ~2*D*sqrt-factors per matrix instead of 2 full copies — the
        # difference between "infeasible by arithmetic" and training
        # 1.5B stage-1 on one 16 GB v5e (bench.py metric=train_v2)
        inner = optax.adafactor(lr, weight_decay_rate=sc.weight_decay,
                                clipping_threshold=1.0)
    elif sc.optimizer == "adamw_bf16":
        inner = optax.adamw(lr, weight_decay=sc.weight_decay,
                            mu_dtype=jnp.bfloat16)
    else:
        inner = optax.adamw(lr, weight_decay=sc.weight_decay)
    base = optax.chain(
        optax.clip_by_global_norm(sc.max_grad_norm),
        inner,
    )
    if frozen_substrings:
        labels = jax.tree.map(lambda t: "train" if t else "freeze",
                              trainable_mask(params, frozen_substrings))
        base = optax.multi_transform(
            {"train": base, "freeze": optax.set_to_zero()}, labels)
    return with_grad_accum(base, sc.grad_accum_steps)


def make_stage1_step(cfg: Showo2Config, vae_cfg: WanVAEConfig,
                     sc: Stage1Config, transport: Transport, optimizer):
    """Fused step.  Batch (already collated, numpy/jax):
      text_tokens [B, L], text_labels [B, L],
      images [B, H, W, 3] pixels — or [B, T, H, W, 3] video batches, which
      take the reference's 5D path (train_stage_one.py:354-360: the VAE
      keeps its temporal axis and the joint video latents flow through the
      same corruption + forward),
      modality_positions [B, M, 2], image_masks [B, L],
      is_und [B] (1 for understanding samples -> t dampening).
    """

    def step(params, opt_state, vae_params, batch, key):
        k_vae, k_t, k_noise = jax.random.split(key, 3)
        B = batch["text_tokens"].shape[0]
        L = batch["text_tokens"].shape[1]

        # frozen VAE.  Images: [B,H,W,3] -> [B,C,1,h,w] -> [B,C,h,w];
        # videos: [B,T,H,W,3] -> [B,C,T',h,w] (temporal axis kept).
        is_video = batch["images"].ndim == 5
        if is_video:
            pixels = jnp.transpose(batch["images"], (0, 4, 1, 2, 3))
            latents = wan_encode(vae_cfg, vae_params, pixels, k_vae)
        else:
            pixels = jnp.transpose(batch["images"], (0, 3, 1, 2))[:, :, None]
            latents = wan_encode(vae_cfg, vae_params, pixels, k_vae)[:, :, 0]
        latents = jax.lax.stop_gradient(latents)

        # transport corruption.  und samples draw t via the reference's
        # max_t0 path — t0 = und_max_t0 set BEFORE the lognorm draw and
        # do_shift warp (reference transport.py:107-130) — selected
        # per-sample (train_stage_one.py:369-374).
        t_gen = transport.sample_t(k_t, B)
        image_masks = batch["image_masks"]
        if sc.und_max_t0 is not None:
            t_und = transport.sample_t(k_t, B, max_t0=sc.und_max_t0)
            t = jnp.where(batch["is_und"] > 0, t_und, t_gen)
            if sc.und_max_t0 == 1.0:
                # und samples are clean (t=1): zero their flow-loss rows
                # PER SAMPLE (train_stage_one.py:379-380 image_masks[i]*0.0)
                image_masks = image_masks * (1 - batch["is_und"])[:, None]
        else:
            t = t_gen
        x0 = jax.random.normal(k_noise, latents.shape, latents.dtype)
        _, xt, ut = transport.path_sampler.plan(t, x0, latents)

        attn_meta = None
        if sc.attn_impl.startswith("pallas"):
            from showo_tpu.ops.flash_attention import \
                seg_from_modality_positions

            seg = seg_from_modality_positions(batch["modality_positions"], L)
            attn_meta = (sc.attn_impl, seg, None, None, None)
            bias = None  # mask recomputed in-kernel from seg metadata
        else:
            bias = omni_attn_mask(batch["modality_positions"], L)

        def loss_fn(params):
            out = showo2_forward(
                cfg, params, batch["text_tokens"], xt, t, bias,
                batch["modality_positions"],
                text_labels=batch["text_labels"], image_labels=ut,
                image_masks=image_masks, remat=sc.remat,
                attn_meta=attn_meta)
            loss_flow = out["loss_flow"]
            total = sc.ntp_coeff * out["loss_ntp"] + sc.flow_coeff * loss_flow
            return total, (out["loss_ntp"], loss_flow)

        (total, (l_ntp, l_flow)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": total, "loss_ntp": l_ntp,
                                   "loss_flow": l_flow,
                                   "grad_norm": grad_norm}

    return jax.jit(step, donate_argnums=(0, 1))


@dataclasses.dataclass
class Stage1Trainer:
    cfg: Showo2Config
    vae_cfg: WanVAEConfig
    sc: Stage1Config
    params: Any
    vae_params: Any
    transport: Transport
    frozen_substrings: Sequence[str] = ()

    def __post_init__(self):
        self.optimizer = make_stage1_optimizer(self.sc, self.params,
                                               self.frozen_substrings)
        self.opt_state = self.optimizer.init(self.params)
        self.step_fn = make_stage1_step(self.cfg, self.vae_cfg, self.sc,
                                        self.transport, self.optimizer)
        self.global_step = 0

    def train_step(self, batch: Dict[str, np.ndarray], key):
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k not in ("texts", "data_type")}
        self.params, self.opt_state, metrics = self.step_fn(
            self.params, self.opt_state, self.vae_params, batch, key)
        self.global_step += 1
        return metrics

    def generate_validation_images(self, prompts, tokenizer, token_ids, key,
                                   output_dir: str, num_steps: int = 20,
                                   guidance_scale: float = 5.0):
        """Periodic ODE sampling during training (train_stage_one.py:602-698
        ``generate_images``)."""
        import os

        from showo_tpu.pipelines.t2i_v2 import T2IV2Pipeline
        from showo_tpu.utils.image import to_pil_images

        pipe = T2IV2Pipeline(
            cfg=self.cfg, params=self.params, vae_cfg=self.vae_cfg,
            vae_params=self.vae_params, tokenizer=tokenizer,
            token_ids=token_ids, guidance_scale=guidance_scale,
            num_steps=num_steps)
        images = pipe.generate(list(prompts), key)
        gen_dir = os.path.join(output_dir, "samples")
        os.makedirs(gen_dir, exist_ok=True)
        for i, im in enumerate(to_pil_images(images)):
            im.save(os.path.join(
                gen_dir, f"step{self.global_step:07d}_{i:02d}.png"))
        return images

    def visualize_reconstruction(self, pixels_nhwc, output_dir: str,
                                 key=None):
        """Side-by-side [input | VAE recon] panels saved per sample
        (train_stage_one.py:702-720 ``visualize_reconstruction``)."""
        import os

        from showo_tpu.show_o2.wan_vae import wan_decode, wan_encode
        from showo_tpu.utils.image import to_pil_images

        pix = jnp.transpose(jnp.asarray(pixels_nhwc), (0, 3, 1, 2))[:, :, None]
        z = wan_encode(self.vae_cfg, self.vae_params, pix, key)
        recon = wan_decode(self.vae_cfg, self.vae_params, z)[:, :, 0]
        recon = jnp.transpose(recon, (0, 2, 3, 1))
        panel = np.concatenate([np.asarray(pixels_nhwc, np.float32),
                                np.asarray(recon, np.float32)], axis=2)
        rec_dir = os.path.join(output_dir, "recon")
        os.makedirs(rec_dir, exist_ok=True)
        for i, im in enumerate(to_pil_images(panel)):
            im.save(os.path.join(
                rec_dir, f"step{self.global_step:07d}_{i:02d}.png"))
        return panel

    def visualize_reconstruction_video(self, videos_nthwc, output_dir: str,
                                       key=None):
        """Per-frame [input | recon] strips for video batches
        (train_stage_one.py:817-832)."""
        import os

        from showo_tpu.show_o2.wan_vae import wan_decode, wan_encode
        from showo_tpu.utils.image import to_pil_images

        vids = jnp.transpose(jnp.asarray(videos_nthwc), (0, 4, 1, 2, 3))
        z = wan_encode(self.vae_cfg, self.vae_params, vids, key)
        recon = wan_decode(self.vae_cfg, self.vae_params, z)
        recon = jnp.transpose(recon, (0, 2, 3, 4, 1))  # NTHWC
        panel = np.concatenate([np.asarray(videos_nthwc, np.float32),
                                np.asarray(recon, np.float32)], axis=3)
        rec_dir = os.path.join(output_dir, "recon_video")
        os.makedirs(rec_dir, exist_ok=True)
        for i in range(panel.shape[0]):
            for t, im in enumerate(to_pil_images(panel[i])):
                im.save(os.path.join(
                    rec_dir,
                    f"step{self.global_step:07d}_{i:02d}_f{t:03d}.png"))
        return panel

    def fit(self, mixed_loader, max_steps: int, log_every: int = 50,
            save_every: Optional[int] = None, output_dir: str = "output",
            seed: int = 0, tracker: Optional[Tracker] = None,
            generate_every: Optional[int] = None,
            validation_prompts: Sequence[str] = (),
            tokenizer=None, token_ids=None):
        """Train loop with the reference's periodic hooks
        (train_stage_one.py:528-576): metric logging, checkpointing, and —
        every ``generate_every`` steps — ODE sampling of
        ``validation_prompts`` plus a VAE reconstruction panel of the
        current batch."""
        from showo_tpu.utils.checkpoint import save_checkpoint

        base_key = jax.random.PRNGKey(seed)
        for batch in mixed_loader:
            # RNG-exact resume: the step key depends only on (seed,
            # global_step), so a resumed run replays the same corruption /
            # noise sequence it would have seen uninterrupted.
            k, k_gen, k_rec = jax.random.split(
                jax.random.fold_in(base_key, self.global_step), 3)
            is_und = np.asarray(
                [1 if d == "mmu" else 0 for d in batch.get(
                    "data_type", ["t2i"] * len(batch["text_tokens"]))],
                np.int32)
            batch = dict(batch, is_und=is_und)
            metrics = self.train_step(batch, k)
            if self.global_step % log_every == 0:
                m = {k2: float(v) for k2, v in metrics.items()}
                logger.info("step %d: %s", self.global_step, m)
                if tracker:
                    tracker.log(m, step=self.global_step)
            if save_every and self.global_step % save_every == 0:
                save_checkpoint((self.params, self.opt_state), output_dir,
                                self.global_step)
                if hasattr(mixed_loader, "state_dict"):
                    from showo_tpu.data.loader import save_loader_state

                    save_loader_state(mixed_loader, output_dir,
                                      self.global_step)
            if generate_every and self.global_step % generate_every == 0:
                if validation_prompts and tokenizer is not None:
                    self.generate_validation_images(
                        validation_prompts, tokenizer, token_ids, k_gen,
                        output_dir)
                if "images" in batch:
                    imgs = np.asarray(batch["images"])
                    if imgs.ndim == 4:  # [B, H, W, 3]
                        self.visualize_reconstruction(imgs, output_dir, k_rec)
                    elif imgs.ndim == 5:  # [B, T, H, W, 3]
                        self.visualize_reconstruction_video(imgs, output_dir,
                                                            k_rec)
            if self.global_step >= max_steps:
                break


def main() -> None:
    """CLI: python -m showo_tpu.show_o2.train_stage_one config=configs/showo2_1.5b_stage_1_a.yaml"""
    import jax.numpy as jnp

    from showo_tpu.config import get_config
    from showo_tpu.data.image_text import create_imagetext_dataloader
    from showo_tpu.data.mixed import MixedDataLoader
    from showo_tpu.inference_t2i_v2 import (build_showo2_config,
                                            load_tokenizer_and_ids)
    from showo_tpu.show_o2.showo2 import init_showo2_params
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params

    config = get_config()
    cfg = build_showo2_config(config)
    tokenizer, token_ids = load_tokenizer_and_ids(config)

    import os

    ckpt = config.model.showo.get("pretrained_model_path", "random")
    if ckpt != "random" and os.path.exists(str(ckpt)):
        from showo_tpu.utils.checkpoint import _load_dir_or_file
        from showo_tpu.utils.torch_import import showo2_params_from_torch

        params = jax.tree.map(jnp.asarray, showo2_params_from_torch(
            _load_dir_or_file(str(ckpt))))
    else:
        logger.warning("random-init Showo2 (%s)", ckpt)
        params = init_showo2_params(cfg, jax.random.PRNGKey(0))

    vae_cfg = WanVAEConfig()
    vae_path = config.model.vae_model.pretrained_model_path
    if os.path.exists(str(vae_path)):
        from showo_tpu.utils.checkpoint import load_wan_vae_weights

        vae_params = jax.tree.map(jnp.asarray,
                                  load_wan_vae_weights(str(vae_path)))
    else:
        logger.warning("random-init WanVAE (%s)", vae_path)
        vae_params = init_wan_vae_params(vae_cfg, jax.random.PRNGKey(1))

    tr = config.training
    sc = Stage1Config(
        learning_rate=float(tr.get("learning_rate", 1e-4)),
        max_grad_norm=float(tr.get("max_grad_norm", 1.0)),
        ntp_coeff=float(tr.get("ntp_coeff", 0.2)),
        flow_coeff=float(tr.get("flow_coeff", 1.0)),
        und_max_t0=tr.get("und_max_t0", 1.0),
        warmup_steps=int(tr.get("warmup_steps", 0)),
        grad_accum_steps=int(tr.get("gradient_accumulation_steps", 1)),
        attn_impl=str(tr.get("attn_impl", "dense")),
        optimizer=str(tr.get("optimizer", "adamw")))

    n_img = config.dataset.preprocessing.num_t2i_image_tokens \
        + (1 if cfg.add_time_embeds else 0)
    transport = Transport(snr_type=config.transport.get("snr_type", "lognorm"),
                          do_shift=config.transport.get("do_shift", True),
                          seq_len=n_img)

    trainer = Stage1Trainer(
        cfg=cfg, vae_cfg=vae_cfg, sc=sc, params=params,
        vae_params=vae_params, transport=transport,
        frozen_substrings=tuple(config.model.get("frozen_params", [])))

    dp = config.dataset.params
    loaders = []
    for key_name, bs, dtype in (
            (dp.get("t2i_jsonl"), tr.get("batch_size_t2i", 1), "t2i"),
            (dp.get("mmu_jsonl"), tr.get("batch_size_mmu", 1), "mmu")):
        if key_name:
            loaders.append(create_imagetext_dataloader(
                key_name, tokenizer, token_ids, batch_size=bs,
                resolution=config.dataset.preprocessing.resolution,
                num_image_tokens=n_img,
                max_seq_len=config.dataset.preprocessing.max_seq_length,
                default_data_type=dtype))
    from showo_tpu.config import snapshot_config

    snapshot_config(config, config.experiment.output_dir)
    mixed = MixedDataLoader(loaders, mode="concat_max_size_cycle")

    # resume_from_checkpoint='latest' (train_stage_one.py:269-299): restore
    # params+opt state, derive global_step, fast-forward the data stream
    if config.experiment.get("resume_from_checkpoint") == "latest":
        from showo_tpu.data.loader import restore_loader_state
        from showo_tpu.utils.checkpoint import resume_latest

        state, step = resume_latest(config.experiment.output_dir,
                                    (trainer.params, trainer.opt_state),
                                    params_only_fallback=True)
        if state is not None:
            trainer.params, trainer.opt_state = jax.tree.map(
                jnp.asarray, state)
            trainer.global_step = step
            restore_loader_state(mixed, config.experiment.output_dir, step)
            logger.info("resumed from step %d", step)

    from showo_tpu.training.train_showo import load_validation_prompts
    from showo_tpu.utils.logging import resolve_wandb_run_id

    wandb_on = bool(config.get("wandb_enabled", False))
    run_id, resume = resolve_wandb_run_id(config, config.experiment.output_dir,
                                          enabled=wandb_on)
    tracker = Tracker(project=config.experiment.project,
                      name=config.experiment.name,
                      enabled=wandb_on,
                      run_id=run_id, resume=resume)
    trainer.fit(mixed, max_steps=int(tr.max_train_steps),
                log_every=int(config.experiment.get("log_every", 50)),
                save_every=config.experiment.get("save_every"),
                output_dir=config.experiment.output_dir,
                seed=int(tr.get("seed", 0)), tracker=tracker,
                generate_every=config.experiment.get("generate_every"),
                validation_prompts=load_validation_prompts(config) or (),
                tokenizer=tokenizer, token_ids=token_ids)


if __name__ == "__main__":
    main()

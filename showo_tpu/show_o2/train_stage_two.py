"""Show-o2 stage-2 trainer (show-o2/train_stage_two.py equivalent).

Instruction tuning on MMU conversations: same fused step as stage one,
but with the reference's 3-group optimizer — separate learning rates for
{und_trans / embedders / position embedding}, {fusion_proj}, and
{showo + diffusion head} (train_stage_two.py ~:157-180) — expressed as an
optax.multi_transform over path-matched groups.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import optax

from showo_tpu.show_o2.showo2 import Showo2Config
from showo_tpu.show_o2.train_stage_one import Stage1Config, Stage1Trainer
from showo_tpu.show_o2.transport import Transport
from showo_tpu.show_o2.wan_vae import WanVAEConfig

GROUP_UND = ("und_trans", "image_embedder_und", "image_embedder_gen",
             "pos_embed")
GROUP_FUSION = ("fusion_proj",)


def param_groups(params):
    """Label pytree: 'und' / 'fusion' / 'main'."""

    def pick(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if any(s in name for s in GROUP_UND):
            return "und"
        if any(s in name for s in GROUP_FUSION):
            return "fusion"
        return "main"

    return jax.tree_util.tree_map_with_path(pick, params)


@dataclasses.dataclass(frozen=True)
class Stage2Config(Stage1Config):
    lr_und: float = 1e-5
    lr_fusion: float = 5e-5
    lr_main: float = 1e-4


def make_stage2_optimizer(sc: Stage2Config, params,
                          frozen_substrings: Sequence[str] = ()):
    def adamw(lr):
        return optax.chain(optax.clip_by_global_norm(sc.max_grad_norm),
                           optax.adamw(lr, weight_decay=sc.weight_decay))

    labels = param_groups(params)
    if frozen_substrings:
        from showo_tpu.show_o2.train_stage_one import trainable_mask

        mask = trainable_mask(params, frozen_substrings)
        labels = jax.tree.map(lambda g, t: g if t else "freeze", labels, mask)
    from showo_tpu.training.train_step import with_grad_accum

    return with_grad_accum(optax.multi_transform(
        {"und": adamw(sc.lr_und), "fusion": adamw(sc.lr_fusion),
         "main": adamw(sc.lr_main), "freeze": optax.set_to_zero()}, labels),
        sc.grad_accum_steps)


@dataclasses.dataclass
class Stage2Trainer(Stage1Trainer):
    """Pass a Stage2Config as ``sc``."""

    def __post_init__(self):
        from showo_tpu.show_o2.train_stage_one import make_stage1_step

        self.optimizer = make_stage2_optimizer(self.sc, self.params,
                                               self.frozen_substrings)
        self.opt_state = self.optimizer.init(self.params)
        self.step_fn = make_stage1_step(self.cfg, self.vae_cfg, self.sc,
                                        self.transport, self.optimizer)
        self.global_step = 0


def main() -> None:
    """CLI: python -m showo_tpu.show_o2.train_stage_two
    config=configs/showo2_1.5b_stage_2_a.yaml — the stage-2 recipe
    (show-o2/train_stage_two.py): all towers trainable with 3 LR groups
    (und / fusion-projector / main), und_max_t0=1.0 (flow loss off for
    pure-und batches)."""
    import os

    import jax.numpy as jnp

    from showo_tpu.config import get_config, snapshot_config
    from showo_tpu.data.image_text import create_imagetext_dataloader
    from showo_tpu.data.loader import restore_loader_state
    from showo_tpu.data.mixed import MixedDataLoader
    from showo_tpu.inference_t2i_v2 import (build_showo2_config,
                                            load_tokenizer_and_ids)
    from showo_tpu.show_o2.showo2 import init_showo2_params
    from showo_tpu.show_o2.transport import Transport
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params
    from showo_tpu.utils.checkpoint import resume_latest
    from showo_tpu.utils.logging import get_logger

    logger = get_logger(__name__)
    config = get_config()
    cfg = build_showo2_config(config)
    tokenizer, token_ids = load_tokenizer_and_ids(config)

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
    sc = Stage2Config(
        lr_und=float(tr.get("learning_rate_ve", 5e-5)),
        lr_fusion=float(tr.get("learning_rate_proj", 5e-5)),
        lr_main=float(tr.get("learning_rate_showo", 5e-5)),
        max_grad_norm=float(tr.get("max_grad_norm", 1.0)),
        ntp_coeff=float(tr.get("ntp_coeff", 0.2)),
        flow_coeff=float(tr.get("flow_coeff", 1.0)),
        und_max_t0=tr.get("und_max_t0", 1.0),
        grad_accum_steps=int(tr.get("gradient_accumulation_steps", 1)),
        attn_impl=str(tr.get("attn_impl", "dense")))

    n_img = config.dataset.preprocessing.num_t2i_image_tokens \
        + (1 if cfg.add_time_embeds else 0)
    transport = Transport(snr_type=config.transport.get("snr_type", "lognorm"),
                          do_shift=config.transport.get("do_shift", True),
                          seq_len=n_img)

    trainer = Stage2Trainer(
        cfg=cfg, vae_cfg=vae_cfg, sc=sc, params=params,
        vae_params=vae_params, transport=transport,
        frozen_substrings=tuple(config.model.get("frozen_params", [])))

    dp = config.dataset.params
    loaders = []
    if dp.get("t2i_jsonl"):
        loaders.append(create_imagetext_dataloader(
            dp.t2i_jsonl, tokenizer, token_ids,
            batch_size=tr.batch_size_t2i,
            resolution=config.dataset.preprocessing.resolution,
            num_image_tokens=n_img,
            max_seq_len=config.dataset.preprocessing.max_seq_length,
            default_data_type="t2i"))
    # und flow: LLaVA-OneVision-style conversations (MMUDataset, reference
    # train_stage_two.py) when annotation_path is set; jsonl captions as a
    # fallback
    if dp.get("annotation_path"):
        from showo_tpu.data.loader import CheckpointableDataLoader
        from showo_tpu.data.mmu_dataset import MMUDataset

        mmu_ds = MMUDataset(
            dp.annotation_path, dp.get("mmu_image_root", ""), tokenizer,
            token_ids, resolution=config.dataset.preprocessing.resolution,
            num_image_tokens=n_img,
            max_seq_len=config.dataset.preprocessing.max_seq_length,
            stage=config.get("stage", "tuning"))
        loaders.append(CheckpointableDataLoader(
            lambda: iter(mmu_ds), batch_size=tr.batch_size_mmu))
    elif dp.get("mmu_jsonl"):
        loaders.append(create_imagetext_dataloader(
            dp.mmu_jsonl, tokenizer, token_ids,
            batch_size=tr.batch_size_mmu,
            resolution=config.dataset.preprocessing.resolution,
            num_image_tokens=n_img,
            max_seq_len=config.dataset.preprocessing.max_seq_length,
            default_data_type="mmu"))
    mixed = MixedDataLoader(loaders, mode="concat_max_size_cycle")

    snapshot_config(config, config.experiment.output_dir)
    if config.experiment.get("resume_from_checkpoint") == "latest":
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

    trainer.fit(mixed, max_steps=int(tr.get("max_train_steps") or 10000),
                log_every=int(config.experiment.get("log_every", 50)),
                save_every=config.experiment.get("save_every"),
                output_dir=config.experiment.output_dir,
                seed=int(tr.get("seed", 0)),
                generate_every=config.experiment.get("generate_every"),
                validation_prompts=load_validation_prompts(config) or (),
                tokenizer=tokenizer, token_ids=token_ids)


if __name__ == "__main__":
    main()

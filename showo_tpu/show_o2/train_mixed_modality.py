"""Show-o2 mixed-modality (interleaved) trainer
(show-o2/train_mixed_modality_simple.py equivalent).

VIST-style interleaved batches carry up to M images per sample
([B, M, H, W, 3] pixels + [B, M, 2] modality positions, (0,0)-padded).
The fused step encodes all images through the frozen VAE, applies
per-image transport corruption, scatters the noisy latents into their
spans, and trains NTP + flow losses.  The two-phase recipe (freeze the
und path, then unfreeze, show-o2/README.md:293-309) is expressed with
``frozen_substrings``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.showo2 import Showo2Config, showo2_forward
from showo_tpu.show_o2.train_stage_one import Stage1Config, make_stage1_optimizer
from showo_tpu.show_o2.transport import Transport
from showo_tpu.show_o2.wan_vae import WanVAEConfig, wan_encode
from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def make_mixed_modal_step(cfg: Showo2Config, vae_cfg: WanVAEConfig,
                          sc: Stage1Config, transport: Transport, optimizer):
    """Batch: text_tokens [B, L], text_labels [B, L],
    images [B, M, H, W, 3], modality_positions [B, M, 2],
    image_masks [B, L]."""

    def step(params, opt_state, vae_params, batch, key):
        k_vae, k_t, k_noise = jax.random.split(key, 3)
        B, M = batch["modality_positions"].shape[:2]
        L = batch["text_tokens"].shape[1]

        pixels = batch["images"].reshape(B * M, *batch["images"].shape[2:])
        pixels = jnp.transpose(pixels, (0, 3, 1, 2))[:, :, None]
        latents = wan_encode(vae_cfg, vae_params, pixels, k_vae)[:, :, 0]
        latents = jax.lax.stop_gradient(latents)  # [B*M, C, h, w]

        t = transport.sample_t(k_t, B * M)
        # idle (0,0) spans get t=1 (clean, excluded from loss by image_masks)
        lengths = batch["modality_positions"][:, :, 1].reshape(-1)
        t = jnp.where(lengths > 0, t, 1.0)
        x0 = jax.random.normal(k_noise, latents.shape, latents.dtype)
        _, xt, ut = transport.path_sampler.plan(t, x0, latents)

        bias = omni_attn_mask(batch["modality_positions"], L)

        def loss_fn(params):
            out = showo2_forward(
                cfg, params, batch["text_tokens"], xt, t, bias,
                batch["modality_positions"],
                text_labels=batch["text_labels"], image_labels=ut,
                image_masks=batch["image_masks"], remat=True)
            total = (sc.ntp_coeff * out["loss_ntp"]
                     + sc.flow_coeff * out["loss_flow"])
            return total, (out["loss_ntp"], out["loss_flow"])

        (total, (l_ntp, l_flow)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": total, "loss_ntp": l_ntp,
                                   "loss_flow": l_flow}

    return jax.jit(step, donate_argnums=(0, 1))


@dataclasses.dataclass
class MixedModalTrainer:
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
        self.step_fn = make_mixed_modal_step(self.cfg, self.vae_cfg, self.sc,
                                             self.transport, self.optimizer)
        self.global_step = 0

    def train_step(self, batch: Dict[str, np.ndarray], key):
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k not in ("texts", "data_type")}
        self.params, self.opt_state, metrics = self.step_fn(
            self.params, self.opt_state, self.vae_params, batch, key)
        self.global_step += 1
        return metrics

    def fit(self, loader, max_steps: int, log_every: int = 50,
            save_every=None, output_dir: str = "output", seed: int = 0):
        from showo_tpu.utils.checkpoint import save_checkpoint

        base_key = jax.random.PRNGKey(seed)
        for batch in loader:
            # RNG-exact resume: key depends only on (seed, global_step)
            k = jax.random.fold_in(base_key, self.global_step)
            metrics = self.train_step(batch, k)
            if self.global_step % log_every == 0:
                logger.info("step %d: %s", self.global_step,
                            {k2: float(v) for k2, v in metrics.items()})
            if save_every and self.global_step % save_every == 0:
                save_checkpoint((self.params, self.opt_state), output_dir,
                                self.global_step)
                if hasattr(loader, "state_dict"):
                    from showo_tpu.data.loader import save_loader_state

                    save_loader_state(loader, output_dir, self.global_step)
            if self.global_step >= max_steps:
                break

def main() -> None:
    """CLI: python -m showo_tpu.show_o2.train_mixed_modality
    config=configs/showo2_1.5b_downstream_mixed_modality_simple.yaml

    The reference's two-phase recipe (show-o2/README.md:293-309) is two
    invocations of this CLI: first with
    frozen_params=['image_embedder_und','und_trans','showo',
    'position_embedding'], then with frozen_params=null +
    resume_from_checkpoint=latest and a larger max_train_steps
    (train_mixed_modality_simple.py:56-844)."""
    import os

    import jax.numpy as jnp

    from showo_tpu.config import get_config, snapshot_config
    from showo_tpu.data.loader import (DataLoader, restore_loader_state,
                                       save_loader_state)
    from showo_tpu.data.vist_dataset import VISTDataset
    from showo_tpu.inference_t2i_v2 import (build_showo2_config,
                                            load_tokenizer_and_ids)
    from showo_tpu.show_o2.showo2 import init_showo2_params
    from showo_tpu.show_o2.wan_vae import init_wan_vae_params
    from showo_tpu.utils.checkpoint import resume_latest

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
    sc = Stage1Config(
        learning_rate=float(tr.get("learning_rate", 1e-4)),
        max_grad_norm=float(tr.get("max_grad_norm", 1.0)),
        ntp_coeff=float(tr.get("ntp_coeff", 1.0)),
        flow_coeff=float(tr.get("flow_coeff", 1.0)),
        und_max_t0=tr.get("und_max_t0", 1.0),
        warmup_steps=int(tr.get("warmup_steps", 0)),
        grad_accum_steps=int(tr.get("gradient_accumulation_steps", 1)),
        attn_impl=str(tr.get("attn_impl", "dense")))

    pre = config.dataset.preprocessing
    n_img = pre.num_t2i_image_tokens + (1 if cfg.add_time_embeds else 0)
    transport = Transport(snr_type=config.transport.get("snr_type", "lognorm"),
                          do_shift=config.transport.get("do_shift", True),
                          seq_len=n_img)

    trainer = MixedModalTrainer(
        cfg=cfg, vae_cfg=vae_cfg, sc=sc, params=params,
        vae_params=vae_params, transport=transport,
        frozen_substrings=tuple(config.model.get("frozen_params") or ()))

    dp = config.dataset.params
    ds = VISTDataset(
        dp.mixed_modal_json, dp.get("mixed_modal_image_root", ""),
        tokenizer, token_ids, resolution=pre.resolution,
        num_image_tokens=n_img,
        max_seq_len=pre.get("max_mixed_modal_seq_length",
                            pre.max_seq_length),
        max_num_images=int(pre.get("max_num_images", 5)))
    from showo_tpu.data.loader import CheckpointableDataLoader

    loader = CheckpointableDataLoader(
        lambda: iter(ds), batch_size=int(tr.get("batch_size_mixed_modal", 1)))

    snapshot_config(config, config.experiment.output_dir)
    if config.experiment.get("resume_from_checkpoint") == "latest":
        state, step = resume_latest(config.experiment.output_dir,
                                    (trainer.params, trainer.opt_state),
                                    params_only_fallback=True)
        if state is not None:
            trainer.params, trainer.opt_state = jax.tree.map(
                jnp.asarray, state)
            trainer.global_step = step
            restore_loader_state(loader, config.experiment.output_dir, step)
            logger.info("resumed from step %d", step)

    trainer.fit(loader, max_steps=int(tr.max_train_steps),
                log_every=int(config.experiment.get("log_every", 50)),
                save_every=config.experiment.get("save_every"),
                output_dir=config.experiment.output_dir,
                seed=int(tr.get("seed", 0)))


if __name__ == "__main__":
    main()

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

        key = jax.random.PRNGKey(seed)
        for batch in loader:
            key, k = jax.random.split(key)
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

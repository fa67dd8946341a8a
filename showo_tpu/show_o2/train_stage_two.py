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
    return optax.multi_transform(
        {"und": adamw(sc.lr_und), "fusion": adamw(sc.lr_fusion),
         "main": adamw(sc.lr_main), "freeze": optax.set_to_zero()}, labels)


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

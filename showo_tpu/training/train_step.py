"""Unified training step: one pjit-compiled function per optimizer step.

The reference's per-step pipeline (training/train.py:496-618) — VQ encode,
corruption, prompting, three mask builders, fused forward, weighted loss,
grad clip, AdamW — collapses here into a single compiled function over a
("dp", "fsdp", "tp") mesh.  Optimizer state inherits the parameters'
fsdp sharding (the ZeRO-2 analogue).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from showo_tpu.models.showo import ShowoConfig, showo_losses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    t2i_coeff: float = 1.0
    lm_coeff: float = 0.1
    mmu_coeff: float = 1.0
    max_seq_length: int = 128
    grad_accum_steps: int = 1
    # "dense" | "pallas_trainable": flash custom-VJP attention — avoids
    # the transient fp32 [B,H,S,S] score tensors in fwd/bwd (the lever
    # for 512px training, S=1155)
    attn_impl: str = "dense"
    # rematerialization policy for the layer stack:
    #   "full" — jax.checkpoint per layer, recompute everything (lowest
    #            memory, the r1/r2 default);
    #   "dots" — save matmul outputs, recompute norms/elementwise
    #            (jax.checkpoint_policies.dots_with_no_batch_dims_saveable);
    #   "qkv" / "qkv_fc1" — save only the named projections
    #            (models/phi.py checkpoint_name tags), recompute the rest
    #   "none" — no remat (fastest when activations fit HBM)
    remat: str = "full"
    # "adamw" (reference parity) | "adamw_bf16" (bf16 first moment) |
    # "adafactor" (factored second moment, ~zero state: frees the 5.2 GB
    # AdamW moments on a 16 GB chip, buying room for the lighter remat
    # policies above — the TPU throughput-mode recipe)
    optimizer: str = "adamw"


def with_grad_accum(optimizer: optax.GradientTransformation,
                    grad_accum_steps: int) -> optax.GradientTransformation:
    """Gradient accumulation (reference train.py:589 accelerator.accumulate;
    train_stage_one.py:453-471 manual ``% grad_accum``): each call
    accumulates the mean gradient, the wrapped update (incl. clipping)
    fires every ``grad_accum_steps`` calls — identical math to the
    reference's sum of loss/k backwards."""
    if grad_accum_steps <= 1:
        return optimizer
    return optax.MultiSteps(optimizer, every_k_schedule=grad_accum_steps)


def make_optimizer(tc: TrainConfig, lr_schedule=None) -> optax.GradientTransformation:
    # max_grad_norm: null disables clipping (reference
    # showo_pretraining_stage2.yaml max_grad_norm: null)
    clip = ([optax.clip_by_global_norm(tc.max_grad_norm)]
            if tc.max_grad_norm else [])
    lr = lr_schedule if lr_schedule is not None else tc.learning_rate
    opt_name = getattr(tc, "optimizer", "adamw")
    if opt_name == "adafactor":
        inner = optax.adafactor(lr, weight_decay_rate=tc.weight_decay,
                                clipping_threshold=1.0)
    elif opt_name == "adamw_bf16":
        import jax.numpy as jnp

        inner = optax.adamw(lr, b1=tc.adam_beta1, b2=tc.adam_beta2,
                            eps=tc.adam_eps, weight_decay=tc.weight_decay,
                            mu_dtype=jnp.bfloat16)
    else:
        inner = optax.adamw(lr, b1=tc.adam_beta1, b2=tc.adam_beta2,
                            eps=tc.adam_eps, weight_decay=tc.weight_decay)
    return with_grad_accum(optax.chain(*clip, inner), tc.grad_accum_steps)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    cfg: ShowoConfig,
    tc: TrainConfig,
    optimizer: optax.GradientTransformation,
    batch_size_t2i: int,
    batch_size_lm: int,
    batch_size_mmu: int,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One fused optimizer step.

    batch: {"input_ids": [B, L], "labels": [B, L], "bias": [B, 1, L, L]}
    laid out [t2i | lm | mmu] along the batch axis (train.py:589-600).
    """

    def loss_fn(params):
        _, l_t2i, l_lm, l_mmu = showo_losses(
            cfg, params, batch["input_ids"], batch["labels"], batch["bias"],
            batch_size_t2i, batch_size_lm, batch_size_mmu,
            max_seq_length=tc.max_seq_length)
        total = tc.t2i_coeff * l_t2i + tc.lm_coeff * l_lm + tc.mmu_coeff * l_mmu
        return total, (l_t2i, l_lm, l_mmu)

    (total, (l_t2i, l_lm, l_mmu)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    grad_norm = optax.global_norm(grads)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {"loss": total, "loss_t2i": l_t2i, "loss_lm": l_lm,
               "loss_mmu": l_mmu, "grad_norm": grad_norm}
    return TrainState(params, opt_state, state.step + 1), metrics


def make_jitted_train_step(cfg: ShowoConfig, tc: TrainConfig, optimizer,
                           batch_size_t2i: int, batch_size_lm: int,
                           batch_size_mmu: int, donate: bool = True):
    fn = partial(train_step, cfg=cfg, tc=tc, optimizer=optimizer,
                 batch_size_t2i=batch_size_t2i, batch_size_lm=batch_size_lm,
                 batch_size_mmu=batch_size_mmu)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())

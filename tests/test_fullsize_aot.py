"""Full-size AOT compile smokes for every flagship config (VERDICT r2
item 8).

All golden parity fixtures are tiny-dim; these compile the REAL-size
programs with abstract weights so transcription errors that only
manifest at full scale (rope table extents, vocab-slice boundaries,
patch/latent geometry) break the suite instead of the first real run:

  * Show-o 1.3B forward at 256^2 (S=387) and 512^2 (S=1155), 1-device
    and 8-device meshes
  * Show-o 1.3B fused train step (recipe batch 15+4+10) on the 8-device
    mesh
  * Show-o2 1.5B velocity step at 432^2 and the 1024^2 HQ geometry
  * Show-o2 1.5B stage-1 train step on the fsdp=8 mesh (single-chip
    training is infeasible by arithmetic: 14.4 GB params+moments)

Compile-only (jit.lower(...).compile() with ShapeDtypeStructs), marked
slow.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, init_showo_params, showo_forward
from showo_tpu.parallel.mesh import make_mesh, param_sharding_rules

pytestmark = pytest.mark.slow


def _abs_sharded(init_fn, mesh):
    abs_p = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    sh = param_sharding_rules(abs_p, mesh)
    attach = lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s)
    return jax.tree.map(attach, abs_p, sh), sh


def _abs_rep(init_fn):
    return jax.eval_shape(init_fn, jax.random.PRNGKey(0))


@pytest.mark.parametrize("vq_tokens,n_dev", [(256, 1), (256, 8),
                                             (1024, 1), (1024, 8)])
def test_v1_forward_fullsize_compiles(vq_tokens, n_dev):
    cfg = ShowoConfig(num_vq_tokens=vq_tokens)
    S = 131 + vq_tokens + 2
    B = 2

    def fn(params, ids, bias):
        logits, _ = showo_forward(cfg, params, input_ids=ids,
                                  attention_bias=bias)
        return logits

    init = lambda k: init_showo_params(cfg, k, jnp.bfloat16)
    if n_dev == 1:
        abs_p = _abs_rep(init)
        ids = jax.ShapeDtypeStruct((B, S), jnp.int32)
        bias = jax.ShapeDtypeStruct((B, 1, S, S), jnp.bfloat16)
        compiled = jax.jit(fn).lower(abs_p, ids, bias).compile()
    else:
        mesh = make_mesh(dp=2, fsdp=2, tp=2)
        abs_p, _ = _abs_sharded(init, mesh)
        bsh = NamedSharding(mesh, P(("dp", "fsdp")))
        ids = jax.ShapeDtypeStruct((8, S), jnp.int32, sharding=bsh)
        bias = jax.ShapeDtypeStruct((8, 1, S, S), jnp.bfloat16, sharding=bsh)
        with jax.set_mesh(mesh):
            compiled = jax.jit(fn).lower(abs_p, ids, bias).compile()
    assert compiled.memory_analysis().temp_size_in_bytes > 0


def test_v1_train_step_fullsize_compiles_sharded():
    """The real pretraining recipe: per-chip batch 15 t2i + 4 lm +
    10 mmu at 256^2 (configs/showo_pretraining_stage1.yaml:83-103),
    AdamW, full-size 1.3B weights, dp=4 x fsdp=2."""
    from showo_tpu.models.magvit import MagvitV2, VQConfig
    from showo_tpu.sampling.schedules import cosine_schedule
    from showo_tpu.training.train_showo import make_fused_train_step
    from showo_tpu.training.train_step import (TrainConfig, TrainState,
                                               make_optimizer)

    cfg = ShowoConfig()
    vq_cfg = VQConfig()
    tc = TrainConfig(max_seq_length=128)
    sp = {"<|pad|>": 50295, "<|soi|>": 50296, "<|eoi|>": 50297,
          "<|mmu|>": 50300}
    mesh = make_mesh(dp=4, fsdp=2, tp=1)
    init = lambda k: init_showo_params(cfg, k, jnp.bfloat16)
    abs_p, p_sh = _abs_sharded(init, mesh)
    vq = MagvitV2(vq_cfg)
    abs_vq, _ = _abs_sharded(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            vq.init(k, jnp.zeros((1, 256, 256, 3)))["params"]), mesh)

    opt = make_optimizer(tc)
    abs_opt = jax.eval_shape(opt.init, abs_p)
    by_shape = {}
    for pa, sh in zip(jax.tree.leaves(abs_p), jax.tree.leaves(p_sh)):
        by_shape.setdefault((pa.shape, str(pa.dtype)), sh)
    rep = NamedSharding(mesh, P())
    abs_opt = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, a.dtype,
            sharding=by_shape.get((a.shape, str(a.dtype)), rep)), abs_opt)
    abs_state = TrainState(abs_p, abs_opt,
                           jax.ShapeDtypeStruct((), jnp.int32))

    B_T2I, B_LM, B_MMU = 15, 4, 10  # per-chip recipe x8 chips
    step = make_fused_train_step(cfg, vq_cfg, tc, opt, sp,
                                 8 * B_T2I, 8 * B_LM, 8 * B_MMU,
                                 cosine_schedule)
    bsh = NamedSharding(mesh, P(("dp", "fsdp")))
    L_text = 129
    L_lm = L_text + cfg.num_vq_tokens + 2

    def binp(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=bsh)

    with jax.set_mesh(mesh):
        compiled = jax.jit(step).lower(
            abs_state, abs_vq,
            binp((8 * B_T2I, 256, 256, 3), jnp.float32),
            binp((8 * B_T2I, L_text), jnp.int32),
            binp((8 * B_LM, L_lm), jnp.int32),
            binp((8 * B_LM, L_lm), jnp.int32),
            binp((8 * B_MMU, 256, 256, 3), jnp.float32),
            binp((8 * B_MMU, L_text - 1), jnp.int32),
            binp((8 * B_MMU, L_text - 1), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
        ).compile()
    ma = compiled.memory_analysis()
    # bf16 params ~2.6 GB + fp32 moments sharded over fsdp=2
    assert ma.argument_size_in_bytes / 8 < 14e9


@pytest.mark.parametrize("latent_hw,n_dev", [(54, 1), (54, 8), (128, 8)])
def test_v2_velocity_fullsize_compiles(latent_hw, n_dev):
    """1.5B velocity step at 432px (54x54 latents -> 730 tokens) and the
    1024px HQ geometry (128x128 -> 4097 tokens)."""
    from showo_tpu.show_o2.showo2 import (Showo2Config, init_showo2_params,
                                          showo2_t2i_velocity)

    cfg = Showo2Config(image_latent_height=latent_hw,
                       image_latent_width=latent_hw)
    S = 256 + cfg.num_image_tokens
    Bf = 2  # CFG pair

    def fn(params, text, lat, t, bias, mp):
        return showo2_t2i_velocity(cfg, params, text, lat, t, bias, mp,
                                   guidance_scale=7.5)

    init = lambda k: init_showo2_params(cfg, k, jnp.bfloat16)
    shapes = [
        ((Bf, S), jnp.int32),
        ((Bf, cfg.image_latent_dim, latent_hw, latent_hw), jnp.bfloat16),
        ((Bf,), jnp.float32),
        ((Bf, 1, S, S), jnp.bfloat16),
        ((Bf, 1, 2), jnp.int32),
    ]
    if n_dev == 1:
        abs_p = _abs_rep(init)
        args = [jax.ShapeDtypeStruct(s, d) for s, d in shapes]
        compiled = jax.jit(fn).lower(abs_p, *args).compile()
    else:
        mesh = make_mesh(dp=1, fsdp=2, tp=4)
        abs_p, _ = _abs_sharded(init, mesh)
        bsh = NamedSharding(mesh, P(("dp", "fsdp")))
        args = [jax.ShapeDtypeStruct(s, d, sharding=bsh) for s, d in shapes]
        with jax.set_mesh(mesh):
            compiled = jax.jit(fn).lower(abs_p, *args).compile()
    assert compiled.memory_analysis().temp_size_in_bytes > 0


def test_v2_stage1_train_fullsize_compiles_sharded():
    """1.5B stage-1 fused step at the real recipe shapes (batch 6 t2i +
    2 mmu per chip, showo2_1.5b_stage_1_a.yaml:107-136) over fsdp=8."""
    from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
    from showo_tpu.show_o2.train_stage_one import (Stage1Config,
                                                   make_stage1_optimizer,
                                                   make_stage1_step)
    from showo_tpu.show_o2.transport import Transport
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params

    cfg = Showo2Config()
    mesh = make_mesh(dp=1, fsdp=8, tp=1)
    init = lambda k: init_showo2_params(cfg, k, jnp.bfloat16)
    abs_p, p_sh = _abs_sharded(init, mesh)
    vae_cfg = WanVAEConfig()
    abs_vae, _ = _abs_sharded(
        lambda k: init_wan_vae_params(vae_cfg, k, jnp.bfloat16), mesh)

    sc = Stage1Config()
    opt = make_stage1_optimizer(sc, abs_p)
    abs_opt = jax.eval_shape(opt.init, abs_p)
    by_shape = {}
    for pa, sh in zip(jax.tree.leaves(abs_p), jax.tree.leaves(p_sh)):
        by_shape.setdefault((pa.shape, str(pa.dtype)), sh)
    rep = NamedSharding(mesh, P())
    abs_opt = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, a.dtype,
            sharding=by_shape.get((a.shape, str(a.dtype)), rep)), abs_opt)

    transport = Transport(snr_type="lognorm", do_shift=True,
                          seq_len=cfg.num_image_tokens)
    step = make_stage1_step(cfg, vae_cfg, sc, transport, opt)

    B, L = 8, 1024
    bsh = NamedSharding(mesh, P(("dp", "fsdp")))

    def binp(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=bsh)

    batch = {
        "text_tokens": binp((B, L), jnp.int32),
        "text_labels": binp((B, L), jnp.int32),
        "modality_positions": binp((B, 1, 2), jnp.int32),
        "text_masks": binp((B, L), jnp.int32),
        "image_masks": binp((B, L), jnp.int32),
        "images": binp((B, 432, 432, 3), jnp.float32),
        "is_und": binp((B,), jnp.int32),
    }
    with jax.set_mesh(mesh):
        compiled = jax.jit(step).lower(
            abs_p, abs_opt, abs_vae, batch,
            jax.ShapeDtypeStruct((2,), jnp.uint32)).compile()
    ma = compiled.memory_analysis()
    assert ma.argument_size_in_bytes / 8 < 14e9

"""Sharded inference (serving path) over the virtual 8-device mesh.

Training steps are mesh-tested in test_parallel_*.py; this covers the
GENERATION programs — the cached MaskGIT t2i sampler and the AR MMU
decoder — jitted with a batch axis sharded over ("dp", "fsdp") and
replicated (or fsdp-sharded) params, the single-program serving layout
(reference deploys one GPU per process; here one program spans the mesh).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import (
    ShowoConfig,
    init_showo_params,
    showo_mmu_generate,
    showo_t2i_generate_cached,
)
from showo_tpu.ops.masks import omni_mask_mmu, omni_mask_predict_next
from showo_tpu.parallel.mesh import make_mesh, shard_params

PAD, SOI, EOI, MMU = 102, 103, 104, 105

CFG = ShowoConfig(
    vocab_size=130, llm_vocab_size=100, num_new_special_tokens=6,
    codebook_size=16, num_vq_tokens=9,
    llm=PhiConfig(vocab_size=130, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4, max_position_embeddings=128),
)


def _t2i_inputs(B, P_len):
    rng = np.random.default_rng(0)
    text = rng.integers(2, 90, size=(B, P_len - 1))
    ids = np.concatenate([
        text, np.full((B, 1), SOI),
        np.full((B, CFG.num_vq_tokens), CFG.mask_token_id),
        np.full((B, 1), EOI)], axis=1)
    uncond = ids.copy()
    uncond[:, : P_len - 1] = PAD
    pair = np.concatenate([ids, uncond], 0)
    bias = omni_mask_predict_next(jnp.asarray(pair), pad_id=PAD, soi_id=SOI,
                                  eoi_id=EOI, rm_pad_in_image=True)
    return jnp.asarray(ids), jnp.asarray(uncond), bias


def test_t2i_cached_generate_on_mesh():
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=4, fsdp=2, tp=1)
    B, P_len = 8, 6
    ids, uncond, bias = _t2i_inputs(B, P_len)

    with jax.set_mesh(mesh):
        params = shard_params(
            init_showo_params(CFG, jax.random.PRNGKey(0)), mesh)
        bspec = NamedSharding(mesh, P(("dp", "fsdp")))
        ids = jax.device_put(ids, bspec)
        uncond = jax.device_put(uncond, bspec)
        bias = jax.device_put(bias, bspec)

        @jax.jit
        def gen(params, ids, uncond, bias, key):
            return showo_t2i_generate_cached(
                CFG, params, ids, key, uncond_input_ids=uncond,
                attention_bias=bias, guidance_scale=1.5, timesteps=3,
                max_seq_length=P_len - 1)

        tokens = gen(params, ids, uncond, bias, jax.random.PRNGKey(1))
    tokens = np.asarray(tokens)
    assert tokens.shape == (B, CFG.num_vq_tokens)
    assert (tokens >= 0).all() and (tokens < CFG.codebook_size).all()


def test_mmu_generate_on_mesh():
    mesh = make_mesh(dp=8, fsdp=1, tp=1)
    B = 8
    rng = np.random.default_rng(1)
    img = rng.integers(CFG.codebook_offset,
                       CFG.codebook_offset + CFG.codebook_size,
                       size=(B, CFG.num_vq_tokens))
    q = rng.integers(2, 90, size=(B, 4))
    prompt = np.concatenate([
        np.full((B, 1), MMU), np.full((B, 1), SOI), img,
        np.full((B, 1), EOI), q], axis=1).astype(np.int64)
    bias = omni_mask_mmu(jnp.asarray(prompt), eoi_id=EOI)

    with jax.set_mesh(mesh):
        params = shard_params(
            init_showo_params(CFG, jax.random.PRNGKey(0)), mesh)
        bspec = NamedSharding(mesh, P(("dp", "fsdp")))
        prompt_d = jax.device_put(jnp.asarray(prompt), bspec)
        bias_d = jax.device_put(bias, bspec)

        @jax.jit
        def gen(params, prompt, bias, key):
            toks, _ = showo_mmu_generate(CFG, params, prompt, key,
                                         prompt_bias=bias,
                                         max_new_tokens=5, top_k=1)
            return toks

        toks = gen(params, prompt_d, bias_d, jax.random.PRNGKey(2))
    toks = np.asarray(toks)
    assert toks.shape == (B, 5)
    assert np.isfinite(toks).all()


def test_fused_params_shard_rules():
    """fuse_parallel_mlp's win/wout kernels must match the fsdp/tp rules
    (a replicated fused layer would silently lose the ZeRO memory win)."""
    from showo_tpu.models.phi import fuse_parallel_mlp
    from showo_tpu.parallel.mesh import param_sharding_rules

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    params = init_showo_params(CFG, jax.random.PRNGKey(0))
    fused = {"showo": fuse_parallel_mlp(params["showo"])}
    shardings = param_sharding_rules(fused, mesh)
    win = shardings["showo"]["layers"]["win"]["kernel"].spec
    wout = shardings["showo"]["layers"]["wout"]["kernel"].spec
    assert win[2] == ("fsdp", "tp"), win
    assert wout[1] == ("fsdp", "tp"), wout

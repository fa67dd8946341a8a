"""Show-o2 fused train step on the virtual 8-device mesh (dp/fsdp/tp).

Exercises the §2.3 parallel path for the v2 model family: Qwen2 + DiT +
frozen Wan-VAE under GSPMD with the shared sharding rules."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from showo_tpu.show_o2.showo2 import init_showo2_params
from showo_tpu.show_o2.train_stage_one import (Stage1Config,
                                               make_stage1_optimizer,
                                               make_stage1_step)
from showo_tpu.show_o2.transport import Transport
from showo_tpu.show_o2.wan_vae import init_wan_vae_params
from tests.test_train_stage_one import TINY, VAE_TINY, N_IMG, _batch


def test_stage1_step_on_dp_fsdp_tp_mesh():
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sc = Stage1Config()
    transport = Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG)

    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    optimizer = make_stage1_optimizer(sc, params, ())

    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        vae_params = shard_params(vae_params, mesh)
        opt_state = jax.jit(optimizer.init)(params)
        step = make_stage1_step(TINY, VAE_TINY, sc, transport, optimizer)
        batch = shard_batch(
            {k: jnp.asarray(v) for k, v in _batch(8).items()}, mesh)
        losses = []
        for i in range(2):
            params, opt_state, metrics = step(params, opt_state, vae_params,
                                              batch, jax.random.PRNGKey(2 + i))
            losses.append(float(metrics["loss"]))

    assert all(np.isfinite(l) for l in losses)
    # gen-format batches train the flow head (text labels are ignored)
    assert float(metrics["loss_flow"]) > 0


def test_v2_params_actually_shard():
    mesh = make_mesh(dp=1, fsdp=4, tp=2)
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
    qk = sharded["showo"]["layers"]["q"]["kernel"]
    # [L, in, out] with out sharded over (fsdp, tp) = 8-way when divisible
    n_shards = len({d.id for d in qk.sharding.device_set})
    assert n_shards == 8
    # per-device shard is 1/8 of the stacked kernel
    assert qk.addressable_shards[0].data.shape[-1] * 8 == qk.shape[-1]

"""Show-o2 stage-1 fused step over the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from showo_tpu.show_o2.showo2 import init_showo2_params
from showo_tpu.show_o2.train_stage_one import (
    Stage1Config,
    make_stage1_optimizer,
    make_stage1_step,
)
from showo_tpu.show_o2.transport import Transport
from showo_tpu.show_o2.wan_vae import init_wan_vae_params
from tests.test_train_stage_one import N_IMG, TINY, VAE_TINY, _batch


def test_stage1_step_on_mesh():
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sc = Stage1Config(und_max_t0=0.9)
    transport = Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG)

    with jax.set_mesh(mesh):
        params = shard_params(init_showo2_params(TINY, jax.random.PRNGKey(0)),
                              mesh)
        vae_params = shard_params(
            init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1)), mesh)
        opt = make_stage1_optimizer(sc, params)
        opt_state = opt.init(params)
        step = make_stage1_step(TINY, VAE_TINY, sc, transport, opt)
        batch = shard_batch({k: jnp.asarray(v) for k, v in _batch(8).items()},
                            mesh)
        params, opt_state, metrics = step(params, opt_state, vae_params,
                                          batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # verify fsdp actually sharded a qwen kernel
    g = params["showo"]["layers"]["gate"]["kernel"]
    shapes = {tuple(s.data.shape) for s in g.addressable_shards}
    full = g.shape
    assert any(s != full for s in shapes)

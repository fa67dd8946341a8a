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


def test_stage2_step_on_mesh():
    """Stage-2's multi_transform (3 LR groups + freeze) over the mesh —
    the optimizer-state pytree shards like the params."""
    from showo_tpu.show_o2.train_stage_two import (
        Stage2Config,
        make_stage2_optimizer,
    )

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sc = Stage2Config(und_max_t0=1.0, lr_und=1e-5, lr_fusion=5e-5,
                      lr_main=1e-4)
    transport = Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG)

    with jax.set_mesh(mesh):
        params = shard_params(
            init_showo2_params(TINY, jax.random.PRNGKey(0)), mesh)
        vae_params = shard_params(
            init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1)), mesh)
        opt = make_stage2_optimizer(sc, params,
                                    frozen_substrings=("und_trans",))
        opt_state = opt.init(params)
        step = make_stage1_step(TINY, VAE_TINY, sc, transport, opt)
        raw = _batch(8)
        raw["is_und"] = np.asarray([0, 1] * 4, np.int32)  # mixed batch
        batch = shard_batch({k: jnp.asarray(v) for k, v in raw.items()},
                            mesh)
        params, opt_state, metrics = step(params, opt_state, vae_params,
                                          batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_ntp"]))


def test_mixed_modal_step_on_mesh():
    """M-image interleaved step over the mesh (VERDICT r1 weak #7)."""
    from showo_tpu.show_o2.formats import format_interleaved_sequence
    from showo_tpu.show_o2.train_mixed_modality import make_mixed_modal_step
    from showo_tpu.show_o2.train_stage_one import make_stage1_optimizer

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sc = Stage1Config(und_max_t0=None)
    transport = Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG)

    B, M, L = 8, 2, 72
    rng = np.random.default_rng(0)
    toks, labs, mps, ims = [], [], [], []
    for i in range(B):
        t, l, mp, tm, im = format_interleaved_sequence(
            ["img", "img"], [list(rng.integers(10, 190, size=3)),
                             list(rng.integers(10, 190, size=3))],
            bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5, img_pad_id=6,
            num_image_tokens=N_IMG, max_seq_len=L, max_num_images=M)
        toks.append(t)
        labs.append(l)
        mps.append(mp)
        ims.append(im)
    raw = {
        "text_tokens": np.stack(toks), "text_labels": np.stack(labs),
        "modality_positions": np.stack(mps), "image_masks": np.stack(ims),
        "images": rng.normal(size=(B, M, 16, 16, 3)).astype(np.float32),
    }
    with jax.set_mesh(mesh):
        params = shard_params(
            init_showo2_params(TINY, jax.random.PRNGKey(0)), mesh)
        vae_params = shard_params(
            init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1)), mesh)
        opt = make_stage1_optimizer(sc, params)
        opt_state = opt.init(params)
        step = make_mixed_modal_step(TINY, VAE_TINY, sc, transport, opt)
        batch = shard_batch({k: jnp.asarray(v) for k, v in raw.items()},
                            mesh)
        params, opt_state, metrics = step(params, opt_state, vae_params,
                                          batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_flow"]) > 0

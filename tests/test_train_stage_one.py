"""Show-o2 stage-1 trainer integration test (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.dit import DiffusionHeadConfig
from showo_tpu.show_o2.qwen2 import Qwen2Config
from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
from showo_tpu.show_o2.siglip import SigLipConfig
from showo_tpu.show_o2.train_stage_one import (
    Stage1Config,
    Stage1Trainer,
    trainable_mask,
)
from showo_tpu.show_o2.transport import Transport
from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params
from showo_tpu.show_o2.formats import format_sequence_gen_qwen2_5

VAE_TINY = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2), num_res_blocks=1,
                        temperal_downsample=(True,))
# VAE: 16x16 pixels -> 4x downsample (2 stages... dim_mult len 2 -> 1
# downsample) -> latent 8x8, z=16.  patch 2 -> 4x4=16 tokens + 1 time = 17.
TINY = Showo2Config(
    llm=Qwen2Config(vocab_size=200, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16),
    siglip=SigLipConfig(hidden_size=48, intermediate_size=96, num_heads=4,
                        num_layers=2, num_positions=16),
    dit=DiffusionHeadConfig(hidden_size=96, intermediate_size=192,
                            num_heads=4, num_kv_heads=2, head_dim=24,
                            num_layers=2),
    image_latent_dim=16,
    image_latent_height=8,
    image_latent_width=8,
    patch_size=2,
    clip_latent_dim=48,
)
N_IMG = TINY.num_image_tokens  # 17
L = 40
IDS = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5, img_pad_id=6)


def _batch(B=2):
    rng = np.random.default_rng(0)
    toks, labs, mps, tms, ims = [], [], [], [], []
    for i in range(B):
        t, l, mp, tm, im = format_sequence_gen_qwen2_5(
            list(rng.integers(10, 190, size=4)), num_image_tokens=N_IMG,
            max_seq_len=L, **IDS)
        toks.append(t)
        labs.append(l)
        mps.append(mp)
        tms.append(tm)
        ims.append(im)
    return {
        "text_tokens": np.stack(toks), "text_labels": np.stack(labs),
        "modality_positions": np.stack(mps), "text_masks": np.stack(tms),
        "image_masks": np.stack(ims),
        "images": rng.normal(size=(B, 16, 16, 3)).astype(np.float32),
        "is_und": np.zeros(B, np.int32),
    }


def test_stage1_trainer_steps():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    sc = Stage1Config(und_max_t0=0.9)
    trainer = Stage1Trainer(
        cfg=TINY, vae_cfg=VAE_TINY, sc=sc, params=params,
        vae_params=vae_params,
        transport=Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG),
        frozen_substrings=("und_trans",))

    batch = _batch()
    losses = []
    key = jax.random.PRNGKey(0)
    before = np.asarray(
        trainer.params["und_trans"]["layers"]["q"]["kernel"]).copy()
    emb_before = np.asarray(trainer.params["showo"]["embed"]).copy()
    for i in range(3):
        key, k = jax.random.split(key)
        m = trainer.train_step(batch, k)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    # frozen substring params unchanged; others updated
    after = np.asarray(trainer.params["und_trans"]["layers"]["q"]["kernel"])
    np.testing.assert_array_equal(before, after)
    assert not np.array_equal(emb_before,
                              np.asarray(trainer.params["showo"]["embed"]))


def test_trainable_mask():
    params = {"a": {"und_trans": {"w": np.zeros(2)}, "x": np.zeros(2)}}
    mask = trainable_mask(params, ["und_trans"])
    assert mask["a"]["und_trans"]["w"] is False
    assert mask["a"]["x"] is True


def test_visualization_hooks(tmp_path):
    import os

    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    trainer = Stage1Trainer(
        cfg=TINY, vae_cfg=VAE_TINY, sc=Stage1Config(), params=params,
        vae_params=vae_params,
        transport=Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG))

    pix = np.random.default_rng(1).normal(size=(2, 16, 16, 3)).astype(np.float32)
    panel = trainer.visualize_reconstruction(pix, str(tmp_path),
                                             jax.random.PRNGKey(2))
    assert panel.shape == (2, 16, 32, 3)
    assert len(os.listdir(tmp_path / "recon")) == 2

    vid = np.random.default_rng(2).normal(size=(1, 5, 16, 16, 3)).astype(np.float32)
    panel_v = trainer.visualize_reconstruction_video(vid, str(tmp_path),
                                                     jax.random.PRNGKey(3))
    assert panel_v.shape == (1, 5, 16, 32, 3)
    assert len(os.listdir(tmp_path / "recon_video")) == 5


def test_stage1_video_batch():
    """5D video batches run through the same fused step (reference
    train_stage_one.py:354-360 keeps the VAE temporal axis)."""
    rng = np.random.default_rng(3)
    T_pix = 5  # -> (5-1)/2 + 1 = 3 latent frames with one temporal stage
    n_tok = 3 * 16 + 1  # T' * (h/p * w/p) + time embed
    Lv = 72
    toks, labs, mps, ims = [], [], [], []
    for i in range(2):
        t, l, mp, tm, im = format_sequence_gen_qwen2_5(
            list(rng.integers(10, 190, size=4)), num_image_tokens=n_tok,
            max_seq_len=Lv, **IDS)
        toks.append(t)
        labs.append(l)
        mps.append(mp)
        ims.append(im)
    batch = {
        "text_tokens": np.stack(toks), "text_labels": np.stack(labs),
        "modality_positions": np.stack(mps), "image_masks": np.stack(ims),
        "images": rng.normal(size=(2, T_pix, 16, 16, 3)).astype(np.float32),
        "is_und": np.zeros(2, np.int32),
    }
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    trainer = Stage1Trainer(
        cfg=TINY, vae_cfg=VAE_TINY, sc=Stage1Config(), params=params,
        vae_params=vae_params,
        transport=Transport(snr_type="lognorm", do_shift=True, seq_len=n_tok))
    m = trainer.train_step(batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss_flow"]) > 0


def test_und_flow_loss_zeroed_per_sample():
    """With und_max_t0 == 1.0 a mixed batch zeroes the flow loss only for
    the und rows (reference train_stage_one.py:379-380 image_masks[i]*0.0):
    changing the und sample's image must not change any loss (its t is
    forced to ~1 and its flow rows are masked), while changing the gen
    sample's image must."""
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    sc = Stage1Config(und_max_t0=1.0)
    trainer = Stage1Trainer(
        cfg=TINY, vae_cfg=VAE_TINY, sc=sc, params=params,
        vae_params=vae_params,
        transport=Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG))

    batch = _batch(B=2)
    batch["is_und"] = np.asarray([0, 1], np.int32)
    # und sample: no text labels so ntp is also image-independent
    batch["text_labels"][1] = -100

    def flow_loss(images):
        b = dict(batch, images=images)
        # the fused step donates params/opt buffers — keep live copies
        p = jax.tree.map(jnp.copy, trainer.params)
        o = jax.tree.map(jnp.copy, trainer.opt_state)
        m = trainer.train_step(b, jax.random.PRNGKey(7))
        trainer.params, trainer.opt_state = p, o  # undo the update
        trainer.global_step = 0
        return float(m["loss_flow"]), float(m["loss"])

    base_imgs = batch["images"].copy()
    f0, t0 = flow_loss(base_imgs)
    assert f0 > 0  # gen sample still contributes flow loss

    # perturb the UND sample's image -> losses unchanged (masked out)
    imgs_und = base_imgs.copy()
    imgs_und[1] = -2.0 * imgs_und[1] + 5.0
    f1, t1 = flow_loss(imgs_und)
    np.testing.assert_allclose(f1, f0, rtol=1e-5)
    np.testing.assert_allclose(t1, t0, rtol=1e-5)

    # the same perturbation on the GEN sample -> flow loss changes
    imgs_gen = base_imgs.copy()
    imgs_gen[0] = -2.0 * imgs_gen[0] + 5.0
    f2, _ = flow_loss(imgs_gen)
    assert abs(f2 - f0) > 10 * abs(f1 - f0) and abs(f2 - f0) > 1e-4


def test_stage1_trainer_adafactor_and_bf16_moments():
    """optimizer=adafactor|adamw_bf16 step and learn at tiny dims — the
    single-chip 1.5B memory levers (bench.py metric=train_v2): Adafactor
    keeps a factored second moment (no [D, F] moment tensors), adamw_bf16
    halves the first moment."""
    batch = _batch()
    for opt_name in ("adafactor", "adamw_bf16"):
        params = init_showo2_params(TINY, jax.random.PRNGKey(0))
        vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
        sc = Stage1Config(und_max_t0=0.9, optimizer=opt_name,
                          learning_rate=1e-3)
        trainer = Stage1Trainer(
            cfg=TINY, vae_cfg=VAE_TINY, sc=sc, params=params,
            vae_params=vae_params,
            transport=Transport(snr_type="lognorm", do_shift=True,
                                seq_len=N_IMG))
        losses = [float(trainer.train_step(batch, jax.random.PRNGKey(i)
                                           )["loss"]) for i in range(6)]
        assert losses[-1] < losses[0], (opt_name, losses)
        leaves = jax.tree.leaves(trainer.opt_state)
        n_state = sum(x.size for x in leaves if hasattr(x, "size"))
        n_params = sum(x.size for x in jax.tree.leaves(trainer.params))
        if opt_name == "adafactor":
            # no first moment: state is at most ~one (unfactored at tiny
            # dims < min_dim_size_to_factor=128) second-moment copy, vs
            # AdamW's two.  Factoring itself is asserted below.
            assert n_state < 1.2 * n_params, (n_state, n_params)
        else:
            mu_dtypes = {str(x.dtype) for x in leaves
                         if hasattr(x, "dtype") and x.ndim >= 2}
            assert "bfloat16" in mu_dtypes, mu_dtypes

    # adafactor factors the second moment above min_dim_size_to_factor:
    # a [256, 512] param keeps 256+512 stats, not 256*512 — the memory
    # claim the 1.5B single-chip config rests on
    from showo_tpu.show_o2.train_stage_one import make_stage1_optimizer
    big = {"w": jnp.zeros((256, 512), jnp.float32)}
    sc_a = Stage1Config(optimizer="adafactor")
    st = make_stage1_optimizer(sc_a, big).init(big)
    n_big = sum(x.size for x in jax.tree.leaves(st) if hasattr(x, "size"))
    assert n_big < 0.05 * 256 * 512, n_big


def test_remat_policies_identical_loss():
    """The remat ladder (utils/remat.py: full/qkv_fc1/none via the
    checkpoint_name tags in qwen2/dit) must be a pure memory/recompute
    trade — every policy computes the SAME step."""
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    batch = _batch()
    losses = {}
    for remat in ("full", "qkv_fc1", "none"):
        trainer = Stage1Trainer(
            cfg=TINY, vae_cfg=VAE_TINY, sc=Stage1Config(remat=remat),
            params=jax.tree.map(jnp.copy, params), vae_params=vae_params,
            transport=Transport(snr_type="lognorm", do_shift=True,
                                seq_len=N_IMG))
        losses[remat] = float(trainer.train_step(batch,
                                                 jax.random.PRNGKey(7))["loss"])
    vals = list(losses.values())
    assert all(abs(v - vals[0]) < 1e-5 for v in vals), losses

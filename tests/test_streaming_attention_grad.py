"""Flash backward (custom VJP) vs dense autodiff (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.ops.flash_attention import (
    metadata_predict_next,
    seg_from_modality_positions,
)
from showo_tpu.ops.masks import omni_mask_predict_next
from showo_tpu.ops.streaming_attention_grad import omni_attention_trainable
from showo_tpu.show_o2.masks import omni_attn_mask

PAD, SOI, EOI = 900, 901, 902


def dense_attention(q, k, v, bias):
    H, Hkv = q.shape[1], k.shape[1]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    probs = jax.nn.softmax(scores + bias, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _qkv(B, H, S, D, seed=0, Hkv=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv or H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv or H, S, D)), jnp.float32)
    return q, k, v


def _check_grads(q, k, v, bias, seg, pad=None, last_pad=None, prefix=None,
                 bq=16, bk=16, atol=3e-4):
    """Compare value + (dq, dk, dv) of a scalar loss vs dense autodiff."""
    rng = np.random.default_rng(99)
    w = jnp.asarray(rng.normal(size=dense_attention(q, k, v, bias).shape),
                    jnp.float32)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, bias) * w)

    def loss_stream(q, k, v):
        out = omni_attention_trainable(q, k, v, seg, pad, last_pad, prefix,
                                       block_q=bq, block_k=bk,
                                       interpret=True)
        return jnp.sum(out * w)

    vd, gd = jax.value_and_grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    vs, gs = jax.value_and_grad(loss_stream, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(vs), float(vd), rtol=1e-4)
    for name, a, b in zip("qkv", gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                                   rtol=1e-3, err_msg=f"d{name}")


def test_grads_v1_t2i_mask_multiblock():
    rng = np.random.default_rng(0)
    rows = []
    for p in (0, 5):
        text = rng.integers(5, 800, size=20 - p).tolist()
        img = rng.integers(5, 800, size=40).tolist()
        rows.append([PAD] * p + text + [SOI] + img + [EOI])
    seq = jnp.asarray(rows)
    B, S = seq.shape
    q, k, v = _qkv(B, 2, S, 8)
    bias = omni_mask_predict_next(seq, pad_id=PAD, soi_id=SOI, eoi_id=EOI,
                                  rm_pad_in_image=True)
    seg, pad, last_pad, prefix = metadata_predict_next(seq, PAD, SOI, EOI)
    _check_grads(q, k, v, bias, seg, pad, last_pad, prefix)


def test_grads_v2_omni_gqa():
    """GQA grads: dk/dv summed over the query-head group."""
    mp = jnp.asarray([[[3, 6], [14, 6]], [[5, 8], [0, 0]]])
    L = 24
    q, k, v = _qkv(2, 4, L, 8, seed=3, Hkv=2)
    bias = omni_attn_mask(mp, L)
    seg = seg_from_modality_positions(mp, L)
    _check_grads(q, k, v, bias, seg, bq=8, bk=8)


def test_grads_causal_long_multiblock():
    """Plain causal at S=70 over many 16-blocks with ragged padding."""
    from showo_tpu.ops.masks import to_additive

    L = 70
    seg = jnp.zeros((1, L), jnp.int32)
    q, k, v = _qkv(1, 2, L, 8, seed=6)
    causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
    _check_grads(q, k, v, to_additive(causal), seg)


def test_grads_bf16_runs():
    """bf16 inputs: grads produced, finite, same dtype."""
    mp = jnp.asarray([[[2, 5]]])
    L = 16
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(1, 2, L, 8, seed=7))
    seg = seg_from_modality_positions(mp, L)

    def loss(q, k, v):
        out = omni_attention_trainable(q, k, v, seg, block_q=8, block_k=8,
                                       interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a in g:
        assert a.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(a, np.float32)).all()


def test_stage1_step_pallas_trainable_matches_dense():
    """Full stage-1 fused step with attn_impl=pallas_trainable (flash
    custom-VJP in BOTH the qwen tower and the DiT head) reproduces the
    dense step's loss and gradient norm on the same batch/key."""
    import dataclasses
    from unittest import mock

    from showo_tpu.ops import streaming_attention_grad as sg
    from showo_tpu.show_o2.showo2 import init_showo2_params
    from showo_tpu.show_o2.train_stage_one import (
        Stage1Config,
        make_stage1_optimizer,
        make_stage1_step,
    )
    from showo_tpu.show_o2.transport import Transport
    from showo_tpu.show_o2.wan_vae import init_wan_vae_params
    from tests.test_train_stage_one import N_IMG, TINY, VAE_TINY, _batch

    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    transport = Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG)
    batch = {k: jnp.asarray(v) for k, v in _batch(2).items()}
    key = jax.random.PRNGKey(5)

    results = {}
    for impl in ("dense", "pallas_trainable"):
        # the fused step donates params/opt_state — fresh copies per impl
        params = init_showo2_params(TINY, jax.random.PRNGKey(0))
        sc = Stage1Config(und_max_t0=0.9, attn_impl=impl)
        opt = make_stage1_optimizer(sc, params)
        opt_state = opt.init(params)
        step = make_stage1_step(TINY, VAE_TINY, sc, transport, opt)
        orig = sg.omni_attention_trainable

        def interp(*a, **kw):
            kw["interpret"] = True
            kw.setdefault("block_q", 8)
            kw.setdefault("block_k", 8)
            return orig(*a, **kw)

        with mock.patch.object(sg, "omni_attention_trainable", interp):
            _, _, metrics = step(params, opt_state, vae_params, batch, key)
        results[impl] = {k: float(v) for k, v in metrics.items()}

    d, p = results["dense"], results["pallas_trainable"]
    np.testing.assert_allclose(p["loss"], d["loss"], rtol=2e-4)
    np.testing.assert_allclose(p["loss_ntp"], d["loss_ntp"], rtol=2e-4)
    np.testing.assert_allclose(p["loss_flow"], d["loss_flow"], rtol=2e-4)
    np.testing.assert_allclose(p["grad_norm"], d["grad_norm"], rtol=2e-3)


def test_stage1_video_batch_pallas_trainable():
    """Video batches (5D pixels -> joint video latents, the long-seq case
    the flash kernel exists for) train through attn_impl=pallas_trainable
    and match the dense step's losses."""
    from unittest import mock

    from showo_tpu.ops import streaming_attention_grad as sg
    from showo_tpu.show_o2.showo2 import init_showo2_params
    from showo_tpu.show_o2.train_stage_one import (
        Stage1Config,
        Stage1Trainer,
    )
    from showo_tpu.show_o2.transport import Transport
    from showo_tpu.show_o2.wan_vae import init_wan_vae_params
    from tests.test_train_stage_one import IDS, TINY, VAE_TINY
    from showo_tpu.show_o2.formats import format_sequence_gen_qwen2_5

    rng = np.random.default_rng(3)
    T_pix = 5
    n_tok = 3 * 16 + 1
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
    key = jax.random.PRNGKey(5)
    results = {}
    for impl in ("dense", "pallas_trainable"):
        trainer = Stage1Trainer(
            cfg=TINY, vae_cfg=VAE_TINY,
            sc=Stage1Config(attn_impl=impl),
            params=init_showo2_params(TINY, jax.random.PRNGKey(0)),
            vae_params=init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1)),
            transport=Transport(snr_type="lognorm", do_shift=True,
                                seq_len=n_tok))
        orig = sg.omni_attention_trainable

        def interp(*a, **kw):
            kw.update(interpret=True, block_q=8, block_k=8)
            return orig(*a, **kw)

        with mock.patch.object(sg, "omni_attention_trainable", interp):
            m = trainer.train_step(batch, key)
        results[impl] = {k: float(v) for k, v in m.items()}

    d, p = results["dense"], results["pallas_trainable"]
    np.testing.assert_allclose(p["loss"], d["loss"], rtol=2e-4)
    np.testing.assert_allclose(p["loss_flow"], d["loss_flow"], rtol=2e-4)

"""v1 unified-trainer integration test: few fused steps on tiny models."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.config import Config  # noqa: E402
from showo_tpu.models.magvit import MagvitV2, VQConfig  # noqa: E402
from showo_tpu.models.phi import PhiConfig  # noqa: E402
from showo_tpu.models.showo import ShowoConfig, init_showo_params  # noqa: E402
from showo_tpu.prompting import UniversalPrompting  # noqa: E402
from showo_tpu.training.train_showo import ShowoTrainer  # noqa: E402

VQ_TINY = VQConfig(ch=32, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
                   dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1), z_channels=4)


def _cfgs():
    text_vocab = 1010
    cfg = ShowoConfig(
        vocab_size=text_vocab + 16 + 1, llm_vocab_size=text_vocab,
        num_new_special_tokens=0, codebook_size=16, num_vq_tokens=16,
        llm=PhiConfig(vocab_size=text_vocab + 17, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4),
    )
    config = Config({
        "experiment": Config(project="t", name="t", output_dir="out"),
        "dataset": Config(preprocessing=Config(max_seq_length=8)),
        "training": Config(batch_size_t2i=2, batch_size_lm=2,
                           batch_size_mmu=2, max_train_steps=3),
    })
    return cfg, config


def test_trainer_runs_and_learns():
    cfg, config = _cfgs()
    uni = UniversalPrompting(FakeTokenizer(), max_text_len=8,
                             cond_dropout_prob=0.1)
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    vq = MagvitV2(VQ_TINY)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))["params"]

    trainer = ShowoTrainer(config=config, cfg=cfg, vq_cfg=VQ_TINY,
                           params=params, vq_params=vq_params,
                           uni_prompting=uni)

    rng = np.random.default_rng(0)
    t2i_batch = {"image": rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
                 "text": ["a cat", "a dog"]}
    mmu_batch = {"image": rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
                 "text": ["describe it", "what is it"]}
    lm_texts = ["language modeling text", "another document"]

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, k = jax.random.split(key)
        m = trainer.train_step(t2i_batch, lm_texts, mmu_batch, k)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert trainer.global_step == 3
    # same data 3 steps -> loss decreases
    assert losses[-1] < losses[0]


def test_trainer_ema_flag():
    """training.ema.enabled=true maintains an EMA copy that tracks the
    trained params (beyond-parity: the reference ships EMAModel unwired)."""
    cfg, config = _cfgs()
    config["training"]["ema"] = {"enabled": True, "decay": 0.5}
    uni = UniversalPrompting(FakeTokenizer(), max_text_len=8,
                             cond_dropout_prob=0.1)
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    vq = MagvitV2(VQ_TINY)
    vq_params = vq.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 8, 8, 3)))["params"]
    trainer = ShowoTrainer(config=config, cfg=cfg, vq_cfg=VQ_TINY,
                           params=params, vq_params=vq_params,
                           uni_prompting=uni)
    assert trainer.ema_state is not None
    init_embed = np.asarray(trainer.ema_state.params["showo"]["embed"]).copy()

    rng = np.random.default_rng(0)
    t2i_batch = {"image": rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
                 "text": ["a cat", "a dog"]}
    mmu_batch = {"image": rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
                 "text": ["describe it", "what is it"]}
    for i in range(3):
        trainer.train_step(t2i_batch, ["lm text", "more text"], mmu_batch,
                           jax.random.PRNGKey(i))
    ema = np.asarray(trainer.ema_state.params["showo"]["embed"])
    live = np.asarray(trainer.state.params["showo"]["embed"])
    assert not np.array_equal(ema, init_embed)   # EMA moved
    assert not np.array_equal(ema, live)         # but lags the live params
    assert int(trainer.ema_state.step) == 3


def test_v1_fused_step_pallas_trainable_matches_dense():
    """v1 fused step with training.attn_impl=pallas_trainable (per-row
    kernel metadata replacing the three dense S x S biases: t2i rm_pad,
    lm pads-visible, mmu batch-first-eoi prefix) reproduces the dense
    step's losses and grad norm."""
    from unittest import mock

    from showo_tpu.ops import streaming_attention_grad as sg

    uni = UniversalPrompting(FakeTokenizer(), max_text_len=8,
                             cond_dropout_prob=0.0)
    rng = np.random.default_rng(0)
    t2i_batch = {"image": rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
                 "text": ["a cat", "a dog"]}
    mmu_batch = {"image": rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
                 "text": ["describe it", "what is it"]}
    lm_texts = ["language modeling text", "another document"]
    key = jax.random.PRNGKey(7)

    results = {}
    for impl in ("dense", "pallas_trainable"):
        cfg, config = _cfgs()
        config.training["attn_impl"] = impl
        params = init_showo_params(cfg, jax.random.PRNGKey(0))
        vq = MagvitV2(VQ_TINY)
        vq_params = vq.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 8, 8, 3)))["params"]
        trainer = ShowoTrainer(config=config, cfg=cfg, vq_cfg=VQ_TINY,
                               params=params, vq_params=vq_params,
                               uni_prompting=uni)
        orig = sg.omni_attention_trainable

        def interp(*a, **kw):
            kw.update(interpret=True, block_q=8, block_k=8)
            return orig(*a, **kw)

        with mock.patch.object(sg, "omni_attention_trainable", interp):
            m = trainer.train_step(t2i_batch, lm_texts, mmu_batch, key)
        results[impl] = {k: float(v) for k, v in m.items()}

    d, p = results["dense"], results["pallas_trainable"]
    np.testing.assert_allclose(p["loss"], d["loss"], rtol=2e-4)
    np.testing.assert_allclose(p["loss_t2i"], d["loss_t2i"], rtol=2e-4)
    np.testing.assert_allclose(p["loss_lm"], d["loss_lm"], rtol=2e-4)
    np.testing.assert_allclose(p["loss_mmu"], d["loss_mmu"], rtol=2e-4)
    np.testing.assert_allclose(p["grad_norm"], d["grad_norm"], rtol=2e-3)


def test_trainer_ema_gated_on_accumulation_boundary():
    """With gradient_accumulation_steps=k the EMA must update once per
    OPTIMIZER step (every k micro-steps), not per micro-step — otherwise
    decay is applied k times per parameter change and the configured decay
    horizon shrinks by k."""
    cfg, config = _cfgs()
    config["training"]["ema"] = {"enabled": True, "decay": 0.5}
    config["training"]["gradient_accumulation_steps"] = 2
    uni = UniversalPrompting(FakeTokenizer(), max_text_len=8,
                             cond_dropout_prob=0.1)
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    vq = MagvitV2(VQ_TINY)
    vq_params = vq.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 8, 8, 3)))["params"]
    trainer = ShowoTrainer(config=config, cfg=cfg, vq_cfg=VQ_TINY,
                           params=params, vq_params=vq_params,
                           uni_prompting=uni)
    rng = np.random.default_rng(0)
    t2i_batch = {"image": rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
                 "text": ["a cat", "a dog"]}
    mmu_batch = {"image": rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
                 "text": ["describe it", "what is it"]}
    ema0 = np.asarray(trainer.ema_state.params["showo"]["embed"]).copy()
    trainer.train_step(t2i_batch, ["lm", "text"], mmu_batch,
                       jax.random.PRNGKey(0))
    # micro-step 1 of 2: params unchanged (MultiSteps), EMA must not tick
    np.testing.assert_array_equal(
        np.asarray(trainer.ema_state.params["showo"]["embed"]), ema0)
    assert int(trainer.ema_state.step) == 0
    trainer.train_step(t2i_batch, ["lm", "text"], mmu_batch,
                       jax.random.PRNGKey(1))
    # boundary: optimizer stepped, EMA ticked exactly once
    assert int(trainer.ema_state.step) == 1

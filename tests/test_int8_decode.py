"""Weight-only int8 serving mode (models/phi.py::quantize_int8).

Beyond-parity feature (the reference has no quantized path): per-output-
channel symmetric int8 on the inference matmul kernels, dequantized on
read so XLA fuses the scale into the weight-tile loads.  Verifies the
quantization mechanics, near-losslessness of the logits, and that the
KV-cached decode path runs end-to-end on quantized params.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.models.phi import (PhiConfig, fuse_parallel_mlp,
                                  init_phi_params, phi_forward,
                                  quantize_int8)

CFG = PhiConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4)


def _params(dtype=jnp.float32):
    return init_phi_params(CFG, jax.random.PRNGKey(0), dtype)


def test_quantize_shapes_and_exactness():
    p = quantize_int8(_params())
    L = p["layers"]
    assert "kernel" not in L["q"] and L["q"]["kernel_i8"].dtype == jnp.int8
    assert L["q"]["scale"].shape == (CFG.num_layers, 1, CFG.hidden_size)
    assert p["lm_head"]["kernel_i8"].dtype == jnp.int8
    # biases / norms / embed untouched
    assert L["ln"]["scale"].dtype != jnp.int8
    assert p["embed"].dtype != jnp.int8
    # a kernel whose columns are exact multiples of scale round-trips
    k = jnp.array([[1.0, -2.0], [0.5, 2.0]])
    pp = {"layers": {"q": {"kernel": k, "bias": jnp.zeros(2)}}}
    q = quantize_int8(pp)["layers"]["q"]
    deq = q["kernel_i8"].astype(jnp.float32) * q["scale"].astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(k), rtol=1e-2)


def test_int8_logits_near_lossless():
    p = _params()
    pq = quantize_int8(fuse_parallel_mlp(p))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, CFG.vocab_size)
    ref, _ = phi_forward(CFG, p, input_ids=ids)
    got, _ = phi_forward(CFG, pq, input_ids=ids)
    ref, got = np.asarray(ref), np.asarray(got)
    # top-1 agreement and small relative error
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.95, agree
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.abs(ref - got).max() / denom < 0.05


def test_int8_cached_decode_runs():
    from showo_tpu.models.showo import (ShowoConfig, init_showo_params,
                                        showo_mmu_generate)
    from showo_tpu.ops.masks import omni_mask_mmu

    cfg = ShowoConfig(vocab_size=128, llm_vocab_size=100,
                      num_new_special_tokens=0, codebook_size=16,
                      num_vq_tokens=4,
                      llm=dataclasses.replace(CFG, vocab_size=128))
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    params = dict(params, showo=quantize_int8(
        fuse_parallel_mlp(params["showo"])))
    prompt = jnp.array([[102, 100, 110, 111, 112, 113, 101, 5, 6]])
    bias = omni_mask_mmu(prompt, eoi_id=101)
    toks, valid = showo_mmu_generate(
        cfg, params, prompt, jax.random.PRNGKey(2), prompt_bias=bias,
        max_new_tokens=4, top_k=1)
    assert np.asarray(toks).shape == (1, 4)
    assert np.isfinite(np.asarray(valid)).all()


def test_qwen2_int8_cached_decode_matches_full():
    from showo_tpu.ops.masks import to_additive
    from showo_tpu.show_o2.qwen2 import (Qwen2Config, Qwen2KVCache,
                                         fuse_inference, init_qwen2_params,
                                         qwen2_forward)
    from showo_tpu.show_o2.qwen2 import quantize_int8 as q8

    cfg = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16)
    pq = q8(fuse_inference(init_qwen2_params(cfg, jax.random.PRNGKey(0))))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)
    causal = jnp.tril(jnp.ones((10, 10), bool))
    full, _, _ = qwen2_forward(cfg, pq, input_ids=ids,
                               attention_bias=to_additive(causal[None, None]))
    cache = Qwen2KVCache.zeros(cfg, 2, 10)
    _, _, cache = qwen2_forward(
        cfg, pq, input_ids=ids[:, :9],
        attention_bias=to_additive(causal[None, None, :9, :]), cache=cache)
    lt, _, _ = qwen2_forward(
        cfg, pq, input_ids=ids[:, 9:],
        attention_bias=to_additive(causal[None, None, 9:, :]), cache=cache)
    np.testing.assert_allclose(np.asarray(lt[:, 0]), np.asarray(full[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_qwen2_int8_logits_near_lossless():
    from showo_tpu.show_o2.qwen2 import (Qwen2Config, fuse_inference,
                                         init_qwen2_params, qwen2_forward)
    from showo_tpu.show_o2.qwen2 import quantize_int8 as q8

    cfg = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16)
    p = init_qwen2_params(cfg, jax.random.PRNGKey(0))
    pq = q8(fuse_inference(p))
    assert pq["lm_head"]["kernel_i8"].shape == (64, 128)  # tied embed.T
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    ref, _, _ = qwen2_forward(cfg, p, input_ids=ids)
    got, _, _ = qwen2_forward(cfg, pq, input_ids=ids)
    ref, got = np.asarray(ref), np.asarray(got)
    assert (ref.argmax(-1) == got.argmax(-1)).mean() >= 0.95
    assert np.abs(ref - got).max() / np.abs(ref).max() < 0.05

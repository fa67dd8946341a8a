"""Continuous-batching serving engine: per-lane decode == per-request decode.

The engine batches REQUESTS AT DIFFERENT LENGTHS into one compiled decode
program (per-lane KV offsets).  Greedy decoding through the engine must
reproduce each request's standalone showo_mmu_generate output exactly —
slot packing, prompt padding, and chunked scheduling are pure scheduling,
not approximations.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import (ShowoConfig, init_showo_params,
                                    showo_mmu_generate)
from showo_tpu.ops.masks import NEG_INF, omni_mask_mmu
from showo_tpu.sampling.ar import ar_generate
from showo_tpu.serving import Showo2MMUServer, ShowoMMUServer
from showo_tpu.show_o2.dit import DiffusionHeadConfig
from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.qwen2 import Qwen2Config, Qwen2KVCache, qwen2_forward
from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params
from showo_tpu.show_o2.siglip import SigLipConfig

CFG = ShowoConfig(
    vocab_size=120, llm_vocab_size=100, num_new_special_tokens=3,
    codebook_size=16, num_vq_tokens=9,
    llm=PhiConfig(vocab_size=120, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4, max_position_embeddings=128),
)
SOI, EOI, MMU = 101, 102, 105


def _prompt(rng, q_len):
    img = rng.integers(106, 120, size=9)
    q = rng.integers(2, 99, size=q_len)
    return np.concatenate([[MMU, SOI], img, [EOI], q]).astype(np.int32)


@pytest.fixture(scope="module")
def params():
    return jax.jit(lambda k: init_showo_params(CFG, k, jnp.float32))(
        jax.random.PRNGKey(0))


def _reference(params, prompt, budget):
    bias = omni_mask_mmu(jnp.asarray(prompt)[None], eoi_id=EOI,
                         dtype=jnp.float32)
    toks, _ = showo_mmu_generate(
        CFG, params, jnp.asarray(prompt)[None], jax.random.PRNGKey(7),
        prompt_bias=bias, max_new_tokens=budget, temperature=1.0, top_k=1)
    return list(np.asarray(toks)[0])


def test_engine_matches_per_request_greedy(params):
    rng = np.random.default_rng(3)
    reqs = [(_prompt(rng, q), b)
            for q, b in [(3, 5), (7, 9), (2, 4), (10, 7), (5, 11), (4, 3)]]

    server = ShowoMMUServer(CFG, params, slots=2, cap=48, chunk=3,
                            buckets=(16, 24), temperature=1.0, top_k=1)
    handles = [server.submit(p, b) for p, b in reqs]
    done = server.run(jax.random.PRNGKey(11))

    assert len(done) == len(reqs)
    for h, (prompt, budget) in zip(handles, reqs):
        assert h.done and len(h.tokens) == budget
        assert h.tokens == _reference(params, prompt, budget), \
            f"request {h.uid} diverged"


def test_engine_slot_reuse_and_accounting(params):
    rng = np.random.default_rng(5)
    server = ShowoMMUServer(CFG, params, slots=2, cap=64, chunk=4,
                            buckets=(24,), temperature=1.0, top_k=1)
    handles = [server.submit(_prompt(rng, 4), 6) for _ in range(5)]
    done = server.run(jax.random.PRNGKey(1))
    assert len(done) == 5
    for h in handles:
        assert len(h.tokens) == 6
        assert h.first_token_at is not None and h.finished_at is not None


V2 = Showo2Config(
    llm=Qwen2Config(vocab_size=200, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16),
    siglip=SigLipConfig(hidden_size=48, intermediate_size=96, num_heads=4,
                        num_layers=2, num_positions=9),
    dit=DiffusionHeadConfig(hidden_size=96, intermediate_size=192,
                            num_heads=4, num_kv_heads=2, head_dim=24,
                            num_layers=2),
    image_latent_dim=4, image_latent_height=6, image_latent_width=6,
    patch_size=2, clip_latent_dim=48,
)
N_IMG = V2.num_image_tokens


@pytest.fixture(scope="module")
def params_v2():
    return init_showo2_params(V2, jax.random.PRNGKey(1))


def _v2_prompt(rng, text_len):
    """Assembled MMU embedding rows: text, then the image span, then text."""
    D = V2.llm.hidden_size
    img_start = 3
    S = text_len + N_IMG + 3
    rows = rng.normal(size=(S, D)).astype(np.float32) * 0.02
    return rows, img_start


def _reference_v2(params, emb, img_start, budget):
    """Standalone per-request greedy decode (the mmu_v2 pipeline loop)."""
    S = emb.shape[0]
    mp = jnp.asarray([[[img_start, N_IMG]]])
    bias = omni_attn_mask(mp, S)
    cap = S + budget + 4

    def prefill(_ids, pb):
        cache = Qwen2KVCache.zeros(V2.llm, 1, cap, dtype=jnp.float32)
        pad = cap - pb.shape[-1]
        pb = jnp.pad(pb, ((0, 0), (0, 0), (0, 0), (0, pad)),
                     constant_values=NEG_INF)
        logits, _, cache = qwen2_forward(
            V2.llm, params["showo"], input_embeds=jnp.asarray(emb)[None],
            attention_bias=pb, cache=cache)
        return logits, cache

    def decode(tok_ids, b, cache):
        e = params["showo"]["embed"][tok_ids]
        logits, _, cache = qwen2_forward(V2.llm, params["showo"],
                                         input_embeds=e, attention_bias=b,
                                         cache=cache)
        return logits, cache

    toks, _ = ar_generate(prefill, decode, jnp.zeros((1, S), jnp.int32),
                          jax.random.PRNGKey(7), max_new_tokens=budget,
                          temperature=1.0, top_k=1, prompt_bias=bias)
    return list(np.asarray(toks)[0])


@pytest.mark.parametrize("fused_admit", [False, True])
def test_v2_engine_matches_per_request_greedy(params_v2, fused_admit):
    rng = np.random.default_rng(11)
    reqs = [(_v2_prompt(rng, t)[0], 3, b)
            for t, b in [(2, 5), (6, 8), (1, 4), (9, 6), (4, 9)]]

    server = Showo2MMUServer(V2, params_v2, slots=2, cap=64, chunk=3,
                             buckets=(20, 28), temperature=1.0, top_k=1,
                             fused_admit=fused_admit)
    handles = [server.submit(e, s, b) for e, s, b in reqs]
    done = server.run(jax.random.PRNGKey(13))

    assert len(done) == len(reqs)
    if fused_admit:
        assert server.engine._fused_cache, "fused path was never exercised"
    for h, (emb, img_start, budget) in zip(handles, reqs):
        assert h.done and len(h.tokens) == budget
        assert h.tokens == _reference_v2(params_v2, emb, img_start, budget), \
            f"v2 request {h.uid} diverged"


def test_speculative_engine_token_exact(params):
    """Prompt-lookup speculative decoding is pure acceleration: greedy
    output through the speculative engine must be TOKEN-EXACT vs the
    standalone greedy decode, whatever the drafts did (accept/reject
    bookkeeping, per-lane buffers, variable per-step advance)."""
    rng = np.random.default_rng(17)
    # repetitive questions raise draft acceptance so both the accept and
    # reject paths actually run
    reqs = []
    for q_len, b in [(6, 9), (3, 12), (8, 5), (4, 14)]:
        p = _prompt(rng, q_len)
        p[-q_len:] = np.tile(p[-q_len:][:2], q_len // 2 + 1)[:q_len]
        reqs.append((p, b))

    server = ShowoMMUServer(CFG, params, slots=2, cap=64, chunk=3,
                            buckets=(16, 24), temperature=1.0, top_k=1,
                            speculative_k=3)
    handles = [server.submit(p, b) for p, b in reqs]
    done = server.run(jax.random.PRNGKey(29))

    assert len(done) == len(reqs)
    for h, (prompt, budget) in zip(handles, reqs):
        assert h.done and len(h.tokens) == budget
        assert h.tokens == _reference(params, prompt, budget), \
            f"speculative request {h.uid} diverged from greedy"
    assert server.engine.stat_steps > 0


def test_spec_adaptive_ab_commits_and_completes(params):
    """Under temperature sampling the engine A/B-probes the speculative
    vs plain decode programs (both sample the same filtered
    distribution) and commits to the measured winner; every request
    still completes with its full budget regardless of which program
    ran each window."""
    rng = np.random.default_rng(23)
    reqs = [(_prompt(rng, q), b)
            for q, b in [(6, 40), (3, 50), (8, 45), (4, 60)]]
    server = ShowoMMUServer(CFG, params, slots=2, cap=160, chunk=3,
                            buckets=(16, 24), temperature=0.9,
                            top_k=None, top_p=0.9, speculative_k=2)
    assert server.engine._alt_decode_chunk is not None
    handles = [server.submit(p, b) for p, b in reqs]
    done = server.run(jax.random.PRNGKey(41))
    assert len(done) == len(reqs)
    for h, (_, budget) in zip(handles, reqs):
        assert h.done and len(h.tokens) == budget
    # enough windows ran to finish probation on this workload
    assert server.engine.ab_choice in ("primary", "alt")


def test_spec_adaptive_not_built_for_greedy(params):
    """Greedy spec is token-exact and always a win — no A/B machinery."""
    server = ShowoMMUServer(CFG, params, slots=2, cap=64, chunk=3,
                            buckets=(16, 24), temperature=1.0, top_k=1,
                            speculative_k=2)
    assert server.engine._alt_decode_chunk is None
    assert server.engine.ab_choice is None


def test_speculative_v2_token_exact(params_v2):
    """v2 speculative decoding (embeds prompts, -1-masked token ring
    seeded by lookup_ids) stays token-exact vs plain greedy."""
    rng = np.random.default_rng(31)
    reqs = [(_v2_prompt(rng, t)[0], 3, b, list(rng.integers(2, 190, size=t)))
            for t, b in [(4, 10), (6, 7), (3, 12)]]

    server = Showo2MMUServer(V2, params_v2, slots=2, cap=72, chunk=3,
                             buckets=(20, 28), temperature=1.0, top_k=1,
                             speculative_k=3)
    handles = [server.submit(e, s, b, lookup_ids=ids)
               for e, s, b, ids in reqs]
    done = server.run(jax.random.PRNGKey(37))

    assert len(done) == len(reqs)
    for h, (emb, img_start, budget, _) in zip(handles, reqs):
        assert h.done and len(h.tokens) == budget
        assert h.tokens == _reference_v2(params_v2, emb, img_start, budget), \
            f"v2 speculative request {h.uid} diverged from greedy"


@pytest.mark.slow
def test_serving_engine_on_mesh(params):
    """The engine's compiled programs span a dp/fsdp/tp mesh unchanged —
    sharded params ride in as jit arguments, the compiler places the
    cache — and the slot scheduling stays token-exact vs the standalone
    per-request decode run under the SAME mesh (sharded vs unsharded
    numerics may differ: tp reduction order can flip greedy near-ties,
    so the comparison point is sharded-to-sharded)."""
    from showo_tpu.parallel.mesh import make_mesh, shard_params

    rng = np.random.default_rng(21)
    reqs = [(_prompt(rng, q), b) for q, b in [(3, 5), (7, 8), (2, 4)]]

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        server = ShowoMMUServer(CFG, sharded, slots=2, cap=48, chunk=3,
                                buckets=(16, 24), temperature=1.0, top_k=1)
        handles = [server.submit(pr, b) for pr, b in reqs]
        done = server.run(jax.random.PRNGKey(3))
        assert len(done) == len(reqs)
        for h, (prompt, budget) in zip(handles, reqs):
            assert len(h.tokens) == budget
            assert h.tokens == _reference(sharded, prompt, budget), \
                f"sharded request {h.uid} diverged from sharded reference"


def test_serve_cli_end_to_end(tmp_path, monkeypatch):
    """inference_serve drives the engine from a requests.jsonl: config
    loading, VQ encode, prompt assembly, serve, decode, out jsonl."""
    import json
    import sys

    from PIL import Image

    import showo_tpu.inference_serve as serve_mod
    from showo_tpu.models.magvit import MagvitV2, VQConfig
    from showo_tpu.models.showo import ShowoConfig as SC

    vq_tiny = VQConfig(ch=32, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
                       dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1),
                       z_channels=4)
    showo_tiny = SC(
        vocab_size=1027, llm_vocab_size=1010, num_new_special_tokens=0,
        codebook_size=16, num_vq_tokens=16,
        llm=PhiConfig(vocab_size=1027, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4))
    monkeypatch.setattr(serve_mod, "build_showo_config",
                        lambda c: showo_tiny)

    def tiny_vq(config):
        model = MagvitV2(vq_tiny)
        p = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 8, 8, 3)))["params"]
        return vq_tiny, p

    monkeypatch.setattr(serve_mod, "load_vq", tiny_vq)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")

    img_paths = []
    for i in range(2):
        p = tmp_path / f"img{i}.png"
        Image.new("RGB", (8, 8), (i * 90, 40, 10)).save(p)
        img_paths.append(str(p))
    reqs = tmp_path / "requests.jsonl"
    with open(reqs, "w") as f:
        f.write(json.dumps({"image": img_paths[0],
                            "question": "what color"}) + "\n")
        f.write(json.dumps({"image": img_paths[1], "question": "describe",
                            "max_new_tokens": 7}) + "\n")
        f.write(json.dumps({"image": img_paths[0],
                            "question": "is it big"}) + "\n")
    cfg = tmp_path / "serve.yaml"
    cfg.write_text(f"""
model:
  showo:
    pretrained_model_path: random
    llm_model_path: none
    vocab_size: 1027
    llm_vocab_size: 1010
    num_new_special_tokens: 0
    codebook_size: 16
    num_vq_tokens: 16
  vq_model:
    vq_model_name: random
dataset:
  params:
    resolution: 8
  preprocessing:
    max_seq_length: 40
""")
    out = tmp_path / "answers.jsonl"
    monkeypatch.setattr(sys, "argv", [
        "x", f"config={cfg}", f"requests={reqs}", f"out={out}",
        "slots=2", "chunk=3", "max_new_tokens=5"])
    serve_mod.main()

    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 3
    assert lines[1]["question"] == "describe"
    assert len(lines[1]["tokens"]) <= 7 and lines[1]["tokens"]
    for l in lines:
        assert "answer" in l and l["ttft_s"] is not None


def test_serve_cli_v2_end_to_end(tmp_path, monkeypatch):
    """inference_serve v2=1: embed assembly (VAE + dual-path embedder +
    chat scaffold) through Showo2MMUServer, answers to out jsonl."""
    import dataclasses
    import json
    import sys

    from PIL import Image

    import showo_tpu.inference_mmu_v2 as mmu_v2_mod
    import showo_tpu.inference_serve as serve_mod
    import showo_tpu.inference_t2i_v2 as t2i_v2_mod
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params

    # z must be 16: wan_encode normalizes by the (16,)-channel Wan
    # latent mean/std constants
    cli_cfg = dataclasses.replace(V2, image_latent_dim=16)
    cli_params = init_showo2_params(cli_cfg, jax.random.PRNGKey(6))
    vae_cfg = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2),
                           num_res_blocks=1, temperal_downsample=(True,))
    vae_params = init_wan_vae_params(vae_cfg, jax.random.PRNGKey(5))
    monkeypatch.setattr(t2i_v2_mod, "build_showo2_config",
                        lambda c: cli_cfg)
    monkeypatch.setattr(mmu_v2_mod, "load_models",
                        lambda config, cfg: (cli_params, vae_cfg,
                                             vae_params))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")

    img = tmp_path / "img.png"
    Image.new("RGB", (12, 12), (120, 40, 10)).save(img)
    reqs = tmp_path / "requests.jsonl"
    with open(reqs, "w") as f:
        f.write(json.dumps({"image": str(img),
                            "question": "what is shown"}) + "\n")
        f.write(json.dumps({"image": str(img), "question": "how many",
                            "max_new_tokens": 4}) + "\n")
    cfg = tmp_path / "serve_v2.yaml"
    cfg.write_text("""
model:
  showo:
    pretrained_model_path: random
    llm_model_path: none
  vae_model:
    pretrained_model_path: none
dataset:
  preprocessing:
    resolution: 12
""")
    out = tmp_path / "answers.jsonl"
    monkeypatch.setattr(sys, "argv", [
        "x", f"config={cfg}", f"requests={reqs}", f"out={out}",
        "v2=1", "slots=2", "chunk=3", "max_new_tokens=6"])
    serve_mod.main()

    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 2
    for l in lines:
        # tokens may be empty if the fake eos fires immediately; the
        # fields and timings must still be present
        assert "answer" in l and "tokens" in l and l["ttft_s"] is not None
    assert len(lines[1]["tokens"]) <= 4


def test_engine_eot_frees_slot(params):
    """A request hitting EOT finishes early; its slot serves the queue."""
    rng = np.random.default_rng(9)
    prompt = _prompt(rng, 4)
    # find the greedy continuation's second token and declare it EOT so the
    # engine must cut generation at 2 tokens while budget says 10
    ref = _reference(params, prompt, 3)
    eot = ref[1]
    server = ShowoMMUServer(CFG, params, slots=1, cap=64, chunk=4,
                            buckets=(24,), temperature=1.0, top_k=1,
                            eot_token=eot)
    h = server.submit(prompt, 10)
    h2 = server.submit(_prompt(rng, 5), 4)
    done = server.run(jax.random.PRNGKey(2))
    assert len(done) == 2
    assert h.done and h.tokens[-1] == eot and len(h.tokens) <= 4
    assert len(h2.tokens) == 4


def test_fused_admission_token_exact(params):
    """Fused admission (prefill inside a decode step, fused_admit.py) is
    pure scheduling: with the same fused-mlp params and greedy sampling,
    the engine produces the SAME tokens whether admissions dispatch the
    standalone prefill program or ride a decode step's weight stream.
    Queue > slots so refills happen while other lanes are mid-decode (the
    fused path); mixed budgets so admissions land at varied offsets."""
    from showo_tpu.models.phi import fuse_parallel_mlp

    fparams = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    rng = np.random.default_rng(13)
    reqs = [(_prompt(rng, q), b)
            for q, b in [(3, 6), (8, 12), (2, 4), (9, 8), (5, 15), (4, 3),
                         (6, 9), (7, 5)]]

    outs = []
    for fused in (False, True):
        server = ShowoMMUServer(CFG, fparams, slots=2, cap=64, chunk=3,
                                buckets=(16, 24), temperature=1.0, top_k=1,
                                fused_admit=fused)
        handles = [server.submit(p, b) for p, b in reqs]
        done = server.run(jax.random.PRNGKey(11))
        assert len(done) == len(reqs)
        assert all(h.done and len(h.tokens) == b
                   for h, (_, b) in zip(handles, reqs))
        outs.append([list(h.tokens) for h in handles])
    assert outs[0] == outs[1], "fused admission changed generated tokens"
    assert server.engine._fused_cache, "fused path was never exercised"


def test_fused_admission_eot(params):
    """EOT finishes + slot reuse stay correct under fused admissions."""
    from showo_tpu.models.phi import fuse_parallel_mlp

    fparams = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    rng = np.random.default_rng(9)
    prompt = _prompt(rng, 4)
    bias = omni_mask_mmu(jnp.asarray(prompt)[None], eoi_id=EOI,
                         dtype=jnp.float32)
    toks, _ = showo_mmu_generate(
        CFG, fparams, jnp.asarray(prompt)[None], jax.random.PRNGKey(7),
        prompt_bias=bias, max_new_tokens=3, temperature=1.0, top_k=1)
    eot = int(np.asarray(toks)[0][1])
    server = ShowoMMUServer(CFG, fparams, slots=2, cap=64, chunk=4,
                            buckets=(24,), temperature=1.0, top_k=1,
                            eot_token=eot, fused_admit=True)
    h = server.submit(prompt, 10)
    rest = [server.submit(_prompt(rng, 5), 4) for _ in range(4)]
    done = server.run(jax.random.PRNGKey(2))
    assert len(done) == 5
    assert h.done and eot in h.tokens[:h.tokens.index(eot) + 1]
    assert all(r.done and len(r.tokens) <= 4 for r in rest)

"""CLI entry: continuous-batching MMU serving (beyond parity).

The reference answers MMU requests one at a time (inference_mmu.py's
image x question loop); this entry serves a whole request file through
the slot engine (showo_tpu/serving) — per-lane KV offsets, one compiled
decode program, lanes refilled the moment a request finishes.

    # v1 (Show-o / Phi):
    python -m showo_tpu.inference_serve config=configs/showo_demo.yaml \
        requests=requests.jsonl [out=answers.jsonl] \
        [slots=8] [chunk=16] [lookahead=4] [int8=1] [spec=4] \
        [max_new_tokens=100]
    # v2 (Show-o2 / Qwen2):
    python -m showo_tpu.inference_serve v2=1 \
        config=configs/showo2_1.5b_demo_432x432.yaml requests=requests.jsonl

``requests.jsonl`` lines: {"image": path, "question": str,
"max_new_tokens": int (optional, defaults to the config value)}.
Without ``requests=``, falls back to the inference_mmu interface
(mmu_image_root + 'question=a *** b') with one request per
image x question pair.  Answers print in submission order and land in
``out`` as jsonl when given (with per-request TTFT).  ``spec=k`` turns
on prompt-lookup speculative decoding (greedy-exact; v1 only).
"""

from __future__ import annotations

import json
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.config import get_config
from showo_tpu.inference_t2i import (
    build_showo_config,
    load_params,
    load_tokenizer,
    load_vq,
)
from showo_tpu.prompting import UniversalPrompting
from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def gather_requests(config) -> List[dict]:
    if "requests" in config:
        with open(config.requests) as f:
            return [json.loads(line) for line in f if line.strip()]
    root = config.mmu_image_root
    questions = str(config.question).split(" *** ")
    reqs = []
    for fname in sorted(os.listdir(root)):
        if fname.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            for q in questions:
                reqs.append({"image": os.path.join(root, fname),
                             "question": q})
    return reqs


def _decode_and_emit(config, reqs, handles, eot, batch_decode, dt):
    total = sum(len(h.tokens) for h in handles)
    logger.info("served %d requests, %d tokens in %.2fs (%.1f tok/s)",
                len(handles), total, dt, total / max(dt, 1e-9))
    out_path = config.get("out", None)
    out_f = open(out_path, "w") if out_path else None
    for r, h in zip(reqs, handles):
        toks = [t for t in h.tokens if t != eot]
        text = batch_decode(toks)
        print(f"[{os.path.basename(r['image'])}] User: {r['question']}\n"
              f" Answer: {text}")
        if out_f:
            out_f.write(json.dumps({
                **{k: r[k] for k in ("image", "question")},
                "answer": text, "tokens": toks,
                "ttft_s": (h.first_token_at - h.submitted_at
                           if h.first_token_at else None)}) + "\n")
    if out_f:
        out_f.close()


def main_v2(config) -> None:
    """Show-o2 serving: per-request embed assembly (inference_mmu_v2
    layout) through Showo2MMUServer."""
    import time

    from PIL import Image

    from showo_tpu.inference_mmu_v2 import load_models
    from showo_tpu.inference_t2i_v2 import (build_showo2_config,
                                            load_tokenizer_and_ids)
    from showo_tpu.serving import Showo2MMUServer
    from showo_tpu.show_o2.dit import time_embed_apply
    from showo_tpu.show_o2.showo2 import embed_images, fuse_inference
    from showo_tpu.show_o2.wan_vae import wan_encode
    from showo_tpu.utils.image import image_transform

    cfg = build_showo2_config(config)
    tokenizer, ids = load_tokenizer_and_ids(config)
    params, vae_cfg, vae_params = load_models(config, cfg)
    params = fuse_inference(params)
    if bool(int(config.get("int8", 0))):
        from showo_tpu.show_o2.qwen2 import quantize_int8 as _q8

        params = dict(params, showo=jax.jit(_q8)(params["showo"]))

    def tok(text: str) -> List[int]:
        t = tokenizer(text, add_special_tokens=False)["input_ids"]
        if t and isinstance(t[0], list):
            t = t[0]
        return list(t)

    sys_ids = tok("system\nYou are a helpful assistant.")
    role_a, role_b = tok("\nuser\n"), tok("\nassistant\n")
    embed = params["showo"]["embed"]
    t1 = jnp.ones((1,), jnp.float32)
    time_embeds = time_embed_apply(params["time_embed"], t1, embed.dtype)
    if "time_embed_proj" in params:
        tp = params["time_embed_proj"]
        time_embeds = time_embeds @ tp["kernel"] + tp["bias"]

    encode = jax.jit(lambda px, k: embed_images(
        cfg, params, wan_encode(vae_cfg, vae_params, px, k)[:, :, 0]))

    default_budget = int(config.get("max_new_tokens", 300))
    res = config.dataset.preprocessing.resolution
    reqs = gather_requests(config)
    if not reqs:
        logger.warning("no requests found")
        return
    key = jax.random.PRNGKey(int(config.get("seed", 0)))
    emb_cache: dict = {}
    prompts, budgets = [], []
    # reference quirk parity (show-o2/inference_mmu.py:144, mmu_v2.py:90):
    # the span starts at len([bos]+sys+role_a) + 2 — the first PATCH row —
    # and its num_image_tokens length then also covers the eoi row
    img_start = 1 + len(sys_ids) + len(role_a) + 2
    for r in reqs:
        path = r["image"]
        if path not in emb_cache:
            pil = Image.open(path).convert("RGB")
            px = jnp.transpose(
                jnp.asarray(image_transform(pil, res))[None],
                (0, 3, 1, 2))[:, :, None]
            key, k1 = jax.random.split(key)
            emb_cache[path] = encode(px, k1)
        tokens_a = jnp.asarray(
            [[ids["bos_id"]] + sys_ids + role_a + [ids["boi_id"]]])
        tokens_b = jnp.asarray(
            [[ids["eoi_id"]] + tok(r["question"]) + role_b])
        rows = jnp.concatenate([
            embed[tokens_a], time_embeds[:, None, :], emb_cache[path],
            embed[tokens_b]], axis=1)[0]
        prompts.append(np.asarray(rows))
        budgets.append(int(r.get("max_new_tokens", default_budget)))

    slots = int(config.get("slots", 4))
    chunk = int(config.get("chunk", 16))
    lookahead = int(config.get("lookahead", 4))
    lens = sorted(p.shape[0] for p in prompts)
    buckets = sorted({_round_up(lens[len(lens) // 2], 32),
                      _round_up(lens[-1], 32)})
    cap = _round_up(max(p.shape[0] + b for p, b in zip(prompts, budgets))
                    + chunk * lookahead + slots, 64)
    server = Showo2MMUServer(
        cfg, params, slots=slots, cap=cap, chunk=chunk, buckets=buckets,
        temperature=float(config.get("temperature", 1.0)),
        top_k=(int(config["top_k"]) if "top_k" in config else 1),
        top_p=(float(config["top_p"]) if "top_p" in config else None),
        eos_token=int(ids["eos_id"]), lookahead=lookahead,
        kv_int8=bool(int(config.get("kv_int8", 0))))
    handles = [server.submit(p, img_start, b)
               for p, b in zip(prompts, budgets)]
    t0 = time.perf_counter()
    server.run(key)
    dt = time.perf_counter() - t0

    def batch_decode(toks):
        try:
            return tokenizer.batch_decode([toks],
                                          skip_special_tokens=True)[0]
        except AttributeError:
            return str(toks)

    _decode_and_emit(config, reqs, handles, int(ids["eos_id"]),
                     batch_decode, dt)


def main() -> None:
    from PIL import Image

    from showo_tpu.models.magvit import MagvitV2
    from showo_tpu.models.phi import fuse_parallel_mlp
    from showo_tpu.serving import ShowoMMUServer
    from showo_tpu.utils.image import image_transform

    config = get_config()
    if bool(int(config.get("v2", 0))):
        return main_v2(config)
    cfg = build_showo_config(config)
    params = load_params(config, cfg)
    params = dict(params, showo=fuse_parallel_mlp(params["showo"]))
    if bool(int(config.get("int8", 0))):
        from showo_tpu.models.phi import quantize_int8

        params = dict(params, showo=jax.jit(quantize_int8)(params["showo"]))
    vq_cfg, vq_params = load_vq(config)
    tokenizer = load_tokenizer(config)
    uni = UniversalPrompting(
        tokenizer, max_text_len=config.dataset.preprocessing.max_seq_length)
    sp = uni.sptids

    vq = MagvitV2(vq_cfg)
    encode = jax.jit(lambda px: vq.apply({"params": vq_params}, px,
                                         method=vq.get_code))

    default_budget = int(config.get("max_new_tokens", 100))
    res = config.dataset.params.resolution
    reqs = gather_requests(config)
    if not reqs:
        logger.warning("no requests found")
        return

    # build token prompts: [mmu][soi] vq tokens [eoi][sot] question ids
    code_cache: dict = {}
    prompts, budgets = [], []
    for r in reqs:
        path = r["image"]
        if path not in code_cache:
            pil = Image.open(path).convert("RGB")
            img = image_transform(pil, res)
            code_cache[path] = (np.asarray(encode(jnp.asarray(img)[None]))[0]
                                + cfg.codebook_offset)
        q_ids = uni.text_tokenizer(
            ["USER: \n" + r["question"] + " ASSISTANT:"])["input_ids"][0]
        prompts.append(np.concatenate([
            [sp["<|mmu|>"], sp["<|soi|>"]], code_cache[path],
            [sp["<|eoi|>"], sp["<|sot|>"]],
            np.asarray(q_ids, np.int64)]).astype(np.int32))
        budgets.append(int(r.get("max_new_tokens", default_budget)))

    slots = int(config.get("slots", 8))
    chunk = int(config.get("chunk", 16))
    lookahead = int(config.get("lookahead", 4))
    spec = int(config.get("spec", 0))  # prompt-lookup speculative draft len
    lens = sorted(len(p) for p in prompts)
    buckets = sorted({_round_up(lens[len(lens) // 2], 32),
                      _round_up(lens[(3 * len(lens)) // 4], 32),
                      _round_up(lens[-1], 32)})
    # + slots: fused admissions advance decode between windows (engine
    # margin, serving/engine.py::_fill_slots)
    cap = _round_up(max(len(p) + b for p, b in zip(prompts, budgets))
                    + chunk * lookahead * (spec + 1) + slots, 64)

    server = ShowoMMUServer(
        cfg, params, slots=slots, cap=cap, chunk=chunk, buckets=buckets,
        temperature=float(config.get("temperature", 1.0)),
        top_k=(int(config["top_k"]) if "top_k" in config else 1),
        top_p=(float(config["top_p"]) if "top_p" in config else None),
        eot_token=int(sp["<|eot|>"]), lookahead=lookahead,
        speculative_k=spec,
        kv_int8=bool(int(config.get("kv_int8", 0))))
    handles = [server.submit(p, b) for p, b in zip(prompts, budgets)]
    import time

    t0 = time.perf_counter()
    server.run(jax.random.PRNGKey(int(config.get("seed", 0))))
    dt = time.perf_counter() - t0

    def batch_decode(toks):
        try:
            return uni.text_tokenizer.batch_decode(
                [toks], skip_special_tokens=True)[0]
        except AttributeError:
            return str(toks)

    _decode_and_emit(config, reqs, handles, int(sp["<|eot|>"]),
                     batch_decode, dt)


if __name__ == "__main__":
    main()

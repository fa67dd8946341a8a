"""CLI entry: continuous-batching MMU serving (beyond parity).

The reference answers MMU requests one at a time (inference_mmu.py's
image x question loop); this entry serves a whole request file through
the slot engine (showo_tpu/serving) — per-lane KV offsets, one compiled
decode program, lanes refilled the moment a request finishes.

    python -m showo_tpu.inference_serve config=configs/showo_demo.yaml \
        requests=requests.jsonl [out=answers.jsonl] \
        [slots=8] [chunk=16] [lookahead=4] [int8=1] [max_new_tokens=100]

``requests.jsonl`` lines: {"image": path, "question": str,
"max_new_tokens": int (optional, defaults to the config value)}.
Without ``requests=``, falls back to the inference_mmu interface
(mmu_image_root + 'question=a *** b') with one request per
image x question pair.  Answers print in submission order and land in
``out`` as jsonl when given.
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


def main() -> None:
    from PIL import Image

    from showo_tpu.models.magvit import MagvitV2
    from showo_tpu.models.phi import fuse_parallel_mlp
    from showo_tpu.serving import ShowoMMUServer
    from showo_tpu.utils.image import image_transform

    config = get_config()
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
    lens = sorted(len(p) for p in prompts)
    buckets = sorted({_round_up(lens[len(lens) // 2], 32),
                      _round_up(lens[(3 * len(lens)) // 4], 32),
                      _round_up(lens[-1], 32)})
    cap = _round_up(max(len(p) + b for p, b in zip(prompts, budgets))
                    + chunk * lookahead, 64)

    server = ShowoMMUServer(
        cfg, params, slots=slots, cap=cap, chunk=chunk, buckets=buckets,
        temperature=float(config.get("temperature", 1.0)),
        top_k=(int(config["top_k"]) if "top_k" in config else 1),
        top_p=(float(config["top_p"]) if "top_p" in config else None),
        eot_token=int(sp["<|eot|>"]), lookahead=lookahead)
    handles = [server.submit(p, b) for p, b in zip(prompts, budgets)]
    import time

    t0 = time.perf_counter()
    done = server.run(jax.random.PRNGKey(int(config.get("seed", 0))))
    dt = time.perf_counter() - t0
    total = sum(len(h.tokens) for h in done)
    logger.info("served %d requests, %d tokens in %.2fs (%.1f tok/s)",
                len(done), total, dt, total / max(dt, 1e-9))

    eot = int(sp["<|eot|>"])
    out_path = config.get("out", None)
    out_f = open(out_path, "w") if out_path else None
    for r, h in zip(reqs, handles):
        toks = [t for t in h.tokens if t != eot]
        try:
            text = uni.text_tokenizer.batch_decode(
                [toks], skip_special_tokens=True)[0]
        except AttributeError:
            text = str(toks)
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


if __name__ == "__main__":
    main()

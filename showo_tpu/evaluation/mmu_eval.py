"""MMU question-answering sweep + scoring.

The reference defers understanding benchmarks to the external lmms-eval
harness (show-o2/README.md:205-231).  This driver covers the in-repo
half: run a jsonl of {image, question, answer} items through an MMU
pipeline, write predictions, and compute exact-match / substring
accuracy so regressions are visible without the external harness.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import jax
import numpy as np

from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def normalize_answer(text: str) -> str:
    """Lower, strip articles/punctuation/whitespace (VQA-style matching)."""
    text = text.lower().strip()
    text = re.sub(r"\b(a|an|the)\b", " ", text)
    text = re.sub(r"[^a-z0-9 ]", "", text)
    return re.sub(r"\s+", " ", text).strip()


def score_predictions(items) -> dict:
    """items: iterable of {prediction, answer}; returns accuracy dict."""
    n = exact = substr = 0
    for it in items:
        pred = normalize_answer(str(it["prediction"]))
        ans = normalize_answer(str(it["answer"]))
        n += 1
        exact += int(pred == ans)
        substr += int(bool(ans) and ans in pred)
    return {"num": n, "exact_match": exact / max(n, 1),
            "contains": substr / max(n, 1)}


def run_mmu_eval(pipeline, eval_jsonl: str, image_root: str, outdir: str,
                 seed: int = 0, device_id: Optional[int] = None,
                 num_devices: Optional[int] = None,
                 max_items: Optional[int] = None,
                 benchmark: Optional[str] = None) -> dict:
    """pipeline: object with .answer(image_nhwc, question, key) -> token ids
    and .decode(tokens) -> str (MMUPipeline / MMUV2Pipeline shape).
    Writes predictions.jsonl + metrics.json under ``outdir``.

    benchmark: None (generic exact/substring scoring) or one of
    "mme" | "pope" | "gqa" | "mmmu" — scores with that benchmark's
    published protocol (evaluation/lmms_benchmarks.py); items then carry
    the benchmark's extra fields (category/options/...) through."""
    from PIL import Image

    from showo_tpu.utils.image import image_transform

    if device_id is None:
        device_id = jax.process_index()
        num_devices = jax.process_count()

    with open(eval_jsonl) as f:
        items = [json.loads(l) for l in f if l.strip()]
    if max_items:
        items = items[:max_items]
    items = [items[i] for i in
             np.array_split(np.arange(len(items)), num_devices)[device_id]]

    os.makedirs(outdir, exist_ok=True)
    key = jax.random.PRNGKey(seed + device_id)
    preds = []
    for it in items:
        img = image_transform(
            Image.open(os.path.join(image_root, it["image"])).convert("RGB"),
            resolution=getattr(pipeline, "resolution", 256))
        key, k = jax.random.split(key)
        toks = pipeline.answer(img, it["question"], k)
        text = pipeline.decode(toks) if hasattr(pipeline, "decode") else str(toks)
        preds.append(dict(it, prediction=text,
                          answer=it.get("answer", "")))

    with open(os.path.join(outdir, f"predictions_{device_id}.jsonl"), "w") as f:
        for p in preds:
            f.write(json.dumps(p) + "\n")
    scored = [p for p in preds if p["answer"]]
    if benchmark:
        from showo_tpu.evaluation.lmms_benchmarks import score_benchmark

        metrics = score_benchmark(benchmark, scored)
    else:
        metrics = score_predictions(scored)
    with open(os.path.join(outdir, f"metrics_{device_id}.json"), "w") as f:
        json.dump(metrics, f)
    logger.info("mmu eval shard %d: %s", device_id, metrics)
    return metrics


def main() -> None:
    """CLI: sweep an eval jsonl through the MMU pipeline and score it.

        python -m showo_tpu.evaluation.mmu_eval \\
            config=configs/showo2_1.5b_demo_432x432.yaml v2=1 \\
            eval_jsonl=questions.jsonl image_root=./images outdir=out \\
            [benchmark=mme|pope|gqa|mmmu] [max_items=N]

    v2=1 uses the Show-o2 pipeline; default is v1 Show-o.  Multi-host
    runs shard items by jax.process_index (same scheme as geneval).
    """
    from showo_tpu.config import get_config

    config = get_config()
    if bool(int(config.get("v2", 0))):
        from showo_tpu.inference_mmu_v2 import load_models
        from showo_tpu.inference_t2i_v2 import (build_showo2_config,
                                                load_tokenizer_and_ids)
        from showo_tpu.pipelines.mmu_v2 import MMUV2Pipeline

        cfg = build_showo2_config(config)
        params, vae_cfg, vae_params = load_models(config, cfg)
        tokenizer, token_ids = load_tokenizer_and_ids(config)
        pipe = MMUV2Pipeline(
            cfg=cfg, params=params, vae_cfg=vae_cfg, vae_params=vae_params,
            tokenizer=tokenizer, token_ids=token_ids,
            max_new_tokens=int(config.get("max_new_tokens", 100)),
            top_k=int(config.get("top_k", 1)))
    else:
        from showo_tpu.inference_mmu import build_pipeline

        pipe = build_pipeline(config)
    metrics = run_mmu_eval(
        pipe, str(config["eval_jsonl"]), str(config["image_root"]),
        str(config.get("outdir", "mmu_eval_out")),
        seed=int(config.get("seed", 0)),
        max_items=(int(config["max_items"]) if "max_items" in config
                   else None),
        benchmark=config.get("benchmark"))
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()

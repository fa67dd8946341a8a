"""GenEval image-sweep driver (show-o2/evaluation/inference_geneval.py).

Metadata jsonl prompts -> per-prompt sample folders
(``outdir/<idx>/samples/xxxxx.png`` + ``metadata.jsonl``), sharded across
hosts by ``jax.process_index()`` (replacing the reference's
device_id/num_devices env sharding, :100-104).  Scoring runs in the
external GenEval harness, as in the reference.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from showo_tpu.utils.image import to_pil_images
from showo_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def run_geneval_sweep(pipeline, metadata_file: str, outdir: str,
                      batch_size: int = 4, seed: int = 0,
                      device_id: Optional[int] = None,
                      num_devices: Optional[int] = None):
    """pipeline: any object with .generate(prompts, key) -> NHWC [-1,1]."""
    if device_id is None:
        device_id = jax.process_index()
        num_devices = jax.process_count()

    with open(metadata_file) as f:
        metadatas = [json.loads(line) for line in f if line.strip()]
    indices = np.array_split(np.arange(len(metadatas)), num_devices)[device_id]

    key = jax.random.PRNGKey(seed + device_id)
    for idx in indices:
        meta = metadatas[idx]
        prompts = [meta["prompt"]] * batch_size
        outpath = os.path.join(outdir, f"{idx:05d}")
        sample_path = os.path.join(outpath, "samples")
        os.makedirs(sample_path, exist_ok=True)
        with open(os.path.join(outpath, "metadata.jsonl"), "w") as fp:
            json.dump(meta, fp)

        key, k = jax.random.split(key)
        images = pipeline.generate(prompts, k)
        for i, im in enumerate(to_pil_images(images)):
            im.save(os.path.join(sample_path, f"{i:05d}.png"))
        logger.info("geneval prompt %d done (%s)", idx, meta["prompt"][:40])


def run_dpg_sweep(pipeline, prompts_dir: str, outdir: str,
                  batch_size: int = 4, seed: int = 0,
                  device_id: Optional[int] = None,
                  num_devices: Optional[int] = None):
    """DPG-Bench: one txt prompt per file -> ``outdir/<name>.png`` grids
    (show-o2/evaluation/inference_dpg.py pattern); mPLUG VQA scoring stays
    external (compute_dpg_bench.py equivalent)."""
    if device_id is None:
        device_id = jax.process_index()
        num_devices = jax.process_count()

    files = sorted(f for f in os.listdir(prompts_dir) if f.endswith(".txt"))
    files = np.array_split(np.asarray(files), num_devices)[device_id]
    os.makedirs(outdir, exist_ok=True)

    key = jax.random.PRNGKey(seed + device_id)
    for fname in files:
        with open(os.path.join(prompts_dir, fname)) as f:
            prompt = f.read().strip()
        key, k = jax.random.split(key)
        images = pipeline.generate([prompt] * batch_size, k)
        # 2x2 grid as DPG expects
        pil = to_pil_images(images)
        from PIL import Image

        w, h = pil[0].size
        grid = Image.new("RGB", (2 * w, 2 * h))
        for i, im in enumerate(pil[:4]):
            grid.paste(im, ((i % 2) * w, (i // 2) * h))
        grid.save(os.path.join(outdir, fname.replace(".txt", ".png")))

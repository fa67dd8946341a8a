"""CLI entry: Show-o2 video understanding.

    python -m showo_tpu.inference_mmu_vid config=configs/showo2_1.5b_demo_432x432.yaml \
        video_path=./videos/clip.gif 'question=What happens in this video?'

Videos load via PIL (frame dirs / GIFs); the decord C++ dependency of the
reference (show-o2/utils.py:236-253) is replaced by host-side sampling in
showo_tpu/utils/video.py.
"""

from __future__ import annotations

import jax

from showo_tpu.config import get_config
from showo_tpu.inference_mmu_v2 import load_models
from showo_tpu.inference_t2i_v2 import (
    build_showo2_config,
    load_tokenizer_and_ids,
)
from showo_tpu.pipelines.mmu_vid import MMUVidPipeline
from showo_tpu.utils.video import load_video


def main() -> None:
    config = get_config()
    cfg = build_showo2_config(config)
    tokenizer, token_ids = load_tokenizer_and_ids(config)
    params, vae_cfg, vae_params = load_models(config, cfg)

    pipe = MMUVidPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                          vae_params=vae_params, tokenizer=tokenizer,
                          token_ids=token_ids,
                          max_new_tokens=int(config.get("max_new_tokens", 300)),
                          top_k=int(config.get("top_k", 1)),
                          top_p=(float(config["top_p"]) if "top_p" in config else None),
                          num_frames=int(config.get("num_frames", 9)))

    frames = load_video(str(config.video_path),
                        num_frames=int(config.get("num_frames", 9)),
                        resolution=config.dataset.preprocessing.resolution)
    key = jax.random.PRNGKey(int(config.get("seed", 0)))
    for q in str(config.question).split(" *** "):
        key, k = jax.random.split(key)
        toks = pipe.answer_video(frames, q, k)
        try:
            text = tokenizer.batch_decode([toks], skip_special_tokens=True)[0]
        except AttributeError:
            text = str(toks)
        print(f"User: {q}\n Answer: {text}")


if __name__ == "__main__":
    main()

"""Tokenizer setup for Show-o2 (show-o2/models/misc.py:337-386
``get_text_tokenizer`` parity).

Adds [PAD] plus the showo tokens and returns the showo_token_ids dict for
qwen2_5 (native vision tokens reused) or llama3 (7 added tokens).
"""

from __future__ import annotations

from typing import Dict, Tuple


def get_text_tokenizer(model_path: str, add_showo_tokens: bool = True,
                       return_showo_token_ids: bool = False,
                       llm_name: str = "qwen2_5"):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_path)
    tok.add_special_tokens({"pad_token": "[PAD]"})
    if add_showo_tokens:
        if llm_name == "llama3":
            for t in ("<|img_start|>", "<|img_end|>", "<|image_pad|>",
                      "<|video_pad|>", "<|vid_start|>", "<|vid_end|>",
                      "<image>"):
                tok.add_tokens(t)
        elif llm_name == "qwen2_5":
            for t in ("<image>", "<|vid_start|>", "<|vid_end|>"):
                tok.add_tokens(t)
        else:
            raise NotImplementedError(llm_name)

    if not return_showo_token_ids:
        return tok

    vocab = tok.get_vocab()
    if llm_name == "llama3":
        ids = {
            "bos_id": vocab["<|begin_of_text|>"],
            "eos_id": tok.eos_token_id,
            "boi_id": vocab["<|img_start|>"],
            "eoi_id": vocab["<|img_end|>"],
            "bov_id": vocab["<|vid_start|>"],
            "eov_id": vocab["<|vid_end|>"],
            "img_pad_id": vocab["<|image_pad|>"],
            "vid_pad_id": vocab["<|video_pad|>"],
            "img_id": vocab["<image>"],
        }
    else:
        ids = {
            "bos_id": vocab["<|im_start|>"],
            "eos_id": tok.eos_token_id,
            "boi_id": vocab["<|vision_start|>"],
            "eoi_id": vocab["<|vision_end|>"],
            "bov_id": vocab["<|vid_start|>"],
            "eov_id": vocab["<|vid_end|>"],
            "img_pad_id": vocab["<|image_pad|>"],
            "vid_pad_id": vocab["<|video_pad|>"],
            "img_id": vocab["<image>"],
        }
    ids["pad_id"] = tok.pad_token_id
    return tok, ids

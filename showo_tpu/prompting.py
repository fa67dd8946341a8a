"""UniversalPrompting: task-tagged sequence assembly for the unified model.

Host-side preprocessing that turns (text, image-token) pairs into
fixed-shape token/label buffers per task — numpy, feeding device arrays.
Faithful to training/prompting_utils.py:18-464, including its quirks:

* t2i/t2v/lvg left-pad text to ``max_text_len`` (= max_seq_length + 1 for
  the prepended task token); lm/mmu right-pad;
* the 1-D attention masks the reference returns are effectively all-ones
  over (text+image+3) in every padded branch because the pad count is
  computed after ``temp_ids`` has already been padded
  (prompting_utils.py:60-61, 181-182) — reproduced as all-ones here;
* conditioning dropout replaces the text with ``[task][bos][eos]``;
* labels keep soi/eoi ids, pads become ``ignore_id``.

The tokenizer is any object with ``__call__(texts) -> {'input_ids': ...}``,
``bos_token_id``/``eos_token_id``/``pad_token_id`` and
``convert_tokens_to_ids``; see tests for a minimal fake.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

SPECIAL_TOKENS = ("<|soi|>", "<|eoi|>", "<|sov|>", "<|eov|>", "<|t2i|>",
                  "<|mmu|>", "<|t2v|>", "<|v2v|>", "<|lvg|>")


class UniversalPrompting:
    def __init__(self, text_tokenizer, special_tokens=SPECIAL_TOKENS,
                 max_text_len: int = 8000, ignore_id: int = -100,
                 cond_dropout_prob: float = 0.1, rng: np.random.Generator | None = None):
        self.text_tokenizer = text_tokenizer
        if getattr(text_tokenizer, "pad_token", None) is None:
            try:
                text_tokenizer.add_special_tokens({"pad_token": "[PAD]"})
            except AttributeError:
                pass
        try:
            text_tokenizer.add_tokens(list(special_tokens))
        except AttributeError:
            pass
        self.sptids = {t: int(text_tokenizer.convert_tokens_to_ids([t])[0])
                       for t in special_tokens}
        self.sptids["<|sot|>"] = int(text_tokenizer.bos_token_id)
        self.sptids["<|eot|>"] = int(text_tokenizer.eos_token_id)
        self.sptids["<|pad|>"] = int(text_tokenizer.pad_token_id)
        # plus 1 for the prepended task token (prompting_utils.py:33-34)
        self.max_text_len = max_text_len + 1
        self.pad_id = int(text_tokenizer.pad_token_id)
        self.ignore_id = ignore_id
        self.cond_dropout_prob = cond_dropout_prob
        self.rng = rng or np.random.default_rng(0)

    # -- helpers ---------------------------------------------------------
    def _with_bos(self, ids: List[int]) -> List[int]:
        bos = int(self.text_tokenizer.bos_token_id)
        if len(ids) == 0:
            return [bos]
        if ids[0] != bos:
            return [bos] + ids
        return list(ids)

    def _gen_text(self, ids: List[int], task_token: int,
                  dropout: bool) -> List[int]:
        eos = int(self.text_tokenizer.eos_token_id)
        ids = self._with_bos(ids)
        if dropout:
            return [task_token, int(self.text_tokenizer.bos_token_id), eos]
        return [task_token] + ids + [eos]

    def _pad_left(self, ids: List[int]) -> List[int]:
        if self.max_text_len >= len(ids):
            return [self.pad_id] * (self.max_text_len - len(ids)) + ids
        eos = int(self.text_tokenizer.eos_token_id)
        return ids[: self.max_text_len - 1] + [eos]

    # -- tasks -----------------------------------------------------------
    def _gen_family(self, text_ids, image_ids, labels, soi: int, eoi: int,
                    task: int, with_labels: bool):
        image_ids = np.asarray(image_ids)
        B, n_img = image_ids.shape
        probs = self.rng.random(len(text_ids))
        seqs, masks, labs = [], [], []
        for i in range(len(text_ids)):
            drop = with_labels and probs[i] < self.cond_dropout_prob
            temp = self._pad_left(
                self._gen_text(list(text_ids[i]), task, drop))
            seq = np.concatenate([np.asarray(temp, np.int64), [soi],
                                  image_ids[i], [eoi]])
            # reference mask-length quirk: labels branch emits text+img+3
            # ones, gen branch emits text-only ones (prompting_utils.py:61,
            # 106 — the pad count is zero after temp_ids was repadded)
            mask = np.ones(len(temp) + n_img + 3 if with_labels else len(temp),
                           np.int64)
            seqs.append(seq)
            masks.append(mask)
            if with_labels:
                lab = np.concatenate([np.asarray(temp, np.int64), [soi],
                                      np.asarray(labels[i], np.int64), [eoi]])
                lab = np.where(lab == self.pad_id, self.ignore_id, lab)
                labs.append(lab)
        if with_labels:
            return (np.stack(seqs), np.stack(masks), np.stack(labs))
        return np.stack(seqs), np.stack(masks)

    def t2i_prompt(self, text_ids, image_ids, labels):
        return self._gen_family(text_ids, image_ids, labels,
                                self.sptids["<|soi|>"], self.sptids["<|eoi|>"],
                                self.sptids["<|t2i|>"], True)

    def t2i_gen_prompt(self, text_ids, image_ids):
        return self._gen_family(text_ids, image_ids, None,
                                self.sptids["<|soi|>"], self.sptids["<|eoi|>"],
                                self.sptids["<|t2i|>"], False)

    def t2v_prompt(self, text_ids, image_ids, labels):
        return self._gen_family(text_ids, image_ids, labels,
                                self.sptids["<|sov|>"], self.sptids["<|eov|>"],
                                self.sptids["<|t2v|>"], True)

    def t2v_gen_prompt(self, text_ids, image_ids):
        return self._gen_family(text_ids, image_ids, None,
                                self.sptids["<|sov|>"], self.sptids["<|eov|>"],
                                self.sptids["<|t2v|>"], False)

    def lvg_prompt(self, text_ids, image_ids, labels):
        # lvg uses the t2i task token (prompting_utils.py:324)
        return self._gen_family(text_ids, image_ids, labels,
                                self.sptids["<|soi|>"], self.sptids["<|eoi|>"],
                                self.sptids["<|t2i|>"], True)

    def lvg_gen_prompt(self, text_ids, image_ids):
        return self._gen_family(text_ids, image_ids, None,
                                self.sptids["<|soi|>"], self.sptids["<|eoi|>"],
                                self.sptids["<|t2i|>"], False)

    def i2v_prompt(self, image_ids, video_ids, labels=None):
        """Image-to-video sequence: ``[v2v][soi]img[eoi][sov]video[eov]``.

        The reference declares the task (dispatch at
        training/prompting_utils.py:447-450) but its ``i2v_prompt``
        (:301-310) is an empty stub returning None.  This is the concrete
        TPU-framework completion: the conditioning image span uses the
        soi/eoi markers, the generated clip uses sov/eov, tagged by the
        otherwise-unused ``<|v2v|>`` task token from the reference's
        special-token set (prompting_utils.py:20-32).  Labels (when given)
        follow the mmu convention: the conditioning prefix is ignore_id,
        supervision covers the video tokens and the eov marker.
        """
        image_ids = np.asarray(image_ids)
        video_ids = np.asarray(video_ids)
        B, n_img = image_ids.shape
        v2v, soi, eoi = (self.sptids["<|v2v|>"], self.sptids["<|soi|>"],
                         self.sptids["<|eoi|>"])
        sov, eov = self.sptids["<|sov|>"], self.sptids["<|eov|>"]
        seqs, masks, labs = [], [], []
        for i in range(B):
            seq = np.concatenate([[v2v, soi], image_ids[i], [eoi, sov],
                                  video_ids[i], [eov]])
            seqs.append(seq)
            masks.append(np.ones(len(seq), np.int64))
            if labels is not None:
                lab = np.concatenate([
                    np.full(n_img + 4, self.ignore_id, np.int64),
                    np.asarray(labels[i], np.int64), [eov]])
                labs.append(lab)
        if labels is not None:
            return np.stack(seqs), np.stack(masks), np.stack(labs)
        return np.stack(seqs), np.stack(masks)

    def lm_prompt(self, text_ids, max_seq_len: int):
        eos = int(self.text_tokenizer.eos_token_id)
        seqs, masks, labs = [], [], []
        for i in range(len(text_ids)):
            ids = self._with_bos(list(text_ids[i])) + [eos]
            if max_seq_len >= len(ids):
                lab = ids + [self.ignore_id] * (max_seq_len - len(ids))
                seq = ids + [self.pad_id] * (max_seq_len - len(ids))
                mask = [1] * len(seq)
            else:
                lab = ids[:max_seq_len]
                seq = ids[:max_seq_len]
                mask = [1] * len(seq)
            seqs.append(seq)
            masks.append(mask)
            labs.append(lab)
        return (np.asarray(seqs, np.int64), np.asarray(masks, np.int64),
                np.asarray(labs, np.int64))

    def mmu_prompt(self, image_ids, text_ids):
        image_ids = np.asarray(image_ids)
        n_img = image_ids.shape[-1]
        eos = int(self.text_tokenizer.eos_token_id)
        max_text_len = self.max_text_len - 1
        soi, eoi, mmu = (self.sptids["<|soi|>"], self.sptids["<|eoi|>"],
                         self.sptids["<|mmu|>"])
        seqs, masks, labs = [], [], []
        for i in range(len(text_ids)):
            ids = self._with_bos(list(text_ids[i])) + [eos]
            if max_text_len >= len(ids):
                ids = ids + [self.pad_id] * (max_text_len - len(ids))
                mask = [1] * (len(ids) + n_img + 3)
            else:
                ids = ids[: max_text_len - 1] + [eos]
                mask = [1] * (len(ids) + n_img + 3)
            lab = np.concatenate([
                [self.ignore_id, self.ignore_id],
                np.full(n_img, self.ignore_id, np.int64),
                [self.ignore_id],
                np.asarray(ids, np.int64),
            ])
            lab = np.where(lab == self.pad_id, self.ignore_id, lab)
            seq = np.concatenate([[mmu], [soi], image_ids[i], [eoi],
                                  np.asarray(ids, np.int64)])
            seqs.append(seq)
            masks.append(mask)
            labs.append(lab)
        return (np.stack(seqs), np.asarray(masks, np.int64), np.stack(labs))

    # -- device-assembly helpers ----------------------------------------
    def t2i_text_block(self, texts, task_token: str = "<|t2i|>",
                       dropout: bool = True) -> np.ndarray:
        """Left-padded text blocks [B, max_text_len] for on-device t2i
        sequence assembly (the [soi]img[eoi] tail is concatenated inside
        the compiled step)."""
        text_ids = self.text_tokenizer(list(texts))["input_ids"]
        probs = self.rng.random(len(text_ids)) if dropout else np.ones(len(text_ids))
        out = []
        for i, ids in enumerate(text_ids):
            drop = probs[i] < self.cond_dropout_prob
            out.append(self._pad_left(
                self._gen_text(list(ids), self.sptids[task_token], drop)))
        return np.asarray(out, np.int64)

    def mmu_text_block(self, texts):
        """Right-padded text blocks + labels [B, max_text_len-1] for
        on-device mmu assembly."""
        eos = int(self.text_tokenizer.eos_token_id)
        max_text_len = self.max_text_len - 1
        text_ids = self.text_tokenizer(list(texts))["input_ids"]
        blocks, labels = [], []
        for ids in text_ids:
            ids = self._with_bos(list(ids)) + [eos]
            if max_text_len >= len(ids):
                ids = ids + [self.pad_id] * (max_text_len - len(ids))
            else:
                ids = ids[: max_text_len - 1] + [eos]
            lab = [self.ignore_id if t == self.pad_id else t for t in ids]
            blocks.append(ids)
            labels.append(lab)
        return np.asarray(blocks, np.int64), np.asarray(labels, np.int64)

    # -- dispatch --------------------------------------------------------
    def __call__(self, input: Tuple, task: str, max_lm_seq_len: int | None = None,
                 t2i_batch_size: int | None = None):
        tok = self.text_tokenizer
        if task == "t2i":
            return self.t2i_prompt(tok(input[0])["input_ids"], input[1], input[2])
        if task == "t2i_gen":
            return self.t2i_gen_prompt(tok(input[0])["input_ids"], input[1])
        if task == "t2i_plus_lm":
            text_ids = tok(input[0])["input_ids"]
            a = self.t2i_prompt(text_ids[:t2i_batch_size], input[1], input[2])
            b = self.lm_prompt(text_ids[t2i_batch_size:], input[3])
            return a, b
        if task == "t2v":
            return self.t2v_prompt(tok(input[0])["input_ids"], input[1], input[2])
        if task == "t2v_gen":
            return self.t2v_gen_prompt(tok(input[0])["input_ids"], input[1])
        if task == "lm":
            return self.lm_prompt(tok(input[0], truncation=True)["input_ids"],
                                  input[1])
        if task == "mmu":
            return self.mmu_prompt(input[0], tok(input[1])["input_ids"])
        if task == "i2v":
            return self.i2v_prompt(input[0], input[1],
                                   input[2] if len(input) > 2 else None)
        if task == "lvg":
            return self.lvg_prompt(tok(input[0])["input_ids"], input[1], input[2])
        if task == "lvg_gen":
            return self.lvg_gen_prompt(tok(input[0])["input_ids"], input[1])
        raise NotImplementedError(task)

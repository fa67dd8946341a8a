"""Deterministic fake tokenizer shared by golden tools and tests.

Mimics the HF tokenizer surface UniversalPrompting touches: word-level
vocab, bos/eos, dynamically added special tokens.
"""

from __future__ import annotations

BASE_VOCAB = 1000  # word ids in [10, 1000)
BOS_ID = 1
EOS_ID = 2


class FakeTokenizer:
    def __init__(self):
        self.bos_token_id = BOS_ID
        self.eos_token_id = EOS_ID
        self.pad_token = None
        self.pad_token_id = None
        self._added: dict[str, int] = {}
        self._next_id = BASE_VOCAB

    def _word_id(self, w: str) -> int:
        if w in self._added:
            return self._added[w]
        import hashlib

        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
        return 10 + (h % (BASE_VOCAB - 10))

    def add_special_tokens(self, d):
        if "pad_token" in d:
            self.pad_token = d["pad_token"]
            self._added[d["pad_token"]] = self._next_id
            self.pad_token_id = self._next_id
            self._next_id += 1

    def add_tokens(self, tokens):
        for t in tokens:
            if t not in self._added:
                self._added[t] = self._next_id
                self._next_id += 1

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, str):
            return self._added.get(tokens, 0)
        return [self._added.get(t, 0) for t in tokens]

    def __call__(self, texts, truncation=False):
        if isinstance(texts, str):
            texts = [texts]
        return {"input_ids": [[self._word_id(w) for w in t.split()]
                              for t in texts]}

"""Tokenizer abstraction.

The reference leans on HuggingFace ``AutoTokenizer`` directly
(``/root/reference/DE-VQA/editor/vllms_for_edit/base.py:12-17`` sets
pad=eos and right padding). We wrap tokenization behind a tiny protocol so:

- production paths plug in an HF tokenizer (``HFTokenizerAdapter``),
- tests run a deterministic, dependency-free ``ToyTokenizer`` whose
  behavior (BOS insertion, no-space merging) mirrors the OPT/LLaMA
  tokenizers closely enough to exercise every label/mask edge case.

The label/mask construction that consumes these tokenizers lives in
``devqa_tpu.data.xym``.
"""
from __future__ import annotations

import zlib
from typing import List, Protocol, Sequence, runtime_checkable


@runtime_checkable
class Tokenizer(Protocol):
    pad_token_id: int

    def encode(self, text: str) -> List[int]:
        """Text → token ids (including BOS if the tokenizer uses one)."""
        ...

    def decode(self, ids: Sequence[int]) -> str:
        ...


class ToyTokenizer:
    """Deterministic whitespace tokenizer for tests.

    - Splits on runs of whitespace; a leading space attaches to the word
      (like BPE's "Ġword" behavior) so ``tok(p + ' ' + t)`` ==
      ``tok(p) + tok(' ' + t)`` — the same prefix-stability property the
      reference relies on when masking label spans.
    - Optionally prepends a BOS token (OPT's tokenizer does; mask math in
      the reference counts it inside ``len(prompt_tok)``).
    - Ids are stable crc32 hashes into [n_reserved, vocab_size).
    """

    PAD, BOS, EOS, UNK, IMG = 0, 1, 2, 3, 4
    N_RESERVED = 8

    def __init__(self, vocab_size: int = 512, add_bos: bool = True):
        assert vocab_size > self.N_RESERVED
        self.vocab_size = vocab_size
        self.add_bos = add_bos
        self.pad_token_id = self.PAD
        self.bos_token_id = self.BOS
        self.eos_token_id = self.EOS
        self._id_to_word = {}

    def _word_id(self, word: str) -> int:
        wid = self.N_RESERVED + (
            zlib.crc32(word.encode("utf-8")) % (self.vocab_size - self.N_RESERVED)
        )
        self._id_to_word.setdefault(wid, word)
        return wid

    def encode(self, text: str) -> List[int]:
        ids = [self.BOS] if self.add_bos else []
        ids.extend(self._word_id(w) for w in text.split())
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        words = []
        for i in ids:
            i = int(i)
            if i in (self.PAD, self.BOS, self.EOS):
                continue
            words.append(self._id_to_word.get(i, "<unk>"))
        return " ".join(words)


class HFTokenizerAdapter:
    """Adapter for a HuggingFace tokenizer.

    Applies the reference's pad-token fallback: if the tokenizer has no pad
    token, use EOS (``vllms_for_edit/base.py:12-15``). Encoding matches the
    reference's ``tokenizer(text)['input_ids']`` (special tokens included).
    """

    def __init__(self, hf_tokenizer):
        self._tok = hf_tokenizer
        if self._tok.pad_token_id is None:
            self._tok.pad_token_id = self._tok.eos_token_id
        self.pad_token_id = int(self._tok.pad_token_id)
        # pass the special ids through (None-safe): FT's unk-only target
        # mask and LoRA's "{prompt} {target} {eos}" construction read them
        self.eos_token_id = self._tok.eos_token_id
        self.unk_token_id = self._tok.unk_token_id
        self.bos_token_id = self._tok.bos_token_id

    def encode(self, text: str) -> List[int]:
        return list(self._tok(text)["input_ids"])

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids))

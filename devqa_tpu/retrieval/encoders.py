"""Sentence encoders for the retrieval substrate.

The reference uses sentence-transformers checkpoints: all-MiniLM-L6-v2
for the dynamic-eval probe stores (dataset/vllm.py:89-117) and
multi-qa-mpnet for LTE (configs/lte_vl). Both are BERT-family encoders
with mean pooling + L2 normalization — served here by the JAX BERT in
core/bert.py with converted weights.

No checkpoint available (this image has zero egress) → use
``retrieval.store.hash_encoder`` as the stand-in; the EncoderFn protocol
is identical so stores built either way interoperate.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np

from ..core import bert as bert_mod


class MiniLMEncoder:
    """JAX sentence-transformer: BERT encode → mean pool → normalize.

    ``from_hf_dir`` loads a local sentence-transformers/HF checkpoint
    directory (weights + tokenizer).
    """

    def __init__(self, params, cfg: bert_mod.BertConfig, tokenizer,
                 max_length: int = 256, batch_size: int = 64):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self._jit = jax.jit(
            lambda p, ids, mask: bert_mod.mean_pool(
                bert_mod.bert_encode(p, cfg, input_ids=ids,
                                     attention_mask=mask), mask))

    @classmethod
    def from_hf_dir(cls, path: str, **kw):
        import transformers

        hf = transformers.AutoModel.from_pretrained(path)
        hfc = hf.config
        cfg = bert_mod.BertConfig(
            vocab_size=hfc.vocab_size, d_model=hfc.hidden_size,
            n_layers=hfc.num_hidden_layers, n_heads=hfc.num_attention_heads,
            d_ffn=hfc.intermediate_size,
            max_positions=hfc.max_position_embeddings)
        sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
        params = bert_mod.convert_hf_bert(sd, cfg)
        tok = transformers.AutoTokenizer.from_pretrained(path)
        return cls(params, cfg, tok, **kw)

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = []
        for i in range(0, len(texts), self.batch_size):
            chunk = list(texts[i:i + self.batch_size])
            real = len(chunk)
            # O(1) compiled shapes: the ragged tail chunk pads by
            # repetition and lengths snap to a fixed bucket set
            # (padding=True alone would compile a new program per
            # distinct chunk max-length — 30-90s each on the
            # remote-compile tunnel).
            chunk = chunk + [chunk[-1]] * (self.batch_size - real)
            enc = self.tokenizer(chunk, padding=True, truncation=True,
                                 max_length=self.max_length,
                                 return_tensors="np")
            ids = enc["input_ids"].astype(np.int32)
            mask = enc["attention_mask"].astype(np.int32)
            L = ids.shape[1]
            bucket = next(b for b in (32, 64, 128, self.max_length)
                          if b >= min(L, self.max_length))
            if L < bucket:
                pad_id = int(getattr(self.tokenizer, "pad_token_id", 0) or 0)
                ids = np.pad(ids, ((0, 0), (0, bucket - L)),
                             constant_values=pad_id)
                mask = np.pad(mask, ((0, 0), (0, bucket - L)))
            emb = self._jit(self.params, ids, mask)
            out.append(np.asarray(emb)[:real])
        return np.concatenate(out, axis=0)

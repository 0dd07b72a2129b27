"""Supervised-span ("xym") construction: prompts + targets → inputs, labels, masks.

This reproduces — bit-for-bit at the token level — the label semantics of the
reference's ``BaseVLLMForEdit.prompts_imgs_target_to_xym``
(``/root/reference/DE-VQA/editor/vllms_for_edit/base.py:75-109``), which
*define* every accuracy metric in DE-VQA:

1. space-joining rule: a space is inserted between prompt and target unless
   either side already provides whitespace at the junction (base.py:89-90);
2. ``label_ids = roll(tok(prompt+target), -1)`` — position j is labeled with
   token j+1 (teacher forcing, base.py:98);
3. ``label_masks[len(tok(prompt))-1 : -1] = 1`` — the supervised span starts
   at the position *predicting* the first target token and excludes the
   rolled-around last position (base.py:100-104);
4. the batch is right-padded and both labels and masks are sliced from
   ``min_prompt_tok_n - 1`` (the shortest prompt in the batch, base.py:107-108),
   giving the "short" label length the evaluation aligns logits against via
   ``logits[:, -label_ids.shape[1]:]``.

Two representations are produced:

- :func:`build_xym` — the reference-shaped ``(label_ids, label_masks)`` pair
  (for golden parity tests and single-sample paths);
- :func:`batch_samples` → :class:`TokenBatch` — an absolute-position layout
  (labels aligned to text-token positions, fixed padded length) that the
  batched TPU evaluation consumes. Both encode identical supervision; the
  TokenBatch form is what lets 12 probes of a test case run as ONE padded
  forward instead of 12 batch=1 forwards (the reference's hot-loop cost,
  SURVEY.md §3.1).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.tokenizer import Tokenizer


def join_prompt_target(prompt: str, target: str) -> str:
    """The space-joining rule of vllms_for_edit/base.py:89-90.

    Empty target → prompt unchanged (used by internal prefix-building
    paths that encode prompt-only inputs through the same machinery; the
    reference, like us on user inputs, never passes empty targets).
    """
    if not target:
        return prompt
    if prompt[-1] not in (" ", "\n") and target[0] not in (" ", "\n"):
        return prompt + " " + target
    return prompt + target


@dataclasses.dataclass
class SampleTokens:
    """Tokenized (prompt, target) pair with the supervised span marked."""

    input_ids: np.ndarray  # [L] int32 — tok(prompt + joined target)
    prompt_len: int        # len(tok(prompt)) — includes BOS if any
    # supervised span in *label space*: positions [prompt_len-1, L-1) carry
    # labels input_ids[j+1]
    image_id: Optional[str] = None  # key for vision-cache lookup; None = text-only

    @property
    def total_len(self) -> int:
        return int(self.input_ids.shape[0])


def tokenize_sample(
    tokenizer: Tokenizer,
    prompt: str,
    target: str,
    image_id: Optional[str] = None,
) -> SampleTokens:
    joined = join_prompt_target(prompt, target)
    input_ids = np.asarray(tokenizer.encode(joined), dtype=np.int32)
    prompt_len = len(tokenizer.encode(prompt))
    return SampleTokens(input_ids=input_ids, prompt_len=prompt_len, image_id=image_id)


def label_width(tokenizer: Tokenizer, prompt: str, target: str) -> int:
    """Supervised-position count of a (prompt, target) probe — the
    label-mask row sum its tokenized sample will carry (mask spans
    [prompt_len-1, len-1), i.e. one position per target token). Used to
    pre-size the gathered-head width for a whole evaluation run
    (eval/harness) without building the batches."""
    joined = join_prompt_target(prompt, target)
    return (len(tokenizer.encode(joined))
            - len(tokenizer.encode(prompt)))


def build_xym(
    tokenizer: Tokenizer,
    prompts: Sequence[str],
    targets: Sequence[str],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Reference-shaped xym: returns (input_ids_padded, label_ids, label_masks,
    min_prompt_tok_n).

    ``label_ids``/``label_masks`` have shape [B, Lmax - (min_prompt_tok_n-1)]
    exactly as produced by vllms_for_edit/base.py:92-108. ``input_ids_padded``
    is [B, Lmax] right-padded with the pad token.
    """
    assert len(prompts) == len(targets)
    pad_id = tokenizer.pad_token_id
    all_ids: List[np.ndarray] = []
    all_labels: List[np.ndarray] = []
    all_masks: List[np.ndarray] = []
    min_prompt_tok_n = 10 ** 9
    for p, t in zip(prompts, targets):
        s = tokenize_sample(tokenizer, p, t)
        labels = np.roll(s.input_ids, -1)
        mask = np.zeros_like(labels)
        # base.py:104 — mask[len(prompt_tok)-1 : -1] += 1
        mask[s.prompt_len - 1 : len(labels) - 1] = 1
        min_prompt_tok_n = min(min_prompt_tok_n, s.prompt_len)
        all_ids.append(s.input_ids)
        all_labels.append(labels)
        all_masks.append(mask)
    lmax = max(len(x) for x in all_ids)
    b = len(all_ids)
    ids_pad = np.full((b, lmax), pad_id, dtype=np.int32)
    lab_pad = np.full((b, lmax), pad_id, dtype=np.int32)
    msk_pad = np.zeros((b, lmax), dtype=np.int32)
    for i, (ids, lab, msk) in enumerate(zip(all_ids, all_labels, all_masks)):
        ids_pad[i, : len(ids)] = ids
        lab_pad[i, : len(lab)] = lab
        msk_pad[i, : len(msk)] = msk
    cut = min_prompt_tok_n - 1
    return ids_pad, lab_pad[:, cut:], msk_pad[:, cut:], min_prompt_tok_n


@dataclasses.dataclass
class TokenBatch:
    """Fixed-length batched layout for TPU evaluation.

    All arrays are [B, L] (text-token positions only; vision-token prefixes
    are handled by the model's embed stage). ``label_ids[b, j]`` is the
    token that position j must predict; ``label_masks[b, j]`` marks the
    supervised span. This is mathematically identical to the reference's
    short-label alignment: for row b the reference's slice
    ``logits[:, -l_short:]`` lines logits position (L_b - l_short + k) up
    with short-label k — i.e. absolute label position j carries the label
    short[k] with j = k + (min_prompt_len - 1). We store labels at absolute
    j directly.
    """

    input_ids: np.ndarray    # [B, L] int32, right-padded with pad_id
    attn_mask: np.ndarray    # [B, L] int32, 1 for real tokens
    label_ids: np.ndarray    # [B, L] int32
    label_masks: np.ndarray  # [B, L] int32
    image_ids: List[Optional[str]]  # per-row vision-cache key (None = no image)

    @property
    def batch_size(self) -> int:
        return int(self.input_ids.shape[0])

    @property
    def seq_len(self) -> int:
        return int(self.input_ids.shape[1])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def batch_samples(
    samples: Sequence[SampleTokens],
    pad_id: int,
    bucket_multiple: int = 16,
    min_len: int = 16,
) -> TokenBatch:
    """Pack samples into a TokenBatch, padding to a length bucket.

    Bucketing (``bucket_multiple``) keeps the number of distinct compiled
    shapes small — the XLA analog of the reference tolerating per-sample
    dynamic lengths (impossible under jit). The packing loop runs in the
    native C extension when available (devqa_tpu/native).
    """
    from ..native import pack_samples_native

    lmax = max(s.total_len for s in samples)
    L = max(min_len, _round_up(lmax, bucket_multiple))
    input_ids, attn_mask, label_ids, label_masks = pack_samples_native(
        [s.input_ids for s in samples], [s.prompt_len for s in samples],
        pad_id, L)
    image_ids: List[Optional[str]] = [s.image_id for s in samples]
    return TokenBatch(input_ids, attn_mask, label_ids, label_masks, image_ids)

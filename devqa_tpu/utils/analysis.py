"""Analysis utilities — the ``easyeditor/util`` toolbox pieces used by the
editing/evaluation stack: batched greedy generation (generate.py
``generate_fast``), LogitLens (logit_lens.py), perplexity (perplexity.py)
and the token-F1 metric (evaluate_utils.F1).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import decoder as dec


@partial(jax.jit, static_argnums=(1, 4))
def _greedy_step_full(params, cfg, ids, mask, max_new: int):
    """Greedy decode by full-sequence recompute per step inside one jitted
    fori_loop (teacher-forcing parity with the reference's
    use_cache=False style; fine for the short answers this domain emits)."""
    B, L = ids.shape

    def body(i, carry):
        ids, mask = carry
        embeds = dec.embed_tokens(params, cfg, ids)
        logits = dec.decoder_apply(params, cfg, embeds, mask)
        lens = mask.sum(1)
        last = jnp.take_along_axis(logits, (lens - 1)[:, None, None], 1)[:, 0]
        nxt = jnp.argmax(last, -1)
        ids = jnp.where(
            jax.nn.one_hot(lens, L, dtype=bool), nxt[:, None], ids)
        mask = jnp.where(jax.nn.one_hot(lens, L, dtype=bool), 1, mask)
        return ids, mask

    return jax.lax.fori_loop(0, max_new, body, (ids, mask))


def generate_fast(model, prompts: Sequence[str], max_new_tokens: int = 10
                  ) -> List[str]:
    """Batched greedy generation (util/generate.py:77 ``generate_fast``).
    ``model``: an editors.llm.session.TextModel."""
    tb = model.batch(list(prompts), [""] * len(prompts))
    L = tb.input_ids.shape[1] + max_new_tokens
    pad = L - tb.input_ids.shape[1]
    ids = np.pad(tb.input_ids, ((0, 0), (0, pad)),
                 constant_values=model.tokenizer.pad_token_id)
    mask = np.pad(tb.attn_mask, ((0, 0), (0, pad)))
    out_ids, out_mask = _greedy_step_full(
        model.params, model.cfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens)
    out_ids, out_mask = np.asarray(out_ids), np.asarray(out_mask)
    texts = []
    for b in range(len(prompts)):
        n0 = int(tb.attn_mask[b].sum())
        n1 = int(out_mask[b].sum())
        texts.append(model.tokenizer.decode(out_ids[b, n0:n1].tolist()))
    return texts


def logit_lens(model, prompt: str, top_k: int = 5):
    """Decode every layer's hidden state against the unembedding
    (util/logit_lens.py:10-100). → list over layers of top-k token ids
    for the last position."""
    cfg = model.cfg
    tb = model.batch([prompt], [""])
    ids = jnp.asarray(tb.input_ids)
    mask = jnp.asarray(tb.attn_mask)
    last = int(tb.attn_mask[0].sum()) - 1
    embeds = dec.embed_tokens(model.params, cfg, ids)
    out = []
    for l in range(cfg.n_layers):
        h = dec.decoder_forward(model.params, cfg, embeds, mask, lo=0, hi=l + 1)
        logits = dec.decoder_logits(model.params, cfg, h)[0, last]
        _, idx = jax.lax.top_k(logits, top_k)
        out.append(np.asarray(idx).tolist())
    return out


def perplexity(model, text: str) -> float:
    """util/perplexity.py:5 — exp of the mean NLL over the text tokens."""
    tb = model.batch([text], [""])
    ids = jnp.asarray(tb.input_ids)
    mask = jnp.asarray(tb.attn_mask)
    embeds = dec.embed_tokens(model.params, model.cfg, ids)
    logits = dec.decoder_apply(model.params, model.cfg, embeds, mask)
    logp = jax.nn.log_softmax(logits, -1)
    n = int(tb.attn_mask[0].sum())
    labels = ids[0, 1:n]
    lp = jnp.take_along_axis(logp[0, : n - 1], labels[:, None], -1)[:, 0]
    return float(jnp.exp(-lp.mean()))


def token_f1(prediction: Sequence[int], truth: Sequence[int]) -> float:
    """evaluate_utils.py:499 ``F1`` — token-overlap F1."""
    pred, ref = list(prediction), list(truth)
    common = 0
    ref_copy = list(ref)
    for t in pred:
        if t in ref_copy:
            common += 1
            ref_copy.remove(t)
    if common == 0:
        return 0.0
    precision = common / len(pred)
    recall = common / len(ref)
    return 2 * precision * recall / (precision + recall)

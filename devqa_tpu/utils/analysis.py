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


@partial(jax.jit, static_argnums=(1, 4))
def _greedy_cached(params, cfg, ids, mask, max_new: int):
    """Greedy decode with a KV cache: one prefill + (max_new−1)
    single-token steps inside one jitted program — per-token cost is
    independent of generated length (the reference's use_cache streaming,
    mPLUG_Owl2/serve/model_worker.py:44). Output-identical to
    :func:`_greedy_step_full` (asserted in tests/test_kv_cache.py)."""
    B, L = ids.shape
    embeds = dec.embed_tokens(params, cfg, ids)
    pre_logits, cache = dec.decoder_prefill(params, cfg, embeds, mask, L)
    lens = mask.sum(1)
    last = jnp.take_along_axis(pre_logits, (lens - 1)[:, None, None], 1)[:, 0]
    nxt = jnp.argmax(last, -1)

    def commit(ids, mask, nxt):
        lens = mask.sum(1)
        oh = jax.nn.one_hot(lens, L, dtype=bool)
        return (jnp.where(oh, nxt[:, None], ids), jnp.where(oh, 1, mask))

    def body(i, carry):
        ids, mask, cache, nxt = carry
        ids, mask = commit(ids, mask, nxt)
        logits, cache = dec.decoder_decode_step(
            params, cfg, cache, params["embed_tokens"][nxt])
        return ids, mask, cache, jnp.argmax(logits, -1)

    ids, mask, cache, nxt = jax.lax.fori_loop(
        0, max_new - 1, body, (ids, mask, cache, nxt))
    ids, mask = commit(ids, mask, nxt)
    return ids, mask


def generate_fast(model, prompts: Sequence[str], max_new_tokens: int = 10,
                  cached: bool = True) -> List[str]:
    """Batched greedy generation (util/generate.py:77 ``generate_fast``).
    ``model``: an editors.llm.session.TextModel. ``cached=False`` forces
    the full-recompute reference path."""
    tb = model.batch(list(prompts), [""] * len(prompts))
    L = tb.input_ids.shape[1] + max_new_tokens
    pad = L - tb.input_ids.shape[1]
    ids = np.pad(tb.input_ids, ((0, 0), (0, pad)),
                 constant_values=model.tokenizer.pad_token_id)
    mask = np.pad(tb.attn_mask, ((0, 0), (0, pad)))
    cacheable = model.cfg.arch in ("opt", "llama")
    step = _greedy_cached if (cached and cacheable) else _greedy_step_full
    out_ids, out_mask = step(
        model.params, model.cfg, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens)
    out_ids, out_mask = np.asarray(out_ids), np.asarray(out_mask)
    texts = []
    for b in range(len(prompts)):
        n0 = int(tb.attn_mask[b].sum())
        n1 = int(out_mask[b].sum())
        texts.append(model.tokenizer.decode(out_ids[b, n0:n1].tolist()))
    return texts


def layer_contributions(vllm, prompts, images, targets):
    """Per-layer attention/MLP contribution stats for a batch of queries —
    the TPU-native show_s (MultimodalTrainer.py:62-260): what the
    reference gathered through instrumented HF modules comes from one
    jitted scan emitting per-layer norms and cosines.

    → dict of numpy arrays [n_layers, B, L]."""
    qb = vllm.encode_queries(prompts, images, targets)
    stats = jax.jit(dec.decoder_layer_contributions, static_argnums=1)(
        vllm.params["decoder"], vllm.cfg.decoder, qb.embeds, qb.kv_valid)
    return {k: np.asarray(v) for k, v in stats.items()}


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

"""FT — direct constrained fine-tuning for text LLMs
(``easyeditor/models/ft/ft_main.py``).

Faithful semantics (oracle-pinned, tests/test_reference_oracle.py):

- The gpt/llama objective is NOT teacher-forced (ft_main.py:181-187):
  the prompts are run WITHOUT the target appended and every target
  token's log-probability is read from the single next-token
  distribution at the LAST prompt position; the per-row mask drops
  ``unk`` target tokens only — target PADDING is included (the
  reference's ``loss_mask = target_ids != tok.unk_token_id`` quirk).
- Optimizer is torch ``Adam(weight_decay=...)`` — COUPLED L2 on the
  gradient (``add_decayed_weights`` before the Adam moments), not AdamW.
- Both the weight AND bias of each matched module train
  (``rewrite_module_tmp.format(layer) in name``, ft_main.py:77-82).
- A batch whose loss is already < 1e-2 skips its step but the ±ε
  ``norm_constraint`` clamp still applies (ft_main.py:191-201); epochs
  break when the epoch-average loss is < 1e-2.
- ``target_new`` gets a leading space unless it is exactly " "
  (ft_main.py:67-70).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...core import decoder as dec
from ...utils.config import BaseConfig
from ...utils.surgery import ParamTarget, get_target, set_target
from .session import TextModel


@dataclasses.dataclass(frozen=True)
class FTHyperParams(BaseConfig):
    layers: Tuple[int, ...] = (31,)
    module: str = "fc2"          # param key within the layer ("fc2","down",…)
    num_steps: int = 25          # epochs
    lr: float = 1e-3
    weight_decay: float = 0.0
    norm_constraint: Optional[float] = None
    batch_size: int = 64
    min_loss: float = 1e-2


def _targets_for(model: TextModel, hparams: FTHyperParams
                 ) -> List[ParamTarget]:
    """Weight + bias of every matched module — the reference selects all
    params whose name contains the module path (ft_main.py:77-82)."""
    ts = []
    for l in hparams.layers:
        ts.append(ParamTarget(("layers", hparams.module, "w"), l))
        mod = model.params["layers"][hparams.module]
        if "b" in mod:
            ts.append(ParamTarget(("layers", hparams.module, "b"), l))
    return ts


def _prep_chunk(model: TextModel, requests):
    """Prompt batch (NO target appended) + padded target-token matrix and
    its unk-only mask (ft_main.py:111-117). The target width is bucketed
    to a multiple of 8 so sequential editing sessions keep an O(1)
    compiled-shape set (extra columns are pad tokens, exactly what the
    reference's ragged padding would add — and masked identically)."""
    tok = model.tokenizer
    texts = [r["prompt"] for r in requests]
    tgts = [r["target_new"] if r["target_new"] == " "
            else " " + r["target_new"] for r in requests]
    tb = model.batch(texts, [""] * len(texts))
    ids = jnp.asarray(tb.input_ids)
    mask = jnp.asarray(tb.attn_mask)
    last_idx = jnp.asarray(np.asarray(tb.attn_mask).sum(1) - 1)
    enc = [list(tok.encode(t)) for t in tgts]
    T_ref = max(len(e) for e in enc)       # the reference's padded width
    T = -(-T_ref // 8) * 8
    pad = int(getattr(tok, "pad_token_id", 0) or 0)
    unk = getattr(tok, "unk_token_id", None)
    tgt_ids = np.full((len(enc), T), pad, np.int32)
    for i, e in enumerate(enc):
        tgt_ids[i, :len(e)] = e
    # the reference masks unk target tokens ONLY — padding is included,
    # but only up to ITS padded width T_ref; our bucket columns beyond
    # that do not exist on the reference side and are masked out
    lmask = (tgt_ids != unk) if unk is not None \
        else np.ones_like(tgt_ids, bool)
    lmask[:, T_ref:] = False
    return ids, mask, last_idx, jnp.asarray(tgt_ids), \
        jnp.asarray(lmask.astype(np.float32))


def _opt(hparams: FTHyperParams):
    # torch Adam's weight_decay is COUPLED: +wd·θ on the gradient before
    # the moments (not AdamW's decoupled decay)
    return optax.chain(optax.add_decayed_weights(hparams.weight_decay),
                       optax.adam(hparams.lr))


def _insert(params, targets, ws):
    for t, w in zip(targets, ws):
        params = set_target(params, t, w)
    return params


def _step(cfg, hparams, targets, params, ws, st, ids, mask, last_idx,
          tgt_ids, lmask):
    w0 = [get_target(params, t) for t in targets]

    def loss_fn(ws):
        p = _insert(params, targets, ws)
        logits = dec.decoder_apply(p, cfg, dec.embed_tokens(p, cfg, ids),
                                   mask)
        last = logits[jnp.arange(ids.shape[0]), last_idx]
        logp = jax.nn.log_softmax(last, -1)          # [B, V]
        picked = jnp.take_along_axis(logp, tgt_ids, 1)
        per_row = -(picked * lmask).sum(1) / jnp.maximum(lmask.sum(1), 1.0)
        return per_row.mean()

    loss, g = jax.value_and_grad(loss_fn)(ws)
    up, st2 = _opt(hparams).update(g, st, ws)
    ws2 = optax.apply_updates(ws, up)
    skip = loss < hparams.min_loss       # step only when loss >= 1e-2
    ws = jax.tree.map(lambda a, b: jnp.where(skip, a, b), ws, ws2)
    st = jax.tree.map(lambda a, b: jnp.where(skip, a, b), st, st2)
    if hparams.norm_constraint is not None:          # clamps regardless
        eps = hparams.norm_constraint
        ws = [jnp.clip(w, o - eps, o + eps) for w, o in zip(ws, w0)]
    return ws, st, loss


# Module-level jits keyed on (cfg, hparams, targets) statics: fresh
# per-call @jax.jit closures would re-trace on every sequential edit
# (30-90s remote compiles on any cache miss through the tunnel).
_step_jit = partial(jax.jit, static_argnums=(0, 1, 2))(_step)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _run_single_chunk_jit(cfg, hparams, targets, params, ws, st, ids, mask,
                          last_idx, tgt_ids, lmask):
    """Single-chunk hot path: the whole epoch loop in one while_loop."""
    def cond(c):
        _, _, i, loss = c
        return jnp.logical_and(i < hparams.num_steps,
                               loss >= hparams.min_loss)

    def body(c):
        ws, st, i, _ = c
        ws, st, loss = _step(cfg, hparams, targets, params, ws, st, ids,
                             mask, last_idx, tgt_ids, lmask)
        return ws, st, i + 1, loss

    ws, _, _, _ = jax.lax.while_loop(
        cond, body, (ws, st, jnp.asarray(0), jnp.asarray(jnp.inf)))
    return ws


def apply_ft(model: TextModel, requests, hparams: FTHyperParams):
    """→ edited decoder params (originals untouched; caller restores by
    dropping the returned tree). Accepts one request or a list."""
    if isinstance(requests, dict):
        requests = [requests]
    cfg = model.cfg
    targets = tuple(_targets_for(model, hparams))

    chunks = [requests[i:i + hparams.batch_size]
              for i in range(0, len(requests), hparams.batch_size)]
    batches = [_prep_chunk(model, c) for c in chunks]
    sizes = [len(c) for c in chunks]

    ws = [get_target(model.params, t) for t in targets]
    st = _opt(hparams).init(ws)
    if len(batches) == 1:
        ws = _run_single_chunk_jit(cfg, hparams, targets, model.params,
                                   ws, st, *batches[0])
        return _insert(model.params, targets, ws)

    for _ in range(hparams.num_steps):
        tot, n = 0.0, 0
        for b, bs in zip(batches, sizes):
            ws, st, loss = _step_jit(cfg, hparams, targets, model.params,
                                     ws, st, *b)
            tot += float(loss) * bs
            n += bs
        if tot / n < hparams.min_loss:   # epoch-average break
            break
    return _insert(model.params, targets, ws)

"""T5 editing session pieces — the reference's seq2seq BaseEditor path
(``easyeditor/editors/editor.py`` + the ``'t5' in model_name`` branches
of ``evaluate_utils.test_seq2seq_batch_prediction_acc``).

``T5TextModel`` exposes the same ``batch``/``accuracy`` surface as
``session.TextModel``, so :class:`LLMEditSession` runs unchanged;
``apply_ft_t5`` is the constrained fine-tune over decoder FF weights.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...core import t5 as t5_mod
from ...core.losses import token_accuracy
from ...utils.surgery import ParamTarget, get_target, set_target


@dataclasses.dataclass
class T5Batch:
    input_ids: np.ndarray    # [B, Le] encoder tokens
    attn_mask: np.ndarray    # [B, Le]
    labels: np.ndarray       # [B, Ld] target tokens (pad-filled)
    label_masks: np.ndarray  # [B, Ld]


class T5TextModel:
    """Host wrapper over T5 params with TextModel's metric surface."""

    def __init__(self, params, cfg: t5_mod.T5Config, tokenizer,
                 bucket_multiple: int = 8):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.bucket_multiple = bucket_multiple
        self._logits = jax.jit(
            lambda p, ids, mask, dec_ids, dec_mask: t5_mod.t5_apply(
                p, cfg, ids, mask, dec_ids, dec_mask))
        self._metrics = jax.jit(token_accuracy)

    def _pad(self, rows, pad):
        m = self.bucket_multiple
        L = max(m, ((max(len(r) for r in rows) + m - 1) // m) * m)
        out = np.full((len(rows), L), pad, np.int32)
        msk = np.zeros((len(rows), L), np.int32)
        for i, r in enumerate(rows):
            out[i, :len(r)] = r
            msk[i, :len(r)] = 1
        return out, msk

    def batch(self, prompts: Sequence[str], targets: Sequence[str]) -> T5Batch:
        pad = self.tokenizer.pad_token_id
        enc = [self.tokenizer.encode(p) for p in prompts]
        dec = [self.tokenizer.encode(t) for t in targets]
        ids, mask = self._pad(enc, pad)
        labels, lmask = self._pad(dec, pad)
        return T5Batch(ids, mask, labels, lmask)

    def accuracy(self, prompts, targets, params=None):
        tb = self.batch(prompts, targets)
        labels = jnp.asarray(tb.labels)
        dec_ids = t5_mod.shift_right(labels, self.cfg)
        logits = self._logits(self.params if params is None else params,
                              jnp.asarray(tb.input_ids),
                              jnp.asarray(tb.attn_mask), dec_ids,
                              jnp.asarray(tb.label_masks))
        # seq2seq: logits[t] predicts labels[t] directly (no roll)
        accs, preds = self._metrics(logits, labels,
                                    jnp.asarray(tb.label_masks))
        return np.asarray(accs), np.asarray(preds), np.asarray(tb.label_masks)


def apply_ft_t5(model: T5TextModel, request, hp) -> Tuple:
    """Constrained fine-tune of decoder FF output weights (the seq2seq
    analog of ft/ft_main.py). ``hp``: editors.llm.FTHyperParams."""
    cfg = model.cfg
    tb = model.batch([request["prompt"]], [request["target_new"]])
    ids = jnp.asarray(tb.input_ids)
    mask = jnp.asarray(tb.attn_mask)
    labels = jnp.asarray(tb.labels)
    lmask = jnp.asarray(tb.label_masks)
    dec_ids = t5_mod.shift_right(labels, cfg)
    targets = [ParamTarget(("decoder", "layers", "wo", "w"), l)
               for l in hp.layers]

    def loss_fn(ws, params):
        for t, w in zip(targets, ws):
            params = set_target(params, t, w)
        logits = t5_mod.t5_apply(params, cfg, ids, mask, dec_ids, lmask)
        logp = jax.nn.log_softmax(logits, -1)
        picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        m = lmask.astype(jnp.float32)
        return -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)

    @partial(jax.jit, static_argnums=())
    def run(params):
        ws0 = [get_target(params, t) for t in targets]
        opt = optax.adam(hp.lr)

        def body(_, carry):
            ws, st = carry
            g = jax.grad(loss_fn)(ws, params)
            up, st = opt.update(g, st, ws)
            ws = optax.apply_updates(ws, up)
            if hp.norm_constraint:
                ws = [w0 + jnp.clip(w - w0, -hp.norm_constraint,
                                    hp.norm_constraint)
                      for w0, w in zip(ws0, ws)]
            return ws, st

        ws, _ = jax.lax.fori_loop(0, hp.num_steps, body,
                                  (ws0, opt.init(ws0)))
        for t, w in zip(targets, ws):
            params = set_target(params, t, w)
        return params

    return run(model.params), None

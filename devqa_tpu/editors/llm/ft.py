"""FT — direct constrained fine-tuning for text LLMs
(``easyeditor/models/ft/ft_main.py``): AdamW on chosen weight tensors,
optional ±ε clamp to the originals. Shares the jitted while-loop executor
with the multimodal FT_VL editor.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ...core import decoder as dec
from ...core.losses import label_loss
from ...utils.config import BaseConfig
from ...utils.surgery import ParamTarget, get_target, set_target
from .session import TextModel


@dataclasses.dataclass(frozen=True)
class FTHyperParams(BaseConfig):
    layers: Tuple[int, ...] = (31,)
    module: str = "fc2"          # param key within the layer ("fc2","down",…)
    num_steps: int = 25
    lr: float = 1e-3
    weight_decay: float = 0.0
    norm_constraint: Optional[float] = None
    min_loss: float = 1e-2


def apply_ft(model: TextModel, request, hparams: FTHyperParams):
    """→ edited decoder params (originals untouched; caller restores by
    dropping the returned tree)."""
    targets = [ParamTarget(("layers", hparams.module, "w"), l)
               for l in hparams.layers]
    tb = model.batch([request["prompt"]], [request["target_new"]])
    opt = optax.adamw(hparams.lr, weight_decay=hparams.weight_decay)

    @jax.jit
    def run(params, ids, mask, labels, lmask):
        w0 = [get_target(params, t) for t in targets]

        def insert(ws):
            p = params
            for t, w in zip(targets, ws):
                p = set_target(p, t, w)
            return p

        def loss_fn(ws):
            logits = dec.decoder_apply(
                insert(ws), model.cfg, dec.embed_tokens(insert(ws), model.cfg,
                                                        ids), mask)
            return label_loss(logits, labels, lmask)

        state = opt.init(w0)

        def cond(c):
            _, _, i, loss = c
            return jnp.logical_and(i < hparams.num_steps,
                                   loss >= hparams.min_loss)

        def body(c):
            ws, st, i, _ = c
            loss, g = jax.value_and_grad(loss_fn)(ws)
            up, st2 = opt.update(g, st, ws)
            ws2 = optax.apply_updates(ws, up)
            if hparams.norm_constraint is not None:
                eps = hparams.norm_constraint
                ws2 = [jnp.clip(w, o - eps, o + eps) for w, o in zip(ws2, w0)]
            skip = loss < hparams.min_loss
            ws = jax.tree.map(lambda a, b: jnp.where(skip, a, b), ws, ws2)
            st = jax.tree.map(lambda a, b: jnp.where(skip, a, b), st, st2)
            return ws, st, i + 1, loss

        ws, _, _, _ = jax.lax.while_loop(
            cond, body, (w0, state, jnp.asarray(0), jnp.asarray(jnp.inf)))
        return insert(ws)

    return run(model.params, jnp.asarray(tb.input_ids),
               jnp.asarray(tb.attn_mask), jnp.asarray(tb.label_ids),
               jnp.asarray(tb.label_masks))

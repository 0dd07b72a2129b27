"""LoRA editing (``easyeditor/models/lora/lora_main.py``): per edit,
train low-rank adapters on the attention q/v projections (peft's default
target modules) and merge the deltas into the weights.

Functional: ``apply_lora`` returns edited params; un-editing = dropping
the returned tree.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ...core import decoder as dec
from ...core.losses import label_loss
from ...utils.config import BaseConfig
from ...utils.surgery import ParamTarget, add_to_target
from .session import TextModel


@dataclasses.dataclass(frozen=True)
class LoRAHyperParams(BaseConfig):
    rank: int = 8
    alpha: float = 32.0
    target_modules: Tuple[str, ...] = ("q", "v")
    layers: Tuple[int, ...] = ()  # empty = all layers
    num_steps: int = 30
    lr: float = 5e-3
    dropout: float = 0.0  # inert at edit time (eval-mode parity)


def apply_lora(model: TextModel, request, hparams: LoRAHyperParams, seed=0):
    cfg = model.cfg
    layers = tuple(hparams.layers) or tuple(range(cfg.n_layers))
    targets = [(l, m) for l in layers for m in hparams.target_modules]
    d = cfg.d_model
    r = hparams.rank
    scale = hparams.alpha / r

    key = jax.random.PRNGKey(seed)
    ab = {}
    for i, (l, m) in enumerate(targets):
        k = jax.random.fold_in(key, i)
        ab["%d.%s" % (l, m)] = {
            "a": jax.random.normal(k, (d, r)) * (1.0 / d ** 0.5),
            "b": jnp.zeros((r, d)),
        }

    tb = model.batch([request["prompt"]], [request["target_new"]])
    opt = optax.adam(hparams.lr)

    @jax.jit
    def run(params, ids, mask, labels, lmask):
        def with_lora(ab):
            p = params
            for (l, m) in targets:
                lo = ab["%d.%s" % (l, m)]
                delta = (lo["a"] @ lo["b"]) * scale
                p = add_to_target(p, ParamTarget(("layers", m, "w"), l), delta)
            return p

        def loss_fn(ab):
            p = with_lora(ab)
            logits = dec.decoder_apply(p, cfg, dec.embed_tokens(p, cfg, ids),
                                       mask)
            return label_loss(logits, labels, lmask)

        state = opt.init(ab)

        def body(_, carry):
            ab, st = carry
            g = jax.grad(loss_fn)(ab)
            up, st = opt.update(g, st, ab)
            return optax.apply_updates(ab, up), st

        ab2, _ = jax.lax.fori_loop(0, hparams.num_steps, body, (ab, state))
        return with_lora(ab2)

    return run(model.params, jnp.asarray(tb.input_ids),
               jnp.asarray(tb.attn_mask), jnp.asarray(tb.label_ids),
               jnp.asarray(tb.label_masks))

"""GRACE — key-value codebook adapter with deferral radii
(``easyeditor/models/grace/GRACE.py``).

One chosen linear layer is wrapped: at inference, the query (the layer's
input at the edit token, generalized to every token) is matched against
stored keys; when the closest key is within its ε-ball, the layer's
output at that token is REPLACED by the stored value
(GRACE.py:146-200, replacement="replace_all" semantics).

Editing (GRACE.py:60-93 + adapter codebook logic):
- no keys yet → init (key = query at the edit token, value trained);
- closest key farther than eps-budget → add a new key;
- close key with a different label → add key and split ε in half;
- close key with the same label → expand ε to cover the query.
Values train by Adam on the edit NLL for n_iter steps.

TPU redesign: fixed-capacity codebook arrays + jitted value training;
the adapter is the decoder's ``mlp_residual`` intervention on the
down-projection (delta = value − original_output at replaced tokens).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...core import decoder as dec
from ...utils.config import BaseConfig
from .mlp_common import capture_down_inputs, down_input_from_mlp_input, \
    down_out, down_weight_bias
from .session import TextModel


@dataclasses.dataclass(frozen=True)
class GRACEHyperParams(BaseConfig):
    layer: int = 5
    eps: float = 1.0
    edit_lr: float = 1.0
    n_iter: int = 30
    val_init: str = "cold"       # "cold" | "warm"
    eps_expand: str = "coverage"
    replacement: str = "replace_all"
    max_keys: int = 256


class GraceEditor:
    """Stateful GRACE editor over a TextModel; the wrapped layer is the
    MLP down-projection (OPT fc2 / llama down_proj) of ``hparams.layer``."""

    def __init__(self, model: TextModel, hparams: GRACEHyperParams):
        self.model = model
        self.hp = hparams
        self.reset()

    def reset(self):
        cfg = self.model.cfg
        M = self.hp.max_keys
        self.state = {
            "keys": jnp.zeros((M, cfg.d_ffn)),
            "values": jnp.zeros((M, cfg.d_model)),
            "eps": jnp.zeros((M,)),
            "labels": jnp.zeros((M,)),  # label fingerprint (mean of label ids)
            "count": jnp.zeros((), jnp.int32),
        }

    # ------------------------------------------------------------------

    def _mlp_residual(self, params, state):
        """Replace the MLP output with the chosen value at tokens whose
        down-projection input falls inside a key's ε-ball."""
        cfg = self.model.cfg
        w, b = down_weight_bias(params, cfg, self.hp.layer)

        def fn(x1):
            # x1 is the MLP input (post-norm). The down-projection's input
            # is recomputed from it (one extra fc1/gate+up matmul set to
            # stay within the generic mlp_residual signature).
            q = down_input_from_mlp_input(params, cfg,
                                          self.hp.layer, x1)  # [B, L, d_ffn]
            dists = jnp.linalg.norm(
                q[:, :, None, :] - state["keys"][None, None], axis=-1)
            n_active = jnp.minimum(state["count"],
                                   state["keys"].shape[0])
            active = jnp.arange(state["keys"].shape[0]) < n_active
            dists = jnp.where(active[None, None, :], dists, jnp.inf)
            best = jnp.argmin(dists, axis=-1)             # [B, L]
            dmin = jnp.min(dists, axis=-1)
            inside = (dmin < state["eps"][best]) & (state["count"] > 0)
            orig_out = down_out(q, w, b)
            value = state["values"][best]
            return jnp.where(inside[..., None], value - orig_out, 0.0)

        return (self.hp.layer, fn)

    @partial(jax.jit, static_argnums=(0,))
    def _logits_jit(self, params, state, ids, mask):
        cfg = self.model.cfg
        embeds = dec.embed_tokens(params, cfg, ids)
        return dec.decoder_apply(params, cfg, embeds, mask,
                                 mlp_residual=self._mlp_residual(params,
                                                                 state))

    def logits(self, ids, mask):
        return self._logits_jit(self.model.params, self.state, ids, mask)

    # Session integration: apply_algo signature.
    def __call__(self, model: TextModel, request):
        self.edit(request)
        # Return params unchanged; metrics flow through self via a proxy
        # forward (session uses model._logits on params — so patch the
        # TextModel forward with the codebook closure instead). The
        # restore fn UNDOES the patch: a leftover proxy would score every
        # later pre-edit metric (and any other algorithm on this model)
        # through this edit's codebook.
        state = self.state
        outer = self
        prev = model.__dict__.get("_logits")

        def patched(p, ids, mask):
            return outer._logits_jit(p, state, ids, mask)

        model._logits = patched

        def restore():
            if prev is None:
                model.__dict__.pop("_logits", None)
            else:
                model._logits = prev

        return model.params, restore

    # ------------------------------------------------------------------

    def edit(self, request):
        tb = self.model.batch([request["prompt"]], [request["target_new"]])
        ids = jnp.asarray(tb.input_ids)
        mask = jnp.asarray(tb.attn_mask)
        labels = jnp.asarray(tb.label_ids)
        lmask = jnp.asarray(tb.label_masks)
        # edit token = last prompt token (key_id = #prompt tokens − 1;
        # GRACE.py:61 uses the -100 count of the label tensor)
        # Traced (not static): a static edit_tok would recompile the whole
        # n_iter edit program per distinct prompt length — O(1) shapes only.
        edit_tok = jnp.asarray(
            int(np.nonzero(np.asarray(tb.label_masks)[0])[0][0]), jnp.int32)
        label_fp = float(np.asarray(labels)[0][np.asarray(lmask)[0] == 1].mean())
        self.state = self._edit_jit(self.model.params, self.state, ids, mask,
                                    labels, lmask, edit_tok, label_fp)

    @partial(jax.jit, static_argnums=(0,))
    def _edit_jit(self, params, state, ids, mask, labels, lmask, edit_tok,
                  label_fp):
        cfg = self.model.cfg
        hp = self.hp
        embeds = dec.embed_tokens(params, cfg, ids)
        # query = down-projection input at the edit token
        _, xs = capture_down_inputs(params, cfg, embeds, mask, (hp.layer,))
        query = xs[hp.layer][0, edit_tok]  # [d_ffn]

        cnt = state["count"]
        active = jnp.arange(hp.max_keys) < jnp.minimum(cnt, hp.max_keys)
        dists = jnp.linalg.norm(state["keys"] - query, axis=-1)
        dists = jnp.where(active, dists, jnp.inf)
        nearest = jnp.argmin(dists)
        dmin = jnp.min(dists)
        same_label = jnp.abs(state["labels"][nearest] - label_fp) < 1e-6

        add_new = (cnt == 0) | (dmin > hp.eps + state["eps"][nearest]) \
            | (~same_label)
        # ε bookkeeping (GRACE.py codebook rules)
        eps_n = state["eps"][nearest]
        eps_n = jnp.where((~add_new) & (dmin > eps_n), dmin, eps_n)       # expand
        eps_n = jnp.where(add_new & (cnt > 0) & (~same_label)
                          & (dmin <= hp.eps + state["eps"][nearest]),
                          dmin / 2 - 1e-5, eps_n)                          # split
        eps_state = state["eps"].at[nearest].set(eps_n)
        # New keys ring-wrap past capacity (oldest slot overwritten);
        # an unwrapped slot=cnt would scatter out of bounds — silently
        # DROPPED by JAX while count kept growing, freezing the codebook
        # at max_keys with no error.
        slot = jnp.where(add_new, cnt % hp.max_keys, nearest)
        new_eps = jnp.where(add_new & (cnt > 0) & (~same_label)
                            & (dmin <= hp.eps + state["eps"][nearest]),
                            dmin / 2, hp.eps)

        # value training at the edit token; an expand-case edit keeps the
        # nearest key's CENTER (moving it would un-cover prior edits) and
        # retrains its existing value on the new request (GRACE.py trains
        # the chosen key's value every edit).
        w, b = down_weight_bias(params, cfg, hp.layer)
        warm = down_out(xs[hp.layer][0, edit_tok], w, b)
        v0_new = warm if hp.val_init == "warm" else jnp.zeros_like(warm)
        v0 = jnp.where(add_new, v0_new, state["values"][nearest])

        onehot = jax.nn.one_hot(edit_tok[None], ids.shape[1])[..., None]

        def loss_fn(v):
            def fn(x1):
                q = down_input_from_mlp_input(params, cfg, hp.layer, x1)
                orig = down_out(q, w, b)
                return onehot * (v - orig)

            logits = dec.decoder_apply(params, cfg, embeds, mask,
                                       mlp_residual=(hp.layer, fn))
            logp = jax.nn.log_softmax(logits, -1)
            picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
            m = lmask.astype(jnp.float32)
            return -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)

        opt = optax.adam(hp.edit_lr)

        def body(_, carry):
            v, st = carry
            g = jax.grad(loss_fn)(v)
            up, st = opt.update(g, st, v)
            return optax.apply_updates(v, up), st

        v, _ = jax.lax.fori_loop(0, hp.n_iter, body, (v0, opt.init(v0)))

        return {
            # expand case: key center and label stay; only eps + value move
            "keys": state["keys"].at[slot].set(
                jnp.where(add_new, query, state["keys"][slot])),
            "values": state["values"].at[slot].set(v),
            "eps": eps_state.at[slot].set(
                jnp.where(add_new, new_eps, eps_state[slot])),
            "labels": state["labels"].at[slot].set(
                jnp.where(add_new, label_fp, state["labels"][slot])),
            "count": jnp.where(add_new, cnt + 1, cnt),
        }

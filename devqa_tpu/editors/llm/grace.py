"""GRACE — key-value codebook adapter with deferral radii
(``easyeditor/models/grace/GRACE.py``).

One chosen linear layer is wrapped — here the MLP down-projection (OPT
fc2 / llama down_proj) of ``hparams.layer``; the query is that layer's
INPUT (GRACE.py:153-154). The reference's semantics, reproduced:

- ONE query per row, taken at ``token_to_edit = min(key_id, L-1)``
  where ``key_id`` is the (-100)-count of the LAST EDIT's label row
  minus one = its last prompt-token index (GRACE.py:61-62). The index
  is stale at inference time by design — probes of any length are
  queried at the previous edit's position.
- When the closest key is within its ε-ball, the layer output is
  REPLACED by the stored value at positions selected by
  ``replacement``: the whole sequence (``replace_all``), the query
  token (``replace_last``), or the prompt span (``replace_prompt``)
  (GRACE.py:199-206). Values train by Adam on the edit NLL for
  ``n_iter`` steps with the same replacement active.
- Codebook maintenance at each edit (GRACE.py:160-189):
  no keys → init; closest key farther than eps-budget → add; close key
  with a different label → add + split ε in half; close key with the
  same label → expand ε to cover the query (``eps_expand=coverage``)
  and retrain its value.
- Labels "match" when the full label rows' float means are equal —
  -100 prompt fills included (GRACE.py:135-136), so the fingerprint
  depends on prompt length, not just the target.
- ``val_init=cold`` draws the initial value uniform [0,1)
  (``torch.rand``, GRACE.py:155); ``warm`` copies the layer output at
  the query token.

Not reproduced (reference defects with no behavioral content):
- ``val_train="adv"`` — perturb_values zeroes ``noise[0]`` of a [1, d]
  noise tensor (GRACE.py:13-20), i.e. the entire perturbation; it is
  behaviorally a no-op;
- with ``n_iter == 1`` the reference leaves the adapter's ``iter`` at 0,
  and the ``iter == 0`` codebook-update branch runs on EVERY subsequent
  eval forward (GRACE.py:163 is not gated on training mode) — the
  codebook then grows during evaluation with a stale edit label; our
  codebook only changes in ``edit()``;
- the reference adapter cannot run on HF OPT at all (OPT flattens the
  decoder-layer MLP input to [B*L, d]; ``args[0][:, t, :]`` needs 3-D,
  GRACE.py:153) — GRACE there is a GPT2/llama-only method; ours is
  arch-uniform.

TPU redesign: fixed-capacity codebook arrays + one jitted edit program
(codebook decision + fori_loop value training); the adapter is the
decoder's ``mlp_residual`` intervention. ``replacement="per_token"``
is this framework's extension: every token is queried against the
codebook independently (no stale index, per-token replacement).
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
    val_init: str = "cold"       # "cold" (uniform [0,1)) | "warm"
    eps_expand: str = "coverage"
    # "replace_all" | "replace_last" | "replace_prompt" (reference modes,
    # GRACE.py:199-206) | "per_token" (this framework's extension)
    replacement: str = "replace_all"
    max_keys: int = 256


class GraceEditor:
    """Stateful GRACE editor over a TextModel; the wrapped layer is the
    MLP down-projection (OPT fc2 / llama down_proj) of ``hparams.layer``."""

    def __init__(self, model: TextModel, hparams: GRACEHyperParams,
                 seed: int = 0):
        self.model = model
        self.hp = hparams
        self.rng = np.random.default_rng(seed)
        self.reset()

    def reset(self):
        cfg = self.model.cfg
        M = self.hp.max_keys
        self.state = {
            "keys": jnp.zeros((M, cfg.d_ffn)),
            "values": jnp.zeros((M, cfg.d_model)),
            "eps": jnp.zeros((M,)),
            "labels": jnp.zeros((M,)),  # full-row label mean (incl. -100s)
            "count": jnp.zeros((), jnp.int32),
            # the last edit's key_id — inference queries at this index
            "edit_tok": jnp.zeros((), jnp.int32),
        }

    # ------------------------------------------------------------------

    def _repl_mask(self, t, length):
        """Position-selection of the replacement mode at query token
        ``t`` (traced) over a ``length``-token row → [length] float."""
        pos = jnp.arange(length)
        if self.hp.replacement == "replace_all":
            return jnp.ones((length,))
        if self.hp.replacement == "replace_last":
            return (pos == t).astype(jnp.float32)
        if self.hp.replacement == "replace_prompt":
            return (pos < t).astype(jnp.float32)
        raise ValueError(self.hp.replacement)

    def _mlp_residual(self, params, state):
        """The GRACEAdapter forward as an ``mlp_residual`` intervention:
        delta = replacement_mask * (chosen_value − original_output)."""
        cfg = self.model.cfg
        hp = self.hp
        w, b = down_weight_bias(params, cfg, hp.layer)

        def per_token(x1):
            # this framework's extension: every token queries the codebook
            q = down_input_from_mlp_input(params, cfg, hp.layer, x1)
            dists = jnp.linalg.norm(
                q[:, :, None, :] - state["keys"][None, None], axis=-1)
            n_active = jnp.minimum(state["count"], state["keys"].shape[0])
            active = jnp.arange(state["keys"].shape[0]) < n_active
            dists = jnp.where(active[None, None, :], dists, jnp.inf)
            best = jnp.argmin(dists, axis=-1)             # [B, L]
            dmin = jnp.min(dists, axis=-1)
            inside = (dmin <= state["eps"][best]) & (state["count"] > 0)
            orig_out = down_out(q, w, b)
            value = state["values"][best]
            return jnp.where(inside[..., None], value - orig_out, 0.0)

        def single_query(x1):
            q = down_input_from_mlp_input(params, cfg, hp.layer, x1)
            L = q.shape[1]
            t = jnp.minimum(state["edit_tok"], L - 1)
            query = jnp.take(q, t, axis=1)                # [B, d_ffn]
            dists = jnp.linalg.norm(
                query[:, None, :] - state["keys"][None], axis=-1)  # [B, M]
            n_active = jnp.minimum(state["count"], state["keys"].shape[0])
            active = jnp.arange(state["keys"].shape[0]) < n_active
            dists = jnp.where(active[None, :], dists, jnp.inf)
            best = jnp.argmin(dists, axis=-1)             # [B]
            dmin = jnp.min(dists, axis=-1)
            inside = (dmin <= state["eps"][best]) & (state["count"] > 0)
            orig_out = down_out(q, w, b)                  # [B, L, d]
            value = state["values"][best][:, None, :]     # [B, 1, d]
            sel = inside[:, None, None] * self._repl_mask(t, L)[None, :, None]
            return sel * (value - orig_out)

        fn = per_token if hp.replacement == "per_token" else single_query
        return (hp.layer, fn)

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
        np_lmask = np.asarray(tb.label_masks)[0]
        edit_tok = jnp.asarray(int(np.nonzero(np_lmask)[0][0]), jnp.int32)
        # The reference's label fingerprint is the mean of the FULL
        # unpadded label row — target ids at target positions, -100
        # everywhere else (GRACE.py:135-136 over utils.tokenize labels).
        np_labels = np.asarray(tb.label_ids)[0]
        n_row = int(np.asarray(tb.attn_mask)[0].sum())
        n_tgt = int(np_lmask.sum())
        label_fp = float((np_labels * np_lmask).sum()
                         + (-100.0) * (n_row - n_tgt)) / max(n_row, 1)
        # cold init = torch.rand uniform [0,1) (GRACE.py:155)
        v0_cold = jnp.asarray(
            self.rng.uniform(size=(self.model.cfg.d_model,)), jnp.float32)
        self.state = self._edit_jit(self.model.params, self.state, ids, mask,
                                    labels, lmask, edit_tok, label_fp,
                                    v0_cold)

    @partial(jax.jit, static_argnums=(0,))
    def _edit_jit(self, params, state, ids, mask, labels, lmask, edit_tok,
                  label_fp, v0_cold):
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
        v0_new = warm if hp.val_init == "warm" else v0_cold
        v0 = jnp.where(add_new, v0_new, state["values"][nearest])

        L = ids.shape[1]
        if hp.replacement == "per_token":
            repl = jax.nn.one_hot(edit_tok[None], L)[..., None]
        else:
            # the training forwards run with the replacement active: the
            # candidate key contains the query itself (dist 0 on add;
            # within the just-expanded ε on retrain), so the chosen value
            # replaces the output per the configured mode (GRACE.py:73-80
            # train through the adapter)
            repl = self._repl_mask(edit_tok, L)[None, :, None]

        def loss_fn(v):
            def fn(x1):
                q = down_input_from_mlp_input(params, cfg, hp.layer, x1)
                orig = down_out(q, w, b)
                return repl * (v - orig)

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
            "edit_tok": edit_tok,
        }

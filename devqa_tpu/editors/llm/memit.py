"""MEMIT — mass-editing memory in a transformer
(``easyeditor/models/memit/memit_main.py``).

Generalizes ROME to many simultaneous edits spread over a layer range:

1. per request, optimize a target hidden state ``z`` at the LAST critical
   layer (compute_z.py). Faithful details, oracle-pinned
   (tests/test_reference_oracle.py::TestMEMITOracle):
   - the delta rides the LAYER output (hidden state) at ``z_layer``, at
     the subject token of every row INCLUDING the essence-KL row
     ("{subject} is a", compute_z.py:48-51,91-110);
   - the NLL is measured at ``loss_layer = max(v_loss_layer, z_layer)``:
     the hidden there goes straight through the final norm + LM head
     (compute_z.py:146-152), while the KL term always reads the full
     final logits (compute_z.py:133-140) — with ``v_loss_layer`` = last
     layer both coincide;
   - ``target_init`` is row 0's (bare "{}" template) hidden at the
     subject token, recorded on the first forward (compute_z.py:96-102),
     and the returned z is ``target_init + delta``;
   - KL(current ‖ initial), weight decay ``‖δ‖ / ‖t₀‖²`` (un-squared
     norm), and the skip-last-backward / loss<5e-2 early-break loop —
     identical to ROME's compute_v (see rome.py);
2. for each layer l in the range (in order), gather the down-projection
   keys ``K_l`` (fc2 inputs at the subject token — averaged per template
   GROUP first, then across groups, compute_ks.py:40-50: the reference's
   cache is ``[["{}"], [N generated]]`` so the bare prompt carries 1/2
   weight, not 1/(N+1)) and the CURRENT bare-prompt z-layer state
   (memit_main.py:171-181 — single bare row, NOT template-averaged);
   distribute the remaining residual ``R = (Z − Z_cur) / (#layers − i)``
   onto layer l with the covariance-regularized least squares
   ``ΔW = (λC + KᵀK)⁻¹ Kᵀ R`` (memit_main.py:150-200, get_cov :248);
3. apply ΔW and continue — later layers see earlier updates.

Covariance defaults to identity (the offline no-stats branch); pass
``cov`` from utils/runningstats.SecondMoment for full parity. K is
captured on the teacher-forced batch (target appended): under the causal
mask the subject-token activations are identical to the reference's
suffix-free prompts.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...core import decoder as dec
from ...utils.config import BaseConfig
from ...utils.surgery import add_to_target
from .mlp_common import capture_down_inputs, down_target
from .rome import CONTEXT_TEMPLATES, _subject_last_token_index
from .session import TextModel


@dataclasses.dataclass(frozen=True)
class MEMITHyperParams(BaseConfig):
    layers: Tuple[int, ...] = (3, 4, 5)
    v_num_grad_steps: int = 20
    v_lr: float = 5e-1
    v_loss_layer: int = -1            # -1 → last layer (reference configs)
    v_weight_decay: float = 0.5
    clamp_norm_factor: float = 4.0
    kl_factor: float = 0.0625
    mom2_update_weight: float = 1.0   # λ on the covariance term


# Module-level jits (fresh per-call @jax.jit closures would re-trace on
# every request — 1000-edit sequential sessions pay trace overhead per
# edit and risk 30-90s tunnel compiles on any cache miss).
@partial(jax.jit, static_argnums=(0, 5))
def _capture_jit(cfg, params, ids, mask, sidx, layer):
    embeds = dec.embed_tokens(params, cfg, ids)
    _, xs = capture_down_inputs(params, cfg, embeds, mask, (layer,))
    return xs[layer][jnp.arange(ids.shape[0]), sidx]


def _capture(model: TextModel, params, ids, mask, sidx, layer):
    """Down-projection input K at `layer`, per row at the subject token."""
    return _capture_jit(model.cfg, params, ids, mask, sidx, layer)


@partial(jax.jit, static_argnums=(0, 5))
def _hidden_at_layer_jit(cfg, params, ids, mask, sidx, layer):
    embeds = dec.embed_tokens(params, cfg, ids)
    h = dec.decoder_forward(params, cfg, embeds, mask, lo=0, hi=layer + 1)
    return h[jnp.arange(ids.shape[0]), sidx]


def _hidden_at_layer(model: TextModel, params, ids, mask, sidx, layer):
    return _hidden_at_layer_jit(model.cfg, params, ids, mask, sidx, layer)


def _template_groups(context_templates):
    """Normalize to the reference's nested shape (memit_main.py:305-318):
    group 0 is always ``["{}"]``; a flat list becomes
    ``[["{}"], [rest]]`` (mirroring ``[["{}"]] + [[generated]]``); a
    nested list passes through."""
    if context_templates is None:
        rest = [t for t in CONTEXT_TEMPLATES if t != "{}"]
        return [["{}"]] + ([rest] if rest else [])
    if isinstance(context_templates[0], (list, tuple)):
        return [list(g) for g in context_templates]
    rest = [t for t in context_templates if t != "{}"]
    return [["{}"]] + ([rest] if rest else [])


def _loss_layer(cfg, hp: MEMITHyperParams, z_layer: int) -> int:
    vl = hp.v_loss_layer if hp.v_loss_layer >= 0 else cfg.n_layers - 1
    return max(vl, z_layer)  # compute_z.py:76


def _optimize_z(model: TextModel, params, request, hp: MEMITHyperParams,
                z_layer: int, context_templates=None):
    """compute_z.py — ROME's v* objective but the delta rides the LAYER
    output (hidden state), not the MLP output."""
    cfg = model.cfg
    tokenizer = model.tokenizer
    subject = request.get("subject") or request["prompt"].split()[-1]
    # groups flatten in order: row 0 is the bare "{}" prompt, whose
    # hidden is target_init and the insert-loop's cur_z
    # (compute_z.py:96-102); group sizes feed the K mean-of-means
    groups = _template_groups(context_templates)
    gsizes = tuple(len(g) for g in groups)
    templates = [t for g in groups for t in g]
    prompts = [t.format(request["prompt"]) for t in templates]
    sidx = jnp.asarray([_subject_last_token_index(tokenizer, p, subject)
                        for p in prompts])
    tb = model.batch(prompts, [request["target_new"]] * len(prompts))
    ids = jnp.asarray(tb.input_ids)
    mask = jnp.asarray(tb.attn_mask)
    labels = jnp.asarray(tb.label_ids)
    lmask = jnp.asarray(tb.label_masks)

    # essence-KL row: "{subject} is a" (compute_z.py:48-51)
    ess_prompt = "%s is a" % subject
    ess_tb = model.batch([ess_prompt], [""])
    ess_ids = jnp.asarray(ess_tb.input_ids)
    ess_mask = jnp.asarray(ess_tb.attn_mask)
    ess_sidx = jnp.asarray(
        [_subject_last_token_index(tokenizer, ess_prompt, subject)])

    z = _optimize_z_jit(cfg, params, ids, mask, labels, lmask, sidx,
                        ess_ids, ess_mask, ess_sidx, hp, z_layer)
    return z, (ids, mask, sidx, gsizes)


def _fwd_hiddens(cfg, params, embeds, mask, onehot, delta, z_layer,
                 loss_layer):
    """Hidden after ``loss_layer`` and after the last layer, with
    ``onehot·delta`` added to the layer-``z_layer`` output."""
    h = dec.decoder_forward(params, cfg, embeds, mask, lo=0,
                            hi=loss_layer + 1,
                            layer_residual=(z_layer,
                                            lambda x: x + onehot * delta))
    h_final = dec.decoder_forward(params, cfg, h, mask, lo=loss_layer + 1)
    return h, h_final


@partial(jax.jit, static_argnums=(0, 10, 11))
def _optimize_z_jit(cfg, params, ids, mask, labels, lmask, sidx,
                    ess_ids, ess_mask, ess_sidx, hp: MEMITHyperParams,
                    z_layer: int):
    L = ids.shape[1]
    loss_layer = _loss_layer(cfg, hp, z_layer)
    embeds = dec.embed_tokens(params, cfg, ids)
    ess_embeds = dec.embed_tokens(params, cfg, ess_ids)
    onehot = jax.nn.one_hot(sidx, L)[..., None]          # [B, L, 1]
    ess_onehot = jax.nn.one_hot(ess_sidx, ess_ids.shape[1])[..., None]

    # target_init: row 0's bare-prompt hidden at z_layer, recorded on the
    # first forward with delta = 0 (compute_z.py:96-102)
    h0 = dec.decoder_forward(params, cfg, embeds, mask, lo=0,
                             hi=z_layer + 1)
    target_init = h0[0, sidx[0]]
    max_norm = hp.clamp_norm_factor * jnp.linalg.norm(target_init)

    # kl_distr_init: full final logits of the essence row with delta = 0
    # through the delta'd graph (compute_z.py:133-142) — equal to a plain
    # forward's distribution
    _, ess_h0 = _fwd_hiddens(cfg, params, ess_embeds, ess_mask, ess_onehot,
                             jnp.zeros((cfg.d_model,)), z_layer, loss_layer)
    pre_ess_p = jax.nn.log_softmax(
        dec.decoder_logits(params, cfg, ess_h0)[0, ess_sidx[0]])

    def loss_fn(delta):
        h_loss, _ = _fwd_hiddens(cfg, params, embeds, mask, onehot, delta,
                                 z_layer, loss_layer)
        logits = dec.decoder_logits(params, cfg, h_loss)
        logp = jax.nn.log_softmax(logits, -1)
        picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        m = lmask.astype(jnp.float32)
        nll = -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)
        _, ess_hf = _fwd_hiddens(cfg, params, ess_embeds, ess_mask,
                                 ess_onehot, delta, z_layer, loss_layer)
        ess_p = jax.nn.log_softmax(
            dec.decoder_logits(params, cfg, ess_hf)[0, ess_sidx[0]])
        # KL(current ‖ initial) (compute_z.py:162-164)
        klv = (jnp.exp(ess_p) * (ess_p - pre_ess_p)).sum()
        # ‖δ‖ / ‖t₀‖² — norm NOT squared (compute_z.py:165-167); safe
        # sqrt subgradient at 0 (torch defines it as 0; δ starts at 0)
        sq = jnp.sum(delta * delta)
        dnorm = jnp.where(sq == 0.0, 0.0,
                          jnp.sqrt(jnp.where(sq == 0.0, 1.0, sq)))
        wd = hp.v_weight_decay * dnorm \
            / jnp.maximum(jnp.sum(target_init * target_init), 1e-12)
        return nll + hp.kl_factor * klv + wd

    opt = optax.adam(hp.v_lr)

    # the reference breaks BEFORE the backward on the last iteration and
    # on loss < 5e-2 (compute_z.py:174-182): v_num_grad_steps iterations
    # = v_num_grad_steps − 1 optimizer steps; an early break keeps the
    # delta that achieved the loss un-stepped.
    def cond(carry):
        _, _, it, loss = carry
        return jnp.logical_and(it < hp.v_num_grad_steps - 1, loss >= 5e-2)

    def body(carry):
        delta, st, it, _ = carry
        loss, g = jax.value_and_grad(loss_fn)(delta)
        up, st = opt.update(g, st, delta)
        stepped = optax.apply_updates(delta, up)
        n = jnp.linalg.norm(stepped)
        stepped = jnp.where(n > max_norm, stepped * max_norm / n, stepped)
        return (jnp.where(loss < 5e-2, delta, stepped), st, it + 1, loss)

    d0 = jnp.zeros((cfg.d_model,))
    d, _, _, _ = jax.lax.while_loop(
        cond, body, (d0, opt.init(d0), jnp.asarray(0), jnp.asarray(jnp.inf)))
    return target_init + d


def apply_memit(model: TextModel, requests: List[Dict],
                hparams: MEMITHyperParams,
                cov: Optional[Dict[int, jnp.ndarray]] = None,
                context_templates=None):
    """→ edited decoder params for a batch of requests."""
    cfg = model.cfg
    layers = tuple(hparams.layers)
    z_layer = layers[-1]
    params = model.params

    zs, contexts = [], []
    for r in requests:
        z, ctx = _optimize_z(model, params, r, hparams, z_layer,
                             context_templates)
        zs.append(z)
        contexts.append(ctx)
    Z = jnp.stack(zs)  # [n, d]

    for i, l in enumerate(layers):
        Ks, cur = [], []
        for (ids, mask, sidx, gsizes) in contexts:
            # K: mean of per-GROUP means (compute_ks.py:40-50); cur_z:
            # the BARE prompt's current z-layer hidden — row 0, not the
            # average (memit_main.py:171-181 passes only the raw prompt)
            rows = _capture(model, params, ids, mask, sidx, l)
            parts, i0 = [], 0
            for gs in gsizes:
                parts.append(rows[i0:i0 + gs].mean(0))
                i0 += gs
            Ks.append(jnp.stack(parts).mean(0))
            cur.append(_hidden_at_layer(model, params, ids, mask, sidx,
                                        z_layer)[0])
        K = jnp.stack(Ks)                     # [n, d_ffn]
        cur_z = jnp.stack(cur)                # [n, d]
        resid = (Z - cur_z) / (len(layers) - i)
        # λ scales the covariance term whichever C is used — the reference
        # solves (λ·cov + KᵀK) (memit_main.py:150-200); scaling only the
        # identity fallback would silently no-op λ exactly when real
        # SecondMoment stats are supplied.
        C = cov[l] if cov is not None and l in cov else jnp.eye(cfg.d_ffn)
        A = hparams.mom2_update_weight * C + K.T @ K  # [d_ffn, d_ffn]
        dw = jnp.linalg.solve(A, K.T @ resid)  # [d_ffn, d]
        params = add_to_target(params, down_target(cfg, l), dw)
    return params

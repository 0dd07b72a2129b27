"""MEMIT — mass-editing memory in a transformer
(``easyeditor/models/memit/memit_main.py``).

Generalizes ROME to many simultaneous edits spread over a layer range:

1. per request, optimize a target hidden state ``z`` at the LAST critical
   layer (compute_z.py — same objective as ROME's v*: target NLL +
   essence-KL + norm clamp);
2. for each layer l in the range (in order), gather the down-projection
   keys ``K_l`` (fc2 inputs at the subject token, compute_ks.py) and the
   current z-layer states; distribute the remaining residual
   ``R = (Z − Z_cur) / (#layers − i)`` onto layer l with the
   covariance-regularized least squares
   ``ΔW = (λC + KᵀK)⁻¹ Kᵀ R`` (memit_main.py:150-200, get_cov :248);
3. apply ΔW and continue — later layers see earlier updates.

Covariance defaults to identity·λ (the offline no-stats branch);
pass ``cov`` from utils/runningstats.SecondMoment for full parity.
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


def _optimize_z(model: TextModel, params, request, hp: MEMITHyperParams,
                z_layer: int):
    """compute_z.py — ROME's v* objective but the delta rides the LAYER
    output (hidden state), not the MLP output."""
    cfg = model.cfg
    tokenizer = model.tokenizer
    subject = request.get("subject") or request["prompt"].split()[-1]
    prompts = [t.format(request["prompt"]) for t in CONTEXT_TEMPLATES]
    sidx = jnp.asarray([_subject_last_token_index(tokenizer, p, subject)
                        for p in prompts])
    tb = model.batch(prompts, [request["target_new"]] * len(prompts))
    ids = jnp.asarray(tb.input_ids)
    mask = jnp.asarray(tb.attn_mask)
    labels = jnp.asarray(tb.label_ids)
    lmask = jnp.asarray(tb.label_masks)
    B, L = ids.shape

    cur_z = _hidden_at_layer(model, params, ids, mask, sidx, z_layer).mean(0)
    z = _optimize_z_jit(cfg, params, ids, mask, labels, lmask, sidx, cur_z,
                        hp, z_layer)
    return z, (ids, mask, sidx)


@partial(jax.jit, static_argnums=(0, 8, 9))
def _optimize_z_jit(cfg, params, ids, mask, labels, lmask, sidx, cur_z,
                    hp: MEMITHyperParams, z_layer: int):
    L = ids.shape[1]
    embeds = dec.embed_tokens(params, cfg, ids)
    onehot = jax.nn.one_hot(sidx, L)[..., None]
    max_norm = hp.clamp_norm_factor * jnp.linalg.norm(cur_z)

    def loss_fn(delta):
        logits = dec.decoder_apply(
            params, cfg, embeds, mask,
            layer_residual=(z_layer, lambda h: h + onehot * delta))
        logp = jax.nn.log_softmax(logits, -1)
        picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        m = lmask.astype(jnp.float32)
        nll = -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)
        wd = hp.v_weight_decay * jnp.sum(delta * delta) \
            / jnp.maximum(jnp.sum(cur_z * cur_z), 1e-12)
        return nll + wd

    opt = optax.adam(hp.v_lr)

    def body(_, carry):
        d, st = carry
        g = jax.grad(loss_fn)(d)
        up, st = opt.update(g, st, d)
        d = optax.apply_updates(d, up)
        n = jnp.linalg.norm(d)
        return jnp.where(n > max_norm, d * max_norm / n, d), st

    d0 = jnp.zeros((cfg.d_model,))
    d, _ = jax.lax.fori_loop(0, hp.v_num_grad_steps, body,
                             (d0, opt.init(d0)))
    return cur_z + d


def apply_memit(model: TextModel, requests: List[Dict],
                hparams: MEMITHyperParams,
                cov: Optional[Dict[int, jnp.ndarray]] = None):
    """→ edited decoder params for a batch of requests."""
    cfg = model.cfg
    layers = tuple(hparams.layers)
    z_layer = layers[-1]
    params = model.params

    zs, contexts = [], []
    for r in requests:
        z, ctx = _optimize_z(model, params, r, hparams, z_layer)
        zs.append(z)
        contexts.append(ctx)
    Z = jnp.stack(zs)  # [n, d]

    for i, l in enumerate(layers):
        Ks, cur = [], []
        for (ids, mask, sidx) in contexts:
            Ks.append(_capture(model, params, ids, mask, sidx, l).mean(0))
            cur.append(_hidden_at_layer(model, params, ids, mask, sidx,
                                        z_layer).mean(0))
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

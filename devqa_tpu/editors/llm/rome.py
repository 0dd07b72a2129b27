"""ROME — rank-one model editing (``easyeditor/models/rome/``).

Pipeline (rome_main.py:17-60 + compute_u.py + compute_v.py):

1. **k*** — average the edited MLP down-projection's *input* at the
   subject's last token over a set of context templates
   (compute_u.py; repr_tools token indexing). Captured via the decoder's
   fc-probe forward (no hooks).
2. **u** — k* optionally whitened by the inverse layer covariance
   (``mom2_adjustment``; stats from utils/runningstats.SecondMoment —
   offline default is identity, the reference's no-stats branch), then
   L2-normalized.
3. **z (v*)** — optimize a delta on the MLP output at the subject token
   so the model emits the new target (compute_v.py: NLL over target
   tokens + essence-KL on "{subject} is a" + norm clamp). Faithful
   details, oracle-pinned (tests/test_reference_oracle.py):
   - the KL term is KL(current ‖ initial) — torch's
     ``kl_div(init_logp, cur_logp, log_target=True)`` computes
     Σ p_cur·(log p_cur − log p_init) (compute_v.py:148-151);
   - weight decay is ``‖δ‖ / ‖t₀‖²`` — the norm is NOT squared
     (compute_v.py:152-154; the squared variant is commented out);
   - the loop breaks BEFORE the backward on the last iteration
     (compute_v.py:164-165), so ``v_num_grad_steps`` performs
     ``v_num_grad_steps − 1`` optimizer steps; the ``loss < 5e-2``
     early break keeps the delta that achieved it un-stepped.
4. **Δ W = u ⊗ (z − out₀) / (uᵀ k₀)** — closed-form rank-one update on
   the down-projection (our [in, out] layout). ``k₀``/``out₀`` are the
   BARE prompt's (template "{}") module input/output at the subject
   token — the reference re-captures them single-row
   (compute_v.get_module_input_output_at_word), while ``u`` averages
   over all templates (compute_u.py).

Arch-generic: the edited linear is OPT's fc2 / llama's down_proj (the
reference's per-model ``rewrite_module_tmp``, e.g.
``model.layers.{}.mlp.down_proj`` for llama). Context templates default
to a fixed neutral set (the reference samples generations from the model
itself — rome_main.get_context_templates; a documented divergence that
only affects the k* averaging distribution; pass ``context_templates``
explicitly for exact control — ``["{}"]`` reproduces the reference with
``context_template_length_params: []``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...core import decoder as dec
from ...utils.config import BaseConfig
from ...utils.surgery import add_to_target
from .mlp_common import capture_down_inputs, down_out, down_target, \
    down_weight_bias
from .session import TextModel

CONTEXT_TEMPLATES = [
    "{}",
    "The following is true. {}",
    "I read that {}",
    "People say that {}",
    "It is known that {}",
]


@dataclasses.dataclass(frozen=True)
class ROMEHyperParams(BaseConfig):
    layer: int = 5
    module: str = "fc2"
    v_num_grad_steps: int = 20
    v_lr: float = 5e-1
    v_weight_decay: float = 0.5
    clamp_norm_factor: float = 4.0
    kl_factor: float = 0.0625
    mom2_adjustment: bool = False


def _subject_last_token_index(tokenizer, prompt: str, subject: str) -> int:
    """Token index of the subject's last token within tok(prompt)
    (repr_tools.get_words_idxs_in_templates semantics, via prefix
    tokenization)."""
    pos = prompt.rfind(subject)
    if pos < 0:
        return len(tokenizer.encode(prompt)) - 1
    prefix_plus = prompt[: pos + len(subject)]
    return len(tokenizer.encode(prefix_plus)) - 1


def apply_rome(model: TextModel, request, hparams: ROMEHyperParams,
               cov_inv: Optional[jnp.ndarray] = None,
               context_templates=None):
    """→ edited decoder params. ``request`` needs 'prompt', 'target_new'
    and ideally 'subject' (defaults to the last prompt word)."""
    cfg = model.cfg
    tokenizer = model.tokenizer
    subject = request.get("subject") or request["prompt"].split()[-1]
    li = hparams.layer
    # template "{}" always first (the reference's CONTEXT_TEMPLATES_CACHE
    # leads with it): row 0 is the bare prompt, reused for the solve
    templates = ["{}"] + [t for t in (context_templates or CONTEXT_TEMPLATES)
                          if t != "{}"]

    # ---- contexts with subject-token indices ----
    prompts = [t.format(request["prompt"]) for t in templates]
    subj_idx = [_subject_last_token_index(tokenizer, p, subject)
                for p in prompts]
    tb = model.batch(prompts, [request["target_new"]] * len(prompts))
    ids = jnp.asarray(tb.input_ids)
    mask = jnp.asarray(tb.attn_mask)
    labels = jnp.asarray(tb.label_ids)
    lmask = jnp.asarray(tb.label_masks)
    sidx = jnp.asarray(subj_idx)

    k_star, k_bare, out_bare = _capture_k_out_jit(cfg, model.params, ids,
                                                  mask, sidx, li)

    # ---- u (compute_u.py; identity covariance unless provided) ----
    u = cov_inv @ k_star if cov_inv is not None else k_star
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)

    # ---- optimize z (compute_v.py) ----
    ess_prompt = "%s is a" % subject
    ess_tb = model.batch([ess_prompt], [""])
    ess_ids = jnp.asarray(ess_tb.input_ids)
    ess_mask = jnp.asarray(ess_tb.attn_mask)
    ess_sidx = jnp.asarray(
        [_subject_last_token_index(tokenizer, ess_prompt, subject)])

    z = _optimize_z_rome_jit(cfg, model.params, ids, mask, labels, lmask,
                             sidx, ess_ids, ess_mask, ess_sidx, out_bare,
                             hparams, li)

    # ---- rank-one update (rome_main.py:17-60 closed form): the solve
    # uses the BARE prompt's module input/output (compute_v.py:178-193),
    # not the template average. Sign-preserving tiny-denominator guard —
    # a maximum() clamp would flip negative u·k to +1e-8.
    denom = jnp.dot(u, k_bare)
    denom = jnp.where(jnp.abs(denom) < 1e-8,
                      jnp.where(denom < 0, -1e-8, 1e-8), denom)
    dw = jnp.outer(u, (z - out_bare) / denom)
    return add_to_target(model.params, down_target(cfg, li), dw)


# Module-level jits: fresh per-call @jax.jit closures would re-trace on
# every edit (sequential sessions pay trace overhead per request, plus
# 30-90s tunnel compiles on any cache miss).
@partial(jax.jit, static_argnums=(0, 4))
def _capture_down_jit(cfg, params, ids, mask, layer):
    embeds = dec.embed_tokens(params, cfg, ids)
    _, xs = capture_down_inputs(params, cfg, embeds, mask, (layer,))
    return xs[layer]


@partial(jax.jit, static_argnums=(0, 5))
def _capture_k_out_jit(cfg, params, ids, mask, sidx, layer):
    """Down-projection input (k) and MLP-block output contribution at
    the subject token: the template average (for u) plus row 0's bare
    values (for target_init and the solve, compute_v.py:178-193)."""
    embeds = dec.embed_tokens(params, cfg, ids)
    _, xs = capture_down_inputs(params, cfg, embeds, mask, (layer,))
    k = xs[layer][jnp.arange(ids.shape[0]), sidx]  # [B, d_ffn]
    w, b = down_weight_bias(params, cfg, layer)
    return k.mean(0), k[0], down_out(k[0], w, b)


def _rome_v_loss(cfg, params, embeds, mask, labels, lmask, onehot,
                 ess_embeds, ess_mask, ess_sidx, ess_onehot, pre_ess_p,
                 target_init, hparams, li, delta):
    """compute_v.py's per-iteration objective at candidate ``delta``."""
    def fwd(delta, embeds_, mask_, oh):
        return dec.decoder_apply(params, cfg, embeds_, mask_,
                                 mlp_residual=(li, lambda x: oh * delta))

    logits = fwd(delta, embeds, mask, onehot)
    logp = jax.nn.log_softmax(logits, -1)
    picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
    m = lmask.astype(jnp.float32)
    nll = -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)
    ess = fwd(delta, ess_embeds, ess_mask, ess_onehot)
    ess_p = jax.nn.log_softmax(ess[0, ess_sidx[0]])
    # KL(current ‖ initial): torch kl_div(init, cur, log_target=True)
    # = Σ p_cur (log p_cur − log p_init) (compute_v.py:148-151)
    klv = (jnp.exp(ess_p) * (ess_p - pre_ess_p)).sum()
    # ‖δ‖ / ‖t₀‖² — norm NOT squared (compute_v.py:152-154). Safe sqrt:
    # the 2-norm's grad at 0 is NaN in JAX; torch defines the
    # subgradient there as 0, and δ starts at exactly 0.
    sq = jnp.sum(delta * delta)
    dnorm = jnp.where(sq == 0.0, 0.0,
                      jnp.sqrt(jnp.where(sq == 0.0, 1.0, sq)))
    wd = hparams.v_weight_decay * dnorm \
        / jnp.maximum(jnp.sum(target_init * target_init), 1e-12)
    return nll + hparams.kl_factor * klv + wd


def rome_v_loss_grads(model: TextModel, request, hparams: ROMEHyperParams,
                      delta, context_templates=None):
    """Diagnostic: (loss, grad) of compute_v's objective at ``delta``.
    Used by the cross-framework oracle to pin the KL direction and
    weight-decay form at a NONZERO delta — both have zero gradient at
    δ=0, so one-step trajectory tests cannot see them."""
    cfg = model.cfg
    subject = request.get("subject") or request["prompt"].split()[-1]
    li = hparams.layer
    templates = ["{}"] + [t for t in (context_templates or CONTEXT_TEMPLATES)
                          if t != "{}"]
    prompts = [t.format(request["prompt"]) for t in templates]
    sidx = jnp.asarray([_subject_last_token_index(model.tokenizer, p, subject)
                        for p in prompts])
    tb = model.batch(prompts, [request["target_new"]] * len(prompts))
    ids, mask = jnp.asarray(tb.input_ids), jnp.asarray(tb.attn_mask)
    _, k_bare, out_bare = _capture_k_out_jit(cfg, model.params, ids, mask,
                                             sidx, li)
    ess_prompt = "%s is a" % subject
    ess_tb = model.batch([ess_prompt], [""])
    ess_ids = jnp.asarray(ess_tb.input_ids)
    ess_mask = jnp.asarray(ess_tb.attn_mask)
    ess_sidx = jnp.asarray(
        [_subject_last_token_index(model.tokenizer, ess_prompt, subject)])
    onehot = jax.nn.one_hot(sidx, ids.shape[1])[..., None]
    ess_onehot = jax.nn.one_hot(ess_sidx, ess_ids.shape[1])[..., None]
    pre_ess = dec.decoder_apply(model.params, cfg,
                                dec.embed_tokens(model.params, cfg, ess_ids),
                                ess_mask)
    pre_ess_p = jax.nn.log_softmax(pre_ess[0, ess_sidx[0]])
    embeds = dec.embed_tokens(model.params, cfg, ids)
    return jax.value_and_grad(lambda d: _rome_v_loss(
        cfg, model.params, embeds, mask, jnp.asarray(tb.label_ids),
        jnp.asarray(tb.label_masks), onehot, dec.embed_tokens(
            model.params, cfg, ess_ids), ess_mask, ess_sidx, ess_onehot,
        pre_ess_p, out_bare, hparams, li, d))(jnp.asarray(delta))


@partial(jax.jit, static_argnums=(0, 11, 12))
def _optimize_z_rome_jit(cfg, params, ids, mask, labels, lmask, sidx,
                         ess_ids, ess_mask, ess_sidx, target_init,
                         hparams: "ROMEHyperParams", li: int):
    L = ids.shape[1]
    embeds = dec.embed_tokens(params, cfg, ids)
    ess_embeds = dec.embed_tokens(params, cfg, ess_ids)
    max_norm = hparams.clamp_norm_factor * jnp.linalg.norm(target_init)

    onehot = jax.nn.one_hot(sidx, L)[..., None]          # [B, L, 1]
    ess_onehot = jax.nn.one_hot(ess_sidx, ess_ids.shape[1])[..., None]

    def fwd_with_delta(delta, embeds_, mask_, oh):
        return dec.decoder_apply(
            params, cfg, embeds_, mask_,
            mlp_residual=(li, lambda x: oh * delta))

    # kl_distr_init: recorded on the FIRST optimization forward, i.e.
    # with delta = 0 but THROUGH the delta'd graph (compute_v.py:125-133)
    # — a plain forward gives the identical distribution.
    pre_ess = fwd_with_delta(jnp.zeros((cfg.d_model,)), ess_embeds,
                             ess_mask, ess_onehot)
    pre_ess_p = jax.nn.log_softmax(pre_ess[0, ess_sidx[0]])

    def loss_fn(delta):
        return _rome_v_loss(cfg, params, embeds, mask, labels, lmask,
                            onehot, ess_embeds, ess_mask, ess_sidx,
                            ess_onehot, pre_ess_p, target_init, hparams,
                            li, delta)

    opt = optax.adam(hparams.v_lr)

    # the reference breaks BEFORE the backward on the last iteration and
    # on loss < 5e-2 (compute_v.py:161-169): v_num_grad_steps iterations
    # = v_num_grad_steps − 1 optimizer steps, and an early break keeps
    # the delta that achieved the loss un-stepped.
    def cond(carry):
        _, _, it, loss = carry
        return jnp.logical_and(it < hparams.v_num_grad_steps - 1,
                               loss >= 5e-2)

    def body(carry):
        delta, st, it, _ = carry
        loss, g = jax.value_and_grad(loss_fn)(delta)
        up, st = opt.update(g, st, delta)
        stepped = optax.apply_updates(delta, up)
        n = jnp.linalg.norm(stepped)
        stepped = jnp.where(n > max_norm, stepped * max_norm / n, stepped)
        # the early-break check uses THIS iteration's loss: if it fell
        # under 5e-2 the un-stepped delta must be kept
        return (jnp.where(loss < 5e-2, delta, stepped), st, it + 1, loss)

    delta0 = jnp.zeros((cfg.d_model,))
    delta, _, _, _ = jax.lax.while_loop(
        cond, body, (delta0, opt.init(delta0), jnp.asarray(0),
                     jnp.asarray(jnp.inf)))
    return target_init + delta


def estimate_fc2_covariance(model: TextModel, texts, layer: int,
                            batch_size: int = 8):
    """Layer-stats covariance over a corpus (rome/layer_stats.py) →
    inverse second moment for mom2_adjustment. Despite the legacy name,
    covers the down-projection of either arch (fc2 / down_proj)."""
    from ...utils.runningstats import SecondMoment

    cfg = model.cfg
    sm = SecondMoment(cfg.d_ffn)

    for i in range(0, len(texts), batch_size):
        chunk = texts[i:i + batch_size]
        tb = model.batch(chunk, [""] * len(chunk))
        x2 = _capture_down_jit(cfg, model.params,
                               jnp.asarray(tb.input_ids),
                               jnp.asarray(tb.attn_mask), layer)
        rows = np.asarray(x2).reshape(-1, cfg.d_ffn)
        valid = np.asarray(tb.attn_mask).reshape(-1) == 1
        sm.add(rows[valid])
    mom2 = np.asarray(sm.moment())
    return jnp.asarray(np.linalg.inv(
        mom2 + 1e-4 * np.eye(mom2.shape[0], dtype=mom2.dtype)))

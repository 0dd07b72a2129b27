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
   tokens + essence-KL on "{subject} is a" + norm clamp).
4. **Δ W = u ⊗ (z − k*W) / (uᵀ k*)** — closed-form rank-one update on the
   down-projection (our [in, out] layout), giving k*ᵀ W' = z exactly.

Arch-generic: the edited linear is OPT's fc2 / llama's down_proj (the
reference's per-model ``rewrite_module_tmp``, e.g.
``model.layers.{}.mlp.down_proj`` for llama). Context templates are a
fixed neutral set (the reference samples generations from the model
itself — rome_main.get_context_templates; a documented divergence that
only affects the k* averaging distribution).
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
               cov_inv: Optional[jnp.ndarray] = None):
    """→ edited decoder params. ``request`` needs 'prompt', 'target_new'
    and ideally 'subject' (defaults to the last prompt word)."""
    cfg = model.cfg
    tokenizer = model.tokenizer
    subject = request.get("subject") or request["prompt"].split()[-1]
    li = hparams.layer

    # ---- contexts with subject-token indices ----
    prompts = [t.format(request["prompt"]) for t in CONTEXT_TEMPLATES]
    subj_idx = [_subject_last_token_index(tokenizer, p, subject)
                for p in prompts]
    tb = model.batch(prompts, [request["target_new"]] * len(prompts))
    ids = jnp.asarray(tb.input_ids)
    mask = jnp.asarray(tb.attn_mask)
    labels = jnp.asarray(tb.label_ids)
    lmask = jnp.asarray(tb.label_masks)
    sidx = jnp.asarray(subj_idx)

    k_star, cur_out = _capture_k_out_jit(cfg, model.params, ids, mask,
                                         sidx, li)

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
                             sidx, ess_ids, ess_mask, ess_sidx, cur_out,
                             hparams, li)

    # ---- rank-one update (rome_main.py:17-60 closed form) ----
    w, b = down_weight_bias(model.params, cfg, li)
    denom = jnp.maximum(jnp.dot(u, k_star), 1e-8)
    dw = jnp.outer(u, (z - down_out(k_star, w, b)) / denom)
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
    the subject token per row, averaged over context templates."""
    embeds = dec.embed_tokens(params, cfg, ids)
    _, xs = capture_down_inputs(params, cfg, embeds, mask, (layer,))
    k = xs[layer][jnp.arange(ids.shape[0]), sidx]  # [B, d_ffn]
    w, b = down_weight_bias(params, cfg, layer)
    return k.mean(0), down_out(k, w, b).mean(0)


@partial(jax.jit, static_argnums=(0, 11, 12))
def _optimize_z_rome_jit(cfg, params, ids, mask, labels, lmask, sidx,
                         ess_ids, ess_mask, ess_sidx, cur_out,
                         hparams: "ROMEHyperParams", li: int):
    L = ids.shape[1]
    embeds = dec.embed_tokens(params, cfg, ids)
    ess_embeds = dec.embed_tokens(params, cfg, ess_ids)
    pre_ess = dec.decoder_apply(params, cfg, ess_embeds, ess_mask)
    pre_ess_p = jax.nn.log_softmax(pre_ess[0, ess_sidx[0]])
    max_norm = hparams.clamp_norm_factor * jnp.linalg.norm(cur_out)

    onehot = jax.nn.one_hot(sidx, L)[..., None]          # [B, L, 1]
    ess_onehot = jax.nn.one_hot(ess_sidx, ess_ids.shape[1])[..., None]

    def fwd_with_delta(delta, embeds_, mask_, oh):
        return dec.decoder_apply(
            params, cfg, embeds_, mask_,
            mlp_residual=(li, lambda x: oh * delta))

    def loss_fn(delta):
        logits = fwd_with_delta(delta, embeds, mask, onehot)
        logp = jax.nn.log_softmax(logits, -1)
        picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        m = lmask.astype(jnp.float32)
        nll = -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)
        ess = fwd_with_delta(delta, ess_embeds, ess_mask, ess_onehot)
        ess_p = jax.nn.log_softmax(ess[0, ess_sidx[0]])
        klv = (jnp.exp(pre_ess_p) * (pre_ess_p - ess_p)).sum()
        # sum-of-squares (NOT norm()**2 — sqrt has a NaN grad at 0)
        wd = hparams.v_weight_decay * jnp.sum(delta * delta) \
            / jnp.maximum(jnp.sum(cur_out * cur_out), 1e-12)
        return nll + hparams.kl_factor * klv + wd

    opt = optax.adam(hparams.v_lr)

    def body(_, carry):
        delta, st = carry
        g = jax.grad(loss_fn)(delta)
        up, st = opt.update(g, st, delta)
        delta = optax.apply_updates(delta, up)
        n = jnp.linalg.norm(delta)
        delta = jnp.where(n > max_norm, delta * max_norm / n, delta)
        return delta, st

    delta0 = jnp.zeros((cfg.d_model,))
    delta, _ = jax.lax.fori_loop(0, hparams.v_num_grad_steps, body,
                                 (delta0, opt.init(delta0)))
    return cur_out + delta


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

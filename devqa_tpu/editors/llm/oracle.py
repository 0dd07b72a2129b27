"""Rank-1 test-time-training "oracle" baseline
(``easyeditor/models/mend/oracle.py:9-110``): per edit, optimize one
rank-1 residual u vᵀ per target weight with plain SGD (lr 100) until the
edit fits (token acc == 1) or ``max_it`` steps, minimizing

    loss = KL(orig ‖ edited) on held-in locality rows + cedit · edit NLL

then report whether the edit succeeded and how well held-out locality
argmaxes are retained (oracle.py:66-110 history/ret bookkeeping).

The reference drives this with the ``higher`` functional monkeypatch and
a Python loop; here the residuals are explicit pytree edits and the
whole optimization is ONE jitted ``lax.while_loop`` (the acc == 1 early
exit is compiled in, so a converged edit costs exactly as many device
steps as it needs).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import decoder as dec
from ...core.losses import label_loss, logit_kl_loss, token_accuracy
from ...utils.config import BaseConfig
from ...utils.surgery import ParamTarget, add_to_target, get_target
from .session import TextModel


@dataclasses.dataclass(frozen=True)
class OracleHyperParams(BaseConfig):
    layers: Tuple[int, ...] = (31,)
    module: str = "fc2"        # param key within the layer ("fc2","down",…)
    lr: float = 100.0          # oracle.py:32 SGD lr
    cedit: float = 2e-4        # oracle.py:66 loss weight on the edit NLL
    max_it: int = 1000         # oracle.py:44 iteration cap
    init_std: float = 0.01     # oracle.py:22 u/v init scale
    n_train_loc: int = 10      # oracle.py:36-37 held-in/held-out split


def _edited(params, uv, targets):
    for t in targets:
        u, v = uv[str(t)]
        w = get_target(params, t)
        params = add_to_target(params, t, (u @ v).astype(w.dtype))
    return params


# Module-level jit (a fresh per-call closure would re-trace each edit in
# oracle_history's sequential loop).
@partial(jax.jit, static_argnums=(0, 9, 10))
def _ttt_jit(cfg, params, uv0, e_ids, e_mask, e_lab, e_lm, t_ids, t_mask,
             hparams: "OracleHyperParams", targets):
    def fwd(p, ids, mask):
        return dec.decoder_apply(p, cfg, dec.embed_tokens(p, cfg, ids), mask)

    orig_tr = fwd(params, t_ids, t_mask)

    def loss_fn(uv):
        p = _edited(params, uv, targets)
        # kl_loc_loss role (evaluate_utils.py:474): full-vocab drift
        # on every valid locality position, so the mask is attn_mask
        loc_kl = logit_kl_loss(orig_tr, fwd(p, t_ids, t_mask), t_mask)
        e_logits = fwd(p, e_ids, e_mask)
        nll = label_loss(e_logits, e_lab, e_lm)
        accs, _ = token_accuracy(e_logits, e_lab, e_lm)
        return loc_kl + hparams.cedit * nll, accs.min()

    def cond(carry):
        uv, it, acc = carry
        return (acc < 1.0) & (it < hparams.max_it)

    def body(carry):
        # One fused fwd+bwd per iteration: acc is measured at the
        # CURRENT uv (the reference's measure-then-step order,
        # oracle.py:44-100) and carried into the next cond check; the
        # returned uv is thus stepped once past the converged point,
        # exactly like the reference's post-measure res_opt.step().
        uv, it, _ = carry
        (_, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(uv)
        uv = jax.tree_util.tree_map(
            lambda x, gx: x - hparams.lr * gx, uv, g)
        return uv, it + 1, acc

    uv, iters, fit_acc = jax.lax.while_loop(
        cond, body, (uv0, 0, jnp.float32(0.0)))
    # fit_acc drives success (the reference's loop-exit bookkeeping,
    # oracle.py:104-107); acc re-measures the RETURNED uv so info
    # also matches edited_params.
    _, acc = loss_fn(uv)
    return uv, iters, fit_acc, acc


def oracle_rank1_ttt(model: TextModel, request: Dict,
                     loc_prompts: Sequence[str],
                     loc_answers: Sequence[str],
                     hparams: OracleHyperParams, seed: int = 0):
    """→ (edited_params, info) where info = {success, iters, acc,
    retention} (retention = held-out locality argmax agreement;
    NaN when there are no held-out rows)."""
    cfg = model.cfg
    targets = [ParamTarget(("layers", hparams.module, "w"), l)
               for l in hparams.layers]

    eb = model.batch([request["prompt"]], [request["target_new"]])
    n_tr = min(hparams.n_train_loc, len(loc_prompts))
    tb_tr = model.batch(loc_prompts[:n_tr], loc_answers[:n_tr])
    has_val = len(loc_prompts) > n_tr
    tb_val = (model.batch(loc_prompts[n_tr:], loc_answers[n_tr:])
              if has_val else None)

    key = jax.random.PRNGKey(seed)
    uv0 = {}
    for i, t in enumerate(targets):
        w = get_target(model.params, t)
        ku, kv = jax.random.split(jax.random.fold_in(key, i))
        uv0[str(t)] = (
            jax.random.normal(ku, (w.shape[0], 1), jnp.float32)
            * hparams.init_std,
            jax.random.normal(kv, (1, w.shape[1]), jnp.float32)
            * hparams.init_std)

    e_ids, e_mask = jnp.asarray(eb.input_ids), jnp.asarray(eb.attn_mask)
    e_lab, e_lm = jnp.asarray(eb.label_ids), jnp.asarray(eb.label_masks)
    t_ids, t_mask = jnp.asarray(tb_tr.input_ids), jnp.asarray(tb_tr.attn_mask)

    uv, iters, fit_acc, acc = _ttt_jit(
        cfg, model.params, uv0, e_ids, e_mask, e_lab, e_lm, t_ids, t_mask,
        hparams, tuple(targets))
    edited_params = _edited(model.params, uv, tuple(targets))

    retention = float("nan")
    if has_val:
        v_ids, v_mask = (jnp.asarray(tb_val.input_ids),
                         jnp.asarray(tb_val.attn_mask))
        orig = np.asarray(jnp.argmax(
            model._logits(model.params, v_ids, v_mask), -1))
        post = np.asarray(jnp.argmax(
            model._logits(edited_params, v_ids, v_mask), -1))
        m = np.asarray(tb_val.attn_mask, np.float32)
        retention = float(((orig == post) * m).sum() / max(m.sum(), 1.0))

    info = {"success": float(fit_acc) >= 1.0, "iters": int(iters),
            "acc": float(acc), "retention": retention}
    return edited_params, info


def oracle_history(model: TextModel, requests: Sequence[Dict],
                   loc_prompts: Sequence[str], loc_answers: Sequence[str],
                   hparams: OracleHyperParams, seed: int = 0):
    """The ``test_rank1`` driver loop (oracle.py:9-110): independent
    rank-1 TTT per request; → (success_rate, per-request info list)."""
    history = []
    for i, r in enumerate(requests):
        _, info = oracle_rank1_ttt(model, r, loc_prompts, loc_answers,
                                   hparams, seed=seed + i)
        history.append(info)
    rate = float(np.mean([h["success"] for h in history])) if history else 0.0
    return rate, history

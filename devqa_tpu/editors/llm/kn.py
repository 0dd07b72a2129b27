"""KN — knowledge neurons (``easyeditor/models/kn/``; vendored
knowledge-neurons package, knowledge_neurons.py:1-947).

1. **Attribution** (integrated gradients over the fc1 activations): for a
   prompt and its answer token, scores[l, j] ≈ act[l, j] · Σ_k ∂p(answer |
   α_k·act) / ∂act[l, j] / m — the Riemann IG approximation
   (knowledge_neurons.get_coarse_neurons).
2. **Refinement**: neurons above ``threshold ·max score`` per prompt,
   intersected/unioned across paraphrase prompts.
3. **Edit** (patch.py): for each selected neuron, move its fc2 value row
   toward the new target's embedding:
   ``W_fc2[l][j] += λ(E[target_new] − E[target_old])``; suppression zeroes
   the row.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import decoder as dec
from ...utils.config import BaseConfig
from ...utils.surgery import get_target, set_target
from .mlp_common import capture_down_inputs, down_target
from .session import TextModel


@dataclasses.dataclass(frozen=True)
class KNHyperParams(BaseConfig):
    layers: Tuple[int, ...] = ()   # empty = all layers
    steps: int = 20                # IG Riemann steps
    adaptive_threshold: float = 0.3
    max_neurons: int = 32
    edit_lambda: float = 1.0


def attribution_scores(model: TextModel, prompt: str, target: str,
                       hparams: KNHyperParams) -> np.ndarray:
    """→ scores [n_layers, d_ffn] for the first target token."""
    cfg = model.cfg
    layers = tuple(hparams.layers) or tuple(range(cfg.n_layers))
    tb = model.batch([prompt], [target])
    ids = jnp.asarray(tb.input_ids)
    mask = jnp.asarray(tb.attn_mask)
    sup = np.nonzero(np.asarray(tb.label_masks)[0])[0]
    pred_pos = jnp.asarray(int(sup[0]), jnp.int32)  # predicts target tok 1
    tgt_tok = jnp.asarray(np.asarray(tb.label_ids)[0, int(sup[0])])

    out = np.zeros((cfg.n_layers, cfg.d_ffn), np.float32)
    s = np.asarray(_ig_jit(cfg, model.params, ids, mask, pred_pos, tgt_tok,
                           layers, hparams))
    for i, l in enumerate(layers):
        out[l] = s[i]
    return out


@partial(jax.jit, static_argnums=(0, 6, 7))
def _ig_jit(cfg, params, ids, mask, pred_pos, tgt_tok, layers,
            hp: KNHyperParams):
    """Module-level jit (a fresh per-call closure re-traces every edit)."""
    embeds = dec.embed_tokens(params, cfg, ids)
    # baseline activations (down-projection inputs) at the prediction
    # position
    _, acts = capture_down_inputs(params, cfg, embeds, mask, layers)

    # Scaling a neuron's activation by α is realized through the
    # dummy-z output delta: down_out' = down_out + (α·acts_in −
    # acts)@W_down, so at acts_in == acts the probed layer contributes
    # α-scaled output and gradients flow through acts_in.
    def grad_wrt_acts(alpha):
        def f(acts_in):
            def delta_for(l):
                w2 = get_target(params, down_target(cfg, l))
                return alpha * (acts_in[l] @ w2) - (acts[l] @ w2)

            zd = {l: delta_for(l) for l in layers}
            logits, _ = capture_down_inputs(
                params, cfg, embeds, mask, layers, z_deltas=zd)
            return jax.nn.softmax(logits[0, pred_pos])[tgt_tok]

        return jax.grad(f)(acts)

    def body(k, acc):
        alpha = (k + 1) / hp.steps
        g = grad_wrt_acts(alpha)
        return jax.tree.map(lambda a, gg: a + gg, acc, g)

    acc0 = jax.tree.map(jnp.zeros_like, acts)
    total = jax.lax.fori_loop(0, hp.steps, body, acc0)
    return jnp.stack([
        (acts[l][0, pred_pos] * total[l][0, pred_pos]) / hp.steps
        for l in layers])


def coarse_neurons(scores: np.ndarray, hparams: KNHyperParams
                   ) -> List[Tuple[int, int]]:
    thr = hparams.adaptive_threshold * scores.max()
    ls, js = np.nonzero(scores > thr)
    order = np.argsort(-scores[ls, js])
    return [(int(ls[i]), int(js[i])) for i in order[:hparams.max_neurons]]


def refine_neurons(model: TextModel, prompts: Sequence[str], target: str,
                   hparams: KNHyperParams) -> List[Tuple[int, int]]:
    """Neurons shared across paraphrase prompts (the reference's refined
    set; falls back to the union when the intersection is empty)."""
    sets = []
    for p in prompts:
        sets.append(set(coarse_neurons(
            attribution_scores(model, p, target, hparams), hparams)))
    inter = set.intersection(*sets) if sets else set()
    return sorted(inter or set.union(*sets))


def apply_kn(model: TextModel, request, hparams: KNHyperParams):
    """→ edited params: selected neurons' fc2 value rows move toward the
    new target's embedding."""
    prompts = [request["prompt"]]
    if request.get("rephrase_prompt"):
        prompts.append(request["rephrase_prompt"])
    neurons = refine_neurons(model, prompts, request.get("ground_truth")
                             or request["target_new"], hparams)
    tok = model.tokenizer
    emb = model.params["embed_tokens"]
    # Gather the needed rows ON DEVICE: np.asarray(emb) would pull the
    # whole vocab x d_model table host-side through the tunnel per edit.
    new_ids = jnp.asarray(tok.encode(" " + request["target_new"]))
    new_vec = jnp.take(emb, new_ids, axis=0).mean(0)
    old = request.get("ground_truth")
    old_vec = (jnp.take(emb, jnp.asarray(tok.encode(" " + old)),
                        axis=0).mean(0) if old else 0.0)
    params = model.params
    for (l, j) in neurons:
        t = down_target(model.cfg, l)
        w = get_target(params, t)
        w = w.at[j].add(hparams.edit_lambda * (new_vec - old_vec))
        params = set_target(params, t, w)
    return params


def suppress_kn(model: TextModel, request, hparams: KNHyperParams):
    """Zero the selected neurons' value rows (knowledge suppression)."""
    neurons = refine_neurons(model, [request["prompt"]],
                             request.get("ground_truth")
                             or request["target_new"], hparams)
    params = model.params
    for (l, j) in neurons:
        t = down_target(model.cfg, l)
        w = get_target(params, t)
        params = set_target(params, t, w.at[j].set(0.0))
    return params

"""KN — knowledge neurons (``easyeditor/models/kn/``; vendored
knowledge-neurons package, knowledge_neurons/knowledge_neurons.py).

Faithful semantics (oracle-pinned, tests/test_reference_oracle.py):

1. **Attribution** (integrated gradients, get_scores_for_layer): the
   patched "activation" is the FIRST ff projection's raw output at the
   LAST prompt token only — llama's pre-silu ``gate_proj`` output /
   OPT-geometry's pre-activation fc1 (``input_ff_attr``,
   knowledge_neurons.py:54-62; Patch.forward replaces
   ``x[:, mask_idx, :]``, patch.py:125-131). One layer is patched per
   score pass, α runs over ``linspace(0, 1, steps)`` (scaled_input,
   :198-215), the objective is the softmax PROBABILITY of the target
   token at the last position, and the score is
   ``baseline · Σ_k grad_k / steps``. For multi-token targets the loop
   re-runs per target token, extending the prompt with the model's
   ARGMAX continuation (not the target; :502-640), and averages.
2. **Coarse selection** (get_coarse_neurons :303-361): every neuron with
   score > adaptive_threshold · max — unsorted, uncapped (``max_neurons``
   here is an optional extension, default off).
3. **Refinement** (get_refined_neurons :363-464): count each coarse
   neuron across prompts; with ``refine`` keep count > p·n_prompts,
   otherwise keep ALL distinct coarse neurons (first-seen order).
4. **Edit** (modify_weights :769-913): each selected value row gets
   ``+Σ_t E[target_t] − Σ_t E[argmax_t]`` (the greedy completion's
   embeddings, not ground_truth's). For SINGLE-token targets only the
   ARGMAX side is scaled ×2 — the reference indexes the argmax with a
   scalar (1-D embedding → its ``* 2`` branch) but the target with a
   list (2-D → the un-scaled sum branch); erase zeroes the row. Neuron
   refinement runs on ``[request['prompt']]`` alone — kn_main.py:34-41
   never passes the rephrase.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import decoder as dec
from ...core.decoder import ACTIVATIONS
from ...utils.config import BaseConfig
from ...utils.pytree import tree_slice
from ...utils.surgery import get_target, set_target
from .mlp_common import down_target
from .session import TextModel


@dataclasses.dataclass(frozen=True)
class KNHyperParams(BaseConfig):
    layers: Tuple[int, ...] = ()   # empty = all layers
    steps: int = 20                # IG grid size (linspace 0..1)
    adaptive_threshold: float = 0.3
    p: float = 0.5                 # refine sharing threshold
    refine: bool = False
    max_neurons: Optional[int] = None  # extension: cap (reference: none)
    edit_lambda: float = 1.0           # extension: scale (reference: 1)


@partial(jax.jit, static_argnums=(0,))
def _baseline_logits_jit(cfg, params, ids, mask):
    embeds = dec.embed_tokens(params, cfg, ids)
    return dec.decoder_apply(params, cfg, embeds, mask)


@partial(jax.jit, static_argnums=(0, 6, 7))
def _layer_ig_jit(cfg, params, ids, mask, pred_pos, tgt_tok, layer: int,
                  steps: int):
    """IG score [d_ffn] for ONE layer at the last prompt token — the
    reference patches exactly one layer per pass (module-level jit: a
    fresh per-call closure would re-trace on every edit)."""
    embeds = dec.embed_tokens(params, cfg, ids)
    L = ids.shape[1]
    act = ACTIVATIONS[cfg.activation]
    p_l = tree_slice(params["layers"], layer)

    # baseline first-projection output at the prediction position
    h = dec.decoder_forward(params, cfg, embeds, mask, lo=0, hi=layer)
    x = dec.mlp_input_at_layer(p_l, cfg, h, mask)[0, pred_pos]  # [d_model]
    if cfg.arch == "llama":
        g = x @ p_l["gate"]["w"]                                # pre-silu
        u = x @ p_l["up"]["w"]
        w2 = p_l["down"]["w"]

        def mlp_delta(ghat):
            return ((act(ghat) - act(g)) * u) @ w2
    else:  # OPT geometry: fc1 pre-activation
        g = x @ p_l["fc1"]["w"] + p_l["fc1"]["b"]
        w2 = p_l["fc2"]["w"]

        def mlp_delta(ghat):
            return (act(ghat) - act(g)) @ w2

    onehot = jax.nn.one_hot(jnp.asarray([pred_pos]), L)[..., None]

    def f(ghat):
        d = mlp_delta(ghat)
        logits = dec.decoder_apply(
            params, cfg, embeds, mask,
            mlp_residual=(layer, lambda _x: onehot * d))
        return jax.nn.softmax(logits[0, pred_pos])[tgt_tok]

    def body(k, acc):
        alpha = k / (steps - 1)          # torch.linspace(0, 1, steps)
        return acc + jax.grad(f)(alpha * g)

    total = jax.lax.fori_loop(0, steps, body, jnp.zeros_like(g))
    return g * total / steps


def attribution_scores(model: TextModel, prompt: str, target: str,
                       hparams: KNHyperParams) -> np.ndarray:
    """→ scores [n_layers, d_ffn]: per-target-token IG at the last prompt
    position, the prompt extended by the greedy continuation between
    tokens, averaged over tokens (get_scores_for_layer :466-628)."""
    cfg = model.cfg
    layers = tuple(hparams.layers) or tuple(range(cfg.n_layers))
    tgt_ids = list(model.tokenizer.encode(target))
    out = np.zeros((cfg.n_layers, cfg.d_ffn), np.float32)

    cur_prompt = prompt
    for i, t in enumerate(tgt_ids):
        tb = model.batch([cur_prompt], [""])
        ids = jnp.asarray(tb.input_ids)
        mask = jnp.asarray(tb.attn_mask)
        pred_pos = jnp.asarray(int(np.asarray(tb.attn_mask)[0].sum()) - 1,
                               jnp.int32)
        for l in layers:
            out[l] += np.asarray(_layer_ig_jit(
                cfg, model.params, ids, mask, pred_pos, jnp.asarray(t), l,
                hparams.steps))
        if i < len(tgt_ids) - 1:   # no wasted forward after the last token
            nxt = int(np.asarray(
                _baseline_logits_jit(cfg, model.params, ids, mask)
            )[0, int(pred_pos)].argmax())
            cur_prompt += model.tokenizer.decode([nxt])
    return out / len(tgt_ids)


def greedy_tokens(model: TextModel, prompt: str, n: int) -> List[int]:
    """The model's n-step greedy continuation (_generate :132-186) —
    the embeddings subtracted by the edit come from THESE tokens."""
    cfg = model.cfg
    toks, cur = [], prompt
    for _ in range(n):
        tb = model.batch([cur], [""])
        ids = jnp.asarray(tb.input_ids)
        mask = jnp.asarray(tb.attn_mask)
        pos = int(np.asarray(tb.attn_mask)[0].sum()) - 1
        nxt = int(np.asarray(_baseline_logits_jit(
            cfg, model.params, ids, mask))[0, pos].argmax())
        toks.append(nxt)
        cur += model.tokenizer.decode([nxt])
    return toks


def coarse_neurons(scores: np.ndarray, hparams: KNHyperParams
                   ) -> List[Tuple[int, int]]:
    """All neurons above adaptive_threshold · max, in torch.nonzero's
    row-major order (get_coarse_neurons :349-356); ``max_neurons`` is an
    optional top-score cap on top (off by default)."""
    thr = hparams.adaptive_threshold * scores.max()
    ls, js = np.nonzero(scores > thr)
    pairs = [(int(l), int(j)) for l, j in zip(ls, js)]
    if hparams.layers:
        # layer-restricted attribution leaves structural zeros in the
        # unprobed rows; a NEGATIVE threshold (all-negative IG scores)
        # would admit every one of them — the reference has no layer
        # restriction, so zeros never exist on its side
        probed = set(hparams.layers)
        pairs = [(l, j) for (l, j) in pairs if l in probed]
    if hparams.max_neurons is not None and len(pairs) > hparams.max_neurons:
        pairs.sort(key=lambda lj: -scores[lj])
        pairs = sorted(pairs[:hparams.max_neurons])
    return pairs


def refine_neurons(model: TextModel, prompts: Sequence[str], target: str,
                   hparams: KNHyperParams) -> List[Tuple[int, int]]:
    """Counter over per-prompt coarse sets: with ``refine`` keep neurons
    shared by > p·n_prompts prompts, else every distinct coarse neuron in
    first-seen order (get_refined_neurons :446-455)."""
    counts: dict = {}
    for p in prompts:
        for n in coarse_neurons(
                attribution_scores(model, p, target, hparams), hparams):
            counts[n] = counts.get(n, 0) + 1
    if hparams.refine:
        t = len(prompts) * hparams.p
        return [n for n, c in counts.items() if c > t]
    return list(counts)


def apply_kn(model: TextModel, request, hparams: KNHyperParams):
    """→ edited params (kn_main.py:12-57 + modify_weights): neurons
    refined on ``ground_truth`` attributions; each value row moves by the
    target-token embeddings minus the greedy completion's embeddings
    (×2 when the target is a single token — the reference's literal
    factor, modify_weights :852-874)."""
    neurons = refine_neurons(model, [request["prompt"]],
                             request.get("ground_truth")
                             or request["target_new"], hparams)
    tok = model.tokenizer
    emb = model.params["embed_tokens"]
    tgt_ids = list(tok.encode(request["target_new"]))
    arg_ids = greedy_tokens(model, request["prompt"], len(tgt_ids))
    # Gather the needed rows ON DEVICE: np.asarray(emb) would pull the
    # whole vocab x d_model table host-side through the tunnel per edit.
    # The x2 applies ONLY to the argmax side of a single-token edit:
    # the reference indexes argmax with a scalar (1-D embedding -> the
    # "* 2" branch) but the target with a LIST (2-D -> the sum branch),
    # modify_weights :852-874 — an asymmetric quirk, oracle-pinned.
    arg_scale = 2.0 if len(arg_ids) == 1 else 1.0
    upd = (jnp.take(emb, jnp.asarray(tgt_ids), axis=0).sum(0)
           - arg_scale * jnp.take(emb, jnp.asarray(arg_ids), axis=0).sum(0))
    params = model.params
    for (l, j) in neurons:
        t = down_target(model.cfg, l)
        w = get_target(params, t)
        w = w.at[j].add(hparams.edit_lambda * upd)
        params = set_target(params, t, w)
    return params


def suppress_kn(model: TextModel, request, hparams: KNHyperParams):
    """Zero the selected neurons' value rows (erase_knowledge,
    erase_value="zero")."""
    neurons = refine_neurons(model, [request["prompt"]],
                             request.get("ground_truth")
                             or request["target_new"], hparams)
    params = model.params
    for (l, j) in neurons:
        t = down_target(model.cfg, l)
        w = get_target(params, t)
        params = set_target(params, t, w.at[j].set(0.0))
    return params

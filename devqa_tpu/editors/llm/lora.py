"""LoRA editing (``easyeditor/models/lora/lora_main.py``) — which is
actually **AdaLoRA**: the reference builds a peft ``AdaLoraConfig`` and
trains SVD-parametrized adapters (execute_lora :67-76).

Faithful semantics (oracle-pinned, tests/test_reference_oracle.py):

- adapter: ``ΔW = B @ (A ⊙ E) · lora_alpha / (r + 1e-5)`` with
  ``A [r, in] ~ N(0, 0.02)``, ``B [out, r] ~ N(0, 0.02)``, ``E [r, 1]``
  zeros (peft adalora/layer.py:68-88,157-187) — the initial delta is 0
  through E, not through B;
- loss: HF causal-LM CE over ``"{prompt} {target} {eos}"`` with the
  prompt window masked by the reference's pad-count arithmetic
  (lora_main.py:141-155 — written for LEFT padding; with right padding
  the masked window shifts, reproduced literally), PLUS peft's
  orthogonal regularization ``0.5 · mean(‖AAᵀ−I‖_F, ‖BᵀB−I‖_F)``
  (adalora/model.py:217-244, AdaLoraModel.forward adds it to .loss);
- optimizer: coupled-decay Adam over the adapters, stepping every batch
  (the loss-floor break is commented out in the reference);
- the rank allocator never runs (execute_lora never calls
  update_and_allocate), so every adapter keeps AdaLoraConfig's INITIAL
  rank ``init_r`` (peft default 12) — the reference's ``rank`` hparam
  (the target rank) never takes effect and is kept here only for
  config-file compatibility.

Functional: ``apply_lora`` returns edited params (deltas merged);
un-editing = dropping the returned tree.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...core import decoder as dec
from ...utils.config import BaseConfig
from ...utils.surgery import ParamTarget, add_to_target
from .session import TextModel


@dataclasses.dataclass(frozen=True)
class LoRAHyperParams(BaseConfig):
    rank: int = 8            # inert (the reference's unreached target_r)
    init_r: int = 12          # the EFFECTIVE adapter rank (peft init_r)
    lora_alpha: float = 32.0
    target_modules: Tuple[str, ...] = ("q", "v")
    layers: Tuple[int, ...] = ()  # empty = all layers
    num_steps: int = 30
    lr: float = 5e-3
    weight_decay: float = 0.0
    orth_reg_weight: float = 0.5
    batch_size: int = 128
    dropout: float = 0.0  # inert at edit time (eval-mode parity)


def _norm_module(m: str) -> str:
    """Accept the reference's HF names ("q_proj") for our keys ("q")."""
    return m[:-5] if m.endswith("_proj") else m


def _fro(m):
    """Frobenius norm with a safe sqrt subgradient at 0."""
    sq = jnp.sum(m * m)
    return jnp.where(sq == 0.0, 0.0, jnp.sqrt(jnp.where(sq == 0.0, 1.0, sq)))


def _prep_chunk(model: TextModel, requests):
    """The reference's label construction (lora_main.py:141-155): CE over
    ``"{p} {t} {eos}"`` with positions ``[n_pad : n_pad+n_prompt]`` and
    all pads masked — the window arithmetic assumes left padding and is
    reproduced literally."""
    tok = model.tokenizer
    eos_id = getattr(tok, "eos_token_id", None)
    eos_str = tok.decode([eos_id]) if eos_id is not None else ""
    fulls = ["%s %s %s" % (r["prompt"], r["target_new"], eos_str)
             for r in requests]
    # direct tokenization (model.batch's prompt/target splitter is for
    # supervised pairs and drops a trailing token on empty targets)
    enc = [list(tok.encode(f)) for f in fulls]
    pad = int(getattr(tok, "pad_token_id", 0) or 0)
    bm = getattr(model, "bucket_multiple", 1)
    L = -(-max(len(e) for e in enc) // bm) * bm
    ids = np.full((len(enc), L), pad, np.int32)
    mask = np.zeros((len(enc), L), np.int32)
    for i, e in enumerate(enc):
        ids[i, :len(e)] = e
        mask[i, :len(e)] = 1
    labels = ids.copy()
    # the reference's num_pad_toks is the count of pad-id tokens over its
    # OWN padded row: ragged structural pads PLUS any content token equal
    # to the pad id — with the standard llama/GPT-2 pad=eos fallback the
    # appended " {eos}" counts too, shifting the masked window by one.
    # Our bucket padding beyond the reference's width must NOT count.
    for i, r in enumerate(requests):
        n_prompt = len(tok.encode(r["prompt"]))
        n_pad = (max(len(e) for e in enc) - len(enc[i])
                 + sum(1 for t in enc[i] if t == pad))
        labels[i, n_pad:n_pad + n_prompt] = -100
    labels[mask == 0] = -100
    labels[ids == pad] = -100
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels)


def init_adapters(model: TextModel, hparams: LoRAHyperParams, seed=0
                  ) -> Dict[str, Dict[str, jnp.ndarray]]:
    """peft's AdaLora init: A,B ~ N(0, 0.02), E = 0."""
    cfg = model.cfg
    layers = tuple(hparams.layers) or tuple(range(cfg.n_layers))
    mods = tuple(_norm_module(m) for m in hparams.target_modules)
    r = hparams.init_r
    key = jax.random.PRNGKey(seed)
    ab = {}
    for i, (l, m) in enumerate((l, m) for l in layers for m in mods):
        w = model.params["layers"][m]["w"]
        d_in, d_out = w.shape[-2], w.shape[-1]
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        ab["%d.%s" % (l, m)] = {
            "a": 0.02 * jax.random.normal(k1, (r, d_in)),
            "b": 0.02 * jax.random.normal(k2, (d_out, r)),
            "e": jnp.zeros((r, 1)),
        }
    return ab


def _targets_for(cfg, hparams: LoRAHyperParams):
    layers = tuple(hparams.layers) or tuple(range(cfg.n_layers))
    mods = tuple(_norm_module(m) for m in hparams.target_modules)
    return tuple((l, m) for l in layers for m in mods)


def _with_lora(cfg, hparams, params, ab):
    scale = hparams.lora_alpha if hparams.lora_alpha > 0 else float(
        hparams.init_r)
    denom = hparams.init_r + 1e-5
    for (l, m) in _targets_for(cfg, hparams):
        lo = ab["%d.%s" % (l, m)]
        delta = ((lo["a"] * lo["e"]).T @ lo["b"].T) * scale / denom
        params = add_to_target(params,
                               ParamTarget(("layers", m, "w"), l), delta)
    return params


def _opt(hparams: LoRAHyperParams):
    return optax.chain(optax.add_decayed_weights(hparams.weight_decay),
                       optax.adam(hparams.lr))


def _step(cfg, hparams, params, ab, st, ids, mask, labels):
    targets = _targets_for(cfg, hparams)

    def loss_fn(ab):
        p = _with_lora(cfg, hparams, params, ab)
        logits = dec.decoder_apply(p, cfg,
                                   dec.embed_tokens(p, cfg, ids), mask)
        lp = jax.nn.log_softmax(logits[:, :-1], -1)
        lab = labels[:, 1:]
        m = (lab != -100).astype(jnp.float32)
        picked = jnp.take_along_axis(
            lp, jnp.where(lab == -100, 0, lab)[..., None], -1)[..., 0]
        ce = -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)
        regu, n = 0.0, 0
        for (l, mo) in targets:
            lo = ab["%d.%s" % (l, mo)]
            eye = jnp.eye(lo["a"].shape[0])
            regu = regu + _fro(lo["a"] @ lo["a"].T - eye) \
                + _fro(lo["b"].T @ lo["b"] - eye)
            n += 2
        return ce + hparams.orth_reg_weight * regu / n

    g = jax.grad(loss_fn)(ab)
    up, st = _opt(hparams).update(g, st, ab)
    return optax.apply_updates(ab, up), st


# Module-level jits keyed on (cfg, hparams) statics: fresh per-call
# @jax.jit closures would re-trace on every sequential edit.
_step_jit = partial(jax.jit, static_argnums=(0, 1))(_step)


@partial(jax.jit, static_argnums=(0, 1))
def _run_single_chunk_jit(cfg, hparams, params, ab, st, ids, mask, labels):
    def body(_, c):
        ab, st = c
        return _step(cfg, hparams, params, ab, st, ids, mask, labels)

    ab, _ = jax.lax.fori_loop(0, hparams.num_steps, body, (ab, st))
    return _with_lora(cfg, hparams, params, ab)


def apply_lora(model: TextModel, requests, hparams: LoRAHyperParams,
               seed=0, adapters: Optional[Dict] = None):
    """→ edited decoder params. Accepts one request or a list;
    ``adapters`` overrides the random init (checkpoint interop / the
    cross-framework oracle)."""
    if isinstance(requests, dict):
        requests = [requests]
    cfg = model.cfg
    ab = adapters if adapters is not None else init_adapters(
        model, hparams, seed)

    chunks = [requests[i:i + hparams.batch_size]
              for i in range(0, len(requests), hparams.batch_size)]
    batches = [_prep_chunk(model, c) for c in chunks]
    st = _opt(hparams).init(ab)

    if len(batches) == 1:
        return _run_single_chunk_jit(cfg, hparams, model.params, ab, st,
                                     *batches[0])

    for _ in range(hparams.num_steps):
        for b in batches:
            ab, st = _step_jit(cfg, hparams, model.params, ab, st, *b)
    return _with_lora(cfg, hparams, model.params, ab)

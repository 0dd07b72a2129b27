"""Arch-generic access to the decoder MLP's down-projection.

The parameter-space editors (ROME/MEMIT/KN/GRACE) all operate on "the
MLP's second linear": OPT's ``fc2``, llama's ``down_proj`` (the
reference resolves these per model via module-path templates, e.g.
``easyeditor/models/rome/compute_u.py`` + per-model hparams
``rewrite_module_tmp: model.layers.{}.mlp.down_proj``). This module
centralizes the mapping so each editor stays arch-agnostic.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...core import decoder as dec
from ...utils.surgery import ParamTarget, get_target

#: The MLP output projection per decoder arch.
DOWN_MODULE = {"opt": "fc2", "llama": "down"}


def down_module(cfg: dec.DecoderConfig) -> str:
    m = DOWN_MODULE.get(cfg.arch)
    if m is None:
        raise NotImplementedError("down projection: arch %r" % cfg.arch)
    return m


def down_target(cfg: dec.DecoderConfig, layer: int) -> ParamTarget:
    return ParamTarget(("layers", down_module(cfg), "w"), layer)


def down_weight_bias(params, cfg: dec.DecoderConfig, layer: int
                     ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(W [d_ffn, d_model], b or None — llama's down_proj has no bias)."""
    m = down_module(cfg)
    w = get_target(params, ParamTarget(("layers", m, "w"), layer))
    layers = params["layers"]
    b = None
    if "b" in layers[m]:
        b = get_target(params, ParamTarget(("layers", m, "b"), layer))
    return w, b


def down_out(k: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray]
             ) -> jnp.ndarray:
    o = k @ w
    return o if b is None else o + b


def down_input_from_mlp_input(params, cfg: dec.DecoderConfig, layer: int,
                              x: jnp.ndarray) -> jnp.ndarray:
    """Recompute the down-projection's input from the (post-norm) MLP
    input ``x``: OPT act(fc1(x)); llama act(gate(x)) * up(x)."""
    act = dec.ACTIVATIONS[cfg.activation]
    if cfg.arch == "opt":
        w1 = get_target(params, ParamTarget(("layers", "fc1", "w"), layer))
        b1 = get_target(params, ParamTarget(("layers", "fc1", "b"), layer))
        return act(x @ w1 + b1)
    g = get_target(params, ParamTarget(("layers", "gate", "w"), layer))
    u = get_target(params, ParamTarget(("layers", "up", "w"), layer))
    return act(x @ g) * (x @ u)


def capture_down_inputs(
    params,
    cfg: dec.DecoderConfig,
    inputs_embeds: jnp.ndarray,
    kv_valid: jnp.ndarray,
    layers: Sequence[int],
    z_deltas: Optional[Dict[int, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, Dict[int, jnp.ndarray]]:
    """Forward with down-projection probes on ``layers``.

    Returns (logits, {layer: down input [B, L, d_ffn]}). ``z_deltas``
    optionally adds a delta to each probed layer's down OUTPUT (the
    dummy-z channel — used by KN's α-scaling trick and by callers that
    need output-gradient capture via jax.grad on the deltas).
    """
    m = down_module(cfg)
    targets = tuple((l, m) for l in layers)
    B, L, _ = inputs_embeds.shape
    zero = jnp.zeros((B, L, cfg.d_model))
    zs = tuple(z_deltas.get(l, zero) if z_deltas else zero for l in layers)
    logits, xs = dec.decoder_forward_with_linear_probes(
        params, cfg, inputs_embeds, kv_valid, targets, zs)
    return logits, {l: xs[(l, m)] for l in layers}

"""LiveEdit auxiliary networks.

JAX rebuild of ``editor/vllm_editors/liveedit/modules.py``:
- :func:`attention_apply` — the cross-attention block (``Attention``,
  modules.py:7-39): separate q/k/v projections, per-head softmax over
  keys, optional variance-rescaling path.
- QVExtractor (modules.py:41-88): learned ``eqe`` query slots extracting
  (a) an edit-query representation from the prompt span and (b) an
  edit-relevant vision representation from the vision span; optional
  learned prototype vision tokens for hard-routing comparison.
- LowRankGenerator (modules.py:90-110): learned ``phi`` slots
  cross-attending to the full edit representation to emit one LoRA factor.

Where the reference slices variable-length spans out of the hidden states
(batch=1 only — modules.py:60,68,101 assert), we keep fixed-shape inputs
and pass **span masks**: masked attention over the full sequence is
mathematically identical to attention over the sliced span, and it
vectorizes over probe batches.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.layers import layer_norm

NEG_INF = -1e30


def _init_linear(key, d_in, d_out, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / (d_in ** 0.5)
    return {
        "w": jax.random.uniform(k1, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (d_out,), dtype, -bound, bound),
    }


def init_attention(key, inp1_dim, inp2_dim, qk_dim, v_dim, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return {
        "q": _init_linear(kq, inp1_dim, qk_dim, dtype),
        "k": _init_linear(kk, inp2_dim, qk_dim, dtype),
        "v": _init_linear(kv, inp2_dim, v_dim, dtype),
    }


def attention_apply(p, inp1, inp2, head_n: int,
                    kv_mask: Optional[jnp.ndarray] = None,
                    rescale_with_score: bool = False):
    """inp1 [b, l1, d1] queries; inp2 [b, l2, d2] keys/values;
    kv_mask [b, l2] (1 = attendable). Returns [b, l1, v_dim]."""
    b, l1, _ = inp1.shape
    l2 = inp2.shape[1]
    q = (inp1 @ p["q"]["w"] + p["q"]["b"]).reshape(b, l1, head_n, -1)
    k = (inp2 @ p["k"]["w"] + p["k"]["b"]).reshape(b, l2, head_n, -1)
    v = (inp2 @ p["v"]["w"] + p["v"]["b"]).reshape(b, l2, head_n, -1)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("blhd,bmhd->blmh", q, k) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, :, None] > 0, s, NEG_INF)
    s = jax.nn.softmax(s, axis=2)
    res = jnp.einsum("blmh,bmhd->blhd", s, v)
    if rescale_with_score:
        res = res / jnp.sqrt(jnp.sum(s ** 2, axis=2))[..., None]
    return res.reshape(b, l1, -1)


def init_qv_extractor(key, eqe_n, inpt_reps_dim, module_dim, vision_tok_n,
                      vis_prot: bool, dtype=jnp.float32):
    ks = jax.random.split(key, 6)

    def kaiming(k, shape):
        fan_in = shape[-1]
        return jax.random.normal(k, shape, dtype) * (2.0 / fan_in) ** 0.5

    p = {
        "ln1": {"scale": jnp.ones((inpt_reps_dim,), dtype),
                "bias": jnp.zeros((inpt_reps_dim,), dtype)},
        "eqe1": kaiming(ks[0], (1, eqe_n, module_dim)),
        "ca_query1": init_attention(ks[1], module_dim, inpt_reps_dim,
                                    module_dim, module_dim, dtype),
        "ca_vision": init_attention(ks[2], module_dim, inpt_reps_dim,
                                    module_dim, module_dim, dtype),
        "ln2": {"scale": jnp.ones((inpt_reps_dim,), dtype),
                "bias": jnp.zeros((inpt_reps_dim,), dtype)},
        "eqe2": kaiming(ks[3], (1, eqe_n, module_dim)),
        "ca_query2": init_attention(ks[4], module_dim, inpt_reps_dim,
                                    module_dim, module_dim, dtype),
    }
    if vis_prot:
        p["vis_rep_prot"] = kaiming(ks[5], (1, vision_tok_n, inpt_reps_dim))
    return p


def qv_extract_vision(p, head_n, query_reps, vision_reps,
                      query_mask=None, vision_mask=None):
    """modules.py:58-64: eqr = att(eqe1, query); evr = att(eqr, vision)."""
    b = query_reps.shape[0]
    qr = layer_norm(query_reps, p["ln1"]["scale"], p["ln1"]["bias"])
    vr = layer_norm(vision_reps, p["ln1"]["scale"], p["ln1"]["bias"])
    eqe1 = jnp.broadcast_to(p["eqe1"], (b,) + p["eqe1"].shape[1:])
    eqr = attention_apply(p["ca_query1"], eqe1, qr, head_n, query_mask)
    evr = attention_apply(p["ca_vision"], eqr, vr, head_n, vision_mask)
    return evr


def qv_extract_query(p, head_n, query_reps, query_mask=None):
    """modules.py:66-71."""
    b = query_reps.shape[0]
    qr = layer_norm(query_reps, p["ln2"]["scale"], p["ln2"]["bias"])
    eqe2 = jnp.broadcast_to(p["eqe2"], (b,) + p["eqe2"].shape[1:])
    return attention_apply(p["ca_query2"], eqe2, qr, head_n, query_mask)


def qv_extract_from_visprot(p, head_n, query_reps, query_mask=None):
    """modules.py:73-74: extract_vision against the learned prototype."""
    b = query_reps.shape[0]
    prot = jnp.broadcast_to(p["vis_rep_prot"], (b,) + p["vis_rep_prot"].shape[1:])
    return qv_extract_vision(p, head_n, query_reps, prot, query_mask, None)


def init_lowrank_generator(key, lora_dim, lora_rank, lora_scale,
                           inpt_reps_dim, module_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    fan_in = module_dim
    return {
        "phi": jax.random.normal(k1, (1, lora_rank, module_dim), dtype)
        * (2.0 / fan_in) ** 0.5,
        "ca": init_attention(k2, module_dim, inpt_reps_dim, module_dim,
                             lora_dim, dtype),
        "ln": {"scale": jnp.ones((inpt_reps_dim,), dtype),
               "bias": jnp.zeros((inpt_reps_dim,), dtype)},
    }


def lowrank_generate(p, head_n, scale, inpt_reps, mask=None):
    """modules.py:99-104 → [b, lora_rank, lora_dim]. ``scale`` =
    1/(lora_scale·√rank) — kept out of the param pytree (not trainable)."""
    b = inpt_reps.shape[0]
    x = layer_norm(inpt_reps, p["ln"]["scale"], p["ln"]["bias"])
    phi = jnp.broadcast_to(p["phi"], (b,) + p["phi"].shape[1:])
    return attention_apply(p["ca"], phi, x, head_n, mask) * scale

"""Q-Former: BERT-style query transformer with periodic cross-attention.

Matches HF ``Blip2QFormerModel`` as used by the reference's BLIP-2 wrapper
(``editor/vllms_for_edit/blip2/blip2.py:34-43``: 32 learned query tokens
cross-attending to frozen ViT features) and the LAVIS Q-Former in
MiniGPT-4 (``editor/vllms_for_edit/minigpt4/modules/Qformer.py``):

- post-LN (BERT) residual blocks,
- cross-attention inserted every ``cross_attention_frequency`` layers
  (HF Blip2: every 2nd layer, i % freq == 0),
- query-only path (no text input): ``intermediate_query``/``output_query``
  MLP branch.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.attention import multihead_attention
from ..ops.layers import gelu_exact, layer_norm, linear
from ..utils.config import BaseConfig


@dataclasses.dataclass(frozen=True)
class QFormerConfig(BaseConfig):
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ffn: int = 3072
    n_query_tokens: int = 32
    encoder_width: int = 1408  # ViT feature dim for cross-attention
    cross_attention_frequency: int = 2
    norm_eps: float = 1e-12


def blip2_qformer_config() -> QFormerConfig:
    return QFormerConfig()


def _mha_params(key, d_q, d_kv, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": {"w": jax.random.normal(ks[0], (d_q, d), dtype) * 0.02, "b": jnp.zeros((d,), dtype)},
        "k": {"w": jax.random.normal(ks[1], (d_kv, d), dtype) * 0.02, "b": jnp.zeros((d,), dtype)},
        "v": {"w": jax.random.normal(ks[2], (d_kv, d), dtype) * 0.02, "b": jnp.zeros((d,), dtype)},
        "o": {"w": jax.random.normal(ks[3], (d, d), dtype) * 0.02, "b": jnp.zeros((d,), dtype)},
        "ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def init_qformer_params(cfg: QFormerConfig, key, dtype=jnp.float32):
    d, f = cfg.d_model, cfg.d_ffn
    keys = jax.random.split(key, 4)

    def layer(k, has_cross):
        ks = jax.random.split(k, 4)
        p = {
            "self_attn": _mha_params(ks[0], d, d, d, dtype),
            "fc1": {"w": jax.random.normal(ks[2], (d, f), dtype) * 0.02,
                    "b": jnp.zeros((f,), dtype)},
            "fc2": {"w": jax.random.normal(ks[3], (f, d), dtype) * 0.02,
                    "b": jnp.zeros((d,), dtype)},
            "mlp_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        }
        if has_cross:
            p["cross_attn"] = _mha_params(ks[1], d, cfg.encoder_width, d, dtype)
        return p

    # Cross-attn layers have extra params → can't be stacked uniformly with
    # non-cross layers; keep two stacked groups interleaved by a static
    # schedule (layer lists are short — 12 — so a python loop over two
    # alternating scans is unnecessary; unroll instead, compile cost is
    # negligible next to the decoder).
    layer_keys = jax.random.split(keys[0], cfg.n_layers)
    layers = [
        layer(layer_keys[i], i % cfg.cross_attention_frequency == 0)
        for i in range(cfg.n_layers)
    ]
    return {
        "query_tokens": jax.random.normal(keys[1], (cfg.n_query_tokens, d), dtype) * 0.02,
        "embed_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "layers": layers,
    }


def _post_ln_attn(p, cfg, x_q, x_kv):
    d = cfg.d_model

    def heads(t):
        b, l, _ = t.shape
        return t.reshape(b, l, cfg.n_heads, d // cfg.n_heads).transpose(0, 2, 1, 3)

    q = heads(linear(x_q, p["q"]["w"], p["q"]["b"]))
    k = heads(linear(x_kv, p["k"]["w"], p["k"]["b"]))
    v = heads(linear(x_kv, p["v"]["w"], p["v"]["b"]))
    o = multihead_attention(q, k, v)
    b, nh, l, dh = o.shape
    o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
    o = linear(o, p["o"]["w"], p["o"]["b"])
    return layer_norm(o + x_q, p["ln"]["scale"], p["ln"]["bias"], cfg.norm_eps)


def qformer_forward(params, cfg: QFormerConfig, image_embeds: jnp.ndarray) -> jnp.ndarray:
    """Query tokens cross-attend to image features.

    image_embeds: [B, n_img_tokens, encoder_width] → [B, n_query, d].
    """
    b = image_embeds.shape[0]
    h = jnp.broadcast_to(
        params["query_tokens"], (b,) + params["query_tokens"].shape
    ).astype(image_embeds.dtype)
    h = layer_norm(h, params["embed_ln"]["scale"], params["embed_ln"]["bias"],
                   cfg.norm_eps)
    for p in params["layers"]:
        h = _post_ln_attn(p["self_attn"], cfg, h, h)
        if "cross_attn" in p:
            h = _post_ln_attn(p["cross_attn"], cfg, h, image_embeds)
        x = gelu_exact(linear(h, p["fc1"]["w"], p["fc1"]["b"]))
        x = linear(x, p["fc2"]["w"], p["fc2"]["b"])
        h = layer_norm(x + h, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"], cfg.norm_eps)
    return h

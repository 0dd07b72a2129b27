"""mPLUG-Owl2 visual abstractor — learnable queries cross-attending to
ViT features.

Rebuild of ``MplugOwlVisualAbstractorModel``
(``easyeditor/trainer/mPLUG_Owl2/mplug_owl2/model/visual_encoder.py:448-920``):

- 64 learnable queries, 6 cross-attention layers;
- per layer (visual_encoder.py:599-650): q' = norm1(q), f' = normk(feats);
  keys/values attend over ``concat([q', f'])``; fixed sincos position
  embeddings are ADDED TO THE INPUTS of the q/k projections only
  (1d-sincos over queries, 2d-sincos over the cls+grid features —
  visual_encoder.py:536-543); residual base is the NORMED query
  (CrossOutput, :585-596) followed by a SwiGLU-with-inner-LN MLP
  (AbstractorMLP, :448-465);
- output: ``visual_fc`` to the language width + a learned ``vit_eos``
  token appended (:911-912) → 64 + 1 = 65 vision tokens.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multihead_attention
from ..ops.layers import layer_norm, linear
from ..utils.config import BaseConfig


@dataclasses.dataclass(frozen=True)
class AbstractorConfig(BaseConfig):
    n_queries: int = 64
    d_model: int = 1024
    n_layers: int = 6
    n_heads: int = 16
    d_ffn: int = 2816
    encoder_width: int = 1024
    grid_size: int = 32      # ViT patch grid (448 / 14)
    out_dim: int = 4096      # language hidden size
    norm_eps: float = 1e-6

    def __post_init__(self):
        # _abstractor_layer concatenates normed queries (d_model) with
        # normed ViT feats (encoder_width) on the sequence axis before
        # the shared k/v projections — the widths must agree (they do in
        # mPLUG-Owl2: sam-1024 tower, 1024-wide abstractor). A mismatch
        # would otherwise fail at trace time, far from the config.
        if self.encoder_width != self.d_model:
            raise ValueError(
                "AbstractorConfig requires encoder_width == d_model "
                "(got %d vs %d)" % (self.encoder_width, self.d_model))


def _sincos_1d(d: int, pos: np.ndarray) -> np.ndarray:
    """MAE-style 1d sincos embedding: [len(pos), d]."""
    omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def _sincos_2d_with_cls(d: int, grid: int) -> np.ndarray:
    """MAE-style 2d sincos grid embedding + zero cls row: [1+grid², d]."""
    gh = np.arange(grid, dtype=np.float64)
    gw = np.arange(grid, dtype=np.float64)
    mesh = np.meshgrid(gw, gh)  # (w, h) order per MAE's get_2d_sincos
    emb_h = _sincos_1d(d // 2, mesh[0].reshape(-1))
    emb_w = _sincos_1d(d // 2, mesh[1].reshape(-1))
    grid_emb = np.concatenate([emb_h, emb_w], axis=1)
    return np.concatenate([np.zeros((1, d), np.float32), grid_emb], axis=0)


def abstractor_pos_embeds(cfg: AbstractorConfig):
    """(q_pos [n_queries, d], k_pos [1+grid², d]) — deterministic buffers
    (the reference registers them as non-trainable buffers)."""
    q_pos = _sincos_1d(cfg.d_model, np.arange(cfg.n_queries, dtype=np.float32))
    k_pos = _sincos_2d_with_cls(cfg.d_model, cfg.grid_size)
    return jnp.asarray(q_pos), jnp.asarray(k_pos)


def _dense(key, d_in, d_out, dtype):
    return {"w": jax.random.normal(key, (d_in, d_out), dtype) * 0.02,
            "b": jnp.zeros((d_out,), dtype)}


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_abstractor_params(cfg: AbstractorConfig, key, dtype=jnp.float32):
    d, f = cfg.d_model, cfg.d_ffn
    keys = jax.random.split(key, 4)

    def layer(k):
        ks = jax.random.split(k, 8)
        return {
            "norm1": _ln(d, dtype), "normk": _ln(d, dtype),
            "q": _dense(ks[0], d, d, dtype),
            "k": _dense(ks[1], cfg.encoder_width, d, dtype),
            "v": _dense(ks[2], cfg.encoder_width, d, dtype),
            "o": _dense(ks[3], d, d, dtype),
            "norm2": _ln(d, dtype),
            "w1": _dense(ks[4], d, f, dtype),
            "w3": _dense(ks[5], d, f, dtype),
            "ffn_ln": _ln(f, dtype),
            "w2": _dense(ks[6], f, d, dtype),
        }

    layer_keys = jax.random.split(keys[0], cfg.n_layers)
    layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[layer(k) for k in layer_keys])
    return {
        "query_embeds": jax.random.normal(keys[1], (cfg.n_queries, d), dtype) * 0.02,
        "visual_fc": _dense(keys[2], d, cfg.out_dim, dtype),
        "vit_eos": jax.random.normal(keys[3], (cfg.out_dim,), dtype) * 0.02,
        "layers": layers,
    }


def _abstractor_layer(p, cfg: AbstractorConfig, q, feats, q_pos, k_pos):
    qn = layer_norm(q, p["norm1"]["scale"], p["norm1"]["bias"], cfg.norm_eps)
    fn = layer_norm(feats, p["normk"]["scale"], p["normk"]["bias"],
                    cfg.norm_eps)
    kv_in = jnp.concatenate([qn, fn], axis=1)
    qk_pos = jnp.concatenate([q_pos, k_pos], axis=0)[None].astype(kv_in.dtype)
    k = linear(kv_in + qk_pos, p["k"]["w"], p["k"]["b"])
    v = linear(kv_in, p["v"]["w"], p["v"]["b"])
    qq = linear(qn + q_pos[None].astype(qn.dtype), p["q"]["w"], p["q"]["b"])

    def heads(t):
        b, l, _ = t.shape
        return t.reshape(b, l, cfg.n_heads,
                         cfg.d_model // cfg.n_heads).transpose(0, 2, 1, 3)

    o = multihead_attention(heads(qq), heads(k), heads(v))
    b, nh, l, dh = o.shape
    ctx = o.transpose(0, 2, 1, 3).reshape(b, l, cfg.d_model)
    t = qn + linear(ctx, p["o"]["w"], p["o"]["b"])
    x = layer_norm(t, p["norm2"]["scale"], p["norm2"]["bias"], cfg.norm_eps)
    inner = jax.nn.silu(linear(x, p["w1"]["w"], p["w1"]["b"])) \
        * linear(x, p["w3"]["w"], p["w3"]["b"])
    inner = layer_norm(inner, p["ffn_ln"]["scale"], p["ffn_ln"]["bias"],
                       cfg.norm_eps)
    return t + linear(inner, p["w2"]["w"], p["w2"]["b"])


def abstractor_forward(params, cfg: AbstractorConfig,
                       image_feats: jnp.ndarray) -> jnp.ndarray:
    """ViT features [B, 1+grid², enc_width] → vision tokens
    [B, n_queries+1, out_dim] (queries through visual_fc, + vit_eos)."""
    b = image_feats.shape[0]
    q_pos, k_pos = abstractor_pos_embeds(cfg)
    q = jnp.broadcast_to(params["query_embeds"],
                         (b,) + params["query_embeds"].shape
                         ).astype(image_feats.dtype)

    def body(carry, p):
        return _abstractor_layer(p, cfg, carry, image_feats, q_pos, k_pos), None

    q, _ = jax.lax.scan(body, q, params["layers"])
    out = linear(q, params["visual_fc"]["w"], params["visual_fc"]["b"])
    eos = jnp.broadcast_to(params["vit_eos"], (b, 1, cfg.out_dim)
                           ).astype(out.dtype)
    return jnp.concatenate([out, eos], axis=1)

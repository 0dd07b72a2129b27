"""Qwen-VL visual resampler — attention pooling of ViT features onto a
fixed query grid.

The reference includes Qwen-VL only as a ``trust_remote_code`` HF load
(``easyeditor/trainer/models.py:113``), so the behavioral spec is the
public Qwen-VL visual module: a 16×16 grid of learnable queries
cross-attends once over the (kv-projected, layer-normed) ViT features;
2d-sincos position embeddings are added to the queries and (at the ViT's
grid resolution) to the keys; the pooled output goes through ``ln_post``
and a final projection matrix to the LLM width.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multihead_attention
from ..ops.layers import layer_norm, linear
from ..utils.config import BaseConfig
from .abstractor import _sincos_1d


@dataclasses.dataclass(frozen=True)
class ResamplerConfig(BaseConfig):
    grid_size: int = 16          # queries = grid² = 256
    d_model: int = 4096          # resampler width == LLM width
    n_heads: int = 32
    kv_dim: int = 1664           # ViT feature width
    vit_grid: int = 32           # ViT patch grid (448 / 14)
    out_dim: int = 4096
    norm_eps: float = 1e-6

    @property
    def n_queries(self) -> int:
        return self.grid_size ** 2


def _sincos_2d(d: int, grid: int) -> np.ndarray:
    gh = np.arange(grid, dtype=np.float64)
    gw = np.arange(grid, dtype=np.float64)
    mesh = np.meshgrid(gw, gh)
    emb_h = _sincos_1d(d // 2, mesh[0].reshape(-1))
    emb_w = _sincos_1d(d // 2, mesh[1].reshape(-1))
    return np.concatenate([emb_h, emb_w], axis=1)


def resampler_pos_embeds(cfg: ResamplerConfig):
    """(q_pos [grid², d], k_pos [vit_grid², d]) — deterministic sincos."""
    return (jnp.asarray(_sincos_2d(cfg.d_model, cfg.grid_size)),
            jnp.asarray(_sincos_2d(cfg.d_model, cfg.vit_grid)))


def init_resampler_params(cfg: ResamplerConfig, key, dtype=jnp.float32):
    d = cfg.d_model
    ks = jax.random.split(key, 8)

    def dense(k, d_in, d_out, bias=True):
        p = {"w": jax.random.normal(k, (d_in, d_out), dtype) * 0.02}
        if bias:
            p["b"] = jnp.zeros((d_out,), dtype)
        return p

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    return {
        "query": jax.random.normal(ks[0], (cfg.n_queries, d), dtype) * 0.02,
        "kv_proj": dense(ks[1], cfg.kv_dim, d, bias=False),
        "ln_q": ln(), "ln_kv": ln(),
        "attn": {"q": dense(ks[2], d, d), "k": dense(ks[3], d, d),
                 "v": dense(ks[4], d, d), "o": dense(ks[5], d, d)},
        "ln_post": ln(),
        "proj": jax.random.normal(ks[6], (d, cfg.out_dim), dtype) * 0.02,
    }


def resampler_forward(params, cfg: ResamplerConfig,
                      image_feats: jnp.ndarray) -> jnp.ndarray:
    """ViT features [B, vit_grid², kv_dim] → [B, grid², out_dim]."""
    b = image_feats.shape[0]
    q_pos, k_pos = resampler_pos_embeds(cfg)
    x = linear(image_feats, params["kv_proj"]["w"],
               params["kv_proj"].get("b"))
    x = layer_norm(x, params["ln_kv"]["scale"], params["ln_kv"]["bias"],
                   cfg.norm_eps)
    q = layer_norm(jnp.broadcast_to(params["query"],
                                    (b,) + params["query"].shape),
                   params["ln_q"]["scale"], params["ln_q"]["bias"],
                   cfg.norm_eps)
    a = params["attn"]
    qq = linear(q + q_pos[None].astype(q.dtype), a["q"]["w"], a["q"]["b"])
    kk = linear(x + k_pos[None].astype(x.dtype), a["k"]["w"], a["k"]["b"])
    vv = linear(x, a["v"]["w"], a["v"]["b"])

    def heads(t):
        bb, l, _ = t.shape
        return t.reshape(bb, l, cfg.n_heads,
                         cfg.d_model // cfg.n_heads).transpose(0, 2, 1, 3)

    o = multihead_attention(heads(qq), heads(kk), heads(vv))
    bb, nh, l, dh = o.shape
    ctx = o.transpose(0, 2, 1, 3).reshape(bb, l, cfg.d_model)
    out = linear(ctx, a["o"]["w"], a["o"]["b"])
    out = layer_norm(out, params["ln_post"]["scale"],
                     params["ln_post"]["bias"], cfg.norm_eps)
    return jnp.einsum("bld,do->blo", out, params["proj"].astype(out.dtype))

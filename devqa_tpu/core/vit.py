"""Vision transformers: one generic ViT covering the three backbone towers.

Behavioral spec (SURVEY.md §2 backbone table):
- BLIP-2's EVA-ViT   (HF ``Blip2VisionModel``): fused qkv, post-layernorm
  only (no embedding pre-LN — that's CLIP's quirk), gelu, 224px/14 → 257
  tokens (cls + 256). Reference use:
  ``editor/vllms_for_edit/blip2/blip2.py:25-31``.
- LLaVA's CLIP ViT-L/14-336: split qkv, quick_gelu, 336px/14 → 577
  tokens; LLaVA reads the penultimate layer's hidden states and drops
  CLS (``editor/vllms_for_edit/llava/llava.py:25-38``) — supported via
  ``stop_at_layer``.
- MiniGPT-4's EVA-ViT-g: structurally the BLIP-2 variant at larger width
  (``editor/vllms_for_edit/minigpt4/modules/eva_vit.py``).

Patch embedding is expressed as patchify + one matmul (MXU-friendly;
identical math to the stride-P conv).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import multihead_attention
from ..ops.layers import layer_norm, linear
from ..utils.config import BaseConfig
from .decoder import ACTIVATIONS


@dataclasses.dataclass(frozen=True)
class ViTConfig(BaseConfig):
    image_size: int = 224
    patch_size: int = 14
    d_model: int = 1408
    n_layers: int = 39
    n_heads: int = 16
    d_ffn: int = 6144
    activation: str = "gelu"
    fused_qkv: bool = True      # Blip2/EVA style single qkv matmul
    pre_layernorm: bool = True  # CLIP has pre_layernorm on embeddings
    use_cls_token: bool = True  # Qwen-VL's tower has no class token
    norm_eps: float = 1e-5

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def n_tokens(self) -> int:
        return self.n_patches + (1 if self.use_cls_token else 0)


def blip2_vit_config() -> ViTConfig:
    return ViTConfig(image_size=224, patch_size=14, d_model=1408, n_layers=39,
                     n_heads=16, d_ffn=6144, fused_qkv=True,
                     pre_layernorm=False)


def clip_vit_l_336_config() -> ViTConfig:
    return ViTConfig(image_size=336, patch_size=14, d_model=1024, n_layers=24,
                     n_heads=16, d_ffn=4096, activation="quick_gelu",
                     fused_qkv=False, pre_layernorm=True)


def eva_vit_g_config() -> ViTConfig:
    return ViTConfig(image_size=224, patch_size=14, d_model=1408, n_layers=39,
                     n_heads=16, d_ffn=6144, fused_qkv=True, pre_layernorm=False)


def init_vit_params(cfg: ViTConfig, key, dtype=jnp.float32):
    d, f = cfg.d_model, cfg.d_ffn
    patch_dim = 3 * cfg.patch_size ** 2
    keys = jax.random.split(key, 8)

    def layer(k):
        ks = jax.random.split(k, 6)
        p = {
            "ln1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "ln2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "o": {"w": jax.random.normal(ks[3], (d, d), dtype) * 0.02,
                  "b": jnp.zeros((d,), dtype)},
            "fc1": {"w": jax.random.normal(ks[4], (d, f), dtype) * 0.02,
                    "b": jnp.zeros((f,), dtype)},
            "fc2": {"w": jax.random.normal(ks[5], (f, d), dtype) * 0.02,
                    "b": jnp.zeros((d,), dtype)},
        }
        if cfg.fused_qkv:
            p["qkv"] = {"w": jax.random.normal(ks[0], (d, 3 * d), dtype) * 0.02,
                        "b": jnp.zeros((3 * d,), dtype)}
        else:
            for name, kk in zip(("q", "k", "v"), ks[:3]):
                p[name] = {"w": jax.random.normal(kk, (d, d), dtype) * 0.02,
                           "b": jnp.zeros((d,), dtype)}
        return p

    layer_keys = jax.random.split(keys[0], cfg.n_layers)
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *[layer(k) for k in layer_keys])
    params = {
        "patch_embed": {"w": jax.random.normal(keys[1], (patch_dim, d), dtype) * 0.02,
                        "b": jnp.zeros((d,), dtype)},
        "pos_embed": jax.random.normal(keys[3], (cfg.n_tokens, d), dtype) * 0.02,
        "post_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "layers": layers,
    }
    if cfg.use_cls_token:
        params["cls_token"] = jax.random.normal(keys[2], (d,), dtype) * 0.02
    if cfg.pre_layernorm:
        params["pre_ln"] = {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}
    return params


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] → [B, (H/P)*(W/P), 3*P*P] matching conv-stride-P layout.

    Channel-major flattening (c, ph, pw) matches torch's
    ``Conv2d(3, d, P, stride=P)`` weight layout ``[d, 3, P, P]`` so HF
    conv kernels convert to our matmul weight via a plain reshape.
    """
    b, h, w, c = pixels.shape
    gh, gw = h // patch, w // patch
    x = pixels.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, gh, gw, c, ph, pw]
    return x.reshape(b, gh * gw, c * patch * patch)


def _vit_layer(p, cfg: ViTConfig, h):
    act = ACTIVATIONS[cfg.activation]
    d = cfg.d_model
    x = layer_norm(h, p["ln1"]["scale"], p["ln1"]["bias"], cfg.norm_eps)
    if cfg.fused_qkv:
        qkv = linear(x, p["qkv"]["w"], p["qkv"]["b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear(x, p["q"]["w"], p["q"]["b"])
        k = linear(x, p["k"]["w"], p["k"]["b"])
        v = linear(x, p["v"]["w"], p["v"]["b"])

    def heads(t):
        b, l, _ = t.shape
        return t.reshape(b, l, cfg.n_heads, d // cfg.n_heads).transpose(0, 2, 1, 3)

    o = multihead_attention(heads(q), heads(k), heads(v))
    b, nh, l, dh = o.shape
    o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
    h = h + linear(o, p["o"]["w"], p["o"]["b"])
    x = layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"], cfg.norm_eps)
    h = h + linear(act(linear(x, p["fc1"]["w"], p["fc1"]["b"])),
                   p["fc2"]["w"], p["fc2"]["b"])
    return h


def vit_forward(
    params,
    cfg: ViTConfig,
    pixels: jnp.ndarray,
    *,
    stop_at_layer: Optional[int] = None,
    apply_post_ln: bool = True,
) -> jnp.ndarray:
    """[B, H, W, 3] → [B, n_tokens, d].

    ``stop_at_layer=k`` returns hidden states after layer k (exclusive of
    later layers and the post-LN) — LLaVA's ``hidden_states[-2]`` is
    ``stop_at_layer=n_layers-1, apply_post_ln=False``.
    """
    # Run the tower in the PARAM dtype: preprocess emits f32 pixels, and
    # a mixed f32×bf16 dot promotes to f32 — which silently ran every
    # downstream matmul of the bf16 tower at the MXU's f32 rate (~4x
    # slower on v5e). One cast here pins the whole stack to bf16 on the
    # bf16 checkpoints (f32 CPU tests are a no-op cast).
    x = patchify(pixels, cfg.patch_size)
    x = x.astype(params["patch_embed"]["w"].dtype)
    h = linear(x, params["patch_embed"]["w"], params["patch_embed"]["b"])
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"],
                               (h.shape[0], 1, cfg.d_model))
        h = jnp.concatenate([cls.astype(h.dtype), h], axis=1)
    h = h + params["pos_embed"]
    if cfg.pre_layernorm and "pre_ln" in params:
        h = layer_norm(h, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                       cfg.norm_eps)
    hi = cfg.n_layers if stop_at_layer is None else stop_at_layer
    seg = jax.tree.map(lambda t: t[:hi], params["layers"])
    h, _ = jax.lax.scan(lambda c, p: (_vit_layer(p, cfg, c), None), h, seg)
    if apply_post_ln and stop_at_layer is None:
        h = layer_norm(h, params["post_ln"]["scale"], params["post_ln"]["bias"],
                       cfg.norm_eps)
    return h

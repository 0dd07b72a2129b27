"""Primitive NN ops shared by the model zoo.

Pure jnp functions over explicit parameter arrays. Matmuls always set
``preferred_element_type=float32`` so the MXU accumulates in f32 even when
weights/activations are bf16.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: [..., in], w: [in, out], b: [out] or None."""
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Standard LayerNorm in f32 for numerical stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LLaMA-style RMSNorm (no mean subtraction, no bias)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * scale).astype(x.dtype)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU — matches torch.nn.GELU default used by the HF ViT,
    Q-Former (BERT) and CLIP implementations the reference loads."""
    return jax.nn.gelu(x, approximate=False)

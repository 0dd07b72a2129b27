"""BERT-style bidirectional encoder.

Used by two subsystems the reference builds on HF ``BertModel``:
- the SERAC scope classifier (``editor/vllm_editors/serac_vl/modules.py:30-50``
  feeds projected LLM embeddings through BERT and pools mean|max|min);
- the MiniLM sentence encoders of the retrieval substrate
  (all-MiniLM-L6-v2 in ``dataset/vllm.py:89-117``, mpnet in LTE).

Standard post-LN BERT: token/position/type embeddings + LN, then
self-attention blocks with output-LN residuals. Supports ``inputs_embeds``
entry (the SERAC path skips token embeddings entirely).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import multihead_attention
from ..ops.layers import gelu_exact, layer_norm, linear
from ..utils.config import BaseConfig


@dataclasses.dataclass(frozen=True)
class BertConfig(BaseConfig):
    vocab_size: int = 30522
    d_model: int = 384
    n_layers: int = 6
    n_heads: int = 12
    d_ffn: int = 1536
    max_positions: int = 512
    type_vocab_size: int = 2
    norm_eps: float = 1e-12


def minilm_l6_config() -> BertConfig:
    """all-MiniLM-L6-v2 geometry (6 layers, d=384)."""
    return BertConfig()


def init_bert_params(cfg: BertConfig, key, dtype=jnp.float32):
    d, f = cfg.d_model, cfg.d_ffn
    ks = jax.random.split(key, 6)

    def dense(k, i, o):
        return {"w": jax.random.normal(k, (i, o), dtype) * 0.02,
                "b": jnp.zeros((o,), dtype)}

    def layer(k):
        kk = jax.random.split(k, 6)
        return {
            "q": dense(kk[0], d, d), "k": dense(kk[1], d, d),
            "v": dense(kk[2], d, d), "o": dense(kk[3], d, d),
            "attn_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "fc1": dense(kk[4], d, f), "fc2": dense(kk[5], f, d),
            "mlp_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        }

    lkeys = jax.random.split(ks[0], cfg.n_layers)
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *[layer(k) for k in lkeys])
    return {
        "tok_embed": jax.random.normal(ks[1], (cfg.vocab_size, d), dtype) * 0.02,
        "pos_embed": jax.random.normal(ks[2], (cfg.max_positions, d), dtype) * 0.02,
        "type_embed": jax.random.normal(ks[3], (cfg.type_vocab_size, d), dtype) * 0.02,
        "embed_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "layers": layers,
    }


def bert_encode(
    params,
    cfg: BertConfig,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    skip_embeddings: bool = False,
) -> jnp.ndarray:
    """→ last hidden state [B, L, d].

    ``skip_embeddings=True`` runs the encoder stack directly on
    ``inputs_embeds`` without position/type embeddings or the embedding
    LN — the reference RECIPE prototype path calls
    ``base_model.encoder(prot_tokens)`` that way (recipe models.py:60-65).
    """
    if inputs_embeds is None:
        inputs_embeds = params["tok_embed"][input_ids]
    b, L, d = inputs_embeds.shape
    if skip_embeddings:
        h = inputs_embeds
    else:
        h = inputs_embeds + params["pos_embed"][:L] + params["type_embed"][0]
        h = layer_norm(h, params["embed_ln"]["scale"], params["embed_ln"]["bias"],
                       cfg.norm_eps)
    if attention_mask is None:
        attention_mask = jnp.ones((b, L), jnp.int32)

    def block(h, p):
        def heads(t):
            return t.reshape(b, L, cfg.n_heads, d // cfg.n_heads).transpose(0, 2, 1, 3)

        q = heads(linear(h, p["q"]["w"], p["q"]["b"]))
        k = heads(linear(h, p["k"]["w"], p["k"]["b"]))
        v = heads(linear(h, p["v"]["w"], p["v"]["b"]))
        o = multihead_attention(q, k, v, kv_valid=attention_mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, L, d)
        o = linear(o, p["o"]["w"], p["o"]["b"])
        h = layer_norm(o + h, p["attn_ln"]["scale"], p["attn_ln"]["bias"],
                       cfg.norm_eps)
        x = gelu_exact(linear(h, p["fc1"]["w"], p["fc1"]["b"]))
        x = linear(x, p["fc2"]["w"], p["fc2"]["b"])
        h = layer_norm(x + h, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"],
                       cfg.norm_eps)
        return h, None

    h, _ = jax.lax.scan(block, h, params["layers"])
    return h


def mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Sentence-transformers mean pooling + L2 normalize."""
    m = attention_mask[..., None].astype(hidden.dtype)
    s = (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
    return s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-12)


def convert_hf_bert(sd, cfg: BertConfig, prefix: str = ""):
    """HF BertModel state dict → our params (for MiniLM / classifier)."""
    import numpy as np

    def t(n):
        return jnp.asarray(np.asarray(sd[prefix + n]).T)

    def a(n):
        return jnp.asarray(np.asarray(sd[prefix + n]))

    def ln(n):
        return {"scale": a(n + ".weight"), "bias": a(n + ".bias")}

    def dense(n):
        return {"w": t(n + ".weight"), "b": a(n + ".bias")}

    layers = []
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}."
        layers.append({
            "q": dense(p + "attention.self.query"),
            "k": dense(p + "attention.self.key"),
            "v": dense(p + "attention.self.value"),
            "o": dense(p + "attention.output.dense"),
            "attn_ln": ln(p + "attention.output.LayerNorm"),
            "fc1": dense(p + "intermediate.dense"),
            "fc2": dense(p + "output.dense"),
            "mlp_ln": ln(p + "output.LayerNorm"),
        })
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "tok_embed": a("embeddings.word_embeddings.weight"),
        "pos_embed": a("embeddings.position_embeddings.weight"),
        "type_embed": a("embeddings.token_type_embeddings.weight"),
        "embed_ln": ln("embeddings.LayerNorm"),
        "layers": layers,
    }

"""T5 encoder-decoder — the seq2seq backbone of EasyEdit's BaseEditor
(``easyeditor/editors/editor.py`` edits t5-3B on zsre; evaluate paths
branch on 't5' throughout ``easyeditor/evaluate/evaluate_utils.py``).

Architecture notes (original T5 v1.0):
- T5LayerNorm = RMS norm without mean subtraction (ops.layers.rms_norm);
- attention has NO 1/sqrt(d_kv) scaling; inner width H·d_kv may differ
  from d_model;
- relative-position bucket biases are added to self-attention scores;
  the bucket table lives on layer 0 (separately for encoder/decoder) and
  is shared by all layers; cross-attention has no position bias;
- feed-forward is relu (v1.0) or gated-gelu (v1.1, ``gated_act``);
- with tied embeddings the decoder output is scaled by d_model**-0.5
  before the LM head.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import linear, rms_norm
from ..utils.config import BaseConfig

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class T5Config(BaseConfig):
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    n_heads: int = 8
    d_ff: int = 2048
    n_enc_layers: int = 6
    n_dec_layers: int = 6
    rel_buckets: int = 32
    rel_max_distance: int = 128
    norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    gated_act: bool = False  # v1.1 gated-gelu FF
    pad_token_id: int = 0    # decoder_start_token_id == pad for T5


def t5_3b_config() -> T5Config:
    """t5-3b (the reference's zsre seq2seq editing target)."""
    return T5Config(d_model=1024, d_kv=128, n_heads=32, d_ff=16384,
                    n_enc_layers=24, n_dec_layers=24)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _dense(key, d_in, d_out, dtype):
    return {"w": jax.random.normal(key, (d_in, d_out), dtype) * 0.02}


def init_t5_params(cfg: T5Config, key, dtype=jnp.float32):
    d, inner, f = cfg.d_model, cfg.n_heads * cfg.d_kv, cfg.d_ff
    ks = jax.random.split(key, 8)

    def attn(k):
        kk = jax.random.split(k, 4)
        return {"q": _dense(kk[0], d, inner, dtype),
                "k": _dense(kk[1], d, inner, dtype),
                "v": _dense(kk[2], d, inner, dtype),
                "o": _dense(kk[3], inner, d, dtype)}

    def ff(k):
        kk = jax.random.split(k, 3)
        p = {"wi": _dense(kk[0], d, f, dtype),
             "wo": _dense(kk[1], f, d, dtype)}
        if cfg.gated_act:
            p["wi_1"] = _dense(kk[2], d, f, dtype)
        return p

    def enc_layer(k):
        kk = jax.random.split(k, 2)
        return {"ln1": {"scale": jnp.ones((d,), dtype)},
                "self_attn": attn(kk[0]),
                "ln2": {"scale": jnp.ones((d,), dtype)},
                **ff(kk[1])}

    def dec_layer(k):
        kk = jax.random.split(k, 3)
        return {"ln1": {"scale": jnp.ones((d,), dtype)},
                "self_attn": attn(kk[0]),
                "ln2": {"scale": jnp.ones((d,), dtype)},
                "cross_attn": attn(kk[1]),
                "ln3": {"scale": jnp.ones((d,), dtype)},
                **ff(kk[2])}

    stack = lambda layers: jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    enc_keys = jax.random.split(ks[0], cfg.n_enc_layers)
    dec_keys = jax.random.split(ks[1], cfg.n_dec_layers)
    params = {
        "shared": jax.random.normal(ks[2], (cfg.vocab_size, d), dtype) * 0.02,
        "encoder": {
            "rel_bias": jax.random.normal(
                ks[3], (cfg.rel_buckets, cfg.n_heads), dtype) * 0.02,
            "layers": stack([enc_layer(k) for k in enc_keys]),
            "final_norm": {"scale": jnp.ones((d,), dtype)},
        },
        "decoder": {
            "rel_bias": jax.random.normal(
                ks[4], (cfg.rel_buckets, cfg.n_heads), dtype) * 0.02,
            "layers": stack([dec_layer(k) for k in dec_keys]),
            "final_norm": {"scale": jnp.ones((d,), dtype)},
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jax.random.normal(
            ks[5], (d, cfg.vocab_size), dtype) * 0.02
    return params


# ---------------------------------------------------------------------------
# Relative position bias (T5Attention._relative_position_bucket)
# ---------------------------------------------------------------------------

def relative_position_bucket(rel, bidirectional: bool, num_buckets: int,
                             max_distance: int):
    ret = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, rel, large)


def position_bias(table, cfg: T5Config, lq: int, lk: int,
                  bidirectional: bool) -> jnp.ndarray:
    """→ [1, H, lq, lk] additive attention bias."""
    ctx = jnp.arange(lq)[:, None]
    mem = jnp.arange(lk)[None, :]
    buckets = relative_position_bucket(mem - ctx, bidirectional,
                                       cfg.rel_buckets,
                                       cfg.rel_max_distance)
    bias = table[buckets]                       # [lq, lk, H]
    return bias.transpose(2, 0, 1)[None]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _t5_attention(p, cfg: T5Config, x_q, x_kv, kv_mask, bias):
    """Unscaled attention with additive bias. kv_mask [B, Lk]."""
    H, dk = cfg.n_heads, cfg.d_kv

    def heads(t):
        b, l, _ = t.shape
        return t.reshape(b, l, H, dk).transpose(0, 2, 1, 3)

    q = heads(linear(x_q, p["q"]["w"]))
    k = heads(linear(x_kv, p["k"]["w"]))
    v = heads(linear(x_kv, p["v"]["w"]))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias
    s = s + jnp.where(kv_mask.astype(bool), 0.0, NEG_INF)[:, None, None, :]
    a = jax.nn.softmax(jnp.maximum(s, 2 * NEG_INF), -1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    b, h, l, _ = o.shape
    return linear(o.transpose(0, 2, 1, 3).reshape(b, l, h * dk), p["o"]["w"])


def _t5_ff(p, cfg: T5Config, x):
    if cfg.gated_act:
        h = jax.nn.gelu(linear(x, p["wi"]["w"]), approximate=True) \
            * linear(x, p["wi_1"]["w"])
    else:
        h = jax.nn.relu(linear(x, p["wi"]["w"]))
    return linear(h, p["wo"]["w"])


def t5_encode(params, cfg: T5Config, input_ids, attn_mask) -> jnp.ndarray:
    enc = params["encoder"]
    h = params["shared"][input_ids]
    L = input_ids.shape[1]
    bias = position_bias(enc["rel_bias"], cfg, L, L, bidirectional=True)

    def body(carry, p):
        h = carry
        x = rms_norm(h, p["ln1"]["scale"], cfg.norm_eps)
        h = h + _t5_attention(p["self_attn"], cfg, x, x, attn_mask, bias)
        x = rms_norm(h, p["ln2"]["scale"], cfg.norm_eps)
        return h + _t5_ff(p, cfg, x), None

    h, _ = jax.lax.scan(body, h, enc["layers"])
    return rms_norm(h, enc["final_norm"]["scale"], cfg.norm_eps)


def t5_decode(params, cfg: T5Config, decoder_ids, dec_mask, enc_out,
              enc_mask) -> jnp.ndarray:
    dec = params["decoder"]
    h = params["shared"][decoder_ids]
    L = decoder_ids.shape[1]
    bias = position_bias(dec["rel_bias"], cfg, L, L, bidirectional=False)
    causal = (jnp.arange(L)[None, :] <= jnp.arange(L)[:, None])
    bias = bias + jnp.where(causal, 0.0, NEG_INF)[None, None]

    def body(carry, p):
        h = carry
        x = rms_norm(h, p["ln1"]["scale"], cfg.norm_eps)
        h = h + _t5_attention(p["self_attn"], cfg, x, x, dec_mask, bias)
        x = rms_norm(h, p["ln2"]["scale"], cfg.norm_eps)
        h = h + _t5_attention(p["cross_attn"], cfg, x, enc_out, enc_mask,
                              None)
        x = rms_norm(h, p["ln3"]["scale"], cfg.norm_eps)
        return h + _t5_ff(p, cfg, x), None

    h, _ = jax.lax.scan(body, h, dec["layers"])
    h = rms_norm(h, dec["final_norm"]["scale"], cfg.norm_eps)
    if cfg.tie_word_embeddings:
        h = h * (cfg.d_model ** -0.5)
        w = params["shared"].T
    else:
        w = params["lm_head"]
    return jnp.dot(h, w, preferred_element_type=jnp.float32)


def t5_apply(params, cfg: T5Config, input_ids, attn_mask, decoder_ids,
             dec_mask) -> jnp.ndarray:
    enc_out = t5_encode(params, cfg, input_ids, attn_mask)
    return t5_decode(params, cfg, decoder_ids, dec_mask, enc_out, attn_mask)


def shift_right(labels, cfg: T5Config):
    """Teacher-forcing decoder inputs: prepend decoder_start (= pad)."""
    return jnp.concatenate(
        [jnp.full_like(labels[:, :1], cfg.pad_token_id), labels[:, :-1]],
        axis=1)


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def convert_t5(sd, cfg: T5Config):
    """HF ``T5ForConditionalGeneration`` state dict → params."""
    import jax

    def a(name):
        return jnp.asarray(sd[name])

    def t(name):
        return jnp.asarray(sd[name]).T

    def attn(prefix):
        return {"q": {"w": t(prefix + ".q.weight")},
                "k": {"w": t(prefix + ".k.weight")},
                "v": {"w": t(prefix + ".v.weight")},
                "o": {"w": t(prefix + ".o.weight")}}

    def ff(prefix):
        if cfg.gated_act:
            return {"wi": {"w": t(prefix + ".wi_0.weight")},
                    "wi_1": {"w": t(prefix + ".wi_1.weight")},
                    "wo": {"w": t(prefix + ".wo.weight")}}
        return {"wi": {"w": t(prefix + ".wi.weight")},
                "wo": {"w": t(prefix + ".wo.weight")}}

    def enc_layer(i):
        p = f"encoder.block.{i}."
        return {"ln1": {"scale": a(p + "layer.0.layer_norm.weight")},
                "self_attn": attn(p + "layer.0.SelfAttention"),
                "ln2": {"scale": a(p + "layer.1.layer_norm.weight")},
                **ff(p + "layer.1.DenseReluDense")}

    def dec_layer(i):
        p = f"decoder.block.{i}."
        return {"ln1": {"scale": a(p + "layer.0.layer_norm.weight")},
                "self_attn": attn(p + "layer.0.SelfAttention"),
                "ln2": {"scale": a(p + "layer.1.layer_norm.weight")},
                "cross_attn": attn(p + "layer.1.EncDecAttention"),
                "ln3": {"scale": a(p + "layer.2.layer_norm.weight")},
                **ff(p + "layer.2.DenseReluDense")}

    stack = lambda ls: jax.tree.map(lambda *xs: jnp.stack(xs), *ls)
    params = {
        "shared": a("shared.weight"),
        "encoder": {
            "rel_bias": a("encoder.block.0.layer.0.SelfAttention."
                          "relative_attention_bias.weight"),
            "layers": stack([enc_layer(i) for i in range(cfg.n_enc_layers)]),
            "final_norm": {"scale": a("encoder.final_layer_norm.weight")},
        },
        "decoder": {
            "rel_bias": a("decoder.block.0.layer.0.SelfAttention."
                          "relative_attention_bias.weight"),
            "layers": stack([dec_layer(i) for i in range(cfg.n_dec_layers)]),
            "final_norm": {"scale": a("decoder.final_layer_norm.weight")},
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = t("lm_head.weight")
    return params

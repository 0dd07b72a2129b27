"""Decoder-only LLM zoo: OPT (BLIP-2's language model) and LLaMA (Vicuna).

TPU-native redesign of the reference's HF decoder usage:

- Layer parameters are **stacked** along a leading axis and iterated with
  ``lax.scan`` — one compiled layer body instead of 32 unrolled layers.
- The reference's nethook machinery (``editor/nethook.py`` Trace stop /
  TraceDict skip-layers / edit_input / forward hooks, used via
  ``get_mid_module_outpt`` and ``forward_from_mid_layer`` in
  ``vllms_for_edit/base.py:138-185``) becomes an explicit **split
  forward**: :func:`decoder_forward` runs layers ``[lo, hi)`` and accepts
  typed intervention points:

  * ``layer_residual=(i, fn)`` — ``fn`` maps the output hidden state of
    layer ``i`` to its replacement (LiveEdit's layer-21 MoE residual,
    ``liveedit.py:111-125``).
  * ``mlp_residual=(i, fn)`` — ``fn`` maps the (post-norm) MLP input of
    layer ``i`` to an additive delta on the MLP output. Covers T-Patcher's
    appended fc1/fc2 neurons (``tp_vl.py:71-109``) and LEMoE's LoRA
    experts on fc1-in/fc2-out (``lemoe_vl.py:55-83``) — both are exactly
    "extra function of the MLP input added to the MLP output".

  Parameter-space editors (FT/MEND/ROME/LoRA) need no intervention: they
  produce an edited parameter pytree and call the same functions.

Masking/positions: a single ``kv_valid`` [B, L] mask drives both attention
masking and position ids (``cumsum(kv_valid)-1``), reproducing HF OPT's
mask-derived learned positions and giving RoPE models identical
"masked-prefix == absent-prefix" semantics (the trick that lets image and
no-image probes share one batched layout).

Note one deliberate divergence from the reference: its *training* path
resumes the decoder by feeding layer 21's captured **output** back into
layer 21's **input** (``forward_from_mid_layer`` skips layers 0..20 and
``edit_input``-replaces layer 21, so layer 21 runs twice relative to the
inference path — ``liveedit.py:295-317`` + ``base.py:164-185``). We keep
training and inference consistent instead: ``decoder_forward(lo=i+1)``
resumes *after* the captured layer. Editors trained in this framework see
the same function at train and eval time.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import multihead_attention
from ..ops.layers import gelu_exact, layer_norm, linear, rms_norm
from ..utils.config import BaseConfig
from ..utils.pytree import tree_slice


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": gelu_exact,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),  # GPT-2 tanh gelu
    "silu": jax.nn.silu,
    "quick_gelu": quick_gelu,
}


@dataclasses.dataclass(frozen=True)
class DecoderConfig(BaseConfig):
    arch: str = "opt"  # "opt" | "llama"
    vocab_size: int = 50272
    d_model: int = 2560
    n_layers: int = 32
    n_heads: int = 32
    d_ffn: int = 10240
    max_positions: int = 2048
    activation: str = "relu"
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    tie_word_embeddings: bool = True
    pos_offset: int = 2  # OPT's learned-position offset
    attn_bias: bool = False  # llama-family q/k/v bias (Qwen's c_attn has one)
    o_bias: bool = False     # llama-family o_proj bias (InternLM)
    rotary_dim: Optional[int] = None  # GPT-J partial interleaved rotary
    n_kv_heads: Optional[int] = None  # grouped-query attention (Llama-2/3)
    # llama-family RoPE pairing: GLM rotates interleaved (even, odd) pairs
    # over the first rotary_dim dims instead of the NeoX half-split.
    rope_interleaved: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads


def opt_2_7b_config() -> DecoderConfig:
    """blip2-opt-2.7b language model (d=2560, 32 layers; SURVEY.md backbone
    table, cites editor/vllms_for_edit/blip2/blip2.py:20-87)."""
    return DecoderConfig(
        arch="opt", vocab_size=50272, d_model=2560, n_layers=32, n_heads=32,
        d_ffn=10240, activation="relu", tie_word_embeddings=True,
    )


def vicuna_7b_config() -> DecoderConfig:
    """llava-v1.5-7b / minigpt-4 language model (Vicuna-7b: d=4096, 32
    layers; SURVEY.md backbone table)."""
    return DecoderConfig(
        arch="llama", vocab_size=32000, d_model=4096, n_layers=32, n_heads=32,
        d_ffn=11008, activation="silu", tie_word_embeddings=False,
        norm_eps=1e-6, max_positions=4096,
    )


def gptj_6b_config() -> DecoderConfig:
    """GPT-J-6B (a stock ROME/MEMIT backbone in the reference's hparams):
    parallel attention+MLP residual on one shared LN, partial interleaved
    rotary (rotary_dim=64), untied biased lm_head."""
    return DecoderConfig(
        arch="gptj", vocab_size=50400, d_model=4096, n_layers=28,
        n_heads=16, d_ffn=16384, activation="gelu_new",
        tie_word_embeddings=False, max_positions=2048, rotary_dim=64,
    )


def gpt2_config(size: str = "base") -> DecoderConfig:
    """GPT-2 (EasyEdit BaseEditor's stock LLM backbone,
    ``easyeditor/editors/editor.py``): structurally the OPT block with
    zero position offset and tanh-gelu. base/medium/large/xl."""
    dims = {"base": (768, 12, 12), "medium": (1024, 24, 16),
            "large": (1280, 36, 20), "xl": (1600, 48, 25)}
    d, n_layers, n_heads = dims[size]
    return DecoderConfig(
        arch="opt", vocab_size=50257, d_model=d, n_layers=n_layers,
        n_heads=n_heads, d_ffn=4 * d, activation="gelu_new",
        tie_word_embeddings=True, max_positions=1024, pos_offset=0,
    )


def baichuan_7b_config() -> DecoderConfig:
    """Baichuan-7B: exactly the llama block (13B switches to ALiBi — not
    modeled); its checkpoint fuses qkv as ``W_pack`` (see
    convert_baichuan)."""
    return DecoderConfig(
        arch="llama", vocab_size=64000, d_model=4096, n_layers=32,
        n_heads=32, d_ffn=11008, activation="silu",
        tie_word_embeddings=False, norm_eps=1e-6, max_positions=4096,
    )


def internlm_7b_config() -> DecoderConfig:
    """InternLM-7B: the llama block with attention biases."""
    return DecoderConfig(
        arch="llama", vocab_size=103168, d_model=4096, n_layers=32,
        n_heads=32, d_ffn=11008, activation="silu",
        tie_word_embeddings=False, norm_eps=1e-6, max_positions=2048,
        attn_bias=True, o_bias=True,
    )


def glm_4_9b_config() -> DecoderConfig:
    """GLM-4-9b — the ChatGLM lineage the reference edits via
    trust_remote_code (``easyeditor/editors/editor.py`` chatglm branches;
    THUDM checkpoints). Modeled on the official HF port
    (``GlmForCausalLM``): llama block with biased q/k/v, unbiased o,
    2-head GQA, SwiGLU via fused gate_up (split at conversion), and
    *partial interleaved* rotary over the first head_dim/2 dims."""
    return DecoderConfig(
        arch="llama", vocab_size=151552, d_model=4096, n_layers=40,
        n_heads=32, n_kv_heads=2, d_ffn=13696, activation="silu",
        tie_word_embeddings=False, norm_eps=1.5625e-07,
        max_positions=8192, attn_bias=True, rope_interleaved=True,
        rotary_dim=64,
    )


def qwen_7b_config() -> DecoderConfig:
    """Qwen-7B (Qwen-VL's language model — the reference loads it via
    trust_remote_code, trainer/models.py:113): llama-family block with
    fused-qkv bias (c_attn), RMSNorm, RoPE, SwiGLU, untied lm_head."""
    return DecoderConfig(
        arch="llama", vocab_size=151936, d_model=4096, n_layers=32,
        n_heads=32, d_ffn=11008, activation="silu",
        tie_word_embeddings=False, norm_eps=1e-6, max_positions=8192,
        attn_bias=True,
    )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _dense(key, d_in, d_out, dtype, bias=True, scale=0.02):
    w = jax.random.normal(key, (d_in, d_out), dtype) * scale
    if bias:
        return {"w": w, "b": jnp.zeros((d_out,), dtype)}
    return {"w": w}


def init_decoder_params(cfg: DecoderConfig, key, dtype=jnp.float32):
    keys = jax.random.split(key, 16)
    d, f = cfg.d_model, cfg.d_ffn
    if cfg.arch == "opt":
        def layer(k):
            ks = jax.random.split(k, 8)
            return {
                "ln1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
                "q": _dense(ks[0], d, d, dtype), "k": _dense(ks[1], d, d, dtype),
                "v": _dense(ks[2], d, d, dtype), "o": _dense(ks[3], d, d, dtype),
                "ln2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
                "fc1": _dense(ks[4], d, f, dtype), "fc2": _dense(ks[5], f, d, dtype),
            }
        layer_keys = jax.random.split(keys[0], cfg.n_layers)
        layers = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[layer(k) for k in layer_keys]
        )
        params = {
            "embed_tokens": jax.random.normal(keys[1], (cfg.vocab_size, d), dtype) * 0.02,
            "embed_positions": jax.random.normal(
                keys[2], (cfg.max_positions + cfg.pos_offset, d), dtype) * 0.02,
            "final_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "layers": layers,
        }
    elif cfg.arch == "gptj":
        def layer(k):
            ks = jax.random.split(k, 8)
            return {
                "ln1": {"scale": jnp.ones((d,), dtype),
                        "bias": jnp.zeros((d,), dtype)},
                "q": _dense(ks[0], d, d, dtype, bias=False),
                "k": _dense(ks[1], d, d, dtype, bias=False),
                "v": _dense(ks[2], d, d, dtype, bias=False),
                "o": _dense(ks[3], d, d, dtype, bias=False),
                "fc1": _dense(ks[4], d, f, dtype),
                "fc2": _dense(ks[5], f, d, dtype),
            }
        layer_keys = jax.random.split(keys[0], cfg.n_layers)
        layers = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[layer(k) for k in layer_keys]
        )
        params = {
            "embed_tokens": jax.random.normal(keys[1], (cfg.vocab_size, d), dtype) * 0.02,
            "final_norm": {"scale": jnp.ones((d,), dtype),
                           "bias": jnp.zeros((d,), dtype)},
            "lm_head": jax.random.normal(keys[3], (d, cfg.vocab_size), dtype) * 0.02,
            "lm_head_b": jnp.zeros((cfg.vocab_size,), dtype),
            "layers": layers,
        }
    elif cfg.arch == "llama":
        def layer(k):
            ks = jax.random.split(k, 8)
            ab = cfg.attn_bias
            d_kv = cfg.kv_heads * cfg.head_dim  # GQA: fewer k/v heads
            return {
                "ln1": {"scale": jnp.ones((d,), dtype)},
                "q": _dense(ks[0], d, d, dtype, bias=ab),
                "k": _dense(ks[1], d, d_kv, dtype, bias=ab),
                "v": _dense(ks[2], d, d_kv, dtype, bias=ab),
                "o": _dense(ks[3], d, d, dtype, bias=cfg.o_bias),
                "ln2": {"scale": jnp.ones((d,), dtype)},
                "gate": _dense(ks[4], d, f, dtype, bias=False),
                "up": _dense(ks[5], d, f, dtype, bias=False),
                "down": _dense(ks[6], f, d, dtype, bias=False),
            }
        layer_keys = jax.random.split(keys[0], cfg.n_layers)
        layers = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[layer(k) for k in layer_keys]
        )
        params = {
            "embed_tokens": jax.random.normal(keys[1], (cfg.vocab_size, d), dtype) * 0.02,
            "final_norm": {"scale": jnp.ones((d,), dtype)},
            "layers": layers,
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = jax.random.normal(
                keys[3], (d, cfg.vocab_size), dtype) * 0.02
    else:
        raise ValueError(cfg.arch)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def positions_from_mask(kv_valid: jnp.ndarray) -> jnp.ndarray:
    """[B, L] validity mask → position ids (cumsum-1, clamped ≥ 0).

    Matches HF OPT's mask-derived learned positions; applied to RoPE
    models too so a masked-off prefix is position-equivalent to absence.
    """
    return jnp.maximum(jnp.cumsum(kv_valid.astype(jnp.int32), axis=1) - 1, 0)


def _rope(q, k, positions, theta):
    """HF-style (non-interleaved) rotary embedding. q,k: [B,H,L,D]."""
    d = q.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions[:, None, :, None].astype(jnp.float32) * inv_freq  # [B,1,L,D/2]
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)

    def rot_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    q2 = q * cos + rot_half(q) * sin
    k2 = k * cos + rot_half(k) * sin
    return q2.astype(q.dtype), k2.astype(k.dtype)


def _rope_interleaved(q, k, positions, theta, rotary_dim):
    """GPT-J-style rotary: applied to the FIRST ``rotary_dim`` dims of
    each head, rotating interleaved (even, odd) pairs."""
    def rot(x):
        xr, xp = x[..., :rotary_dim], x[..., rotary_dim:]
        inv = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2,
                                          dtype=jnp.float32) / rotary_dim))
        ang = positions[:, None, :, None].astype(jnp.float32) * inv
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        rr = jnp.stack([r1, r2], axis=-1).reshape(xr.shape)
        return jnp.concatenate([rr.astype(x.dtype), xp], axis=-1)

    return rot(q), rot(k)


def _split_heads(x, n_heads):
    b, l, d = x.shape
    return x.reshape(b, l, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def _repeat_kv(x, n_rep: int):
    """[B, Hkv, L, D] → [B, Hkv·n_rep, L, D] (GQA key/value broadcast)."""
    if n_rep == 1:
        return x
    b, h, l, d = x.shape
    return jnp.broadcast_to(x[:, :, None], (b, h, n_rep, l, d)).reshape(
        b, h * n_rep, l, d)


def _attn_block(p, cfg: DecoderConfig, h_norm, kv_valid, positions):
    q = _split_heads(linear(h_norm, p["q"]["w"], p["q"].get("b")), cfg.n_heads)
    k = _split_heads(linear(h_norm, p["k"]["w"], p["k"].get("b")),
                     cfg.kv_heads)
    v = _split_heads(linear(h_norm, p["v"]["w"], p["v"].get("b")),
                     cfg.kv_heads)
    if cfg.arch == "llama":
        if cfg.rope_interleaved:  # GLM partial interleaved pairing
            q, k = _rope_interleaved(q, k, positions, cfg.rope_theta,
                                     cfg.rotary_dim or cfg.head_dim)
        else:
            q, k = _rope(q, k, positions, cfg.rope_theta)
    elif cfg.arch == "gptj":
        q, k = _rope_interleaved(q, k, positions, cfg.rope_theta,
                                 cfg.rotary_dim or cfg.head_dim)
    n_rep = cfg.n_heads // cfg.kv_heads  # GQA: only k/v broadcast
    o = multihead_attention(q, _repeat_kv(k, n_rep), _repeat_kv(v, n_rep),
                            kv_valid=kv_valid, causal=True)
    return linear(_merge_heads(o), p["o"]["w"], p["o"].get("b"))


def mlp_input_at_layer(p, cfg: DecoderConfig, h, kv_valid) -> jnp.ndarray:
    """The post-norm MLP input of ONE layer given its input hidden state
    — what a hook on fc1/gate's input sees (the layer's norm+attention
    front half). Kept here, next to :func:`decoder_layer`, as the single
    source of truth: editors that optimize against the MLP input
    (T-Patcher's per-edit neuron, tp_vl.py:71-109) call this instead of
    re-deriving layer internals."""
    positions = positions_from_mask(kv_valid)
    if cfg.arch == "opt":
        hn = layer_norm(h, p["ln1"]["scale"], p["ln1"]["bias"], cfg.norm_eps)
        h2 = h + _attn_block(p, cfg, hn, kv_valid, positions)
        return layer_norm(h2, p["ln2"]["scale"], p["ln2"]["bias"],
                          cfg.norm_eps)
    if cfg.arch == "gptj":
        # Parallel residual: attn and mlp share ONE LN of the layer input
        # (see decoder_layer's gptj branch) — the MLP input IS ln1(h).
        return layer_norm(h, p["ln1"]["scale"], p["ln1"]["bias"],
                          cfg.norm_eps)
    if cfg.arch != "llama":
        # mplug_owl2 needs modality-split multiway k/v+norms that
        # _attn_block does not model — fail loudly rather than return
        # silently-wrong activations (decoder_layer_contributions does
        # the same for its unsupported archs).
        raise NotImplementedError(
            "mlp_input_at_layer: arch %r not supported" % cfg.arch)
    hn = rms_norm(h, p["ln1"]["scale"], cfg.norm_eps)
    h2 = h + _attn_block(p, cfg, hn, kv_valid, positions)
    return rms_norm(h2, p["ln2"]["scale"], cfg.norm_eps)


def decoder_layer(
    p,
    cfg: DecoderConfig,
    h,
    kv_valid,
    positions,
    mlp_residual_fn: Optional[Callable] = None,
):
    """One pre-LN decoder layer. ``p`` holds a single layer's params."""
    act = ACTIVATIONS[cfg.activation]
    if cfg.arch == "gptj":
        # Parallel residual on one shared LN (modeling_gptj block):
        # h' = h + attn(ln(h)) + mlp(ln(h))
        x = layer_norm(h, p["ln1"]["scale"], p["ln1"]["bias"], cfg.norm_eps)
        attn = _attn_block(p, cfg, x, kv_valid, positions)
        mlp = linear(act(linear(x, p["fc1"]["w"], p["fc1"]["b"])),
                     p["fc2"]["w"], p["fc2"]["b"])
        if mlp_residual_fn is not None:
            mlp = mlp + mlp_residual_fn(x)
        return h + attn + mlp
    if cfg.arch == "opt":
        h_norm = layer_norm(h, p["ln1"]["scale"], p["ln1"]["bias"], cfg.norm_eps)
        h = h + _attn_block(p, cfg, h_norm, kv_valid, positions)
        x = layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"], cfg.norm_eps)
        mlp = linear(act(linear(x, p["fc1"]["w"], p["fc1"]["b"])),
                     p["fc2"]["w"], p["fc2"]["b"])
        if mlp_residual_fn is not None:
            mlp = mlp + mlp_residual_fn(x)
        return h + mlp
    else:  # llama
        h_norm = rms_norm(h, p["ln1"]["scale"], cfg.norm_eps)
        h = h + _attn_block(p, cfg, h_norm, kv_valid, positions)
        x = rms_norm(h, p["ln2"]["scale"], cfg.norm_eps)
        mlp = linear(
            act(linear(x, p["gate"]["w"])) * linear(x, p["up"]["w"]),
            p["down"]["w"],
        )
        if mlp_residual_fn is not None:
            mlp = mlp + mlp_residual_fn(x)
        return h + mlp


def _scan_layers(layers, cfg, h, kv_valid, positions, lo, hi, remat):
    """Run stacked layers [lo, hi) with lax.scan."""
    if hi <= lo:
        return h
    seg = jax.tree.map(lambda x: x[lo:hi], layers)
    body = lambda carry, p: (decoder_layer(p, cfg, carry, kv_valid, positions), None)
    if remat:
        body = jax.checkpoint(body)
    h, _ = jax.lax.scan(body, h, seg)
    return h


def embed_tokens(params, cfg: DecoderConfig, input_ids) -> jnp.ndarray:
    return params["embed_tokens"][input_ids]


def decoder_forward(
    params,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    kv_valid: jnp.ndarray,
    *,
    lo: int = 0,
    hi: Optional[int] = None,
    layer_residual: Optional[Tuple[int, Callable]] = None,
    mlp_residual: Optional[Tuple[int, Callable]] = None,
    remat: bool = False,
    modality: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run decoder layers [lo, hi) over ``inputs_embeds`` → hidden states.

    ``lo == 0`` additionally applies the model's position embeddings (OPT);
    resuming from a mid-layer capture (``lo > 0``) must not re-add them —
    the functional equivalent of ``forward_from_mid_layer``.

    ``modality`` [B, L] (1 = visual token) selects the second way of
    mPLUG-Owl2's multiway k/v/norms; ignored by opt/llama. Defaults to
    all-text.
    """
    hi = cfg.n_layers if hi is None else hi
    positions = positions_from_mask(kv_valid)
    h = inputs_embeds
    if lo == 0 and cfg.arch == "opt":
        h = h + params["embed_positions"][positions + cfg.pos_offset]
    if cfg.arch == "mplug_owl2" and modality is None:
        modality = jnp.zeros_like(kv_valid)

    def run_layer(p_i, h, mlp_fn):
        if cfg.arch == "mplug_owl2":
            return mplug_owl2_layer(p_i, cfg, h, kv_valid, positions,
                                    modality, mlp_residual_fn=mlp_fn)
        return decoder_layer(p_i, cfg, h, kv_valid, positions,
                             mlp_residual_fn=mlp_fn)

    def run_span(h, a, b):
        if cfg.arch == "mplug_owl2":
            return _scan_mplug_layers(params["layers"], cfg, h, kv_valid,
                                      positions, modality, a, b, remat)
        return _scan_layers(params["layers"], cfg, h, kv_valid, positions,
                            a, b, remat)

    # Split the scan at intervention layers.
    points = {}
    if layer_residual is not None:
        points.setdefault(layer_residual[0], {})["layer_residual"] = layer_residual[1]
    if mlp_residual is not None:
        points.setdefault(mlp_residual[0], {})["mlp_residual"] = mlp_residual[1]
    cut_layers = sorted(i for i in points if lo <= i < hi)

    cur = lo
    for i in cut_layers:
        h = run_span(h, cur, i)
        p_i = tree_slice(params["layers"], i)
        h = run_layer(p_i, h, points[i].get("mlp_residual"))
        if "layer_residual" in points[i]:
            h = points[i]["layer_residual"](h)
        cur = i + 1
    h = run_span(h, cur, hi)
    return h


def _scan_mplug_layers(layers, cfg, h, kv_valid, positions, modality,
                       lo, hi, remat):
    if hi <= lo:
        return h
    seg = jax.tree.map(lambda x: x[lo:hi], layers)
    body = lambda carry, p: (
        mplug_owl2_layer(p, cfg, carry, kv_valid, positions, modality), None)
    if remat:
        body = jax.checkpoint(body)
    h, _ = jax.lax.scan(body, h, seg)
    return h


def decoder_logits(params, cfg: DecoderConfig, hidden) -> jnp.ndarray:
    """Final norm + LM head → [B, L, V] f32 logits."""
    if cfg.arch in ("opt", "gptj"):  # LayerNorm-family final norm
        h = layer_norm(hidden, params["final_norm"]["scale"],
                       params["final_norm"]["bias"], cfg.norm_eps)
    else:  # llama-family RMSNorm
        h = rms_norm(hidden, params["final_norm"]["scale"], cfg.norm_eps)
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"].T
    else:
        w = params["lm_head"]
    logits = jnp.dot(h, w, preferred_element_type=jnp.float32)
    if "lm_head_b" in params:  # GPT-J's biased head
        logits = logits + params["lm_head_b"]
    return logits


def _head_chunk(V: int, target: int = 8192, floor: int = 1024) -> int:
    """Largest divisor of V that is ≤ target (≥ floor), else 0 (caller
    falls back to the materialized head). OPT's 50272 → 6284, LLaMA's
    32000 → 8000."""
    if V <= target:
        return V
    for c in range(target, floor - 1, -1):
        if V % c == 0:
            return c
    return 0


def decoder_pred_ids(params, cfg: DecoderConfig, hidden) -> jnp.ndarray:
    """argmax over the vocabulary of ``decoder_logits(hidden)`` WITHOUT
    materializing the [..., V] f32 logits: the head runs as a
    ``lax.scan`` over vocabulary chunks keeping only a running
    (max, argmax) per position, so HBM sees O(positions) instead of
    O(positions × V) — the teacher-forced accuracy metric only ever
    reads the argmax (losses.gathered_token_accuracy). Bit-identical to
    ``jnp.argmax(decoder_logits(...), -1)``: same f32 accumulation per
    element, and ties resolve to the first index in both (strict ``>``
    keeps the earlier chunk's winner)."""
    vc = _head_chunk(_head_weight(params, cfg).shape[1])
    if vc == 0:  # prime-ish vocab: no useful divisor
        return jnp.argmax(decoder_logits(params, cfg, hidden), axis=-1)
    if cfg.arch in ("opt", "gptj"):
        h = layer_norm(hidden, params["final_norm"]["scale"],
                       params["final_norm"]["bias"], cfg.norm_eps)
    else:
        h = rms_norm(hidden, params["final_norm"]["scale"], cfg.norm_eps)
    w = _head_weight(params, cfg)
    bias = params.get("lm_head_b")
    lead = h.shape[:-1]
    h2 = h.reshape(-1, h.shape[-1])
    n = w.shape[1] // vc

    def body(carry, i):
        best, besti = carry
        wc = jax.lax.dynamic_slice_in_dim(w, i * vc, vc, axis=1)
        lg = jnp.dot(h2, wc, preferred_element_type=jnp.float32)
        if bias is not None:
            lg = lg + jax.lax.dynamic_slice_in_dim(bias, i * vc, vc, 0)
        m = jnp.max(lg, axis=-1)
        ai = jnp.argmax(lg, axis=-1).astype(jnp.int32) + i * vc
        upd = m > best
        return (jnp.where(upd, m, best), jnp.where(upd, ai, besti)), None

    init = (jnp.full((h2.shape[0],), -jnp.inf, jnp.float32),
            jnp.zeros((h2.shape[0],), jnp.int32))
    (best, besti), _ = jax.lax.scan(body, init, jnp.arange(n))
    return besti.reshape(lead)


def _head_weight(params, cfg: DecoderConfig):
    return params["embed_tokens"].T if cfg.tie_word_embeddings \
        else params["lm_head"]


def decoder_apply(
    params, cfg: DecoderConfig, inputs_embeds, kv_valid, **kw
) -> jnp.ndarray:
    """Full forward: embeddings → layers → logits."""
    h = decoder_forward(params, cfg, inputs_embeds, kv_valid, **kw)
    return decoder_logits(params, cfg, h)


# ---------------------------------------------------------------------------
# Layer-contribution readout (analysis)
# ---------------------------------------------------------------------------

def decoder_layer_contributions(params, cfg: DecoderConfig, inputs_embeds,
                                kv_valid):
    """Per-layer residual-stream contribution readout — the functional
    equivalent of the reference's ``show_s`` instrumentation
    (MultimodalTrainer.py:62-260, which collects per-layer input /
    attention / MLP hidden states and their norm + cosine contribution
    to the layer output; disabled upstream by an early return).

    Returns dict of [n_layers, B, L] arrays: ``attn_norm`` / ``mlp_norm``
    (contribution magnitudes) and ``attn_cos`` / ``mlp_cos`` / ``in_cos``
    (cosine similarity of each component to the layer output).
    """
    if cfg.arch not in ("opt", "llama"):
        raise NotImplementedError(cfg.arch)
    positions = positions_from_mask(kv_valid)
    h = inputs_embeds
    if cfg.arch == "opt":
        h = h + params["embed_positions"][positions + cfg.pos_offset]
    act = ACTIVATIONS[cfg.activation]

    def cos(a, b):
        na = jnp.maximum(jnp.linalg.norm(a, axis=-1), 1e-8)
        nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-8)
        return (a * b).sum(-1) / (na * nb)

    def body(carry, p):
        h_in = carry
        if cfg.arch == "opt":
            h_norm = layer_norm(h_in, p["ln1"]["scale"], p["ln1"]["bias"],
                                cfg.norm_eps)
        else:
            h_norm = rms_norm(h_in, p["ln1"]["scale"], cfg.norm_eps)
        attn = _attn_block(p, cfg, h_norm, kv_valid, positions)
        h_mid = h_in + attn
        if cfg.arch == "opt":
            x = layer_norm(h_mid, p["ln2"]["scale"], p["ln2"]["bias"],
                           cfg.norm_eps)
            mlp = linear(act(linear(x, p["fc1"]["w"], p["fc1"]["b"])),
                         p["fc2"]["w"], p["fc2"]["b"])
        else:
            x = rms_norm(h_mid, p["ln2"]["scale"], cfg.norm_eps)
            mlp = linear(act(linear(x, p["gate"]["w"]))
                         * linear(x, p["up"]["w"]), p["down"]["w"])
        h_out = h_mid + mlp
        stats = {
            "attn_norm": jnp.linalg.norm(attn, axis=-1),
            "mlp_norm": jnp.linalg.norm(mlp, axis=-1),
            "attn_cos": cos(attn, h_out),
            "mlp_cos": cos(mlp, h_out),
            "in_cos": cos(h_in, h_out),
        }
        return h_out, stats

    _, stats = jax.lax.scan(body, h, params["layers"])
    return stats


# ---------------------------------------------------------------------------
# KV-cached decoding (serving / generate)
# ---------------------------------------------------------------------------
#
# The reference serves with HF use_cache streaming
# (mPLUG_Owl2/serve/model_worker.py:44). TPU-native shape: ONE compiled
# prefill program (full slotted prompt → per-layer K/V stacked into a
# fixed-capacity cache) + ONE compiled single-token decode program whose
# cost is independent of generated length. Per-row write indices use a
# masked select over the (short) cache axis — no dynamic shapes.


def init_kv_cache(cfg: DecoderConfig, batch: int, max_len: int,
                  dtype=jnp.float32):
    shape = (cfg.n_layers, batch, cfg.n_heads, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype),
            "valid": jnp.zeros((batch, max_len), jnp.int32)}


def _qkv_heads(p, cfg: DecoderConfig, h_norm, positions):
    q = _split_heads(linear(h_norm, p["q"]["w"], p["q"].get("b")), cfg.n_heads)
    k = _split_heads(linear(h_norm, p["k"]["w"], p["k"].get("b")),
                     cfg.kv_heads)
    v = _split_heads(linear(h_norm, p["v"]["w"], p["v"].get("b")),
                     cfg.kv_heads)
    if cfg.arch == "llama":
        if cfg.rope_interleaved:
            q, k = _rope_interleaved(q, k, positions, cfg.rope_theta,
                                     cfg.rotary_dim or cfg.head_dim)
        else:
            q, k = _rope(q, k, positions, cfg.rope_theta)
    # The KV cache stores full-head k/v (GQA heads broadcast here — a
    # memory/simplicity tradeoff at these short serving contexts).
    n_rep = cfg.n_heads // cfg.kv_heads
    return q, _repeat_kv(k, n_rep), _repeat_kv(v, n_rep)


def _layer_with_kv(p, cfg: DecoderConfig, h, positions, attend_fn):
    """One decoder layer where attention K/V flow through ``attend_fn``
    (so prefill can emit them and decode can splice the cache). Validity
    masking is entirely ``attend_fn``'s responsibility."""
    act = ACTIVATIONS[cfg.activation]
    if cfg.arch == "opt":
        h_norm = layer_norm(h, p["ln1"]["scale"], p["ln1"]["bias"], cfg.norm_eps)
    else:
        h_norm = rms_norm(h, p["ln1"]["scale"], cfg.norm_eps)
    q, k, v = _qkv_heads(p, cfg, h_norm, positions)
    o, aux = attend_fn(q, k, v)
    h = h + linear(_merge_heads(o), p["o"]["w"], p["o"].get("b"))
    if cfg.arch == "opt":
        x = layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"], cfg.norm_eps)
        mlp = linear(act(linear(x, p["fc1"]["w"], p["fc1"]["b"])),
                     p["fc2"]["w"], p["fc2"]["b"])
    else:
        x = rms_norm(h, p["ln2"]["scale"], cfg.norm_eps)
        mlp = linear(act(linear(x, p["gate"]["w"])) * linear(x, p["up"]["w"]),
                     p["down"]["w"])
    return h + mlp, aux


def decoder_prefill(params, cfg: DecoderConfig, inputs_embeds, kv_valid,
                    max_len: int):
    """Full-prompt forward that also fills a KV cache.

    → (logits [B, L, V], cache). ``max_len`` is the cache capacity (≥ L);
    cached K carry RoPE already applied at their absolute positions.
    """
    if cfg.arch not in ("opt", "llama"):
        raise NotImplementedError(
            "KV-cached decoding covers opt/llama; %r uses the "
            "full-recompute path" % cfg.arch)
    B, L, _ = inputs_embeds.shape
    assert max_len >= L, (max_len, L)
    positions = positions_from_mask(kv_valid)
    h = inputs_embeds
    if cfg.arch == "opt":
        h = h + params["embed_positions"][positions + cfg.pos_offset]

    def attend(q, k, v):
        o = multihead_attention(q, k, v, kv_valid=kv_valid, causal=True)
        return o, (k, v)

    def body(carry, p):
        h, (k, v) = _layer_with_kv(p, cfg, carry, positions, attend)
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(body, h, params["layers"])
    pad = max_len - L
    ks = jnp.pad(ks, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    vs = jnp.pad(vs, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    cache = {"k": ks, "v": vs,
             "valid": jnp.pad(kv_valid.astype(jnp.int32), ((0, 0), (0, pad)))}
    logits = decoder_logits(params, cfg, h)
    return logits, cache


def decoder_prefill_continue(params, cfg: DecoderConfig, prefix,
                             inputs_embeds, kv_valid, max_len: int):
    """Suffix prefill attending to a per-row PREFIX KV block.

    Serving prefix cache: for the slotted VLLM layout the first
    ``P = img_slot_pos + n_img_tokens`` positions depend only on the
    image (and, for mid-sequence slots, the constant pre-slot token,
    e.g. LLaVA's BOS), so their K/V can be computed once per image and
    reused across prompts — the reference recomputes the full 576-token
    LLaVA prefix for every request (model_worker.py generate path).

    ``prefix``: {"k","v": [n_layers, B, H, P, hd], "valid": [B, P]} —
    rows with an all-zero valid prefix (text-only) reduce exactly to the
    plain prefill of the suffix (positions restart at 0, prefix keys
    masked). ``inputs_embeds``/``kv_valid``: the suffix [B, Ls(, d)].
    → (logits [B, Ls, V], cache laid out [prefix | suffix | pad] —
    identical to :func:`decoder_prefill` over the full sequence).
    """
    if cfg.arch not in ("opt", "llama"):
        raise NotImplementedError(
            "KV-cached decoding covers opt/llama; %r uses the "
            "full-recompute path" % cfg.arch)
    B, Ls, _ = inputs_embeds.shape
    P = prefix["valid"].shape[1]
    assert max_len >= P + Ls, (max_len, P, Ls)
    full_valid = jnp.concatenate(
        [prefix["valid"].astype(jnp.int32), kv_valid.astype(jnp.int32)], 1)
    positions = positions_from_mask(full_valid)[:, P:]
    h = inputs_embeds
    if cfg.arch == "opt":
        h = h + params["embed_positions"][positions + cfg.pos_offset]

    def body(carry, xs):
        p, ck, cv = xs

        def attend(q, k, v):
            kk = jnp.concatenate([ck, k], axis=2)
            vv = jnp.concatenate([cv, v], axis=2)
            # rectangular causal: suffix query i attends keys <= P + i
            # (xla_attention offsets the diagonal by Lk - Lq = P)
            o = multihead_attention(q, kk, vv, kv_valid=full_valid,
                                    causal=True)
            return o, (k, v)

        h, (k, v) = _layer_with_kv(p, cfg, carry, positions, attend)
        return h, (k, v)

    h, (ks, vs) = jax.lax.scan(
        body, h, (params["layers"], prefix["k"], prefix["v"]))
    pad = max_len - P - Ls
    ks = jnp.concatenate([prefix["k"], ks], axis=3)
    vs = jnp.concatenate([prefix["v"], vs], axis=3)
    ks = jnp.pad(ks, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    vs = jnp.pad(vs, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    cache = {"k": ks, "v": vs,
             "valid": jnp.pad(full_valid, ((0, 0), (0, pad)))}
    logits = decoder_logits(params, cfg, h)
    return logits, cache


def decoder_decode_step(params, cfg: DecoderConfig, cache, token_embeds):
    """One cached greedy-decode step.

    ``token_embeds`` [B, d]: the new token's input embedding. The token's
    POSITION is its row's valid count (mask-derived cumsum semantics),
    while its cache SLOT is the index after the row's last valid slot —
    the two differ when the slotted layout masks vision slots
    mid-sequence (text-only rows). If a row's cache is full the write is
    silently dropped; size ``max_len`` for prompt + max_new_tokens.
    → (logits [B, V], cache')."""
    B, d = token_embeds.shape
    max_len = cache["valid"].shape[1]
    valid = cache["valid"]
    n_valid = valid.sum(1)                              # [B]
    pos = n_valid[:, None]                              # [B, 1] new position
    h = token_embeds[:, None, :]                        # [B, 1, d]
    if cfg.arch == "opt":
        h = h + params["embed_positions"][pos + cfg.pos_offset]
    iota = jnp.arange(max_len)
    last = jnp.max(jnp.where(valid > 0, iota[None, :], -1), axis=1)  # [B]
    slot = last + 1
    write = (iota[None, :] == slot[:, None])            # [B, max_len]
    new_valid = valid | write.astype(jnp.int32)

    def body(carry, xs):
        h = carry
        p, ck, cv = xs

        def attend(q, k, v):
            wk = jnp.where(write[:, None, :, None], k, ck)
            wv = jnp.where(write[:, None, :, None], v, cv)
            o = multihead_attention(q, wk, wv, kv_valid=new_valid,
                                    causal=False)
            return o, (wk, wv)

        h, (wk, wv) = _layer_with_kv(p, cfg, h, pos, attend)
        return h, (wk, wv)

    h, (ks, vs) = jax.lax.scan(
        body, h, (params["layers"], cache["k"], cache["v"]))
    logits = decoder_logits(params, cfg, h)[:, 0]
    return logits, {"k": ks, "v": vs, "valid": new_valid}


# ---------------------------------------------------------------------------
# MLP linear probes (MEND's x/δ capture)
# ---------------------------------------------------------------------------

#: MLP linear modules per decoder arch, in dataflow order.
MLP_MODULES = {"opt": ("fc1", "fc2"), "llama": ("gate", "up", "down")}


def decoder_forward_with_linear_probes(
    params,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    kv_valid: jnp.ndarray,
    probe_targets: Tuple[Tuple[int, str], ...],
    zs: Tuple[jnp.ndarray, ...],
):
    """Forward with per-(layer, module) MLP-linear probes for MEND-style
    gradient capture, for both decoder families.

    The reference captures each edited linear's input ``x`` with a forward
    hook and its output gradient ``δ`` with a full-backward hook
    (mend_vl.py:63-85); its llama configs resolve any module path
    (mend_vl.py:200 get_edit_modules, configs/mend_vl/llava-v1.5-7b.yaml
    lists mlp.{gate,up,down}_proj). Functionally: add a zero dummy ``z``
    to the probed linear's output — ``grad(loss, z)`` IS δ — and return
    the linear's input as an auxiliary output.

    ``probe_targets``: static tuple of (layer, module) with module in
    :data:`MLP_MODULES`[cfg.arch]; ``zs`` aligns with it ([B, L, out_dim]
    zeros). Returns (logits, {(layer, module): x_input}).

    Probe dataflow per arch:
      opt:   x_fc1 = ln2(h);  x_fc2 = act(fc1(x_fc1) + z_fc1)
      llama: x_gate = x_up = rms2(h);
             x_down = silu(gate(x) + z_gate) * (up(x) + z_up)
    """
    mods = MLP_MODULES.get(cfg.arch)
    if mods is None:
        raise NotImplementedError("linear probes: arch %r" % cfg.arch)
    for (l, m) in probe_targets:
        assert m in mods, (l, m, cfg.arch)
    z_of = {t: z for t, z in zip(probe_targets, zs)}
    by_layer = sorted({l for (l, _) in probe_targets})
    positions = positions_from_mask(kv_valid)
    h = inputs_embeds
    if cfg.arch == "opt":
        h = h + params["embed_positions"][positions + cfg.pos_offset]
    act = ACTIVATIONS[cfg.activation]
    xs = {}
    cur = 0
    for li in by_layer:
        h = _scan_layers(params["layers"], cfg, h, kv_valid, positions,
                         cur, li, False)
        p = tree_slice(params["layers"], li)

        def z(m):
            return z_of.get((li, m), 0.0)

        def put(m, x):
            if (li, m) in z_of:
                xs[(li, m)] = x

        if cfg.arch == "opt":
            h_norm = layer_norm(h, p["ln1"]["scale"], p["ln1"]["bias"],
                                cfg.norm_eps)
            h = h + _attn_block(p, cfg, h_norm, kv_valid, positions)
            x1 = layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"],
                            cfg.norm_eps)
            o1 = linear(x1, p["fc1"]["w"], p["fc1"]["b"]) + z("fc1")
            x2 = act(o1)
            o2 = linear(x2, p["fc2"]["w"], p["fc2"]["b"]) + z("fc2")
            h = h + o2
            put("fc1", x1)
            put("fc2", x2)
        else:  # llama
            h_norm = rms_norm(h, p["ln1"]["scale"], cfg.norm_eps)
            h = h + _attn_block(p, cfg, h_norm, kv_valid, positions)
            x = rms_norm(h, p["ln2"]["scale"], cfg.norm_eps)
            g = linear(x, p["gate"]["w"]) + z("gate")
            u = linear(x, p["up"]["w"]) + z("up")
            xd = act(g) * u
            o = linear(xd, p["down"]["w"]) + z("down")
            h = h + o
            put("gate", x)
            put("up", x)
            put("down", xd)
        cur = li + 1
    h = _scan_layers(params["layers"], cfg, h, kv_valid, positions,
                     cur, cfg.n_layers, False)
    return decoder_logits(params, cfg, h), xs


def decoder_forward_with_fc_probes(
    params,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    kv_valid: jnp.ndarray,
    probe_layers: Tuple[int, ...],
    z1s: Tuple[jnp.ndarray, ...],
    z2s: Tuple[jnp.ndarray, ...],
):
    """OPT-geometry wrapper over :func:`decoder_forward_with_linear_probes`
    keeping the original fc1/fc2 per-layer API:
    returns (logits, {layer: (x1, x2)})."""
    if cfg.arch != "opt":
        raise NotImplementedError(
            "fc probes are the OPT API; use decoder_forward_with_linear_probes")
    targets = tuple((l, m) for l in probe_layers for m in ("fc1", "fc2"))
    zs = tuple(z for l in range(len(probe_layers))
               for z in (z1s[l], z2s[l]))
    logits, xs = decoder_forward_with_linear_probes(
        params, cfg, inputs_embeds, kv_valid, targets, zs)
    return logits, {l: (xs[(l, "fc1")], xs[(l, "fc2")]) for l in probe_layers}


# ---------------------------------------------------------------------------
# mPLUG-Owl2: modality-adaptive LLaMA variant
# ---------------------------------------------------------------------------

def mplug_owl2_config() -> DecoderConfig:
    """mPLUG-Owl2's modality-adaptive LLaMA-2-7b
    (easyeditor/trainer/mPLUG_Owl2/mplug_owl2/model/modeling_llama2.py):
    k_proj, v_proj and both layer norms are two-way (text / visual,
    MultiwayNetwork — modeling_llama2.py:19-34,66-69,186-189); q/o and the
    MLP are shared."""
    return DecoderConfig(
        arch="mplug_owl2", vocab_size=32000, d_model=4096, n_layers=32,
        n_heads=32, d_ffn=11008, activation="silu",
        tie_word_embeddings=False, norm_eps=1e-6, max_positions=4096,
    )


def init_mplug_owl2_decoder_params(cfg: DecoderConfig, key,
                                   dtype=jnp.float32):
    """LLaMA params + the visual second way for k/v/norms."""
    base_cfg = dataclasses.replace(cfg, arch="llama")
    params = init_decoder_params(base_cfg, key, dtype)
    d = cfg.d_model
    ks = jax.random.split(jax.random.fold_in(key, 7), 4)
    n = cfg.n_layers
    extra = {
        "ln1_vis": {"scale": jnp.ones((n, d), dtype)},
        "ln2_vis": {"scale": jnp.ones((n, d), dtype)},
        "k_vis": {"w": jax.random.normal(ks[0], (n, d, d), dtype) * 0.02},
        "v_vis": {"w": jax.random.normal(ks[1], (n, d, d), dtype) * 0.02},
    }
    params["layers"] = {**params["layers"], **extra}
    return params


def mplug_owl2_layer(p, cfg: DecoderConfig, h, kv_valid, positions,
                     modality, mlp_residual_fn=None):
    """One modality-adaptive layer. ``modality`` [B, L]: 1 = visual token.

    JAX realization of MultiwayNetwork: compute both ways densely and
    select per token (no gather/scatter — the 2nd k/v matmul is the only
    extra cost, and it runs on the MXU).
    """
    act = ACTIVATIONS[cfg.activation]
    m = modality[..., None].astype(h.dtype)

    def mw_norm(scale_t, scale_v, x):
        return (rms_norm(x, scale_t, cfg.norm_eps) * (1 - m)
                + rms_norm(x, scale_v, cfg.norm_eps) * m)

    h_norm = mw_norm(p["ln1"]["scale"], p["ln1_vis"]["scale"], h)
    q = _split_heads(linear(h_norm, p["q"]["w"]), cfg.n_heads)
    k_t = linear(h_norm, p["k"]["w"])
    k_v = linear(h_norm, p["k_vis"]["w"])
    v_t = linear(h_norm, p["v"]["w"])
    v_v = linear(h_norm, p["v_vis"]["w"])
    k = _split_heads(k_t * (1 - m) + k_v * m, cfg.n_heads)
    v = _split_heads(v_t * (1 - m) + v_v * m, cfg.n_heads)
    q, k = _rope(q, k, positions, cfg.rope_theta)
    o = multihead_attention(q, k, v, kv_valid=kv_valid, causal=True)
    h = h + linear(_merge_heads(o), p["o"]["w"])
    x = mw_norm(p["ln2"]["scale"], p["ln2_vis"]["scale"], h)
    mlp = linear(act(linear(x, p["gate"]["w"])) * linear(x, p["up"]["w"]),
                 p["down"]["w"])
    if mlp_residual_fn is not None:
        mlp = mlp + mlp_residual_fn(x)
    return h + mlp


def mplug_owl2_forward(params, cfg: DecoderConfig, inputs_embeds, kv_valid,
                       modality, lo: int = 0, hi: Optional[int] = None,
                       **kw):
    """Modality-adaptive forward — delegates to :func:`decoder_forward`,
    which dispatches on arch and supports the same typed interventions
    (editors target the shared MLP / layer outputs)."""
    return decoder_forward(params, cfg, inputs_embeds, kv_valid,
                           lo=lo, hi=hi, modality=modality, **kw)

"""HuggingFace → devqa_tpu weight conversion.

Converts the torch checkpoints the reference loads
(``Blip2ForConditionalGeneration`` — blip2.py:12, ``LlavaForConditional
Generation`` — llava.py, LLaMA/Vicuna for MiniGPT-4) into this
framework's parameter pytrees. Works on a flat ``state_dict``-like mapping
of numpy arrays so no torch import is required at conversion time; tensors
are transposed from torch's [out, in] linear layout to our [in, out].

Parity is enforced by tests/test_hf_parity.py: tiny random HF models are
instantiated on CPU and logits are compared end-to-end.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from .decoder import DecoderConfig
from .qformer import QFormerConfig
from .vit import ViTConfig
from .vllm import VLLMConfig


Array = np.ndarray


def _t(sd: Mapping[str, Array], name: str) -> Array:
    """Fetch a torch linear weight and transpose to [in, out]."""
    return np.asarray(sd[name]).T


def _a(sd: Mapping[str, Array], name: str) -> Array:
    return np.asarray(sd[name])


def _ln(sd, prefix):
    return {"scale": _a(sd, prefix + ".weight"), "bias": _a(sd, prefix + ".bias")}


def _dense(sd, prefix, bias=True):
    p = {"w": _t(sd, prefix + ".weight")}
    if bias:
        p["b"] = _a(sd, prefix + ".bias")
    return p


def _stack(layer_dicts):
    import jax

    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *layer_dicts)


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------

def convert_opt(sd: Mapping[str, Array], cfg: DecoderConfig, prefix: str = "model.decoder."):
    """HF ``OPTForCausalLM`` → decoder params (blip2's language_model)."""
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}."
        layers.append({
            "ln1": _ln(sd, p + "self_attn_layer_norm"),
            "q": _dense(sd, p + "self_attn.q_proj"),
            "k": _dense(sd, p + "self_attn.k_proj"),
            "v": _dense(sd, p + "self_attn.v_proj"),
            "o": _dense(sd, p + "self_attn.out_proj"),
            "ln2": _ln(sd, p + "final_layer_norm"),
            "fc1": _dense(sd, p + "fc1"),
            "fc2": _dense(sd, p + "fc2"),
        })
    return {
        "embed_tokens": jnp.asarray(_a(sd, prefix + "embed_tokens.weight")),
        "embed_positions": jnp.asarray(_a(sd, prefix + "embed_positions.weight")),
        "final_norm": {
            k: jnp.asarray(v) for k, v in _ln(sd, prefix + "final_layer_norm").items()
        },
        "layers": _stack(layers),
    }


def convert_llama(sd: Mapping[str, Array], cfg: DecoderConfig, prefix: str = "model."):
    """HF ``LlamaForCausalLM`` → decoder params (Vicuna)."""
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}."
        layers.append({
            "ln1": {"scale": _a(sd, p + "input_layernorm.weight")},
            "q": _dense(sd, p + "self_attn.q_proj", bias=False),
            "k": _dense(sd, p + "self_attn.k_proj", bias=False),
            "v": _dense(sd, p + "self_attn.v_proj", bias=False),
            "o": _dense(sd, p + "self_attn.o_proj", bias=False),
            "ln2": {"scale": _a(sd, p + "post_attention_layernorm.weight")},
            "gate": _dense(sd, p + "mlp.gate_proj", bias=False),
            "up": _dense(sd, p + "mlp.up_proj", bias=False),
            "down": _dense(sd, p + "mlp.down_proj", bias=False),
        })
    params = {
        "embed_tokens": jnp.asarray(_a(sd, prefix + "embed_tokens.weight")),
        "final_norm": {"scale": jnp.asarray(_a(sd, prefix + "norm.weight"))},
        "layers": _stack(layers),
    }
    if not cfg.tie_word_embeddings:
        # lm_head placement varies across transformers versions: root-level
        # "lm_head.weight" (LlavaForConditionalGeneration ≥4.52), or next to
        # the text model ("language_model.lm_head.weight").
        candidates = ["lm_head.weight", prefix.rsplit("model.", 1)[0] + "lm_head.weight"]
        key = next(c for c in candidates if c in sd)
        params["lm_head"] = jnp.asarray(_t(sd, key))
    return params


# ---------------------------------------------------------------------------
# Vision towers
# ---------------------------------------------------------------------------

def convert_blip2_vision(sd: Mapping[str, Array], cfg: ViTConfig,
                         prefix: str = "vision_model."):
    """HF ``Blip2VisionModel`` (fused qkv, pre+post LN)."""
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}encoder.layers.{i}."
        layers.append({
            "ln1": _ln(sd, p + "layer_norm1"),
            "qkv": _dense(sd, p + "self_attn.qkv"),
            "o": _dense(sd, p + "self_attn.projection"),
            "ln2": _ln(sd, p + "layer_norm2"),
            "fc1": _dense(sd, p + "mlp.fc1"),
            "fc2": _dense(sd, p + "mlp.fc2"),
        })
    patch_w = _a(sd, prefix + "embeddings.patch_embedding.weight")  # [d,3,P,P]
    d = patch_w.shape[0]
    params = {
        "patch_embed": {
            "w": jnp.asarray(patch_w.reshape(d, -1).T),
            "b": jnp.asarray(
                _a(sd, prefix + "embeddings.patch_embedding.bias")
                if prefix + "embeddings.patch_embedding.bias" in sd
                else np.zeros((d,), patch_w.dtype)),
        },
        "cls_token": jnp.asarray(
            _a(sd, prefix + "embeddings.class_embedding").reshape(-1)),
        "pos_embed": jnp.asarray(
            _a(sd, prefix + "embeddings.position_embedding").reshape(-1, d)),
        "post_ln": {k: jnp.asarray(v)
                    for k, v in _ln(sd, prefix + "post_layernorm").items()},
        "layers": _stack(layers),
    }
    if prefix + "pre_layernorm.weight" in sd:
        params["pre_ln"] = {k: jnp.asarray(v)
                            for k, v in _ln(sd, prefix + "pre_layernorm").items()}
    return params


def convert_clip_vision(sd: Mapping[str, Array], cfg: ViTConfig,
                        prefix: str = "vision_model."):
    """HF ``CLIPVisionModel`` (split qkv, quick_gelu; llava's tower)."""
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}encoder.layers.{i}."
        layers.append({
            "ln1": _ln(sd, p + "layer_norm1"),
            "q": _dense(sd, p + "self_attn.q_proj"),
            "k": _dense(sd, p + "self_attn.k_proj"),
            "v": _dense(sd, p + "self_attn.v_proj"),
            "o": _dense(sd, p + "self_attn.out_proj"),
            "ln2": _ln(sd, p + "layer_norm2"),
            "fc1": _dense(sd, p + "mlp.fc1"),
            "fc2": _dense(sd, p + "mlp.fc2"),
        })
    patch_w = _a(sd, prefix + "embeddings.patch_embedding.weight")
    d = patch_w.shape[0]
    return {
        "patch_embed": {"w": jnp.asarray(patch_w.reshape(d, -1).T),
                        "b": jnp.zeros((d,), patch_w.dtype)},  # CLIP: no bias
        "cls_token": jnp.asarray(_a(sd, prefix + "embeddings.class_embedding").reshape(-1)),
        "pos_embed": jnp.asarray(_a(sd, prefix + "embeddings.position_embedding.weight")),
        "pre_ln": {k: jnp.asarray(v)
                   for k, v in _ln(sd, prefix + "pre_layrnorm").items()},  # sic (HF)
        "post_ln": {k: jnp.asarray(v)
                    for k, v in _ln(sd, prefix + "post_layernorm").items()},
        "layers": _stack(layers),
    }


# ---------------------------------------------------------------------------
# Q-Former + full models
# ---------------------------------------------------------------------------

def convert_blip2_qformer(sd: Mapping[str, Array], cfg: QFormerConfig,
                          prefix: str = "qformer.", query_tokens_key: str = "query_tokens"):
    def mha(p):
        return {
            "q": _dense(sd, p + "attention.query"),
            "k": _dense(sd, p + "attention.key"),
            "v": _dense(sd, p + "attention.value"),
            "o": _dense(sd, p + "output.dense"),
            "ln": _ln(sd, p + "output.LayerNorm"),
        }

    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}encoder.layer.{i}."
        lp = {
            "self_attn": mha(p + "attention."),
            "fc1": _dense(sd, p + "intermediate_query.dense"),
            "fc2": _dense(sd, p + "output_query.dense"),
            "mlp_ln": _ln(sd, p + "output_query.LayerNorm"),
        }
        if i % cfg.cross_attention_frequency == 0:
            lp["cross_attn"] = mha(p + "crossattention.")
        layers.append(jnp.asarray if False else lp)
    import jax

    layers = [jax.tree.map(jnp.asarray, lp) for lp in layers]
    return {
        "query_tokens": jnp.asarray(_a(sd, query_tokens_key).reshape(
            cfg.n_query_tokens, cfg.d_model)),
        "embed_ln": {k: jnp.asarray(v)
                     for k, v in _ln(sd, prefix + "layernorm").items()},
        "layers": layers,
    }


def convert_blip2(sd: Mapping[str, Array], cfg: VLLMConfig):
    """Full ``Blip2ForConditionalGeneration`` state dict → VLLM params."""
    return {
        "vit": convert_blip2_vision(sd, cfg.vit, "vision_model."),
        "qformer": convert_blip2_qformer(sd, cfg.qformer, "qformer.", "query_tokens"),
        "projection": {"w": jnp.asarray(_t(sd, "language_projection.weight")),
                       "b": jnp.asarray(_a(sd, "language_projection.bias"))},
        "decoder": convert_opt(sd, cfg.decoder, "language_model.model.decoder."),
    }


def convert_llava(sd: Mapping[str, Array], cfg: VLLMConfig):
    """Full ``LlavaForConditionalGeneration`` state dict → VLLM params.

    Handles both HF layouts: pre-4.52 ("vision_tower.…",
    "language_model.model.…") and ≥4.52 ("model.vision_tower.…",
    "model.language_model.…" with a root-level lm_head).
    """
    new_layout = any(k.startswith("model.vision_tower.") for k in sd)
    root = "model." if new_layout else ""
    llm_prefix = "model.language_model." if new_layout else "language_model.model."
    import jax

    return {
        "vit": convert_clip_vision(sd, cfg.vit, root + "vision_tower.vision_model."),
        "projection": jax.tree.map(jnp.asarray, {
            "fc1": _dense(sd, root + "multi_modal_projector.linear_1"),
            "fc2": _dense(sd, root + "multi_modal_projector.linear_2"),
        }),
        "decoder": convert_llama(sd, cfg.decoder, llm_prefix),
    }


def torch_state_dict_to_numpy(model) -> Dict[str, Array]:
    """torch nn.Module → {name: numpy array} (host-side, no grad)."""
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}

"""HuggingFace → devqa_tpu weight conversion.

Converts the torch checkpoints the reference loads
(``Blip2ForConditionalGeneration`` — blip2.py:12, ``LlavaForConditional
Generation`` — llava.py, LLaMA/Vicuna for MiniGPT-4) into this
framework's parameter pytrees. Works on a flat ``state_dict``-like mapping
of numpy arrays so no torch import is required at conversion time; tensors
are transposed from torch's [out, in] linear layout to our [in, out].

Parity is enforced by tests/test_hf_parity.py: tiny random HF models are
instantiated on CPU and logits are compared end-to-end. Full-size layouts
are covered by conversion DRY tests: the converters are tracer-friendly,
so ``jax.eval_shape(lambda sd: convert_x(sd, cfg), manifest)`` validates
every key name and shape of the 2.7B/7B layouts without allocating any
weight memory (tests/test_convert_dry.py).
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
    return jnp.asarray(sd[name]).T


def _a(sd: Mapping[str, Array], name: str) -> Array:
    return jnp.asarray(sd[name])


def _ln(sd, prefix):
    return {"scale": _a(sd, prefix + ".weight"), "bias": _a(sd, prefix + ".bias")}


def _dense(sd, prefix, bias=True):
    p = {"w": _t(sd, prefix + ".weight")}
    if bias:
        p["b"] = _a(sd, prefix + ".bias")
    return p


def _stack(layer_dicts):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_dicts)


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


def convert_gpt2(sd: Mapping[str, Array], cfg: DecoderConfig,
                 prefix: str = "transformer."):
    """HF ``GPT2LMHeadModel`` → decoder params (arch="opt",
    pos_offset=0). GPT-2's Conv1D stores weights [in, out] already — no
    transpose — and c_attn fuses q|k|v as contiguous output thirds."""
    d = cfg.d_model
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}h.{i}."
        cw = _a(sd, p + "attn.c_attn.weight")   # [d, 3d], [in, out]
        cb = _a(sd, p + "attn.c_attn.bias")
        qw, kw, vw = jnp.split(cw, 3, axis=1)
        qb, kb, vb = jnp.split(cb, 3, axis=0)
        layers.append({
            "ln1": _ln(sd, p + "ln_1"),
            "q": {"w": qw, "b": qb}, "k": {"w": kw, "b": kb},
            "v": {"w": vw, "b": vb},
            "o": {"w": _a(sd, p + "attn.c_proj.weight"),
                  "b": _a(sd, p + "attn.c_proj.bias")},
            "ln2": _ln(sd, p + "ln_2"),
            "fc1": {"w": _a(sd, p + "mlp.c_fc.weight"),
                    "b": _a(sd, p + "mlp.c_fc.bias")},
            "fc2": {"w": _a(sd, p + "mlp.c_proj.weight"),
                    "b": _a(sd, p + "mlp.c_proj.bias")},
        })
    return {
        "embed_tokens": _a(sd, prefix + "wte.weight"),
        "embed_positions": _a(sd, prefix + "wpe.weight"),
        "final_norm": _ln(sd, prefix + "ln_f"),
        "layers": _stack(layers),
    }


def convert_baichuan(sd: Mapping[str, Array], cfg: DecoderConfig,
                     prefix: str = "model."):
    """Baichuan-7B → llama-arch params: identical to convert_llama except
    qkv ship fused as ``self_attn.W_pack.weight`` [3d, d] (contiguous
    q|k|v output thirds)."""
    expanded: Dict[str, Array] = dict(sd)
    import numpy as _np

    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}.self_attn."
        w = _np.asarray(sd[p + "W_pack.weight"])
        qw, kw, vw = _np.split(w, 3, axis=0)
        expanded[p + "q_proj.weight"] = qw
        expanded[p + "k_proj.weight"] = kw
        expanded[p + "v_proj.weight"] = vw
    return convert_llama(expanded, cfg, prefix)


def convert_glm(sd: Mapping[str, Array], cfg: DecoderConfig,
                prefix: str = "model."):
    """HF ``GlmForCausalLM`` (the ChatGLM/GLM-4 lineage) → llama-arch
    params: identical to convert_llama except the MLP ships fused as
    ``mlp.gate_up_proj.weight`` [2f, d] — first half gate, second half
    up (GlmMLP chunks dim=-1 after the matmul, i.e. output rows). Uses
    jnp slicing so the converter stays eval_shape-traceable for the
    full-size dry test."""
    expanded: Dict[str, Array] = dict(sd)
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}.mlp."
        w = jnp.asarray(sd[p + "gate_up_proj.weight"])
        expanded[p + "gate_proj.weight"] = w[: cfg.d_ffn]
        expanded[p + "up_proj.weight"] = w[cfg.d_ffn:]
    return convert_llama(expanded, cfg, prefix)


def convert_gptj(sd: Mapping[str, Array], cfg: DecoderConfig,
                 prefix: str = "transformer."):
    """HF ``GPTJForCausalLM`` → decoder params (arch="gptj")."""
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}h.{i}."
        layers.append({
            "ln1": _ln(sd, p + "ln_1"),
            "q": _dense(sd, p + "attn.q_proj", bias=False),
            "k": _dense(sd, p + "attn.k_proj", bias=False),
            "v": _dense(sd, p + "attn.v_proj", bias=False),
            "o": _dense(sd, p + "attn.out_proj", bias=False),
            "fc1": _dense(sd, p + "mlp.fc_in"),
            "fc2": _dense(sd, p + "mlp.fc_out"),
        })
    return {
        "embed_tokens": _a(sd, prefix + "wte.weight"),
        "final_norm": _ln(sd, prefix + "ln_f"),
        "lm_head": _t(sd, "lm_head.weight"),
        "lm_head_b": _a(sd, "lm_head.bias"),
        "layers": _stack(layers),
    }


def convert_llama(sd: Mapping[str, Array], cfg: DecoderConfig, prefix: str = "model."):
    """HF ``LlamaForCausalLM`` → decoder params (Vicuna)."""
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}."
        layers.append({
            "ln1": {"scale": _a(sd, p + "input_layernorm.weight")},
            "q": _dense(sd, p + "self_attn.q_proj", bias=cfg.attn_bias),
            "k": _dense(sd, p + "self_attn.k_proj", bias=cfg.attn_bias),
            "v": _dense(sd, p + "self_attn.v_proj", bias=cfg.attn_bias),
            "o": _dense(sd, p + "self_attn.o_proj", bias=cfg.o_bias),
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
        key = next((c for c in candidates if c in sd), None)
        if key is None:
            raise KeyError(
                "untied lm_head not found in checkpoint; tried %r "
                "(set tie_word_embeddings=True if the model ties it)"
                % (candidates,))
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
                else jnp.zeros((d,), patch_w.dtype)),
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
        layers.append(lp)
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


# ---------------------------------------------------------------------------
# MiniGPT-4 (LAVIS-style checkpoint layout)
# ---------------------------------------------------------------------------

def convert_eva_vit(sd: Mapping[str, Array], cfg: ViTConfig,
                    prefix: str = "visual_encoder.",
                    ln_vision_prefix: str = "ln_vision"):
    """EVA-ViT-g from the LAVIS/MiniGPT-4 layout
    (``editor/vllms_for_edit/minigpt4/modules/eva_vit.py:137-260``):
    timm-style blocks (norm1/attn/norm2/mlp), fused qkv with bias
    assembled from separate q_bias and v_bias (zero k bias,
    eva_vit.py:150-196), conv patch embed, [1, T, d] pos_embed/cls_token.
    The model's own final norm is unused (forward_features skips it,
    eva_vit.py:414); MiniGPT-4's external ``ln_vision``
    (minigpt4.py:224) maps to our ``post_ln``.
    """
    layers = []
    d = cfg.d_model
    for i in range(cfg.n_layers):
        p = f"{prefix}blocks.{i}."
        qb = _a(sd, p + "attn.q_bias")
        vb = _a(sd, p + "attn.v_bias")
        layers.append({
            "ln1": _ln(sd, p + "norm1"),
            "qkv": {"w": _t(sd, p + "attn.qkv.weight"),
                    "b": jnp.concatenate([qb, jnp.zeros_like(qb), vb])},
            "o": _dense(sd, p + "attn.proj"),
            "ln2": _ln(sd, p + "norm2"),
            "fc1": _dense(sd, p + "mlp.fc1"),
            "fc2": _dense(sd, p + "mlp.fc2"),
        })
    patch_w = _a(sd, prefix + "patch_embed.proj.weight")  # [d, 3, P, P]
    pos = _a(sd, prefix + "pos_embed").reshape(-1, d)
    pos = interpolate_pos_embed(pos, cfg.n_tokens, has_cls=True)
    return {
        "patch_embed": {
            "w": patch_w.reshape(d, -1).T,
            "b": _a(sd, prefix + "patch_embed.proj.bias"),
        },
        "cls_token": _a(sd, prefix + "cls_token").reshape(-1),
        "pos_embed": pos,
        "post_ln": _ln(sd, ln_vision_prefix),  # external ln_vision
        "layers": _stack(layers),
    }


def interpolate_pos_embed(pos, n_tokens: int, has_cls: bool) -> "jnp.ndarray":
    """Bicubic grid interpolation of absolute position embeddings when the
    checkpoint's image size differs from the target (the reference's
    ``interpolate_pos_embed`` applied on EVA-ViT load,
    ``editor/vllms_for_edit/minigpt4/modules/eva_vit.py`` tail /
    ``minigpt4.py:45-47`` init_vision_encoder img_size)."""
    if pos.shape[0] == n_tokens:
        return pos
    import jax

    d = pos.shape[1]
    cls = pos[:1] if has_cls else pos[:0]
    grid = pos[1:] if has_cls else pos
    src = int(round(float(np.sqrt(grid.shape[0]))))
    dst = int(round(float(np.sqrt(n_tokens - (1 if has_cls else 0)))))
    grid = jnp.asarray(grid).reshape(src, src, d)
    grid = jax.image.resize(grid, (dst, dst, d), method="cubic")
    return jnp.concatenate([jnp.asarray(cls), grid.reshape(dst * dst, d)])


def convert_lavis_qformer(sd: Mapping[str, Array], cfg: QFormerConfig,
                          prefix: str = "Qformer.bert.",
                          query_tokens_key: str = "query_tokens"):
    """BLIP-2 Q-Former in the LAVIS BERT layout
    (``modules/Qformer.py``: attention.self.{query,key,value} +
    attention.output.{dense,LayerNorm}; crossattention every
    ``cross_attention_frequency`` layers; intermediate_query /
    output_query MLP; embeddings.LayerNorm)."""
    def mha(p):
        return {
            "q": _dense(sd, p + "self.query"),
            "k": _dense(sd, p + "self.key"),
            "v": _dense(sd, p + "self.value"),
            "o": _dense(sd, p + "output.dense"),
            "ln": _ln(sd, p + "output.LayerNorm"),
        }

    import jax

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
        layers.append(jax.tree.map(jnp.asarray, lp))
    return {
        "query_tokens": _a(sd, query_tokens_key).reshape(
            cfg.n_query_tokens, cfg.d_model),
        "embed_ln": _ln(sd, prefix + "embeddings.LayerNorm"),
        "layers": layers,
    }


def convert_minigpt4(sd: Mapping[str, Array], cfg: VLLMConfig):
    """Merged MiniGPT-4 state dict → VLLM params.

    Expected keys (``editor/vllms_for_edit/minigpt4/modules/minigpt4.py``
    attribute names, which is how LAVIS checkpoints serialize):
    ``visual_encoder.*`` (EVA-ViT-g), ``ln_vision.*``,
    ``Qformer.bert.*`` + ``query_tokens``, ``llama_proj.{weight,bias}``
    (minigpt4.py:70), ``llama_model.model.*`` (HF LlamaForCausalLM).
    Use :func:`merge_minigpt4_checkpoints` to assemble the dict from the
    separate files the reference loads (eva ckpt + blip2 q-former ckpt +
    vicuna HF dir + stage-2 minigpt4 ckpt).
    """
    return {
        "vit": convert_eva_vit(sd, cfg.vit, "visual_encoder.", "ln_vision"),
        "qformer": convert_lavis_qformer(sd, cfg.qformer, "Qformer.bert.",
                                         "query_tokens"),
        "projection": {"w": _t(sd, "llama_proj.weight"),
                       "b": _a(sd, "llama_proj.bias")},
        "decoder": convert_llama(sd, cfg.decoder, "llama_model.model."),
    }


def merge_minigpt4_checkpoints(paths, llama_dir=None) -> Dict[str, Array]:
    """torch-load LAVIS ``.pth`` checkpoint(s) (each either a raw state
    dict or {"model": state_dict}) and optionally an HF Vicuna directory,
    merging into one flat numpy dict with ``convert_minigpt4``'s expected
    prefixes. Later files win on key conflicts (the stage-2 MiniGPT-4
    ckpt overrides llama_proj)."""
    import torch

    merged: Dict[str, Array] = {}
    for path in paths:
        obj = torch.load(path, map_location="cpu", weights_only=True)
        state = obj.get("model", obj) if isinstance(obj, dict) else obj
        for k, v in state.items():
            if hasattr(v, "detach"):
                merged[k] = v.detach().cpu().numpy()
    if llama_dir is not None:
        import transformers

        hf = transformers.LlamaForCausalLM.from_pretrained(llama_dir)
        for k, v in torch_state_dict_to_numpy(hf).items():
            merged["llama_model." + k] = v
    return merged


def torch_state_dict_to_numpy(model) -> Dict[str, Array]:
    """torch nn.Module → {name: numpy array} (host-side, no grad)."""
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# mPLUG-Owl2
# ---------------------------------------------------------------------------

def convert_owl2_vision(sd: Mapping[str, Array], cfg: ViTConfig,
                        prefix: str = "model.vision_model."):
    """MplugOwlVisionModel (visual_encoder.py:84-446): conv patch embed
    (no bias), cls + pos params, embedding pre-layernorm, pre-LN layers
    with a FUSED qkv whose output features are laid out head-major
    ``[heads, 3, head_dim]`` (visual_encoder.py:155-163) — permuted here
    to this framework's ``[3, heads, head_dim]`` chunk layout."""
    d, nh = cfg.d_model, cfg.n_heads
    hd = d // nh

    def qkv_perm(w, b):
        # torch w: [3d(out: h,3,hd), d(in)] → ours [d(in), 3d(out: 3,h,hd)]
        w = jnp.asarray(w).reshape(nh, 3, hd, d).transpose(1, 0, 2, 3)
        b = jnp.asarray(b).reshape(nh, 3, hd).transpose(1, 0, 2)
        return {"w": w.reshape(3 * d, d).T, "b": b.reshape(3 * d)}

    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}encoder.layers.{i}."
        layers.append({
            "ln1": _ln(sd, p + "input_layernorm"),
            "qkv": qkv_perm(sd[p + "self_attn.query_key_value.weight"],
                            sd[p + "self_attn.query_key_value.bias"]),
            "o": _dense(sd, p + "self_attn.dense"),
            "ln2": _ln(sd, p + "post_attention_layernorm"),
            "fc1": _dense(sd, p + "mlp.fc1"),
            "fc2": _dense(sd, p + "mlp.fc2"),
        })
    patch_w = _a(sd, prefix + "embeddings.patch_embed.weight")  # [d,3,P,P]
    return {
        "patch_embed": {"w": patch_w.reshape(d, -1).T,
                        "b": jnp.zeros((d,), patch_w.dtype)},  # conv bias=False
        "cls_token": _a(sd, prefix + "embeddings.cls_token").reshape(-1),
        "pos_embed": _a(sd, prefix + "embeddings.position_embedding"
                        ).reshape(-1, d),
        "pre_ln": _ln(sd, prefix + "embeddings.pre_layernorm"),
        "post_ln": _ln(sd, prefix + "post_layernorm"),
        "layers": _stack(layers),
    }


def convert_owl2_abstractor(sd: Mapping[str, Array], cfg,
                            prefix: str = "model.visual_abstractor."):
    """MplugOwlVisualAbstractorModel (visual_encoder.py:448-920). The
    sincos q/k position buffers are deterministic and recomputed
    (abstractor.abstractor_pos_embeds), not read from the checkpoint."""
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}encoder.layers.{i}.crossattention."
        layers.append({
            "norm1": _ln(sd, p + "norm1"),
            "normk": _ln(sd, p + "normk"),
            "q": _dense(sd, p + "attention.query"),
            "k": _dense(sd, p + "attention.key"),
            "v": _dense(sd, p + "attention.value"),
            "o": _dense(sd, p + "output.out_proj"),
            "norm2": _ln(sd, p + "output.norm2"),
            "w1": _dense(sd, p + "output.mlp.w1"),
            "w2": _dense(sd, p + "output.mlp.w2"),
            "w3": _dense(sd, p + "output.mlp.w3"),
            "ffn_ln": _ln(sd, p + "output.mlp.ffn_ln"),
        })
    return {
        "query_embeds": _a(sd, prefix + "query_embeds").reshape(
            cfg.n_queries, cfg.d_model),
        "visual_fc": _dense(sd, prefix + "visual_fc"),
        "vit_eos": _a(sd, prefix + "vit_eos").reshape(-1),
        "layers": _stack(layers),
    }


def convert_owl2_decoder(sd: Mapping[str, Array], cfg: DecoderConfig,
                         prefix: str = "model."):
    """Modality-adaptive LLaMA-2 (modeling_llama2.py): q/o and the MLP are
    shared; k_proj/v_proj and both layer norms are MultiwayNetwork pairs
    serialized as ``.multiway.0`` (text) / ``.multiway.1`` (visual)."""
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}."
        layers.append({
            "ln1": {"scale": _a(sd, p + "input_layernorm.multiway.0.weight")},
            "ln1_vis": {"scale": _a(sd, p + "input_layernorm.multiway.1.weight")},
            "q": _dense(sd, p + "self_attn.q_proj", bias=False),
            "k": {"w": _t(sd, p + "self_attn.k_proj.multiway.0.weight")},
            "k_vis": {"w": _t(sd, p + "self_attn.k_proj.multiway.1.weight")},
            "v": {"w": _t(sd, p + "self_attn.v_proj.multiway.0.weight")},
            "v_vis": {"w": _t(sd, p + "self_attn.v_proj.multiway.1.weight")},
            "o": _dense(sd, p + "self_attn.o_proj", bias=False),
            "ln2": {"scale": _a(sd, p + "post_attention_layernorm.multiway.0.weight")},
            "ln2_vis": {"scale": _a(sd, p + "post_attention_layernorm.multiway.1.weight")},
            "gate": _dense(sd, p + "mlp.gate_proj", bias=False),
            "up": _dense(sd, p + "mlp.up_proj", bias=False),
            "down": _dense(sd, p + "mlp.down_proj", bias=False),
        })
    return {
        "embed_tokens": _a(sd, prefix + "embed_tokens.weight"),
        "final_norm": {"scale": _a(sd, prefix + "norm.weight")},
        "lm_head": _t(sd, "lm_head.weight"),
        "layers": _stack(layers),
    }


def convert_mplug_owl2(sd: Mapping[str, Array], cfg: VLLMConfig):
    """Full mplug-owl2-llama2-7b state dict → VLLM params
    (modeling_mplug_owl2.py:35-39 composition)."""
    return {
        "vit": convert_owl2_vision(sd, cfg.vit, "model.vision_model."),
        "abstractor": convert_owl2_abstractor(sd, cfg.abstractor,
                                              "model.visual_abstractor."),
        "decoder": convert_owl2_decoder(sd, cfg.decoder, "model."),
    }


def load_torch_dir(weights_dir: str) -> Dict[str, Array]:
    """Flat numpy state dict from a directory of torch ``.bin``/``.pth``
    (and ``.safetensors`` when the library is available) shards."""
    import glob
    import os

    merged: Dict[str, Array] = {}
    paths = sorted(glob.glob(os.path.join(weights_dir, "*.bin"))
                   + glob.glob(os.path.join(weights_dir, "*.pth")))
    if paths:
        import torch

        for path in paths:
            obj = torch.load(path, map_location="cpu", weights_only=True)
            state = obj.get("model", obj) if isinstance(obj, dict) else obj
            for k, v in state.items():
                if hasattr(v, "detach"):
                    merged[k] = v.detach().cpu().numpy()
    for path in sorted(glob.glob(os.path.join(weights_dir, "*.safetensors"))):
        from safetensors.numpy import load_file  # optional dependency

        merged.update(load_file(path))
    return merged


# ---------------------------------------------------------------------------
# Qwen-VL (public Qwen-VL module layout; the reference loads this backbone
# via trust_remote_code only — trainer/models.py:113)
# ---------------------------------------------------------------------------

def convert_qwen_vl_vision(sd: Mapping[str, Array], cfg: ViTConfig,
                           prefix: str = "transformer.visual."):
    """Qwen-VL's CLIP-like tower: conv1 patch embed (no bias), no class
    token, ln_pre, resblocks with nn.MultiheadAttention fused in_proj
    (contiguous q|k|v thirds — matches this framework's qkv chunking),
    mlp c_fc/c_proj. The tower output feeds the resampler RAW; ln_post
    belongs to the pooled path, so the tower's post_ln slot is filled
    with identity."""
    d = cfg.d_model
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}transformer.resblocks.{i}."
        layers.append({
            "ln1": _ln(sd, p + "ln_1"),
            "qkv": {"w": _t(sd, p + "attn.in_proj_weight"),
                    "b": _a(sd, p + "attn.in_proj_bias")},
            "o": _dense(sd, p + "attn.out_proj"),
            "ln2": _ln(sd, p + "ln_2"),
            "fc1": _dense(sd, p + "mlp.c_fc"),
            "fc2": _dense(sd, p + "mlp.c_proj"),
        })
    patch_w = _a(sd, prefix + "conv1.weight")
    return {
        "patch_embed": {"w": patch_w.reshape(d, -1).T,
                        "b": jnp.zeros((d,), patch_w.dtype)},
        # The public checkpoint stores a 16x16 (256-row) table and
        # bicubic-resizes to the runtime grid at load (visual.py
        # get_abs_pos); 448px -> 32x32 = 1024 tokens here. No-op when
        # the shapes already match.
        "pos_embed": interpolate_pos_embed(
            _a(sd, prefix + "positional_embedding"), cfg.n_tokens,
            has_cls=False),
        "pre_ln": _ln(sd, prefix + "ln_pre"),
        "post_ln": {"scale": jnp.ones((d,), patch_w.dtype),
                    "bias": jnp.zeros((d,), patch_w.dtype)},  # inert
        "layers": _stack(layers),
    }


def convert_qwen_vl_resampler(sd: Mapping[str, Array], cfg,
                              prefix: str = "transformer.visual."):
    d = cfg.d_model
    inw = _a(sd, prefix + "attn_pool.attn.in_proj_weight")  # [3d, d]
    inb = _a(sd, prefix + "attn_pool.attn.in_proj_bias")
    qw, kw, vw = jnp.split(inw, 3, axis=0)
    qb, kb, vb = jnp.split(inb, 3, axis=0)
    return {
        "query": _a(sd, prefix + "attn_pool.query").reshape(cfg.n_queries, d),
        "kv_proj": {"w": _t(sd, prefix + "attn_pool.kv_proj.weight")},
        "ln_q": _ln(sd, prefix + "attn_pool.ln_q"),
        "ln_kv": _ln(sd, prefix + "attn_pool.ln_kv"),
        "attn": {
            "q": {"w": qw.T, "b": qb}, "k": {"w": kw.T, "b": kb},
            "v": {"w": vw.T, "b": vb},
            "o": _dense(sd, prefix + "attn_pool.attn.out_proj"),
        },
        "ln_post": _ln(sd, prefix + "ln_post"),
        "proj": _a(sd, prefix + "proj"),
    }


def convert_qwen_decoder(sd: Mapping[str, Array], cfg: DecoderConfig,
                         prefix: str = "transformer."):
    """Qwen-7B: fused c_attn with bias split into contiguous q|k|v
    thirds; mlp.w2 is the silu-gated branch (→ gate), mlp.w1 the linear
    branch (→ up), mlp.c_proj → down."""
    d = cfg.d_model
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}h.{i}."
        cw = _a(sd, p + "attn.c_attn.weight")   # [3d, d]
        cb = _a(sd, p + "attn.c_attn.bias")
        qw, kw, vw = jnp.split(cw, 3, axis=0)
        qb, kb, vb = jnp.split(cb, 3, axis=0)
        layers.append({
            "ln1": {"scale": _a(sd, p + "ln_1.weight")},
            "q": {"w": qw.T, "b": qb},
            "k": {"w": kw.T, "b": kb},
            "v": {"w": vw.T, "b": vb},
            "o": {"w": _t(sd, p + "attn.c_proj.weight")},
            "ln2": {"scale": _a(sd, p + "ln_2.weight")},
            "gate": {"w": _t(sd, p + "mlp.w2.weight")},
            "up": {"w": _t(sd, p + "mlp.w1.weight")},
            "down": {"w": _t(sd, p + "mlp.c_proj.weight")},
        })
    return {
        "embed_tokens": _a(sd, prefix + "wte.weight"),
        "final_norm": {"scale": _a(sd, prefix + "ln_f.weight")},
        "lm_head": _t(sd, "lm_head.weight"),
        "layers": _stack(layers),
    }


def convert_qwen_vl(sd: Mapping[str, Array], cfg: VLLMConfig):
    return {
        "vit": convert_qwen_vl_vision(sd, cfg.vit, "transformer.visual."),
        "resampler": convert_qwen_vl_resampler(sd, cfg.resampler,
                                               "transformer.visual."),
        "decoder": convert_qwen_decoder(sd, cfg.decoder, "transformer."),
    }


def qwen_vl_manifest(cfg: VLLMConfig) -> Dict[str, "jnp.ndarray"]:
    import jax

    S = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    v, r, d = cfg.vit, cfg.resampler, cfg.decoder
    m: Dict[str, jnp.ndarray] = {}
    vp = "transformer.visual."
    m[vp + "conv1.weight"] = S(v.d_model, 3, v.patch_size, v.patch_size)
    # The public checkpoint keeps a fixed 16x16 grid (visual.py:
    # nn.Parameter(torch.randn(256, width))) and interpolates at load —
    # NOT the runtime n_tokens grid.
    m[vp + "positional_embedding"] = S(256, v.d_model)
    m[vp + "ln_pre.weight"] = S(v.d_model)
    m[vp + "ln_pre.bias"] = S(v.d_model)
    # ln_post sits AFTER the attention pool, at the resampler width
    m[vp + "ln_post.weight"] = S(r.d_model)
    m[vp + "ln_post.bias"] = S(r.d_model)
    for i in range(v.n_layers):
        p = f"{vp}transformer.resblocks.{i}."
        for ln in ("ln_1", "ln_2"):
            m[p + ln + ".weight"] = S(v.d_model)
            m[p + ln + ".bias"] = S(v.d_model)
        m[p + "attn.in_proj_weight"] = S(3 * v.d_model, v.d_model)
        m[p + "attn.in_proj_bias"] = S(3 * v.d_model)
        m[p + "attn.out_proj.weight"] = S(v.d_model, v.d_model)
        m[p + "attn.out_proj.bias"] = S(v.d_model)
        m[p + "mlp.c_fc.weight"] = S(v.d_ffn, v.d_model)
        m[p + "mlp.c_fc.bias"] = S(v.d_ffn)
        m[p + "mlp.c_proj.weight"] = S(v.d_model, v.d_ffn)
        m[p + "mlp.c_proj.bias"] = S(v.d_model)
    m[vp + "attn_pool.query"] = S(r.n_queries, r.d_model)
    m[vp + "attn_pool.kv_proj.weight"] = S(r.d_model, r.kv_dim)
    m[vp + "attn_pool.attn.in_proj_weight"] = S(3 * r.d_model, r.d_model)
    m[vp + "attn_pool.attn.in_proj_bias"] = S(3 * r.d_model)
    m[vp + "attn_pool.attn.out_proj.weight"] = S(r.d_model, r.d_model)
    m[vp + "attn_pool.attn.out_proj.bias"] = S(r.d_model)
    for ln in ("attn_pool.ln_q", "attn_pool.ln_kv"):
        m[vp + ln + ".weight"] = S(r.d_model)
        m[vp + ln + ".bias"] = S(r.d_model)
    m[vp + "proj"] = S(r.d_model, r.out_dim)
    m["transformer.wte.weight"] = S(d.vocab_size, d.d_model)
    m["transformer.ln_f.weight"] = S(d.d_model)
    m["lm_head.weight"] = S(d.vocab_size, d.d_model)
    for i in range(d.n_layers):
        p = f"transformer.h.{i}."
        m[p + "ln_1.weight"] = S(d.d_model)
        m[p + "ln_2.weight"] = S(d.d_model)
        m[p + "attn.c_attn.weight"] = S(3 * d.d_model, d.d_model)
        m[p + "attn.c_attn.bias"] = S(3 * d.d_model)
        m[p + "attn.c_proj.weight"] = S(d.d_model, d.d_model)
        m[p + "mlp.w1.weight"] = S(d.d_ffn, d.d_model)
        m[p + "mlp.w2.weight"] = S(d.d_ffn, d.d_model)
        m[p + "mlp.c_proj.weight"] = S(d.d_model, d.d_ffn)
    return m


# ---------------------------------------------------------------------------
# Full-size layout manifests (conversion dry tests)
# ---------------------------------------------------------------------------


def mplug_owl2_manifest(cfg: VLLMConfig) -> Dict[str, "jnp.ndarray"]:
    """{key: ShapeDtypeStruct} of the mplug-owl2-llama2-7b checkpoint
    layout for eval_shape dry-runs (mirrors the module structure cited in
    the converters above)."""
    import jax

    S = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    v, a, d = cfg.vit, cfg.abstractor, cfg.decoder
    m: Dict[str, jnp.ndarray] = {}
    vp = "model.vision_model."
    m[vp + "embeddings.cls_token"] = S(1, 1, v.d_model)
    m[vp + "embeddings.patch_embed.weight"] = S(v.d_model, 3, v.patch_size,
                                                v.patch_size)
    m[vp + "embeddings.position_embedding"] = S(1, v.n_tokens, v.d_model)
    m[vp + "embeddings.pre_layernorm.weight"] = S(v.d_model)
    m[vp + "embeddings.pre_layernorm.bias"] = S(v.d_model)
    m[vp + "post_layernorm.weight"] = S(v.d_model)
    m[vp + "post_layernorm.bias"] = S(v.d_model)
    for i in range(v.n_layers):
        p = f"{vp}encoder.layers.{i}."
        for ln in ("input_layernorm", "post_attention_layernorm"):
            m[p + ln + ".weight"] = S(v.d_model)
            m[p + ln + ".bias"] = S(v.d_model)
        m[p + "self_attn.query_key_value.weight"] = S(3 * v.d_model, v.d_model)
        m[p + "self_attn.query_key_value.bias"] = S(3 * v.d_model)
        m[p + "self_attn.dense.weight"] = S(v.d_model, v.d_model)
        m[p + "self_attn.dense.bias"] = S(v.d_model)
        m[p + "mlp.fc1.weight"] = S(v.d_ffn, v.d_model)
        m[p + "mlp.fc1.bias"] = S(v.d_ffn)
        m[p + "mlp.fc2.weight"] = S(v.d_model, v.d_ffn)
        m[p + "mlp.fc2.bias"] = S(v.d_model)
    ap = "model.visual_abstractor."
    m[ap + "query_embeds"] = S(1, a.n_queries, a.d_model)
    m[ap + "visual_fc.weight"] = S(a.out_dim, a.d_model)
    m[ap + "visual_fc.bias"] = S(a.out_dim)
    m[ap + "vit_eos"] = S(1, 1, a.out_dim)
    for i in range(a.n_layers):
        p = f"{ap}encoder.layers.{i}.crossattention."
        for ln in ("norm1", "normk"):
            m[p + ln + ".weight"] = S(a.d_model)
            m[p + ln + ".bias"] = S(a.d_model)
        for proj, width in (("query", a.d_model), ("key", a.encoder_width),
                            ("value", a.encoder_width)):
            m[p + f"attention.{proj}.weight"] = S(a.d_model, width)
            m[p + f"attention.{proj}.bias"] = S(a.d_model)
        m[p + "attention.q_pos_embed"] = S(a.n_queries, a.d_model)
        m[p + "attention.k_pos_embed"] = S(1 + a.grid_size ** 2, a.d_model)
        m[p + "output.out_proj.weight"] = S(a.d_model, a.d_model)
        m[p + "output.out_proj.bias"] = S(a.d_model)
        m[p + "output.norm2.weight"] = S(a.d_model)
        m[p + "output.norm2.bias"] = S(a.d_model)
        for w, din, dout in (("w1", a.d_model, a.d_ffn),
                             ("w3", a.d_model, a.d_ffn),
                             ("w2", a.d_ffn, a.d_model)):
            m[p + f"output.mlp.{w}.weight"] = S(dout, din)
            m[p + f"output.mlp.{w}.bias"] = S(dout)
        m[p + "output.mlp.ffn_ln.weight"] = S(a.d_ffn)
        m[p + "output.mlp.ffn_ln.bias"] = S(a.d_ffn)
    m["model.embed_tokens.weight"] = S(d.vocab_size, d.d_model)
    m["model.norm.weight"] = S(d.d_model)
    m["lm_head.weight"] = S(d.vocab_size, d.d_model)
    for i in range(d.n_layers):
        p = f"model.layers.{i}."
        for w in (0, 1):
            m[p + f"input_layernorm.multiway.{w}.weight"] = S(d.d_model)
            m[p + f"post_attention_layernorm.multiway.{w}.weight"] = S(d.d_model)
            m[p + f"self_attn.k_proj.multiway.{w}.weight"] = S(d.d_model, d.d_model)
            m[p + f"self_attn.v_proj.multiway.{w}.weight"] = S(d.d_model, d.d_model)
        m[p + "self_attn.q_proj.weight"] = S(d.d_model, d.d_model)
        m[p + "self_attn.o_proj.weight"] = S(d.d_model, d.d_model)
        m[p + "mlp.gate_proj.weight"] = S(d.d_ffn, d.d_model)
        m[p + "mlp.up_proj.weight"] = S(d.d_ffn, d.d_model)
        m[p + "mlp.down_proj.weight"] = S(d.d_model, d.d_ffn)
    return m

def minigpt4_manifest(cfg: VLLMConfig) -> Dict[str, "jnp.ndarray"]:
    """{key: ShapeDtypeStruct} of the MiniGPT-4 checkpoint layout for
    ``jax.eval_shape`` conversion dry-runs (no weight memory). Mirrors
    the reference module structure cited in :func:`convert_minigpt4`."""
    import jax

    S = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    v, q, d = cfg.vit, cfg.qformer, cfg.decoder
    m: Dict[str, jnp.ndarray] = {}
    # EVA-ViT
    m["visual_encoder.patch_embed.proj.weight"] = S(v.d_model, 3,
                                                    v.patch_size, v.patch_size)
    m["visual_encoder.patch_embed.proj.bias"] = S(v.d_model)
    m["visual_encoder.cls_token"] = S(1, 1, v.d_model)
    m["visual_encoder.pos_embed"] = S(1, v.n_tokens, v.d_model)
    for i in range(v.n_layers):
        p = f"visual_encoder.blocks.{i}."
        m[p + "norm1.weight"] = S(v.d_model)
        m[p + "norm1.bias"] = S(v.d_model)
        m[p + "attn.qkv.weight"] = S(3 * v.d_model, v.d_model)
        m[p + "attn.q_bias"] = S(v.d_model)
        m[p + "attn.v_bias"] = S(v.d_model)
        m[p + "attn.proj.weight"] = S(v.d_model, v.d_model)
        m[p + "attn.proj.bias"] = S(v.d_model)
        m[p + "norm2.weight"] = S(v.d_model)
        m[p + "norm2.bias"] = S(v.d_model)
        m[p + "mlp.fc1.weight"] = S(v.d_ffn, v.d_model)
        m[p + "mlp.fc1.bias"] = S(v.d_ffn)
        m[p + "mlp.fc2.weight"] = S(v.d_model, v.d_ffn)
        m[p + "mlp.fc2.bias"] = S(v.d_model)
    m["ln_vision.weight"] = S(v.d_model)
    m["ln_vision.bias"] = S(v.d_model)
    # Q-Former (LAVIS BERT)
    m["query_tokens"] = S(1, q.n_query_tokens, q.d_model)
    m["Qformer.bert.embeddings.LayerNorm.weight"] = S(q.d_model)
    m["Qformer.bert.embeddings.LayerNorm.bias"] = S(q.d_model)
    for i in range(q.n_layers):
        p = f"Qformer.bert.encoder.layer.{i}."

        def attn(ap, kv_width):
            m[ap + "self.query.weight"] = S(q.d_model, q.d_model)
            m[ap + "self.query.bias"] = S(q.d_model)
            m[ap + "self.key.weight"] = S(q.d_model, kv_width)
            m[ap + "self.key.bias"] = S(q.d_model)
            m[ap + "self.value.weight"] = S(q.d_model, kv_width)
            m[ap + "self.value.bias"] = S(q.d_model)
            m[ap + "output.dense.weight"] = S(q.d_model, q.d_model)
            m[ap + "output.dense.bias"] = S(q.d_model)
            m[ap + "output.LayerNorm.weight"] = S(q.d_model)
            m[ap + "output.LayerNorm.bias"] = S(q.d_model)

        attn(p + "attention.", q.d_model)
        if i % q.cross_attention_frequency == 0:
            attn(p + "crossattention.", q.encoder_width)
        m[p + "intermediate_query.dense.weight"] = S(q.d_ffn, q.d_model)
        m[p + "intermediate_query.dense.bias"] = S(q.d_ffn)
        m[p + "output_query.dense.weight"] = S(q.d_model, q.d_ffn)
        m[p + "output_query.dense.bias"] = S(q.d_model)
        m[p + "output_query.LayerNorm.weight"] = S(q.d_model)
        m[p + "output_query.LayerNorm.bias"] = S(q.d_model)
    # projector + Vicuna
    m["llama_proj.weight"] = S(d.d_model, q.d_model)
    m["llama_proj.bias"] = S(d.d_model)
    m["llama_model.model.embed_tokens.weight"] = S(d.vocab_size, d.d_model)
    m["llama_model.model.norm.weight"] = S(d.d_model)
    m["llama_model.lm_head.weight"] = S(d.vocab_size, d.d_model)
    for i in range(d.n_layers):
        p = f"llama_model.model.layers.{i}."
        m[p + "input_layernorm.weight"] = S(d.d_model)
        m[p + "post_attention_layernorm.weight"] = S(d.d_model)
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            m[p + f"self_attn.{proj}.weight"] = S(d.d_model, d.d_model)
        m[p + "mlp.gate_proj.weight"] = S(d.d_ffn, d.d_model)
        m[p + "mlp.up_proj.weight"] = S(d.d_ffn, d.d_model)
        m[p + "mlp.down_proj.weight"] = S(d.d_model, d.d_ffn)
    return m

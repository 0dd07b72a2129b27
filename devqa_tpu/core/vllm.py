"""Composed vision-language models: BLIP-2-OPT, LLaVA-1.5, MiniGPT-4.

The reference wraps each backbone behind ``BaseVLLMForEdit``
(``editor/vllms_for_edit/base.py:22``), whose job is: (texts, images) →
LLM input embeddings + a vision-token range ``vt_range``, then
``get_llm_outpt`` → logits. Here that becomes pure functions over a
parameter pytree with one **uniform batched layout**:

    [ text[:, :p] | vision slot block (V tokens) | text[:, p:] ]

- BLIP-2 (``blip2/blip2.py:20-66``):   p=0, V=32 (Q-Former queries).
- LLaVA (``llava/llava.py:25-51``):    p=1 (after BOS), V=576 (CLIP
  penultimate features, CLS dropped, through a 2-layer MLP projector).
- MiniGPT-4 (``minigpt4/minigpt4.py:33-78``): p=1, V=32 (Q-Former +
  llama_proj), vt_range [1, 33].

Rows without an image keep the slot block but mask it off in
``kv_valid``; mask-derived positions (decoder.py) make that exactly
equivalent to the reference's shorter no-image sequence, so image and
no-image probes batch together — the key to fusing the 12 dynamic-eval
probes of a test case into one forward (SURVEY.md §7 hard part 6).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.config import BaseConfig
from . import abstractor as abs_mod
from . import decoder as dec
from . import qformer as qf
from . import resampler as res_mod
from . import vit as vit_mod
from .preprocess import preprocess_images


@dataclasses.dataclass(frozen=True)
class VLLMConfig(BaseConfig):
    name: str = "blip2-opt-2.7b"
    bridge: str = "qformer"  # "qformer" | "mlp" | "abstractor" | "resampler"
    #                          | "none" (text-only: no vision tower, V=0 —
    #                          the whole editor zoo / harness / serving
    #                          stack then operates on a bare decoder, the
    #                          EasyEdit BaseEditor setting)
    img_slot_pos: int = 0    # where the vision block sits in the text stream
    n_img_tokens: int = 32
    vit: vit_mod.ViTConfig = dataclasses.field(default_factory=vit_mod.blip2_vit_config)
    qformer: Optional[qf.QFormerConfig] = dataclasses.field(
        default_factory=qf.blip2_qformer_config)
    abstractor: Optional[abs_mod.AbstractorConfig] = None
    resampler: Optional[res_mod.ResamplerConfig] = None
    decoder: dec.DecoderConfig = dataclasses.field(default_factory=dec.opt_2_7b_config)
    vit_feature_layer: Optional[int] = None  # LLaVA: take hidden at this layer
    # image special token string in prompts (stripped before tokenizing;
    # the slot layout realizes it). blip2: none.
    img_special_token: Optional[str] = None

    @property
    def vt_range(self) -> Tuple[int, int]:
        """Static vision-token range in the full layout — the reference's
        per-call ``vt_range`` (e.g. [0,32] blip2, [1,33] minigpt4)."""
        return (self.img_slot_pos, self.img_slot_pos + self.n_img_tokens)


def blip2_opt_2_7b_config() -> VLLMConfig:
    return VLLMConfig(
        name="blip2-opt-2.7b", bridge="qformer", img_slot_pos=0, n_img_tokens=32,
        vit=vit_mod.blip2_vit_config(), qformer=qf.blip2_qformer_config(),
        decoder=dec.opt_2_7b_config(),
    )


def llava_v15_7b_config() -> VLLMConfig:
    return VLLMConfig(
        name="llava-v1.5-7b", bridge="mlp", img_slot_pos=1, n_img_tokens=576,
        vit=vit_mod.clip_vit_l_336_config(), qformer=None,
        decoder=dec.vicuna_7b_config(),
        vit_feature_layer=vit_mod.clip_vit_l_336_config().n_layers - 1,
        img_special_token="<image>",
    )


def minigpt4_vicuna_7b_config() -> VLLMConfig:
    return VLLMConfig(
        name="minigpt-4-vicuna-7b", bridge="qformer", img_slot_pos=1,
        n_img_tokens=32,
        vit=vit_mod.eva_vit_g_config(),
        qformer=qf.blip2_qformer_config(),
        decoder=dec.vicuna_7b_config(),
        img_special_token="<ImageHere>",
    )


def owl2_vit_config() -> vit_mod.ViTConfig:
    """MplugOwlVisionModel (visual_encoder.py:384-446 + config defaults:
    448px/14 → 1025 tokens, d=1024, 24 pre-LN layers, fused qkv,
    quick_gelu, embedding pre-layernorm)."""
    return vit_mod.ViTConfig(
        image_size=448, patch_size=14, d_model=1024, n_layers=24, n_heads=16,
        d_ffn=4096, activation="quick_gelu", fused_qkv=True,
        pre_layernorm=True, norm_eps=1e-6)


def mplug_owl2_llama2_7b_config() -> VLLMConfig:
    """mPLUG-Owl2 (modeling_mplug_owl2.py:35-39 composition): owl ViT →
    visual abstractor (64 queries + vit_eos = 65 vision tokens) →
    modality-adaptive LLaMA-2-7b. ``<|image|>`` splices after BOS."""
    return VLLMConfig(
        name="mplug-owl2-llama2-7b", bridge="abstractor", img_slot_pos=1,
        n_img_tokens=65,
        vit=owl2_vit_config(), qformer=None,
        abstractor=abs_mod.AbstractorConfig(),
        decoder=dec.mplug_owl2_config(),
        img_special_token="<|image|>",
    )


# --- tiny configs for CPU tests -------------------------------------------

def text_only_vllm_config(dcfg: dec.DecoderConfig,
                          name: Optional[str] = None) -> VLLMConfig:
    """Wrap a bare decoder as a V=0 VLLM: every editor, the evaluation
    harness, and the serving stack then run on a pure text LLM (the
    EasyEdit BaseEditor setting, ``easyeditor/editors/editor.py:39``).
    The vision slot block is empty — no vision params exist and the
    image pipeline is never invoked."""
    return VLLMConfig(name=name or "text-" + dcfg.arch, bridge="none",
                      img_slot_pos=0, n_img_tokens=0,
                      vit=vit_mod.ViTConfig(), qformer=None, decoder=dcfg)


def tiny_vllm_config(arch: str = "opt", img_slot_pos: int = 0) -> VLLMConfig:
    vit_cfg = vit_mod.ViTConfig(
        image_size=16, patch_size=4, d_model=32, n_layers=2, n_heads=2, d_ffn=64,
        fused_qkv=True, pre_layernorm=True)
    qf_cfg = qf.QFormerConfig(
        d_model=24, n_layers=2, n_heads=2, d_ffn=48, n_query_tokens=4,
        encoder_width=32, cross_attention_frequency=2)
    dcfg = dec.DecoderConfig(
        arch=arch, vocab_size=512, d_model=32, n_layers=4, n_heads=2, d_ffn=64,
        max_positions=128,
        activation="relu" if arch == "opt" else "silu",
        tie_word_embeddings=(arch == "opt"))
    return VLLMConfig(
        name=f"tiny-{arch}", bridge="qformer", img_slot_pos=img_slot_pos,
        n_img_tokens=4, vit=vit_cfg, qformer=qf_cfg, decoder=dcfg)


def qwen_vl_vit_config() -> vit_mod.ViTConfig:
    """Qwen-VL's OpenCLIP-bigG-style tower: 448/14 → 1024 patch tokens,
    no class token, d=1664, 48 pre-LN layers; the tower's own output is
    fed RAW to the resampler (ln_post lives after the pool)."""
    return vit_mod.ViTConfig(
        image_size=448, patch_size=14, d_model=1664, n_layers=48, n_heads=16,
        d_ffn=8192, activation="gelu", fused_qkv=True, pre_layernorm=True,
        use_cls_token=False, norm_eps=1e-6)


def qwen_vl_7b_config() -> VLLMConfig:
    """Qwen-VL: tower → attention-pool resampler (256 queries) → Qwen-7B.
    The reference wires this backbone via trust_remote_code only
    (trainer/models.py:113); layout follows the public Qwen-VL module."""
    return VLLMConfig(
        name="qwen-vl", bridge="resampler", img_slot_pos=0, n_img_tokens=256,
        vit=qwen_vl_vit_config(), qformer=None,
        resampler=res_mod.ResamplerConfig(),
        decoder=dec.qwen_7b_config(),
        img_special_token="<img>",
    )


def tiny_owl2_vllm_config() -> VLLMConfig:
    """Tiny mPLUG-Owl2: abstractor bridge + modality-adaptive decoder."""
    vit_cfg = vit_mod.ViTConfig(
        image_size=16, patch_size=4, d_model=32, n_layers=2, n_heads=2,
        d_ffn=64, activation="quick_gelu", fused_qkv=True, pre_layernorm=True)
    a_cfg = abs_mod.AbstractorConfig(
        n_queries=4, d_model=32, n_layers=2, n_heads=2, d_ffn=48,
        encoder_width=32, grid_size=4, out_dim=32)
    dcfg = dec.DecoderConfig(
        arch="mplug_owl2", vocab_size=512, d_model=32, n_layers=4, n_heads=2,
        d_ffn=64, max_positions=128, activation="silu",
        tie_word_embeddings=False)
    return VLLMConfig(
        name="tiny-owl2", bridge="abstractor", img_slot_pos=1,
        n_img_tokens=a_cfg.n_queries + 1, vit=vit_cfg, qformer=None,
        abstractor=a_cfg, decoder=dcfg, img_special_token="<|image|>")


def init_vllm_params(cfg: VLLMConfig, key, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d_llm = cfg.decoder.d_model
    if cfg.decoder.arch == "mplug_owl2":
        decoder_params = dec.init_mplug_owl2_decoder_params(cfg.decoder, k2,
                                                            dtype)
    else:
        decoder_params = dec.init_decoder_params(cfg.decoder, k2, dtype)
    if cfg.bridge == "none":
        return {"decoder": decoder_params}
    params = {
        "vit": vit_mod.init_vit_params(cfg.vit, k1, dtype),
        "decoder": decoder_params,
    }
    if cfg.bridge == "qformer":
        params["qformer"] = qf.init_qformer_params(cfg.qformer, k3, dtype)
        params["projection"] = {
            "w": jax.random.normal(k4, (cfg.qformer.d_model, d_llm), dtype) * 0.02,
            "b": jnp.zeros((d_llm,), dtype),
        }
    elif cfg.bridge == "abstractor":
        params["abstractor"] = abs_mod.init_abstractor_params(
            cfg.abstractor, k3, dtype)
    elif cfg.bridge == "resampler":
        params["resampler"] = res_mod.init_resampler_params(
            cfg.resampler, k3, dtype)
    else:  # llava 2-layer MLP projector (gelu between)
        ka, kb = jax.random.split(k4)
        params["projection"] = {
            "fc1": {"w": jax.random.normal(ka, (cfg.vit.d_model, d_llm), dtype) * 0.02,
                    "b": jnp.zeros((d_llm,), dtype)},
            "fc2": {"w": jax.random.normal(kb, (d_llm, d_llm), dtype) * 0.02,
                    "b": jnp.zeros((d_llm,), dtype)},
        }
    return params


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------

def encode_image(params, cfg: VLLMConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """Normalized pixels [B, S, S, 3] → LLM-space vision tokens
    [B, n_img_tokens, d_llm].

    BLIP-2: ViT → Q-Former → linear projection (blip2.py:22-52).
    LLaVA: ViT penultimate hidden, drop CLS → MLP projector (llava.py:25-51).
    mPLUG-Owl2: ViT (post-LN) → visual abstractor (+vit_eos)
    (modeling_mplug_owl2.py:60-63 encode_images).
    """
    if cfg.bridge == "qformer":
        feats = vit_mod.vit_forward(params["vit"], cfg.vit, pixels)
        q = qf.qformer_forward(params["qformer"], cfg.qformer, feats)
        out = jnp.dot(q, params["projection"]["w"],
                      preferred_element_type=jnp.float32)
        return (out + params["projection"]["b"]).astype(q.dtype)
    elif cfg.bridge == "abstractor":
        feats = vit_mod.vit_forward(params["vit"], cfg.vit, pixels)
        return abs_mod.abstractor_forward(params["abstractor"],
                                          cfg.abstractor, feats)
    elif cfg.bridge == "resampler":
        # raw tower output: Qwen-VL's ln_post sits after the pool
        feats = vit_mod.vit_forward(params["vit"], cfg.vit, pixels,
                                    apply_post_ln=False)
        return res_mod.resampler_forward(params["resampler"],
                                         cfg.resampler, feats)
    else:
        feats = vit_mod.vit_forward(
            params["vit"], cfg.vit, pixels,
            stop_at_layer=cfg.vit_feature_layer, apply_post_ln=False)
        feats = feats[:, 1:]  # drop CLS (llava.py:36)
        p = params["projection"]
        h = jnp.dot(feats, p["fc1"]["w"], preferred_element_type=jnp.float32)
        # Cast the gelu output back to the params dtype before the second
        # dot: an f32 operand would run the MXU at its f32 rate (~4x).
        h = jax.nn.gelu(h + p["fc1"]["b"], approximate=False).astype(
            feats.dtype)
        h = jnp.dot(h, p["fc2"]["w"], preferred_element_type=jnp.float32)
        return (h + p["fc2"]["b"]).astype(feats.dtype)


def encode_image_from_u8(params, cfg: VLLMConfig, images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 images → vision tokens, preprocessing fused on-device."""
    return encode_image(params, cfg, preprocess_images(images_u8, cfg.vit.image_size))


def assemble_embeds(
    params,
    cfg: VLLMConfig,
    input_ids: jnp.ndarray,   # [B, Lt] text tokens (img special token stripped)
    text_mask: jnp.ndarray,   # [B, Lt] 1 = real text token
    img_tokens: jnp.ndarray,  # [B, V, d_llm] vision tokens (garbage ok if absent)
    has_image: jnp.ndarray,   # [B] 1 if the row has an image
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the uniform layout → (inputs_embeds [B, p+V+(Lt-p)... = Lt+V, d],
    kv_valid [B, Lt+V])."""
    p = cfg.img_slot_pos
    tok = dec.embed_tokens(params["decoder"], cfg.decoder, input_ids)
    pre, post = tok[:, :p], tok[:, p:]
    embeds = jnp.concatenate([pre, img_tokens.astype(tok.dtype), post], axis=1)
    img_valid = jnp.broadcast_to(
        has_image[:, None].astype(jnp.int32), (tok.shape[0], cfg.n_img_tokens))
    kv_valid = jnp.concatenate(
        [text_mask[:, :p].astype(jnp.int32), img_valid,
         text_mask[:, p:].astype(jnp.int32)], axis=1)
    return embeds, kv_valid


def vllm_modality(cfg: VLLMConfig, batch: int, length: int) -> Optional[jnp.ndarray]:
    """Static modality indicators for the slotted layout (mPLUG-Owl2's
    MultiwayNetwork routing, modeling_mplug_owl2.py:84-120): 1 on the
    vision-slot positions, 0 elsewhere. None for single-way decoders.
    No-image rows keep slot modality 1 — those positions are masked out
    of attention, so their multiway routing is unobservable."""
    if cfg.decoder.arch != "mplug_owl2":
        return None
    lo, hi = cfg.vt_range
    pos = jnp.arange(length)
    row = ((pos >= lo) & (pos < hi)).astype(jnp.int32)
    return jnp.broadcast_to(row, (batch, length))


def vllm_logits(
    params,
    cfg: VLLMConfig,
    inputs_embeds: jnp.ndarray,
    kv_valid: jnp.ndarray,
    *,
    layer_residual: Optional[Tuple[int, Callable]] = None,
    mlp_residual: Optional[Tuple[int, Callable]] = None,
) -> jnp.ndarray:
    """The reference's ``get_llm_outpt`` (full-sequence teacher forcing,
    use_cache=False — blip2.py:68-75) with optional editor interventions."""
    h = vllm_hidden(params, cfg, inputs_embeds, kv_valid,
                    layer_residual=layer_residual,
                    mlp_residual=mlp_residual)
    return dec.decoder_logits(params["decoder"], cfg.decoder, h)


def vllm_hidden(
    params,
    cfg: VLLMConfig,
    inputs_embeds: jnp.ndarray,
    kv_valid: jnp.ndarray,
    *,
    layer_residual: Optional[Tuple[int, Callable]] = None,
    mlp_residual: Optional[Tuple[int, Callable]] = None,
) -> jnp.ndarray:
    """``vllm_logits`` without the LM head: final-layer hidden states.
    Callers that only need logits at a few positions (teacher-forced
    metrics) gather rows from this before projecting (losses.
    gathered_token_accuracy) instead of paying the head at every
    position."""
    return dec.decoder_forward(
        params["decoder"], cfg.decoder, inputs_embeds, kv_valid,
        layer_residual=layer_residual, mlp_residual=mlp_residual,
        modality=vllm_modality(cfg, *inputs_embeds.shape[:2]))


def vllm_hidden_at(
    params, cfg: VLLMConfig, inputs_embeds, kv_valid, layer: int
) -> jnp.ndarray:
    """Hidden state after layer ``layer`` — the functional
    ``get_mid_module_outpt`` (base.py:151-162, Trace stop=True): the
    decoder simply does not run past the captured layer."""
    return dec.decoder_forward(
        params["decoder"], cfg.decoder, inputs_embeds, kv_valid,
        lo=0, hi=layer + 1,
        modality=vllm_modality(cfg, *inputs_embeds.shape[:2]))


def vllm_resume_from(
    params, cfg: VLLMConfig, hidden, kv_valid, layer: int,
    *,
    layer_residual_fn: Optional[Callable] = None,
    mlp_residual: Optional[Tuple[int, Callable]] = None,
) -> jnp.ndarray:
    """Resume after layer ``layer`` given its captured output — the
    functional ``forward_from_mid_layer`` (base.py:164-185), minus the
    reference's double-application quirk (see decoder.py docstring).

    ``layer_residual_fn``, if given, transforms the captured hidden before
    resuming (LiveEdit's train-time residual injection at the edit layer).
    """
    if layer_residual_fn is not None:
        hidden = layer_residual_fn(hidden)
    h = dec.decoder_forward(
        params["decoder"], cfg.decoder, hidden, kv_valid,
        lo=layer + 1, mlp_residual=mlp_residual,
        modality=vllm_modality(cfg, *hidden.shape[:2]))
    return dec.decoder_logits(params["decoder"], cfg.decoder, h)

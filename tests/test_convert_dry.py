"""Weight-conversion coverage without weights.

1. MiniGPT-4 round-trip: tiny params → LAVIS-layout state dict →
   convert_minigpt4 → identical pytree (validates every key name and
   transpose in the converter numerically).
2. vt_range [1, 33] splicing: the vision block lands after BOS exactly as
   the reference's get_context_emb splice (minigpt4.py:85).
3. Full-size conversion DRY tests (VERDICT r1 #10): jax.eval_shape runs
   each converter against a zero-memory manifest of the real checkpoint
   layout (meta-device HF models for blip2/llava; the mirrored manifest
   for MiniGPT-4), so converter typos die here instead of at 7.5GB load
   time.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_vllm

from devqa_tpu.core import convert_hf as C
from devqa_tpu.core import vllm as V


def tiny_minigpt4_config():
    cfg = V.tiny_vllm_config("llama", img_slot_pos=1)
    import dataclasses

    # EVA-ViT-g geometry: no embedding pre-layernorm (eva_vit_g_config).
    return dataclasses.replace(
        cfg, name="tiny-minigpt4", img_special_token="<ImageHere>",
        vit=dataclasses.replace(cfg.vit, pre_layernorm=False))


def sd_from_params(params, cfg):
    """Inverse of convert_minigpt4 for a tiny param tree."""
    sd = {}
    v = cfg.vit
    P = v.patch_size
    vit = jax.tree.map(np.asarray, params["vit"])
    sd["visual_encoder.patch_embed.proj.weight"] = \
        vit["patch_embed"]["w"].T.reshape(v.d_model, 3, P, P)
    sd["visual_encoder.patch_embed.proj.bias"] = vit["patch_embed"]["b"]
    sd["visual_encoder.cls_token"] = vit["cls_token"].reshape(1, 1, -1)
    sd["visual_encoder.pos_embed"] = vit["pos_embed"][None]
    sd["ln_vision.weight"] = vit["post_ln"]["scale"]
    sd["ln_vision.bias"] = vit["post_ln"]["bias"]
    for i in range(v.n_layers):
        p = f"visual_encoder.blocks.{i}."
        L = jax.tree.map(lambda t: np.asarray(t[i]), params["vit"]["layers"])
        sd[p + "norm1.weight"] = L["ln1"]["scale"]
        sd[p + "norm1.bias"] = L["ln1"]["bias"]
        sd[p + "attn.qkv.weight"] = L["qkv"]["w"].T
        d = v.d_model
        sd[p + "attn.q_bias"] = L["qkv"]["b"][:d]
        sd[p + "attn.v_bias"] = L["qkv"]["b"][2 * d:]
        sd[p + "attn.proj.weight"] = L["o"]["w"].T
        sd[p + "attn.proj.bias"] = L["o"]["b"]
        sd[p + "norm2.weight"] = L["ln2"]["scale"]
        sd[p + "norm2.bias"] = L["ln2"]["bias"]
        sd[p + "mlp.fc1.weight"] = L["fc1"]["w"].T
        sd[p + "mlp.fc1.bias"] = L["fc1"]["b"]
        sd[p + "mlp.fc2.weight"] = L["fc2"]["w"].T
        sd[p + "mlp.fc2.bias"] = L["fc2"]["b"]
    q = cfg.qformer
    qp = jax.tree.map(np.asarray, params["qformer"])
    sd["query_tokens"] = qp["query_tokens"][None]
    sd["Qformer.bert.embeddings.LayerNorm.weight"] = qp["embed_ln"]["scale"]
    sd["Qformer.bert.embeddings.LayerNorm.bias"] = qp["embed_ln"]["bias"]
    for i, L in enumerate(qp["layers"]):
        p = f"Qformer.bert.encoder.layer.{i}."

        def put_attn(ap, a):
            sd[ap + "self.query.weight"] = a["q"]["w"].T
            sd[ap + "self.query.bias"] = a["q"]["b"]
            sd[ap + "self.key.weight"] = a["k"]["w"].T
            sd[ap + "self.key.bias"] = a["k"]["b"]
            sd[ap + "self.value.weight"] = a["v"]["w"].T
            sd[ap + "self.value.bias"] = a["v"]["b"]
            sd[ap + "output.dense.weight"] = a["o"]["w"].T
            sd[ap + "output.dense.bias"] = a["o"]["b"]
            sd[ap + "output.LayerNorm.weight"] = a["ln"]["scale"]
            sd[ap + "output.LayerNorm.bias"] = a["ln"]["bias"]

        put_attn(p + "attention.", L["self_attn"])
        if "cross_attn" in L:
            put_attn(p + "crossattention.", L["cross_attn"])
        sd[p + "intermediate_query.dense.weight"] = L["fc1"]["w"].T
        sd[p + "intermediate_query.dense.bias"] = L["fc1"]["b"]
        sd[p + "output_query.dense.weight"] = L["fc2"]["w"].T
        sd[p + "output_query.dense.bias"] = L["fc2"]["b"]
        sd[p + "output_query.LayerNorm.weight"] = L["mlp_ln"]["scale"]
        sd[p + "output_query.LayerNorm.bias"] = L["mlp_ln"]["bias"]
    proj = jax.tree.map(np.asarray, params["projection"])
    sd["llama_proj.weight"] = proj["w"].T
    sd["llama_proj.bias"] = proj["b"]
    dcfg = cfg.decoder
    dp = jax.tree.map(np.asarray, params["decoder"])
    sd["llama_model.model.embed_tokens.weight"] = dp["embed_tokens"]
    sd["llama_model.model.norm.weight"] = dp["final_norm"]["scale"]
    if "lm_head" in dp:
        sd["llama_model.lm_head.weight"] = dp["lm_head"].T
    names = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
             "v": "self_attn.v_proj", "o": "self_attn.o_proj",
             "gate": "mlp.gate_proj", "up": "mlp.up_proj",
             "down": "mlp.down_proj"}
    for i in range(dcfg.n_layers):
        p = f"llama_model.model.layers.{i}."
        sd[p + "input_layernorm.weight"] = dp["layers"]["ln1"]["scale"][i]
        sd[p + "post_attention_layernorm.weight"] = dp["layers"]["ln2"]["scale"][i]
        for ours, theirs in names.items():
            sd[p + theirs + ".weight"] = dp["layers"][ours]["w"][i].T
    return sd


def tree_shapes(t):
    return jax.tree.map(lambda x: tuple(x.shape), t)


class TestMiniGPT4Converter:
    def test_round_trip(self):
        cfg = tiny_minigpt4_config()
        params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
        sd = sd_from_params(params, cfg)
        got = C.convert_minigpt4(sd, cfg)
        flat_a, tree_a = jax.tree_util.tree_flatten_with_path(params)
        flat_b, tree_b = jax.tree_util.tree_flatten_with_path(got)
        assert tree_a == tree_b
        for (pa, a), (_, b) in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=str(pa))

    def test_vt_range_splice(self):
        """Vision tokens occupy [1, 33) of the full layout (vt_range
        [1,33], minigpt4.py:78) — after BOS, spliced at <ImageHere>."""
        from devqa_tpu.core.tokenizer import ToyTokenizer
        from devqa_tpu.core.wrapper import JaxVLLM
        from devqa_tpu.data.images import SyntheticImageProvider

        cfg = tiny_minigpt4_config()
        assert cfg.vt_range == (1, 1 + cfg.n_img_tokens)
        params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
        vllm = JaxVLLM(cfg, params, ToyTokenizer(vocab_size=cfg.decoder.vocab_size),
                       SyntheticImageProvider(cfg.vit.image_size),
                       bucket_multiple=8)
        qb = vllm.encode_queries(["<ImageHere>\nwhat is this"], ["img.jpg"],
                                 ["cat"])
        lo, hi = cfg.vt_range
        img_tokens, _ = vllm.encode_images(["img.jpg"])
        np.testing.assert_allclose(
            np.asarray(qb.embeds[0, lo:hi]), np.asarray(img_tokens[0]),
            rtol=1e-5, atol=1e-5)
        assert np.asarray(qb.kv_valid)[0, lo:hi].all()
        # no-image row masks the slot off
        qb2 = vllm.encode_queries(["what is this"], [None], ["cat"])
        assert not np.asarray(qb2.kv_valid)[0, lo:hi].any()


class TestConvertedCheckpointRoundTrip:
    def test_save_load_converted(self, tmp_path):
        """cli/convert.py's orbax format round-trips the param pytree and
        the registry's marker/loader recognize it."""
        from devqa_tpu.cli.convert import (is_converted_dir, load_converted,
                                           save_converted)

        cfg = V.tiny_vllm_config("opt")
        params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
        out = str(tmp_path / "conv")
        save_converted(params, cfg.name, out)
        assert is_converted_dir(out) and not is_converted_dir(str(tmp_path))
        got, meta = load_converted(out)
        assert meta["model"] == cfg.name
        fa, ta = jax.tree_util.tree_flatten_with_path(params)
        fb, tb = jax.tree_util.tree_flatten_with_path(got)
        assert ta == tb
        for (pa, a), (_, b) in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(pa))


class TestPosEmbedInterpolation:
    def test_eva_pos_interpolated_to_target_grid(self):
        """A checkpoint saved at a different image size converts with its
        grid position embeddings bicubically resized (the reference's
        interpolate_pos_embed on EVA load)."""
        from devqa_tpu.core.convert_hf import interpolate_pos_embed

        d = 8
        src_grid = 4
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.normal(size=(1 + src_grid ** 2, d)),
                          jnp.float32)
        out = interpolate_pos_embed(pos, 1 + 8 ** 2, has_cls=True)
        assert out.shape == (65, d)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(pos[0]))
        # identity when sizes already match
        same = interpolate_pos_embed(pos, pos.shape[0], has_cls=True)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))


class TestLlamaVariantConverters:
    def test_baichuan_w_pack_round_trip(self):
        """Baichuan fuses qkv as W_pack; converter splits the thirds."""
        from devqa_tpu.core import decoder as dec

        cfg = dec.DecoderConfig(
            arch="llama", vocab_size=64, d_model=16, n_layers=2, n_heads=2,
            d_ffn=32, activation="silu", tie_word_embeddings=False,
            max_positions=32)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(5))
        sd = {}
        dp = jax.tree.map(np.asarray, params)
        sd["model.embed_tokens.weight"] = dp["embed_tokens"]
        sd["model.norm.weight"] = dp["final_norm"]["scale"]
        sd["lm_head.weight"] = dp["lm_head"].T
        for i in range(cfg.n_layers):
            p = f"model.layers.{i}."
            L = dp["layers"]
            sd[p + "input_layernorm.weight"] = L["ln1"]["scale"][i]
            sd[p + "post_attention_layernorm.weight"] = L["ln2"]["scale"][i]
            sd[p + "self_attn.W_pack.weight"] = np.concatenate(
                [L["q"]["w"][i].T, L["k"]["w"][i].T, L["v"]["w"][i].T])
            sd[p + "self_attn.o_proj.weight"] = L["o"]["w"][i].T
            sd[p + "mlp.gate_proj.weight"] = L["gate"]["w"][i].T
            sd[p + "mlp.up_proj.weight"] = L["up"]["w"][i].T
            sd[p + "mlp.down_proj.weight"] = L["down"]["w"][i].T
        got = C.convert_baichuan(sd, cfg)
        fa, ta = jax.tree_util.tree_flatten_with_path(params)
        fb, tb = jax.tree_util.tree_flatten_with_path(got)
        assert ta == tb
        for (pa, a), (_, b) in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, err_msg=str(pa))

    def test_internlm_biases_present(self):
        from devqa_tpu.core import decoder as dec

        cfg = dec.internlm_7b_config()
        shapes = jax.eval_shape(
            lambda k: dec.init_decoder_params(cfg, k), jax.random.PRNGKey(0))
        assert "b" in shapes["layers"]["q"] and "b" in shapes["layers"]["o"]


class TestFullSizeDry:
    """Converter × full-size checkpoint layout, zero weight memory."""

    def _check(self, manifest, convert, cfg):
        got = jax.eval_shape(lambda sd: convert(sd, cfg), manifest)
        want = jax.eval_shape(
            lambda k: V.init_vllm_params(cfg, k), jax.random.PRNGKey(0))
        ga, ta = jax.tree_util.tree_flatten_with_path(tree_shapes(got))
        wa, tb = jax.tree_util.tree_flatten_with_path(tree_shapes(want))
        assert ta == tb
        for (pa, a), (_, b) in zip(ga, wa):
            assert a == b, (pa, a, b)

    def _hf_manifest(self, model):
        return {k: jax.ShapeDtypeStruct(tuple(v.shape), jnp.float32)
                for k, v in model.state_dict().items()}

    def test_blip2_full(self):
        import transformers
        from accelerate import init_empty_weights

        # Salesforce/blip2-opt-2.7b layout: default vision+qformer configs,
        # OPT-2.7b text config (HF's default text_config is opt-125m-sized).
        cfg = transformers.Blip2Config(
            text_config=transformers.OPTConfig(
                hidden_size=2560, ffn_dim=10240, num_hidden_layers=32,
                num_attention_heads=32, vocab_size=50272).to_dict())
        with init_empty_weights():
            hf = transformers.Blip2ForConditionalGeneration(cfg)
        self._check(self._hf_manifest(hf), C.convert_blip2,
                    V.blip2_opt_2_7b_config())

    def test_llava_full(self):
        import transformers
        from accelerate import init_empty_weights

        # llava-hf/llava-1.5-7b layout: CLIP ViT-L/14-336 + Vicuna-7b.
        cfg = transformers.LlavaConfig(
            vision_config=transformers.CLIPVisionConfig(
                hidden_size=1024, intermediate_size=4096,
                num_hidden_layers=24, num_attention_heads=16,
                image_size=336, patch_size=14).to_dict(),
            text_config=transformers.LlamaConfig(
                hidden_size=4096, intermediate_size=11008,
                num_hidden_layers=32, num_attention_heads=32,
                vocab_size=32000).to_dict())
        with init_empty_weights():
            hf = transformers.LlavaForConditionalGeneration(cfg)
        self._check(self._hf_manifest(hf), C.convert_llava,
                    V.llava_v15_7b_config())

    def test_minigpt4_full(self):
        cfg = V.minigpt4_vicuna_7b_config()
        self._check(C.minigpt4_manifest(cfg), C.convert_minigpt4, cfg)

    def test_glm_full(self):
        """GLM-4-9b decoder layout (ChatGLM lineage, official HF port):
        fused gate_up split + biased GQA projections at full size."""
        import transformers
        from accelerate import init_empty_weights

        from devqa_tpu.core import decoder as dec

        cfg = dec.glm_4_9b_config()
        hf_cfg = transformers.GlmConfig(
            vocab_size=151552, hidden_size=4096, intermediate_size=13696,
            num_hidden_layers=40, num_attention_heads=32,
            num_key_value_heads=2, head_dim=128, attention_bias=True,
            partial_rotary_factor=0.5, tie_word_embeddings=False)
        with init_empty_weights():
            hf = transformers.GlmForCausalLM(hf_cfg)
        manifest = self._hf_manifest(hf)
        got = jax.eval_shape(lambda sd: C.convert_glm(sd, cfg), manifest)
        want = jax.eval_shape(
            lambda k: dec.init_decoder_params(cfg, k), jax.random.PRNGKey(0))
        ga, ta = jax.tree_util.tree_flatten_with_path(tree_shapes(got))
        wa, tb = jax.tree_util.tree_flatten_with_path(tree_shapes(want))
        assert ta == tb
        for (pa, a), (_, b) in zip(ga, wa):
            assert a == b, (pa, a, b)

"""mPLUG-Owl2 full composition: vision tower → abstractor → modality-
adaptive decoder, converter round-trip, harness + editor integration.

Reference: mplug_owl2/model/visual_encoder.py (vision + abstractor),
modeling_mplug_owl2.py (encode_images :60-63, modality assembly :84-120),
modeling_llama2.py (MultiwayNetwork).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import write_records

from devqa_tpu.core import convert_hf as C
from devqa_tpu.core import vllm as V
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.core.wrapper import JaxVLLM
from devqa_tpu.data.images import SyntheticImageProvider


@pytest.fixture(scope="module")
def owl2():
    cfg = V.tiny_owl2_vllm_config()
    params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
    vllm = JaxVLLM(cfg, params, ToyTokenizer(vocab_size=cfg.decoder.vocab_size),
                   SyntheticImageProvider(cfg.vit.image_size),
                   bucket_multiple=8)
    return cfg, params, vllm


class TestOwl2Forward:
    def test_end_to_end_batch(self, owl2):
        cfg, params, vllm = owl2
        qb = vllm.encode_queries(
            ["<|image|>\nwhat is this", "text only question"],
            ["img.jpg", None], ["cat", "dog"])
        logits = np.asarray(vllm.logits(qb.embeds, qb.kv_valid))
        assert np.isfinite(logits).all()
        lo, hi = cfg.vt_range
        # vision block occupies the slot for the image row
        img_tokens, _ = vllm.encode_images(["img.jpg"])
        np.testing.assert_allclose(np.asarray(qb.embeds[0, lo:hi]),
                                   np.asarray(img_tokens[0]),
                                   rtol=1e-5, atol=1e-5)
        assert not np.asarray(qb.kv_valid)[1, lo:hi].any()

    def test_vision_tokens_count(self, owl2):
        """64 abstractor queries + vit_eos → n_queries+1 vision tokens
        (visual_encoder.py:911-912)."""
        cfg, params, vllm = owl2
        toks, _ = vllm.encode_images(["a.jpg"])
        assert toks.shape[1] == cfg.abstractor.n_queries + 1 == cfg.n_img_tokens

    def test_multiway_routes_vision_tokens(self, owl2):
        """Perturbing the visual-way k changes image-row logits but leaves
        a text-only row untouched (its vision slots are masked)."""
        cfg, params, vllm = owl2
        qb = vllm.encode_queries(
            ["<|image|>\nwhat is this", "text only question"],
            ["img.jpg", None], ["cat", "dog"])
        base = np.asarray(vllm.logits(qb.embeds, qb.kv_valid))
        p2 = jax.tree_util.tree_map(lambda x: x, params)
        p2 = {**p2, "decoder": {**p2["decoder"], "layers": {
            **p2["decoder"]["layers"],
            "k_vis": {"w": p2["decoder"]["layers"]["k_vis"]["w"] + 0.5}}}}
        pert = np.asarray(vllm.logits(qb.embeds, qb.kv_valid, params=p2))
        valid = np.asarray(qb.kv_valid)
        assert not np.allclose(base[0][valid[0] == 1], pert[0][valid[0] == 1])
        np.testing.assert_allclose(base[1][valid[1] == 1],
                                   pert[1][valid[1] == 1],
                                   rtol=1e-5, atol=1e-5)

    def test_mlp_intervention_on_shared_mlp(self, owl2):
        """Editors intervene on the shared MLP through the same typed
        intervention point as the other arches."""
        cfg, params, vllm = owl2
        from devqa_tpu.core.vllm import vllm_logits

        qb = vllm.encode_queries(["<|image|>\nq"], ["i.jpg"], ["a"])
        base = np.asarray(vllm.logits(qb.embeds, qb.kv_valid))
        out = vllm_logits(params, cfg, qb.embeds, qb.kv_valid,
                          mlp_residual=(2, lambda x: x * 0.1))
        assert not np.allclose(base, np.asarray(out))

    def test_hidden_at_resume_consistency(self, owl2):
        cfg, params, vllm = owl2
        qb = vllm.encode_queries(["<|image|>\nq"], ["i.jpg"], ["a"])
        h = vllm.hidden_at(qb.embeds, qb.kv_valid, 1)
        resumed = np.asarray(vllm.resume_from(h, qb.kv_valid, 1))
        full = np.asarray(vllm.logits(qb.embeds, qb.kv_valid))
        np.testing.assert_allclose(resumed, full, rtol=2e-5, atol=2e-5)


class TestOwl2Converter:
    def test_round_trip(self):
        cfg = V.tiny_owl2_vllm_config()
        params = V.init_vllm_params(cfg, jax.random.PRNGKey(1))
        sd = owl2_sd_from_params(params, cfg)
        got = C.convert_mplug_owl2(sd, cfg)
        fa, ta = jax.tree_util.tree_flatten_with_path(params)
        fb, tb = jax.tree_util.tree_flatten_with_path(got)
        assert ta == tb
        for (pa, a), (_, b) in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6, err_msg=str(pa))

    def test_full_size_dry(self):
        cfg = V.mplug_owl2_llama2_7b_config()
        got = jax.eval_shape(lambda sd: C.convert_mplug_owl2(sd, cfg),
                             C.mplug_owl2_manifest(cfg))
        want = jax.eval_shape(lambda k: V.init_vllm_params(cfg, k),
                              jax.random.PRNGKey(0))
        sa = jax.tree.map(lambda x: tuple(x.shape), got)
        sb = jax.tree.map(lambda x: tuple(x.shape), want)
        fa, ta = jax.tree_util.tree_flatten_with_path(sa)
        fb, tb = jax.tree_util.tree_flatten_with_path(sb)
        assert ta == tb
        for (pa, a), (_, b) in zip(fa, fb):
            assert a == b, (pa, a, b)


class TestOwl2Harness:
    def test_txi_harness_and_ft_editor(self, owl2, tmp_path):
        from devqa_tpu.data.schema import EVQA
        from devqa_tpu.editors.ft_vl import FTvl, FTvlConfig
        from devqa_tpu.eval.harness import EditorEvaluation
        from devqa_tpu.retrieval.store import hash_encoder

        cfg, params, vllm = owl2
        path, _ = write_records(str(tmp_path), 3)
        data = EVQA(path, str(tmp_path), encoder=hash_encoder(8))
        ed = FTvl(vllm, FTvlConfig(
            edit_model_name=cfg.name,
            rewrite_module_tmp="model.layers.{}.mlp.down_proj.weight",
            layers=(3,), num_steps=4, lr=1e-2))
        ev = EditorEvaluation(ed, data, "OWL2-TEST", str(tmp_path / "res"))
        res = ev.evaluate_sequential_edit(edit_n=3)
        rd = res[0][0]
        assert set(rd) == {"reliability", "generality", "locality"}
        assert set(rd["locality"]) >= {"text_loc", "t1i2", "t3i1"}


def owl2_sd_from_params(params, cfg):
    """Inverse of convert_mplug_owl2 for a tiny param tree (incl. the
    head-major qkv interleave)."""
    sd = {}
    v = cfg.vit
    d, nh = v.d_model, v.n_heads
    hd = d // nh
    P = v.patch_size
    vit = jax.tree.map(np.asarray, params["vit"])
    vp = "model.vision_model."
    sd[vp + "embeddings.patch_embed.weight"] = \
        vit["patch_embed"]["w"].T.reshape(d, 3, P, P)
    sd[vp + "embeddings.cls_token"] = vit["cls_token"].reshape(1, 1, -1)
    sd[vp + "embeddings.position_embedding"] = vit["pos_embed"][None]
    sd[vp + "embeddings.pre_layernorm.weight"] = vit["pre_ln"]["scale"]
    sd[vp + "embeddings.pre_layernorm.bias"] = vit["pre_ln"]["bias"]
    sd[vp + "post_layernorm.weight"] = vit["post_ln"]["scale"]
    sd[vp + "post_layernorm.bias"] = vit["post_ln"]["bias"]
    for i in range(v.n_layers):
        p = f"{vp}encoder.layers.{i}."
        L = jax.tree.map(lambda t: np.asarray(t[i]), params["vit"]["layers"])
        sd[p + "input_layernorm.weight"] = L["ln1"]["scale"]
        sd[p + "input_layernorm.bias"] = L["ln1"]["bias"]
        # ours [d, 3d(3,h,hd)] → torch [3d(h,3,hd), d]
        w = L["qkv"]["w"].T.reshape(3, nh, hd, d).transpose(1, 0, 2, 3)
        b = L["qkv"]["b"].reshape(3, nh, hd).transpose(1, 0, 2)
        sd[p + "self_attn.query_key_value.weight"] = w.reshape(3 * d, d)
        sd[p + "self_attn.query_key_value.bias"] = b.reshape(3 * d)
        sd[p + "self_attn.dense.weight"] = L["o"]["w"].T
        sd[p + "self_attn.dense.bias"] = L["o"]["b"]
        sd[p + "post_attention_layernorm.weight"] = L["ln2"]["scale"]
        sd[p + "post_attention_layernorm.bias"] = L["ln2"]["bias"]
        sd[p + "mlp.fc1.weight"] = L["fc1"]["w"].T
        sd[p + "mlp.fc1.bias"] = L["fc1"]["b"]
        sd[p + "mlp.fc2.weight"] = L["fc2"]["w"].T
        sd[p + "mlp.fc2.bias"] = L["fc2"]["b"]
    a = cfg.abstractor
    ap = "model.visual_abstractor."
    ab = jax.tree.map(np.asarray, params["abstractor"])
    sd[ap + "query_embeds"] = ab["query_embeds"][None]
    sd[ap + "visual_fc.weight"] = ab["visual_fc"]["w"].T
    sd[ap + "visual_fc.bias"] = ab["visual_fc"]["b"]
    sd[ap + "vit_eos"] = ab["vit_eos"].reshape(1, 1, -1)
    for i in range(a.n_layers):
        p = f"{ap}encoder.layers.{i}.crossattention."
        L = jax.tree.map(lambda t: np.asarray(t[i]),
                         params["abstractor"]["layers"])
        for ln, theirs in (("norm1", "norm1"), ("normk", "normk")):
            sd[p + theirs + ".weight"] = L[ln]["scale"]
            sd[p + theirs + ".bias"] = L[ln]["bias"]
        for ours, theirs in (("q", "attention.query"), ("k", "attention.key"),
                             ("v", "attention.value"),
                             ("o", "output.out_proj")):
            sd[p + theirs + ".weight"] = L[ours]["w"].T
            sd[p + theirs + ".bias"] = L[ours]["b"]
        sd[p + "output.norm2.weight"] = L["norm2"]["scale"]
        sd[p + "output.norm2.bias"] = L["norm2"]["bias"]
        for w in ("w1", "w2", "w3"):
            sd[p + f"output.mlp.{w}.weight"] = L[w]["w"].T
            sd[p + f"output.mlp.{w}.bias"] = L[w]["b"]
        sd[p + "output.mlp.ffn_ln.weight"] = L["ffn_ln"]["scale"]
        sd[p + "output.mlp.ffn_ln.bias"] = L["ffn_ln"]["bias"]
    dcfg = cfg.decoder
    dp = jax.tree.map(np.asarray, params["decoder"])
    sd["model.embed_tokens.weight"] = dp["embed_tokens"]
    sd["model.norm.weight"] = dp["final_norm"]["scale"]
    sd["lm_head.weight"] = dp["lm_head"].T
    for i in range(dcfg.n_layers):
        p = f"model.layers.{i}."
        Ld = dp["layers"]
        sd[p + "input_layernorm.multiway.0.weight"] = Ld["ln1"]["scale"][i]
        sd[p + "input_layernorm.multiway.1.weight"] = Ld["ln1_vis"]["scale"][i]
        sd[p + "post_attention_layernorm.multiway.0.weight"] = Ld["ln2"]["scale"][i]
        sd[p + "post_attention_layernorm.multiway.1.weight"] = Ld["ln2_vis"]["scale"][i]
        sd[p + "self_attn.q_proj.weight"] = Ld["q"]["w"][i].T
        sd[p + "self_attn.k_proj.multiway.0.weight"] = Ld["k"]["w"][i].T
        sd[p + "self_attn.k_proj.multiway.1.weight"] = Ld["k_vis"]["w"][i].T
        sd[p + "self_attn.v_proj.multiway.0.weight"] = Ld["v"]["w"][i].T
        sd[p + "self_attn.v_proj.multiway.1.weight"] = Ld["v_vis"]["w"][i].T
        sd[p + "self_attn.o_proj.weight"] = Ld["o"]["w"][i].T
        sd[p + "mlp.gate_proj.weight"] = Ld["gate"]["w"][i].T
        sd[p + "mlp.up_proj.weight"] = Ld["up"]["w"][i].T
        sd[p + "mlp.down_proj.weight"] = Ld["down"]["w"][i].T
    return sd

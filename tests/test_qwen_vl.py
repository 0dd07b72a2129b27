"""Qwen-VL backbone: tower (no cls) + attention-pool resampler + Qwen
decoder (llama block + qkv bias). The reference includes this backbone
via trust_remote_code only (trainer/models.py:113); layout follows the
public Qwen-VL module (see core/resampler.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import write_records

from devqa_tpu.core import convert_hf as C
from devqa_tpu.core import resampler as res_mod
from devqa_tpu.core import vit as vit_mod
from devqa_tpu.core import decoder as dec
from devqa_tpu.core import vllm as V
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.core.wrapper import JaxVLLM
from devqa_tpu.data.images import SyntheticImageProvider


def tiny_qwen_vl_config() -> V.VLLMConfig:
    vit_cfg = vit_mod.ViTConfig(
        image_size=16, patch_size=4, d_model=32, n_layers=2, n_heads=2,
        d_ffn=64, activation="gelu", fused_qkv=True, pre_layernorm=True,
        use_cls_token=False)
    r_cfg = res_mod.ResamplerConfig(grid_size=2, d_model=32, n_heads=2,
                                    kv_dim=32, vit_grid=4, out_dim=32)
    dcfg = dec.DecoderConfig(
        arch="llama", vocab_size=512, d_model=32, n_layers=3, n_heads=2,
        d_ffn=64, activation="silu", tie_word_embeddings=False,
        max_positions=128, attn_bias=True)
    return V.VLLMConfig(
        name="tiny-qwen-vl", bridge="resampler", img_slot_pos=0,
        n_img_tokens=r_cfg.n_queries, vit=vit_cfg, qformer=None,
        resampler=r_cfg, decoder=dcfg, img_special_token="<img>")


@pytest.fixture(scope="module")
def qvl():
    cfg = tiny_qwen_vl_config()
    params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
    vllm = JaxVLLM(cfg, params, ToyTokenizer(vocab_size=cfg.decoder.vocab_size),
                   SyntheticImageProvider(cfg.vit.image_size),
                   bucket_multiple=8)
    return cfg, params, vllm


class TestQwenVLForward:
    def test_end_to_end(self, qvl):
        cfg, params, vllm = qvl
        qb = vllm.encode_queries(["<img>\nwhat is it", "plain text"],
                                 ["a.jpg", None], ["cat", "dog"])
        logits = np.asarray(vllm.logits(qb.embeds, qb.kv_valid))
        assert np.isfinite(logits).all()
        toks, _ = vllm.encode_images(["a.jpg"])
        assert toks.shape[1] == cfg.resampler.n_queries == cfg.n_img_tokens

    def test_harness_runs(self, qvl, tmp_path):
        from devqa_tpu.data.schema import EVQA
        from devqa_tpu.editors.null import NullEditor
        from devqa_tpu.eval.harness import EditorEvaluation
        from devqa_tpu.retrieval.store import hash_encoder

        cfg, params, vllm = qvl
        path, _ = write_records(str(tmp_path), 2)
        data = EVQA(path, str(tmp_path), encoder=hash_encoder(8))
        ev = EditorEvaluation(NullEditor(vllm), data, "QVL",
                              str(tmp_path / "res"))
        res = ev.evaluate_sequential_edit(edit_n=2)
        assert set(res[0][0]) == {"reliability", "generality", "locality"}

    def test_kv_cached_generation(self, qvl):
        """The Qwen decoder is llama-family → cached decode applies."""
        from devqa_tpu.serve.worker import ModelWorker

        cfg, params, vllm = qvl
        w = ModelWorker(vllm)
        out = w.generate("what is it", image="b.jpg", max_new_tokens=3)
        assert isinstance(out, str)


class TestQwenVLConverter:
    def test_round_trip(self):
        cfg = tiny_qwen_vl_config()
        params = V.init_vllm_params(cfg, jax.random.PRNGKey(2))
        sd = qwen_sd_from_params(params, cfg)
        got = C.convert_qwen_vl(sd, cfg)
        fa, ta = jax.tree_util.tree_flatten_with_path(params)
        fb, tb = jax.tree_util.tree_flatten_with_path(got)
        assert ta == tb
        for (pa, a), (_, b) in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6, err_msg=str(pa))

    def test_full_size_dry(self):
        cfg = V.qwen_vl_7b_config()
        got = jax.eval_shape(lambda sd: C.convert_qwen_vl(sd, cfg),
                             C.qwen_vl_manifest(cfg))
        want = jax.eval_shape(lambda k: V.init_vllm_params(cfg, k),
                              jax.random.PRNGKey(0))
        sa = jax.tree.map(lambda x: tuple(x.shape), got)
        sb = jax.tree.map(lambda x: tuple(x.shape), want)
        fa, ta = jax.tree_util.tree_flatten_with_path(sa)
        fb, tb = jax.tree_util.tree_flatten_with_path(sb)
        assert ta == tb
        for (pa, a), (_, b) in zip(fa, fb):
            assert a == b, (pa, a, b)


def qwen_sd_from_params(params, cfg):
    """Inverse of convert_qwen_vl for a tiny param tree. The inert tower
    post_ln must stay identity for an exact round trip."""
    sd = {}
    v = cfg.vit
    d = v.d_model
    P = v.patch_size
    vp = "transformer.visual."
    vit = jax.tree.map(np.asarray, params["vit"])
    sd[vp + "conv1.weight"] = vit["patch_embed"]["w"].T.reshape(d, 3, P, P)
    sd[vp + "positional_embedding"] = vit["pos_embed"]
    sd[vp + "ln_pre.weight"] = vit["pre_ln"]["scale"]
    sd[vp + "ln_pre.bias"] = vit["pre_ln"]["bias"]
    for i in range(v.n_layers):
        p = f"{vp}transformer.resblocks.{i}."
        L = jax.tree.map(lambda t: np.asarray(t[i]), params["vit"]["layers"])
        sd[p + "ln_1.weight"] = L["ln1"]["scale"]
        sd[p + "ln_1.bias"] = L["ln1"]["bias"]
        sd[p + "attn.in_proj_weight"] = L["qkv"]["w"].T
        sd[p + "attn.in_proj_bias"] = L["qkv"]["b"]
        sd[p + "attn.out_proj.weight"] = L["o"]["w"].T
        sd[p + "attn.out_proj.bias"] = L["o"]["b"]
        sd[p + "ln_2.weight"] = L["ln2"]["scale"]
        sd[p + "ln_2.bias"] = L["ln2"]["bias"]
        sd[p + "mlp.c_fc.weight"] = L["fc1"]["w"].T
        sd[p + "mlp.c_fc.bias"] = L["fc1"]["b"]
        sd[p + "mlp.c_proj.weight"] = L["fc2"]["w"].T
        sd[p + "mlp.c_proj.bias"] = L["fc2"]["b"]
    r = cfg.resampler
    rp = jax.tree.map(np.asarray, params["resampler"])
    sd[vp + "attn_pool.query"] = rp["query"]
    sd[vp + "attn_pool.kv_proj.weight"] = rp["kv_proj"]["w"].T
    sd[vp + "attn_pool.ln_q.weight"] = rp["ln_q"]["scale"]
    sd[vp + "attn_pool.ln_q.bias"] = rp["ln_q"]["bias"]
    sd[vp + "attn_pool.ln_kv.weight"] = rp["ln_kv"]["scale"]
    sd[vp + "attn_pool.ln_kv.bias"] = rp["ln_kv"]["bias"]
    sd[vp + "attn_pool.attn.in_proj_weight"] = np.concatenate(
        [rp["attn"]["q"]["w"].T, rp["attn"]["k"]["w"].T,
         rp["attn"]["v"]["w"].T])
    sd[vp + "attn_pool.attn.in_proj_bias"] = np.concatenate(
        [rp["attn"]["q"]["b"], rp["attn"]["k"]["b"], rp["attn"]["v"]["b"]])
    sd[vp + "attn_pool.attn.out_proj.weight"] = rp["attn"]["o"]["w"].T
    sd[vp + "attn_pool.attn.out_proj.bias"] = rp["attn"]["o"]["b"]
    sd[vp + "ln_post.weight"] = rp["ln_post"]["scale"]
    sd[vp + "ln_post.bias"] = rp["ln_post"]["bias"]
    sd[vp + "proj"] = rp["proj"]
    dcfg = cfg.decoder
    dp = jax.tree.map(np.asarray, params["decoder"])
    sd["transformer.wte.weight"] = dp["embed_tokens"]
    sd["transformer.ln_f.weight"] = dp["final_norm"]["scale"]
    sd["lm_head.weight"] = dp["lm_head"].T
    for i in range(dcfg.n_layers):
        p = f"transformer.h.{i}."
        Ld = dp["layers"]
        sd[p + "ln_1.weight"] = Ld["ln1"]["scale"][i]
        sd[p + "ln_2.weight"] = Ld["ln2"]["scale"][i]
        sd[p + "attn.c_attn.weight"] = np.concatenate(
            [Ld["q"]["w"][i].T, Ld["k"]["w"][i].T, Ld["v"]["w"][i].T])
        sd[p + "attn.c_attn.bias"] = np.concatenate(
            [Ld["q"]["b"][i], Ld["k"]["b"][i], Ld["v"]["b"][i]])
        sd[p + "attn.c_proj.weight"] = Ld["o"]["w"][i].T
        sd[p + "mlp.w2.weight"] = Ld["gate"]["w"][i].T
        sd[p + "mlp.w1.weight"] = Ld["up"]["w"][i].T
        sd[p + "mlp.c_proj.weight"] = Ld["down"]["w"][i].T
    return sd

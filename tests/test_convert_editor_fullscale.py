"""Full-scale editor-checkpoint interop (VERDICT r1 #8).

Round-trips reference-schema torch 'Best' checkpoints at the REAL config
dimensions (configs/<editor>/blip2-opt-2.7b.yaml: module_dim 1024,
llm_mid_dim 2560; MEND aux rank 1920 over (2560,10240) shapes; SERAC
BERT-base classifier + OPT-125m counterfactual) through
editors/convert_reference.py, so loading an actually-trained reference
checkpoint in a weights-available environment is de-risked: every key
name, transpose and grouping is exercised at full width with random
values (zeros would hide transposes). Reference schema:
editor/vllm_editors/base.py:237-255 {'train_modules': {name: sd}, ...}.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from devqa_tpu.editors import convert_reference as CR


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def assert_trees_equal(a, b, rtol=1e-6):
    fa, ta = jax.tree_util.tree_flatten_with_path(a)
    fb, tb = jax.tree_util.tree_flatten_with_path(b)
    assert ta == tb
    for (pa, x), (_, y) in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol,
                                   err_msg=str(pa))


class TestLiveEditFullScale:
    def test_round_trip_blip2_dims(self, tmp_path):
        from test_convert_reference import _lowrank_sd, _qv_sd

        from devqa_tpu.editors.liveedit import (LiveEditConfig,
                                                init_liveedit_params)

        lcfg = LiveEditConfig.from_yaml(
            os.path.join(REPO, "configs/liveedit/blip2-opt-2.7b.yaml"))
        assert lcfg.llm_mid_dim == 2560
        assert lcfg.retrieval_editor.module_dim == 1024
        params = init_liveedit_params(lcfg, 32, jax.random.PRNGKey(0))
        tm = {
            "edit_extractor": _qv_sd(params["edit_extractor"]),
            "inpt_extractor": _qv_sd(params["inpt_extractor"]),
            "moegen_c": _lowrank_sd(params["moegen_c"]),
            "moegen_r": _lowrank_sd(params["moegen_r"]),
            "instant_reps_norm": {
                "weight": _t(params["instant_reps_norm"]["scale"]),
                "bias": _t(params["instant_reps_norm"]["bias"])},
        }
        path = str(tmp_path / "Best")
        torch.save({"i": 1, "epoch": 0, "loss": 0.1, "ema_loss": 0.1,
                    "train_modules": tm}, path)
        obj = torch.load(path, map_location="cpu", weights_only=False)
        got = CR.convert_liveedit_train_modules(obj["train_modules"])
        assert_trees_equal(got, params)


class _StubVLLM:
    """MENDvl only reads vllm.cfg at construction time."""

    def __init__(self, cfg):
        self.cfg = cfg


class TestMENDFullScale:
    def test_round_trip_blip2_dims(self, tmp_path):
        from devqa_tpu.core import vllm as V
        from devqa_tpu.editors.mend_vl import MENDvl, MENDvlConfig

        mcfg = MENDvlConfig.from_yaml(
            os.path.join(REPO, "configs/mend_vl/blip2-opt-2.7b.yaml"))
        assert mcfg.aux_model.rank == 1920
        ed = MENDvl(_StubVLLM(V.blip2_opt_2_7b_config()), mcfg, seed=0)
        # shapes: (2560, 10240) for fc1 x3 layers, (10240, 2560) for fc2
        assert set(ed.shapes) == {(2560, 10240), (10240, 2560)}

        # Build the reference torch sd from our params: aux_models keys
        # "(in, out)" with mlp.layers.{i}.{u,v,bias,mode_{scale,shift}
        # .weight} + Welford buffers; flat edit_lrs in shape-group order.
        rng = np.random.default_rng(0)
        aux_sd, norm_want = {}, {}
        for s, group in ed.shapes.items():
            key = str(s)
            aux = ed.params["aux"][key]
            for i, layer in enumerate(aux["layers"]):
                p = f"{key}.mlp.layers.{i}."
                aux_sd[p + "u"] = _t(layer["u"])
                aux_sd[p + "v"] = _t(layer["v"])
                aux_sd[p + "bias"] = _t(layer["bias"])
                aux_sd[p + "mode_scale.weight"] = _t(layer["mode_scale"])
                aux_sd[p + "mode_shift.weight"] = _t(layer["mode_shift"])
            ns = {k: rng.normal(size=np.asarray(v).shape).astype(np.float32)
                  for k, v in ed.norm_state[key].items()}
            ns["k"] = np.float32(rng.integers(1, 100))
            for k, v in ns.items():
                aux_sd[key + "." + k] = _t(v)
            norm_want[key] = ns
        flat = [t for s in ed.shapes for t in ed.shapes[s]]
        lr_sd = {}
        for i, (l, m) in enumerate(flat):
            lr_sd[str(i)] = _t(ed.params["edit_lrs"]["%d.%s" % (l, m)])
        path = str(tmp_path / "Best")
        torch.save({"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": 0.0,
                    "train_modules": {"aux_models": aux_sd,
                                      "edit_lrs": lr_sd}}, path)

        obj = torch.load(path, map_location="cpu", weights_only=False)
        got_params, got_norm = CR.convert_mend_train_modules(
            obj["train_modules"], ed.targets, ed.shape_of,
            mcfg.aux_model.n_hidden)
        assert_trees_equal(got_params, ed.params)
        for key, ns in norm_want.items():
            for k, v in ns.items():
                np.testing.assert_allclose(
                    np.asarray(got_norm[key][k]).reshape(-1),
                    np.asarray(v).reshape(-1), rtol=1e-6)


def _bert_sd(params, cfg, prefix):
    """Inverse of core.bert.convert_hf_bert for shape/value parity."""
    sd = {}

    def put_ln(n, p):
        sd[prefix + n + ".weight"] = _t(p["scale"])
        sd[prefix + n + ".bias"] = _t(p["bias"])

    def put_dense(n, p):
        sd[prefix + n + ".weight"] = _t(np.asarray(p["w"]).T)
        sd[prefix + n + ".bias"] = _t(p["b"])

    sd[prefix + "embeddings.word_embeddings.weight"] = _t(params["tok_embed"])
    sd[prefix + "embeddings.position_embeddings.weight"] = \
        _t(params["pos_embed"])
    sd[prefix + "embeddings.token_type_embeddings.weight"] = \
        _t(params["type_embed"])
    put_ln("embeddings.LayerNorm", params["embed_ln"])
    for i in range(cfg.n_layers):
        L = jax.tree.map(lambda t: np.asarray(t[i]), params["layers"])
        p = f"encoder.layer.{i}."
        put_dense(p + "attention.self.query", L["q"])
        put_dense(p + "attention.self.key", L["k"])
        put_dense(p + "attention.self.value", L["v"])
        put_dense(p + "attention.output.dense", L["o"])
        put_ln(p + "attention.output.LayerNorm", L["attn_ln"])
        put_dense(p + "intermediate.dense", L["fc1"])
        put_dense(p + "output.dense", L["fc2"])
        put_ln(p + "output.LayerNorm", L["mlp_ln"])
    return sd


def _opt_sd(params, cfg, prefix):
    """Inverse of core.convert_hf.convert_opt."""
    sd = {}

    def put_ln(n, p):
        sd[prefix + n + ".weight"] = _t(p["scale"])
        sd[prefix + n + ".bias"] = _t(p["bias"])

    def put_dense(n, p):
        sd[prefix + n + ".weight"] = _t(np.asarray(p["w"]).T)
        sd[prefix + n + ".bias"] = _t(p["b"])

    sd[prefix + "embed_tokens.weight"] = _t(params["embed_tokens"])
    sd[prefix + "embed_positions.weight"] = _t(params["embed_positions"])
    put_ln("final_layer_norm", params["final_norm"])
    for i in range(cfg.n_layers):
        L = jax.tree.map(lambda t: np.asarray(t[i]), params["layers"])
        p = f"layers.{i}."
        put_ln(p + "self_attn_layer_norm", L["ln1"])
        put_dense(p + "self_attn.q_proj", L["q"])
        put_dense(p + "self_attn.k_proj", L["k"])
        put_dense(p + "self_attn.v_proj", L["v"])
        put_dense(p + "self_attn.out_proj", L["o"])
        put_ln(p + "final_layer_norm", L["ln2"])
        put_dense(p + "fc1", L["fc1"])
        put_dense(p + "fc2", L["fc2"])
    return sd


def _resblock_sd(p, prefix, sd):
    sd[prefix + ".l_in_norm.weight"] = _t(p["ln"]["scale"])
    sd[prefix + ".l_in_norm.bias"] = _t(p["ln"]["bias"])
    for name in ("l_in", "l_mid", "l_out"):
        sd[prefix + "." + name + ".weight"] = _t(np.asarray(p[name]["w"]).T)
        sd[prefix + "." + name + ".bias"] = _t(p[name]["b"])


class TestSERACFullScale:
    def test_round_trip_blip2_dims(self, tmp_path):
        """Full BERT-base classifier + OPT-125m counterfactual mapping at
        real dims (the riskiest converter: two whole HF model layouts)."""
        from devqa_tpu.editors.serac_vl import SERACvlConfig, init_serac_params

        scfg = SERACvlConfig.from_yaml(
            os.path.join(REPO, "configs/serac_vl/blip2-opt-2.7b.yaml"))
        assert scfg.llm_hidden_size == 2560
        params = init_serac_params(scfg, jax.random.PRNGKey(0))

        cl_sd = _bert_sd(params["classifier"]["bert"], scfg.classifier,
                         "classifier.")
        _resblock_sd(params["classifier"]["proj"], "classifier_proj", cl_sd)
        cl_sd["ln.weight"] = _t(params["classifier"]["ln"]["scale"])
        cl_sd["ln.bias"] = _t(params["classifier"]["ln"]["bias"])

        cf_sd = _opt_sd(params["counterfact"]["lm"], scfg.counterfact,
                        "counterfact_model.model.decoder.")
        _resblock_sd(params["counterfact"]["proj_in"],
                     "counterfact_model_proj_in", cf_sd)
        _resblock_sd(params["counterfact"]["proj_out"],
                     "counterfact_model_proj_out", cf_sd)

        path = str(tmp_path / "Best")
        torch.save({"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": 0.0,
                    "train_modules": {"classifier": cl_sd,
                                      "counterfact_model": cf_sd}}, path)
        obj = torch.load(path, map_location="cpu", weights_only=False)
        got = CR.convert_serac_train_modules(obj["train_modules"], scfg)
        assert_trees_equal(got, params)

"""Reference-trained editor checkpoint interop (torch 'Best' blobs →
editor param pytrees)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from helpers import make_tiny_vllm

from devqa_tpu.editors.convert_reference import load_reference_editor_ckpt
from devqa_tpu.editors.liveedit import LiveEdit
from devqa_tpu.editors.mend_vl import MENDvl, MENDvlConfig
from test_liveedit import tiny_liveedit_cfg


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _attention_sd(p, prefix, sd):
    for ours, theirs in (("q", "q_mlp"), ("k", "k_mlp"), ("v", "v_mlp")):
        sd[f"{prefix}.{theirs}.weight"] = _t(np.asarray(p[ours]["w"]).T)
        sd[f"{prefix}.{theirs}.bias"] = _t(p[ours]["b"])


def _qv_sd(p):
    sd = {}
    sd["layer_norm1.weight"] = _t(p["ln1"]["scale"])
    sd["layer_norm1.bias"] = _t(p["ln1"]["bias"])
    sd["eqe1"] = _t(p["eqe1"])
    _attention_sd(p["ca_query1"], "ca_query_info_ext1", sd)
    _attention_sd(p["ca_vision"], "ca_vision_info_ext", sd)
    sd["layer_norm2.weight"] = _t(p["ln2"]["scale"])
    sd["layer_norm2.bias"] = _t(p["ln2"]["bias"])
    sd["eqe2"] = _t(p["eqe2"])
    _attention_sd(p["ca_query2"], "ca_query_info_ext2", sd)
    if "vis_rep_prot" in p:
        sd["vis_rep_prot"] = _t(p["vis_rep_prot"])
    return sd


def _lowrank_sd(p):
    sd = {"phi": _t(p["phi"])}
    _attention_sd(p["ca"], "ca_lora", sd)
    sd["layer_norm.weight"] = _t(p["ln"]["scale"])
    sd["layer_norm.bias"] = _t(p["ln"]["bias"])
    return sd


class TestLiveEditCkpt:
    def test_round_trip_and_inference_equivalence(self, tmp_path):
        vllm = make_tiny_vllm()
        ed = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=11)
        tm = {
            "edit_extractor": _qv_sd(ed.params["edit_extractor"]),
            "inpt_extractor": _qv_sd(ed.params["inpt_extractor"]),
            "moegen_c": _lowrank_sd(ed.params["moegen_c"]),
            "moegen_r": _lowrank_sd(ed.params["moegen_r"]),
            "instant_reps_norm": {
                "weight": _t(ed.params["instant_reps_norm"]["scale"]),
                "bias": _t(ed.params["instant_reps_norm"]["bias"])},
        }
        path = str(tmp_path / "Best")
        torch.save({"i": 1, "epoch": 0, "loss": 0.1, "ema_loss": 0.1,
                    "train_modules": tm}, path)
        ed2 = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=99)  # other init
        load_reference_editor_ckpt(ed2, path)
        fa, ta = jax.tree_util.tree_flatten_with_path(ed.params)
        fb, tb = jax.tree_util.tree_flatten_with_path(ed2.params)
        assert ta == tb
        for (pa, a), (_, b) in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, err_msg=str(pa))
        # behavioral check: after the same edit, logits agree
        req = {"prompt": "what is shown The answer is:", "image": "i.jpg",
               "target_new": "cat"}
        ed.edit_one_piece(req)
        ed2.edit_one_piece(req)
        qb = vllm.encode_queries([req["prompt"]], [req["image"]],
                                 [req["target_new"]])
        np.testing.assert_allclose(np.asarray(ed.query_logits(qb)),
                                   np.asarray(ed2.query_logits(qb)),
                                   rtol=1e-5, atol=1e-5)


class TestMENDCkpt:
    def test_round_trip(self, tmp_path):
        vllm = make_tiny_vllm()
        cfg = MENDvlConfig(
            edit_model_name=vllm.cfg.name, edit_layers=(2, 3),
            edit_modules=("fc1", "fc2"),
            aux_model=MENDvlConfig.AuxModelConfig(n_hidden=1, rank=16))
        ed = MENDvl(vllm, cfg, seed=7)
        # synthesize trained-looking norm buffers
        for k in ed.norm_state:
            ed.norm_state[k] = jax.tree.map(
                lambda x: jnp.asarray(
                    np.random.default_rng(0).normal(size=x.shape) ** 2,
                    jnp.float32), ed.norm_state[k])
        aux_sd = {}
        for key, aux in ed.params["aux"].items():
            for i, lp in enumerate(aux["layers"]):
                p = f"{key}.mlp.layers.{i}."
                aux_sd[p + "u"] = _t(lp["u"])
                aux_sd[p + "v"] = _t(lp["v"])
                aux_sd[p + "bias"] = _t(lp["bias"])
                aux_sd[p + "mode_scale.weight"] = _t(lp["mode_scale"])
                aux_sd[p + "mode_shift.weight"] = _t(lp["mode_shift"])
            ns = ed.norm_state[key]
            for b in ("u_mean", "u_s", "v_mean", "v_s"):
                aux_sd[f"{key}.{b}"] = _t(ns[b])
            aux_sd[f"{key}.k"] = _t(np.asarray(ns["k"]).reshape(1))
            # buffers the reference also stores but we derive
            aux_sd[f"{key}.u_std"] = _t(np.sqrt(np.asarray(ns["u_s"])))
            aux_sd[f"{key}.v_std"] = _t(np.sqrt(np.asarray(ns["v_s"])))
        # flat edit_lrs in shape-grouped order (fc1s then fc2s)
        groups = {}
        for t in ed.targets:
            groups.setdefault(ed.shape_of[t[1]], []).append(t)
        flat = [t for s in groups for t in groups[s]]
        lr_sd = {str(i): _t(np.asarray(
            ed.params["edit_lrs"]["%d.%s" % t]).reshape(1))
            for i, t in enumerate(flat)}
        path = str(tmp_path / "Best")
        torch.save({"train_modules": {"aux_models": aux_sd,
                                      "edit_lrs": lr_sd}}, path)
        ed2 = MENDvl(vllm, cfg, seed=123)
        load_reference_editor_ckpt(ed2, path)
        for tree_a, tree_b in ((ed.params, ed2.params),
                               (ed.norm_state, ed2.norm_state)):
            fa, ta = jax.tree_util.tree_flatten_with_path(tree_a)
            fb, tb = jax.tree_util.tree_flatten_with_path(tree_b)
            assert ta == tb
            for (pa, a), (_, b) in zip(fa, fb):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, err_msg=str(pa))

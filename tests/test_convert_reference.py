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


class TestSERACCkpt:
    def test_classifier_and_counterfact_parity(self, tmp_path):
        """Convert REAL torch modules (HF BertModel / OPTForCausalLM +
        spec-built ResBlocks) through the reference ckpt layout and pin
        the classifier reps + counterfactual hidden path numerically."""
        import transformers
        from torch import nn

        from devqa_tpu.core import bert as bert_mod
        from devqa_tpu.core import decoder as dec
        from devqa_tpu.editors import serac_vl as S
        from devqa_tpu.editors.convert_reference import \
            convert_serac_train_modules

        class ResBlock(nn.Module):  # from the documented equation
            def __init__(self, i, o):
                super().__init__()
                self.l_in_norm = nn.LayerNorm(i)
                self.l_in = nn.Linear(i, o)
                self.l_mid = nn.Linear(o, o)
                self.l_out = nn.Linear(o, o)

            def forward(self, x):
                x = self.l_in(self.l_in_norm(x))
                return self.l_out(torch.relu(self.l_mid(x))) + x

        torch.manual_seed(9)
        D, R = 24, 16  # llm hidden, rep dim
        bert_cfg = transformers.BertConfig(
            vocab_size=64, hidden_size=R, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=64)
        hf_bert = transformers.BertModel(bert_cfg).eval()
        cl_proj = ResBlock(D, R).eval()
        cl_ln = nn.LayerNorm(R).eval()
        opt_cfg = transformers.OPTConfig(
            vocab_size=64, hidden_size=R, ffn_dim=32, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=64,
            do_layer_norm_before=True, word_embed_proj_dim=R)
        hf_opt = transformers.OPTForCausalLM(opt_cfg).eval()
        cf_in = ResBlock(D, R).eval()
        cf_out = ResBlock(R, D).eval()

        cl_sd = {"classifier." + k: v for k, v in hf_bert.state_dict().items()}
        cl_sd.update({"classifier_proj." + k: v
                      for k, v in cl_proj.state_dict().items()})
        cl_sd.update({"ln." + k: v for k, v in cl_ln.state_dict().items()})
        cf_sd = {"counterfact_model." + k: v
                 for k, v in hf_opt.state_dict().items()}
        cf_sd.update({"counterfact_model_proj_in." + k: v
                      for k, v in cf_in.state_dict().items()})
        cf_sd.update({"counterfact_model_proj_out." + k: v
                      for k, v in cf_out.state_dict().items()})

        cfg = S.SERACvlConfig(
            llm_hidden_size=D, classifier_rep_dim=R,
            counterfact_model_rep_dim=R,
            classifier=bert_mod.BertConfig(
                vocab_size=64, d_model=R, n_layers=2, n_heads=2, d_ffn=32,
                max_positions=64),
            counterfact=dec.DecoderConfig(
                arch="opt", vocab_size=64, d_model=R, n_layers=2, n_heads=2,
                d_ffn=32, max_positions=64, activation="relu",
                tie_word_embeddings=True))
        params = convert_serac_train_modules(
            {"classifier": cl_sd, "counterfact_model": cf_sd}, cfg)

        rng = np.random.default_rng(0)
        embeds = rng.normal(size=(1, 10, D)).astype(np.float32)
        mask = np.ones((1, 10), np.int32)
        with torch.no_grad():
            x = cl_proj(torch.tensor(embeds))
            x = cl_ln(x) / 32
            h = hf_bert(inputs_embeds=x,
                        attention_mask=torch.tensor(mask)).last_hidden_state
            ref = torch.cat([h.mean(1), h.max(1).values, h.min(1).values],
                            1).numpy()
        ours = S.classifier_reps(params, cfg, jnp.asarray(embeds),
                                 jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4,
                                   atol=2e-4)

        # counterfactual hidden path: proj_in -> OPT decoder -> proj_out
        with torch.no_grad():
            y = cf_in(torch.tensor(embeds))
            hh = hf_opt.model.decoder(
                inputs_embeds=y,
                attention_mask=torch.tensor(mask)).last_hidden_state
            ref_out = cf_out(hh).numpy()
        from devqa_tpu.editors.serac_vl import _resblock
        yj = _resblock(params["counterfact"]["proj_in"], jnp.asarray(embeds))
        hj = dec.decoder_forward(params["counterfact"]["lm"],
                                 cfg.counterfact, yj, jnp.asarray(mask))
        # HF's OPTDecoder applies the final layer norm to its last_hidden
        from devqa_tpu.ops.layers import layer_norm as _lnorm
        hj = _lnorm(hj, params["counterfact"]["lm"]["final_norm"]["scale"],
                    params["counterfact"]["lm"]["final_norm"]["bias"])
        out = _resblock(params["counterfact"]["proj_out"], hj)
        np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4,
                                   atol=2e-4)

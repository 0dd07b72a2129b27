"""llama-arch support for the parameter-space editors (VERDICT r1 #3).

The reference runs MEND_VL on all three backbones and resolves edit
modules per model (editor/vllm_editors/mend_vl/mend_vl.py:200;
configs/mend_vl/llava-v1.5-7b.yaml lists mlp.{gate,up,down}_proj), and
ROME/MEMIT target model.layers.{}.mlp.down_proj on llama
(easyeditor/models/rome/compute_u.py + per-model hparams).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_vllm

from devqa_tpu.core import decoder as dec
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.editors.llm import (GRACEHyperParams, GraceEditor,
                                   ROMEHyperParams, apply_rome)
from devqa_tpu.editors.llm.kn import KNHyperParams, attribution_scores, \
    suppress_kn
from devqa_tpu.editors.llm.memit import MEMITHyperParams, apply_memit
from devqa_tpu.editors.llm.session import TextModel
from devqa_tpu.editors.mend_vl import MENDvl, MENDvlConfig, MENDvlTrainable
from devqa_tpu.utils.surgery import ParamTarget, get_target

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lmodel():
    cfg = dec.DecoderConfig(arch="llama", vocab_size=256, d_model=32,
                            n_layers=6, n_heads=2, d_ffn=64,
                            activation="silu", tie_word_embeddings=False,
                            max_positions=64)
    params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0))
    return TextModel(params, cfg, ToyTokenizer(vocab_size=256),
                     bucket_multiple=8)


REQ = {"case_id": 0, "prompt": "the capital of france is", "target_new": "lyon",
       "ground_truth": "paris", "subject": "france",
       "rephrase_prompt": "france has its capital at"}


class TestLinearProbes:
    @pytest.mark.parametrize("arch", ["opt", "llama"])
    def test_zero_probe_is_identity(self, arch):
        cfg = dec.DecoderConfig(arch=arch, vocab_size=64, d_model=16,
                                n_layers=4, n_heads=2, d_ffn=32,
                                activation="relu" if arch == "opt" else "silu",
                                tie_word_embeddings=(arch == "opt"),
                                max_positions=32)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(1))
        ids = jnp.asarray(np.arange(10)[None, :] % 64)
        mask = jnp.ones_like(ids)
        embeds = dec.embed_tokens(params, cfg, ids)
        ref = dec.decoder_apply(params, cfg, embeds, mask)
        mods = dec.MLP_MODULES[arch]
        targets = tuple((l, m) for l in (1, 2) for m in mods)
        out_dim = {"fc1": cfg.d_ffn, "fc2": cfg.d_model, "gate": cfg.d_ffn,
                   "up": cfg.d_ffn, "down": cfg.d_model}
        zs = tuple(jnp.zeros(ids.shape + (out_dim[m],)) for (_, m) in targets)
        logits, xs = dec.decoder_forward_with_linear_probes(
            params, cfg, embeds, mask, targets, zs)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        assert set(xs) == set(targets)

    def test_delta_grad_matches_direct_perturbation(self):
        """grad wrt the dummy z IS the output-gradient δ of the probed
        linear: perturbing z by ε·g changes the loss like a first-order
        step."""
        cfg = dec.DecoderConfig(arch="llama", vocab_size=64, d_model=16,
                                n_layers=3, n_heads=2, d_ffn=32,
                                activation="silu", tie_word_embeddings=False,
                                max_positions=32)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(2))
        ids = jnp.asarray(np.arange(8)[None, :] % 64)
        mask = jnp.ones_like(ids)
        embeds = dec.embed_tokens(params, cfg, ids)
        targets = ((1, "down"),)

        def loss(z):
            logits, _ = dec.decoder_forward_with_linear_probes(
                params, cfg, embeds, mask, targets, (z,))
            return jnp.sum(jax.nn.log_softmax(logits, -1)[0, -1, :4])

        z0 = jnp.zeros(ids.shape + (cfg.d_model,))
        g = jax.grad(loss)(z0)
        eps = 1e-3
        l0, l1 = loss(z0), loss(eps * g)
        gsq = float(jnp.sum(g * g))
        np.testing.assert_allclose(float(l1 - l0), eps * gsq,
                                   rtol=1e-2, atol=1e-7)


class TestROMEOnLlama:
    def test_rank_one_on_down(self, lmodel):
        hp = ROMEHyperParams(layer=2, v_num_grad_steps=10, v_lr=0.2)
        new = apply_rome(lmodel, REQ, hp)
        t = ParamTarget(("layers", "down", "w"), 2)
        dw = np.asarray(get_target(new, t)) - np.asarray(
            get_target(lmodel.params, t))
        assert np.linalg.matrix_rank(dw, tol=1e-5) == 1
        for l in (0, 1, 3):
            tl = ParamTarget(("layers", "down", "w"), l)
            np.testing.assert_array_equal(
                np.asarray(get_target(lmodel.params, tl)),
                np.asarray(get_target(new, tl)))

    def test_improves_target(self, lmodel):
        hp = ROMEHyperParams(layer=2, v_num_grad_steps=25, v_lr=0.5)
        acc0, _, _ = lmodel.accuracy([REQ["prompt"]], [REQ["target_new"]])
        new = apply_rome(lmodel, REQ, hp)
        acc1, _, _ = lmodel.accuracy([REQ["prompt"]], [REQ["target_new"]],
                                     params=new)
        assert float(acc1[0]) >= float(acc0[0])


class TestMEMITOnLlama:
    def test_edits_down_of_layer_range(self, lmodel):
        hp = MEMITHyperParams(layers=(2, 3), v_num_grad_steps=10, v_lr=0.3)
        reqs = [REQ, {**REQ, "case_id": 1, "prompt": "the capital of italy is",
                      "target_new": "milan", "subject": "italy"}]
        new = apply_memit(lmodel, reqs, hp)
        for l in (2, 3):
            t = ParamTarget(("layers", "down", "w"), l)
            assert not np.allclose(np.asarray(get_target(new, t)),
                                   np.asarray(get_target(lmodel.params, t)))
        for l in (0, 1, 4, 5):
            t = ParamTarget(("layers", "down", "w"), l)
            np.testing.assert_array_equal(
                np.asarray(get_target(new, t)),
                np.asarray(get_target(lmodel.params, t)))


class TestGRACEOnLlama:
    def test_codebook_edit(self, lmodel):
        hp = GRACEHyperParams(layer=2, eps=10.0, edit_lr=0.5, n_iter=20,
                              max_keys=8)
        ed = GraceEditor(lmodel, hp)
        ed.edit(REQ)
        assert int(ed.state["count"]) == 1
        tb = lmodel.batch([REQ["prompt"]], [REQ["target_new"]])
        logits = ed.logits(jnp.asarray(tb.input_ids),
                           jnp.asarray(tb.attn_mask))
        assert np.isfinite(np.asarray(logits)).all()


class TestKNOnLlama:
    def test_attribution_and_suppress(self, lmodel):
        hp = KNHyperParams(layers=(1, 2), steps=4, max_neurons=4)
        scores = attribution_scores(lmodel, REQ["prompt"], REQ["target_new"],
                                    hp)
        assert np.isfinite(scores).all() and scores.shape[0] == 6
        new = suppress_kn(lmodel, REQ, hp)
        assert any(
            not np.allclose(
                np.asarray(get_target(new,
                                      ParamTarget(("layers", "down", "w"), l))),
                np.asarray(get_target(lmodel.params,
                                      ParamTarget(("layers", "down", "w"), l))))
            for l in (1, 2))


class TestMENDOnLlama:
    def test_llava_yaml_loads(self):
        cfg = MENDvlConfig.from_yaml(
            os.path.join(REPO, "configs/mend_vl/llava-v1.5-7b.yaml"))
        assert tuple(cfg.edit_modules) == ("gate", "up", "down")

    @pytest.fixture(scope="class")
    def setup(self):
        vllm = make_tiny_vllm("llama")
        cfg = MENDvlConfig(
            edit_model_name=vllm.cfg.name,
            edit_layers=(2, 3), edit_modules=("gate", "up", "down"),
            init_edit_lr=1e-2, edit_lr_lr=1e-3,
            aux_model=MENDvlConfig.AuxModelConfig(n_hidden=1, rank=24,
                                                  lr=1e-3))
        return vllm, cfg

    def test_edit_changes_and_restores(self, setup):
        vllm, cfg = setup
        ed = MENDvl(vllm, cfg, seed=0)
        qb = vllm.encode_queries(["what is shown The answer is:"],
                                 ["img.jpg"], ["cat"])
        base = np.asarray(ed.query_logits(qb))
        ed.edit_one_piece({"prompt": "what is shown The answer is:",
                           "image": "img.jpg", "target_new": "cat"})
        edited = np.asarray(ed.query_logits(qb))
        assert not np.allclose(base, edited)
        ed.restore_to_original_model()
        np.testing.assert_allclose(np.asarray(ed.query_logits(qb)), base,
                                   rtol=1e-5, atol=1e-5)

    def test_trains_a_step(self, setup, tmp_path):
        from helpers import write_records

        from devqa_tpu.data.schema import EVQA
        from devqa_tpu.retrieval.store import hash_encoder

        vllm, cfg = setup
        path, _ = write_records(str(tmp_path), 4)
        data = EVQA(path, str(tmp_path), encoder=hash_encoder(8))
        tr = MENDvlTrainable(vllm, cfg, seed=0)
        batch = tr.organize_batch_data(data.data[:2])
        loss, logs = tr.train_step(batch)
        assert np.isfinite(loss)
        assert {"rel_loss", "gen_loss", "loc_loss"} <= set(logs)

"""Text-LLM editing zoo: ROME, GRACE, LoRA, FT + the editing session."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devqa_tpu.core import decoder as dec
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.editors.llm import (FTHyperParams, GRACEHyperParams,
                                   GraceEditor, LLMEditSession,
                                   LoRAHyperParams, ROMEHyperParams,
                                   apply_ft, apply_lora, apply_rome)
from devqa_tpu.editors.llm.session import TextModel
from devqa_tpu.utils.surgery import ParamTarget, get_target


@pytest.fixture(scope="module")
def model():
    cfg = dec.DecoderConfig(arch="opt", vocab_size=256, d_model=32,
                            n_layers=6, n_heads=2, d_ffn=64, max_positions=64)
    params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0))
    return TextModel(params, cfg, ToyTokenizer(vocab_size=256),
                     bucket_multiple=8)


REQ = {"case_id": 0, "prompt": "the capital of france is", "target_new": "lyon",
       "ground_truth": "paris", "subject": "france",
       "rephrase_prompt": "france has its capital at",
       "locality": {"neighborhood": {"prompt": "the capital of italy is",
                                     "ground_truth": "rome"}}}


class TestROME:
    def test_rank_one_property(self, model):
        """After the edit, k* @ W' must equal z exactly — and only a
        rank-one subspace changed."""
        hp = ROMEHyperParams(layer=2, v_num_grad_steps=10, v_lr=0.2)
        new = apply_rome(model, REQ, hp)
        w0 = np.asarray(get_target(model.params,
                                   ParamTarget(("layers", "fc2", "w"), 2)))
        w1 = np.asarray(get_target(new, ParamTarget(("layers", "fc2", "w"), 2)))
        dw = w1 - w0
        assert np.linalg.matrix_rank(dw, tol=1e-5) == 1
        # other layers untouched
        for l in (0, 1, 3):
            a = np.asarray(get_target(model.params,
                                      ParamTarget(("layers", "fc2", "w"), l)))
            b = np.asarray(get_target(new,
                                      ParamTarget(("layers", "fc2", "w"), l)))
            np.testing.assert_array_equal(a, b)

    def test_improves_target(self, model):
        hp = ROMEHyperParams(layer=2, v_num_grad_steps=25, v_lr=0.5)
        acc0, _, _ = model.accuracy([REQ["prompt"]], [REQ["target_new"]])
        new = apply_rome(model, REQ, hp)
        acc1, _, _ = model.accuracy([REQ["prompt"]], [REQ["target_new"]],
                                    params=new)
        assert float(acc1[0]) >= float(acc0[0])


class TestFTAndLoRA:
    def test_ft(self, model):
        hp = FTHyperParams(layers=(5,), num_steps=40, lr=1e-1)
        new = apply_ft(model, REQ, hp)
        acc, _, _ = model.accuracy([REQ["prompt"]], [REQ["target_new"]],
                                   params=new)
        assert float(acc[0]) == 1.0

    def test_lora(self, model):
        hp = LoRAHyperParams(rank=4, num_steps=40, lr=2e-2, layers=(4, 5))
        new = apply_lora(model, REQ, hp)
        acc, _, _ = model.accuracy([REQ["prompt"]], [REQ["target_new"]],
                                   params=new)
        acc0, _, _ = model.accuracy([REQ["prompt"]], [REQ["target_new"]])
        assert float(acc[0]) > float(acc0[0]) or float(acc[0]) == 1.0


class TestGRACE:
    def test_codebook_edit_and_deferral(self, model):
        hp = GRACEHyperParams(layer=3, eps=2.0, n_iter=40, edit_lr=0.5,
                              max_keys=8)
        g = GraceEditor(model, hp)
        tb = model.batch([REQ["prompt"]], [REQ["target_new"]])
        base = model._logits(model.params, jnp.asarray(tb.input_ids),
                             jnp.asarray(tb.attn_mask))
        g.edit(REQ)
        assert int(g.state["count"]) == 1
        out = g.logits(jnp.asarray(tb.input_ids), jnp.asarray(tb.attn_mask))
        assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-4)
        # second distinct edit adds a key
        g.edit({"prompt": "the largest ocean on earth is",
                "target_new": "atlantic"})
        assert int(g.state["count"]) == 2
        g.reset()
        assert int(g.state["count"]) == 0

    def test_expand_keeps_key_center(self, model):
        """Same-label edit within the ε budget must EXPAND the nearest
        ball, not move its center — re-centering silently un-covers the
        first edit (GRACE.py only ever grows ε)."""
        hp = GRACEHyperParams(layer=3, eps=100.0, n_iter=2, edit_lr=0.1,
                              max_keys=8)
        g = GraceEditor(model, hp)
        g.edit(REQ)
        key0 = np.asarray(g.state["keys"][0]).copy()
        eps0 = float(g.state["eps"][0])
        # same target (same label fingerprint), different prompt — with a
        # huge ε budget this is the expand case
        g.edit({"prompt": "france's capital city is called",
                "target_new": REQ["target_new"]})
        assert int(g.state["count"]) == 1
        np.testing.assert_allclose(np.asarray(g.state["keys"][0]), key0)
        assert float(g.state["eps"][0]) >= eps0

    def test_codebook_ring_wraps_past_capacity(self, model):
        """Past max_keys, new keys wrap onto the oldest slot; an
        out-of-bounds scatter would be silently DROPPED by JAX while
        count kept growing (codebook frozen with no error)."""
        hp = GRACEHyperParams(layer=3, eps=1e-6, n_iter=1, edit_lr=0.1,
                              max_keys=2)
        g = GraceEditor(model, hp)
        prompts = ["alpha beta gamma", "delta epsilon zeta",
                   "eta theta iota", "kappa lambda mu"]
        for i, p in enumerate(prompts):
            g.edit({"prompt": p, "target_new": "tok%d" % i})
        assert int(g.state["count"]) == 4
        key_after = np.asarray(g.state["keys"]).copy()
        # slot 0 must hold edit 3's key (wrapped), not edit 1's: editing
        # edit 3's prompt again (same label) is the expand case on slot 0
        g2 = GraceEditor(model, hp)
        g2.edit({"prompt": prompts[2], "target_new": "tok2"})
        np.testing.assert_allclose(key_after[0],
                                   np.asarray(g2.state["keys"][0]),
                                   rtol=1e-5, atol=1e-6)

    def test_session_restore_unpatches_logits(self, model):
        hp = GRACEHyperParams(layer=3, eps=2.0, n_iter=2, edit_lr=0.1,
                              max_keys=8)
        g = GraceEditor(model, hp)
        orig = model._logits
        _, restore = g(model, REQ)
        assert model._logits is not orig  # proxied through the codebook
        restore()
        assert model._logits is orig      # fully unpatched


class TestSession:
    def test_session_with_ft(self, model):
        hp = FTHyperParams(layers=(5,), num_steps=30, lr=1e-1)
        session = LLMEditSession(
            model, lambda m, r: apply_ft(m, r, hp), "FT")
        results = session.edit([REQ])
        assert results[0]["post"]["rewrite_acc"] >= results[0]["pre"]["rewrite_acc"]
        assert "neighborhood" in results[0]["post"]["locality"]
        s = LLMEditSession.summary(results)
        assert "rewrite_acc" in s and "locality" in s

    def test_portability_metrics(self, model):
        """Portability probes report plain token accuracy under the edit
        (compute_portability_quality, evaluate.py:169-188)."""
        hp = FTHyperParams(layers=(5,), num_steps=10, lr=1e-1)
        session = LLMEditSession(
            model, lambda m, r: apply_ft(m, r, hp), "FT")
        req = {**REQ, "portability": {
            "one_hop": {"prompt": "lyon is located in",
                        "ground_truth": "france"}}}
        results = session.edit([req])
        assert "one_hop_acc" in results[0]["post"]["portability"]
        s = LLMEditSession.summary(results)
        assert "one_hop_acc" in s["portability"]

    def test_zsre_loader(self, tmp_path):
        from devqa_tpu.data.text_datasets import load_zsre

        recs = [{"src": "q1", "alt": "a1", "answers": ["gt1"],
                 "rephrase": "q1r", "loc": "nq question: lq",
                 "loc_ans": "la", "subject": "s1"}]
        p = tmp_path / "zsre.json"
        p.write_text(json.dumps(recs))
        data = load_zsre(str(p))
        assert data[0]["prompt"] == "q1"
        assert data[0]["locality"]["neighborhood"]["prompt"] == "lq"


class TestT5Session:
    def test_t5_ft_through_session(self):
        """T5 edits through the same LLMEditSession protocol the
        decoder-only backbones use (the reference's seq2seq BaseEditor
        path)."""
        from devqa_tpu.core import t5 as t5_mod
        from devqa_tpu.editors.llm.t5_session import T5TextModel, apply_ft_t5

        cfg = t5_mod.T5Config(vocab_size=256, d_model=16, d_kv=4, n_heads=4,
                              d_ff=32, n_enc_layers=2, n_dec_layers=2)
        params = t5_mod.init_t5_params(cfg, jax.random.PRNGKey(7))
        model = T5TextModel(params, cfg, ToyTokenizer(vocab_size=256))
        hp = FTHyperParams(layers=(1,), num_steps=25, lr=5e-2)
        session = LLMEditSession(
            model, lambda m, r: apply_ft_t5(m, r, hp), "FT-T5")
        req = {"case_id": 0, "prompt": "the capital of france is",
               "target_new": "lyon",
               "locality": {"nb": {"prompt": "the capital of italy is",
                                   "ground_truth": "rome"}}}
        res = session.edit([req])
        assert res[0]["post"]["rewrite_acc"] >= res[0]["pre"]["rewrite_acc"]
        assert "nb" in res[0]["post"]["locality"]

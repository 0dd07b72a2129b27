"""MEND_VL: gradient capture, transform, edit mechanics, meta-training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_vllm, write_records

from devqa_tpu.core.losses import token_accuracy
from devqa_tpu.data.schema import EVQA
from devqa_tpu.editors.mend_vl import (MENDvl, MENDvlConfig, MENDvlTrainable,
                                       init_gt_norm_state, welford_update)
from devqa_tpu.retrieval.store import hash_encoder


def tiny_mend_cfg(vllm):
    return MENDvlConfig(
        edit_model_name=vllm.cfg.name,
        edit_layers=(2, 3), edit_modules=("fc1", "fc2"),
        init_edit_lr=1e-2, edit_lr_lr=1e-3,
        relia_lambda=0.1, gen_lambda=0.1, loc_lambda=0.1,
        aux_model=MENDvlConfig.AuxModelConfig(n_hidden=1, rank=24, lr=1e-3))


REQ = {"prompt": "what city is shown The answer is:", "image": "imgC.jpg",
       "target_new": "lisbon"}


class TestWelford:
    def test_matches_numpy_stats(self):
        rng = np.random.default_rng(0)
        rows_u = rng.normal(size=(40, 6)).astype(np.float32)
        rows_v = rng.normal(size=(40, 4)).astype(np.float32)
        norm = init_gt_norm_state(6, 4)
        # two chunked updates with some masked rows
        w1 = np.ones(20, np.float32); w1[3] = 0
        w2 = np.ones(20, np.float32); w2[10] = 0
        norm = welford_update(norm, jnp.asarray(rows_u[:20]),
                              jnp.asarray(rows_v[:20]), jnp.asarray(w1))
        norm = welford_update(norm, jnp.asarray(rows_u[20:]),
                              jnp.asarray(rows_v[20:]), jnp.asarray(w2))
        keep = np.concatenate([w1, w2]).astype(bool)
        np.testing.assert_allclose(np.asarray(norm["u_mean"]),
                                   rows_u[keep].mean(0), rtol=1e-5)
        var = rows_u[keep].var(0, ddof=1)
        got_var = np.asarray(norm["u_s"]) / (float(norm["k"]) - 1)
        np.testing.assert_allclose(got_var, var, rtol=1e-4)


class TestMENDEdit:
    @pytest.fixture(scope="class")
    def setup(self):
        vllm = make_tiny_vllm()
        editor = MENDvl(vllm, tiny_mend_cfg(vllm), seed=0)
        return vllm, editor

    def test_no_edit_identity(self, setup):
        vllm, editor = setup
        editor.restore_to_original_model()
        qb = vllm.encode_queries([REQ["prompt"]], [REQ["image"]], ["x"])
        out = editor.query_logits(qb)
        base = vllm.logits(qb.embeds, qb.kv_valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

    def test_edit_changes_logits_and_restores(self, setup):
        vllm, editor = setup
        editor.restore_to_original_model()
        qb = vllm.encode_queries([REQ["prompt"]], [REQ["image"]],
                                 [REQ["target_new"]])
        base = np.asarray(vllm.logits(qb.embeds, qb.kv_valid))
        editor.edit_one_piece(REQ)
        out = np.asarray(editor.query_logits(qb))
        assert not np.allclose(out, base, atol=1e-5)
        assert float(editor.deltas[(2, "fc1")]["n"]) > 0
        editor.restore_to_original_model()
        out2 = np.asarray(editor.query_logits(qb))
        np.testing.assert_allclose(out2, base, rtol=1e-5, atol=1e-5)

    def test_sequential_edits_average(self, setup):
        vllm, editor = setup
        editor.restore_to_original_model()
        editor.edit_one_piece(REQ)
        n1 = float(editor.deltas[(3, "fc2")]["n"])
        editor.edit_one_piece({**REQ, "prompt": "who is here The answer is:",
                               "target_new": "a guard"})
        n2 = float(editor.deltas[(3, "fc2")]["n"])
        assert n2 > n1


class TestMENDTraining:
    def test_meta_training_improves_edit(self, tmp_path):
        vllm = make_tiny_vllm(seed=7)
        editor = MENDvlTrainable(vllm, tiny_mend_cfg(vllm), seed=0)
        path, _ = write_records(str(tmp_path), 4)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        batch = editor.organize_batch_data(data.data[:3])
        losses = [editor.train_step(batch)[0] for _ in range(10)]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # after training, an edit should raise the target accuracy
        req = data.data[0].requests[0]
        qb = vllm.encode_queries([req["prompt"]], [req["image"]],
                                 [req["target_new"]])
        editor.restore_to_original_model()
        acc0, _ = token_accuracy(vllm.logits(qb.embeds, qb.kv_valid),
                                 qb.label_ids, qb.label_masks)
        editor.edit_one_piece(req)
        acc1, _ = token_accuracy(editor.query_logits(qb), qb.label_ids,
                                 qb.label_masks)
        assert float(acc1[0]) >= float(acc0[0])


class TestMENDText:
    """Text-LLM MEND through TextDecoderShim (the EasyEdit
    MendRewriteExecutor / EditTrainer role)."""

    def _model(self, seed=0):
        from devqa_tpu.core import decoder as dec
        from devqa_tpu.core.tokenizer import ToyTokenizer
        from devqa_tpu.editors.llm.session import TextModel

        cfg = dec.DecoderConfig(arch="opt", vocab_size=256, d_model=32,
                                n_layers=4, n_heads=2, d_ffn=64,
                                max_positions=96)
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(seed))
        return TextModel(params, cfg, ToyTokenizer(vocab_size=256),
                         bucket_multiple=8)

    def _cfg(self):
        return MENDvlConfig(
            edit_model_name="text-opt",
            edit_layers=(2,), edit_modules=("fc1", "fc2"),
            init_edit_lr=1e-2, edit_lr_lr=1e-3,
            relia_lambda=0.1, gen_lambda=0.1, loc_lambda=0.1,
            aux_model=MENDvlConfig.AuxModelConfig(n_hidden=1, rank=24,
                                                  lr=1e-3))

    def test_edit_session_integration(self):
        from devqa_tpu.editors.llm import LLMEditSession
        from devqa_tpu.editors.llm.mend import MENDText

        model = self._model()
        mend = MENDText(model, self._cfg(), seed=0)
        req = {"prompt": "the capital of france is", "target_new": "lyon",
               "locality": {"nb": {"prompt": "the capital of italy is",
                                   "ground_truth": "rome"}}}
        # apply() returns edited decoder params, untouched original
        orig = model.params
        new = mend.apply(req)
        assert new is not orig
        w0 = np.asarray(orig["layers"]["fc2"]["w"][2])
        w1 = np.asarray(new["layers"]["fc2"]["w"][2])
        assert not np.allclose(w0, w1)

        mend.restore_to_original_model()
        sess = LLMEditSession(model, lambda m, r: mend.apply(r), "mend")
        res = sess.edit([req])
        assert "rewrite_acc" in res[0]["post"]
        assert "nb" in res[0]["post"]["locality"]
        assert model.params is orig  # session restored

    def test_text_meta_training_runs(self):
        from devqa_tpu.data.text_datasets import BaseLLMEditData
        from devqa_tpu.editors.llm.mend import (MENDTextTrainable,
                                                as_test_cases)

        model = self._model(seed=3)
        ed = MENDTextTrainable(model, self._cfg(), seed=0)
        reqs = [{"prompt": f"fact number {i} is", "target_new": "blue",
                 "rephrase_prompt": f"the {i}th fact reads",
                 "locality": {"nb": {"prompt": "paris is in",
                                     "ground_truth": "france"}}}
                for i in range(4)]
        cases = as_test_cases(BaseLLMEditData(reqs).data)
        batch = ed.organize_batch_data(cases)
        l0, logs = ed.train_step(batch)
        l1, _ = ed.train_step(batch)
        assert np.isfinite(l0) and np.isfinite(l1)
        assert {"rel_loss", "gen_loss", "loc_loss"} <= set(logs)

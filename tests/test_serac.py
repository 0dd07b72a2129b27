"""SERAC_VL: pool mechanics, threshold routing, training, harness run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_vllm, write_records

from devqa_tpu.core import bert as bert_mod
from devqa_tpu.data.schema import EVQA
from devqa_tpu.editors.serac_vl import (SERACvl, SERACvlConfig,
                                        SERACvlTrainable, classifier_reps,
                                        sim_matrix)
from devqa_tpu.eval.harness import EditorEvaluation
from devqa_tpu.retrieval.store import hash_encoder
from devqa_tpu.core import decoder as dec


def tiny_serac_cfg(vllm):
    return SERACvlConfig(
        edit_model_name=vllm.cfg.name,
        classifier_rep_dim=16,
        counterfact_model_rep_dim=16,
        llm_hidden_size=vllm.cfg.decoder.d_model,
        max_edits=8, max_edit_len=24,
        classifier=bert_mod.BertConfig(vocab_size=2, d_model=16, n_layers=2,
                                       n_heads=2, d_ffn=32),
        counterfact=dec.DecoderConfig(arch="opt", vocab_size=2, d_model=16,
                                      n_layers=2, n_heads=2, d_ffn=32,
                                      max_positions=128))


@pytest.fixture(scope="module")
def setup():
    vllm = make_tiny_vllm()
    editor = SERACvl(vllm, tiny_serac_cfg(vllm), seed=1)
    return vllm, editor


REQ = {"prompt": "what fruit is this The answer is:", "image": "imgF.jpg",
       "target_new": "durian"}


class TestSERAC:
    def test_empty_pool_is_base_model(self, setup):
        vllm, editor = setup
        editor.restore_to_original_model()
        qb = vllm.encode_queries([REQ["prompt"]], [REQ["image"]], ["x"])
        out = editor.query_logits(qb)
        base = vllm.logits(qb.embeds, qb.kv_valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-5, atol=1e-6)

    def test_edit_fills_pool(self, setup):
        vllm, editor = setup
        editor.restore_to_original_model()
        editor.edit_one_piece(REQ)
        assert int(editor.state["count"]) == 1
        assert editor.state["edit_mask"][0].sum() > 0

    def test_threshold_routes_to_counterfact(self, setup):
        """With an untrained random classifier, force routing both ways via
        the threshold to check both paths are live. (Separate editor
        instances: cfg is a jit-static captured via self.)"""
        vllm, _ = setup
        qb = vllm.encode_queries([REQ["prompt"]], [REQ["image"]],
                                 [REQ["target_new"]])
        base = vllm.logits(qb.embeds, qb.kv_valid)
        lo = SERACvl(vllm, tiny_serac_cfg(vllm).replace(sim_threshold=-1e9),
                     seed=1)
        lo.edit_one_piece(REQ)
        out_cf = lo.query_logits(qb)
        assert not np.allclose(np.asarray(out_cf), np.asarray(base), atol=1e-4)
        hi = SERACvl(vllm, tiny_serac_cfg(vllm).replace(sim_threshold=1e9),
                     seed=1)
        hi.edit_one_piece(REQ)
        out_base = hi.query_logits(qb)
        np.testing.assert_allclose(np.asarray(out_base), np.asarray(base),
                                   rtol=1e-5, atol=1e-6)

    def test_classifier_reps_shape(self, setup):
        vllm, editor = setup
        d = vllm.cfg.decoder.d_model
        embeds = jnp.ones((3, 10, d))
        mask = jnp.ones((3, 10), jnp.int32)
        reps = classifier_reps(editor.params, editor.cfg, embeds, mask)
        assert reps.shape == (3, 3 * editor.cfg.classifier.d_model)
        sim = sim_matrix(reps, reps)
        assert sim.shape == (3, 3)


class TestSERACTraining:
    def test_train_decreases_loss(self, tmp_path):
        vllm = make_tiny_vllm()
        editor = SERACvlTrainable(vllm, tiny_serac_cfg(vllm), seed=0)
        path, _ = write_records(str(tmp_path), 4)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        batch = editor.organize_batch_data(data.data[:3])
        losses = [editor.train_step(batch)[0] for _ in range(12)]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_harness_run(self, tmp_path):
        vllm = make_tiny_vllm()
        editor = SERACvl(vllm, tiny_serac_cfg(vllm), seed=2)
        path, _ = write_records(str(tmp_path), 2)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        ev = EditorEvaluation(editor, data, evaluation_name="EVQA",
                              results_dir=str(tmp_path / "res"))
        results = ev.evaluate_single_edit()
        assert len(results) == 2
        assert "acc" in results[0]["reliability"][0]

"""LTE and RECIPE retrieval-prompt editors."""
import numpy as np
import pytest

from helpers import make_tiny_vllm, write_records

from devqa_tpu.core import bert as bert_mod
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.data.schema import EVQA
from devqa_tpu.editors.lte_vl import LTEvl, LTEvlConfig, LTEvlTrainable
from devqa_tpu.editors.recipe_vl import (RECIPEvl, RECIPEvlConfig,
                                         RECIPEvlTrainable)
from devqa_tpu.eval.harness import EditorEvaluation
from devqa_tpu.retrieval.store import hash_encoder


REQ = {"prompt": "what bird is flying The answer is:", "image": "imgB.jpg",
       "target_new": "an osprey"}


def lte_cfg(vllm):
    return LTEvlConfig(edit_model_name=vllm.cfg.name, retrieval_embed_dim=16,
                       sim_threshold=0.3, max_edits=8, max_prefix_len=32)


def recipe_cfg(vllm):
    return RECIPEvlConfig(
        edit_model_name=vllm.cfg.name,
        model_hidden_size=vllm.cfg.decoder.d_model,
        retr_top_k=1, max_edits=8,
        krm=RECIPEvlConfig.KRMConfig(krm_base_dim=16, prompt_token_n=2,
                                     knowledge_rep_dim=24,
                                     knowl_rep_prot_token_n=3),
        encoder=bert_mod.BertConfig(vocab_size=512, d_model=16, n_layers=2,
                                    n_heads=2, d_ffn=32))


class TestLTE:
    def test_empty_pool_identity(self):
        vllm = make_tiny_vllm()
        editor = LTEvl(vllm, lte_cfg(vllm), hash_encoder(16))
        qb = editor.build_query_batch([REQ["prompt"]], [REQ["image"]], ["x"])
        out = editor.query_logits(qb)
        base = vllm.logits(qb.embeds, qb.kv_valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-5, atol=1e-6)

    def test_retrieval_prefix_changes_logits(self):
        vllm = make_tiny_vllm()
        editor = LTEvl(vllm, lte_cfg(vllm), hash_encoder(16))
        editor.edit_one_piece(REQ)
        assert int(editor.state["count"]) == 1
        # same prompt → retrieved (hash encoder: identical text, sim = 1)
        qb = editor.build_query_batch([REQ["prompt"]], [REQ["image"]],
                                      [REQ["target_new"]])
        out = editor.query_logits(qb)
        base = vllm.logits(qb.embeds, qb.kv_valid)
        assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-4)
        assert out.shape == base.shape  # logits realigned after prefix
        # unrelated prompt (zero word overlap with the stored key under the
        # bag-of-words hash encoder) → below threshold → base model.
        # Compare on valid positions only: fully-masked garbage rows take
        # the uniform-softmax fallback whose value depends on total padded
        # length (metrics never read them).
        qb2 = editor.build_query_batch(
            ["zelkova quorum taxicab meridian"], [None], ["steam"])
        out2 = np.asarray(editor.query_logits(qb2))
        base2 = np.asarray(vllm.logits(qb2.embeds, qb2.kv_valid))
        valid = np.asarray(qb2.kv_valid)[0] == 1
        np.testing.assert_allclose(out2[0][valid], base2[0][valid],
                                   rtol=1e-4, atol=1e-5)

    def test_training_updates_decoder(self, tmp_path):
        vllm = make_tiny_vllm(seed=11)
        editor = LTEvlTrainable(vllm, lte_cfg(vllm), hash_encoder(16))
        path, _ = write_records(str(tmp_path), 3)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        w0 = np.asarray(vllm.params["decoder"]["embed_tokens"])
        batch = editor.organize_batch_data(data.data[:1])
        l0, _ = editor.train_step(batch)
        l1, _ = editor.train_step(batch)
        assert np.isfinite([l0, l1]).all()
        assert not np.allclose(w0, np.asarray(vllm.params["decoder"]["embed_tokens"]))


class TestRECIPE:
    def test_edit_and_retrieve(self):
        vllm = make_tiny_vllm()
        tok = ToyTokenizer(vocab_size=512)
        editor = RECIPEvl(vllm, recipe_cfg(vllm), tok, seed=4)
        assert int(editor.state["count"]) == 1  # prototype slot
        editor.edit_one_piece(REQ)
        assert int(editor.state["count"]) == 2
        qb = editor.build_query_batch([REQ["prompt"]], [REQ["image"]],
                                      [REQ["target_new"]])
        out = editor.query_logits(qb)
        assert out.shape[1] == qb.embeds.shape[1]
        # build_query_batch drops images (recipe_vl.py:94 faithful)
        assert qb.has_image.sum() == 0

    def test_restore(self):
        vllm = make_tiny_vllm()
        tok = ToyTokenizer(vocab_size=512)
        editor = RECIPEvl(vllm, recipe_cfg(vllm), tok, seed=4)
        editor.edit_one_piece(REQ)
        editor.restore_to_original_model()
        assert int(editor.state["count"]) == 1

    def test_training_loss_decreases(self, tmp_path):
        vllm = make_tiny_vllm()
        tok = ToyTokenizer(vocab_size=512)
        editor = RECIPEvlTrainable(vllm, recipe_cfg(vllm), tok, seed=0)
        path, _ = write_records(str(tmp_path), 4)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        batch = editor.organize_batch_data(data.data[:3])
        losses = []
        for _ in range(10):
            b = dict(batch)
            losses.append(editor.train_step(b)[0])
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_harness_run(self, tmp_path):
        vllm = make_tiny_vllm()
        tok = ToyTokenizer(vocab_size=512)
        editor = RECIPEvl(vllm, recipe_cfg(vllm), tok, seed=4)
        path, _ = write_records(str(tmp_path), 2)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        ev = EditorEvaluation(editor, data, evaluation_name="EVQA",
                              results_dir=str(tmp_path / "res"))
        results = ev.evaluate_single_edit()
        assert len(results) == 2


class TestRingCapacity:
    """Edits past max_edits wrap the ring (newest kept) instead of
    crashing (LTE's numpy pool raised IndexError) or being silently
    dropped (JAX out-of-bounds scatter)."""

    def test_lte_wraps_past_capacity(self):
        vllm = make_tiny_vllm()
        editor = LTEvl(vllm, lte_cfg(vllm), hash_encoder(16))  # cap 8
        for i in range(10):  # 2 past capacity — used to IndexError at 8
            editor.edit_one_piece({"prompt": f"fact {i} is", "image": None,
                                   "target_new": "blue"})
        assert int(editor.state["count"]) == 10
        # newest edit landed in slot 10 % 8 = 1
        assert np.abs(np.asarray(editor.state["prefix_mask"][1])).sum() > 0

    def test_liveedit_wraps_past_capacity(self):
        from devqa_tpu.editors.liveedit import LiveEdit
        from test_liveedit import tiny_liveedit_cfg

        vllm = make_tiny_vllm()
        cfg = tiny_liveedit_cfg(vllm).replace(max_edits=4)
        ed = LiveEdit(vllm, cfg, seed=0)
        for i in range(6):
            ed.edit_one_piece({"prompt": f"thing {i} is", "image": f"i{i}.jpg",
                               "target_new": "red"})
        assert int(ed.state["count"]) == 6
        # slot 1 holds edit #5 (5 % 4 = 1): its rep differs from edit #1's
        # original write (overwritten by the wrap)
        assert np.isfinite(np.asarray(ed.state["eqr"])).all()

"""FT_VL editor: edit efficacy, restore invariant, harness integration."""
import numpy as np
import pytest

from helpers import make_tiny_vllm, write_records

from devqa_tpu.core.losses import token_accuracy
from devqa_tpu.data.schema import EVQA
from devqa_tpu.editors.ft_vl import FTvl, FTvlConfig
from devqa_tpu.eval.harness import EditorEvaluation
from devqa_tpu.retrieval.store import hash_encoder


@pytest.fixture(scope="module")
def vllm():
    return make_tiny_vllm()


def cfg_for(vllm, **kw):
    # Tiny decoder has 4 layers → edit last layer's fc2.
    defaults = dict(
        edit_model_name=vllm.cfg.name,
        rewrite_module_tmp="language_model.model.decoder.layers.{}.fc2.weight",
        layers=(3,), num_steps=40, lr=1e-1, weight_decay=0.0)
    defaults.update(kw)
    return FTvlConfig(**defaults)


REQ = {"prompt": "what is in the picture The answer is:", "image": "imgX.jpg",
       "target_new": "a giant squid"}


class TestFTvl:
    def test_edit_teaches_target(self, vllm):
        editor = FTvl(vllm, cfg_for(vllm))
        qb = vllm.encode_queries([REQ["prompt"]], [REQ["image"]],
                                 [REQ["target_new"]])
        acc0, _ = token_accuracy(vllm.logits(qb.embeds, qb.kv_valid),
                                 qb.label_ids, qb.label_masks)
        editor.edit_one_piece(REQ)
        acc1, _ = token_accuracy(vllm.logits(qb.embeds, qb.kv_valid),
                                 qb.label_ids, qb.label_masks)
        assert float(acc1[0]) > float(acc0[0])
        assert float(acc1[0]) == 1.0  # 40 steps at lr 0.1 on a tiny model
        editor.restore_to_original_model()

    def test_restore_is_exact(self, vllm):
        editor = FTvl(vllm, cfg_for(vllm))
        before = [np.asarray(x) for x in
                  (vllm.params["decoder"]["layers"]["fc2"]["w"],)]
        editor.edit_one_piece(REQ)
        after = np.asarray(vllm.params["decoder"]["layers"]["fc2"]["w"])
        assert not np.allclose(before[0], after)
        editor.restore_to_original_model()
        restored = np.asarray(vllm.params["decoder"]["layers"]["fc2"]["w"])
        np.testing.assert_array_equal(before[0], restored)

    def test_edit_touches_only_target_layer(self, vllm):
        editor = FTvl(vllm, cfg_for(vllm))
        w_before = np.asarray(vllm.params["decoder"]["layers"]["fc2"]["w"])
        editor.edit_one_piece(REQ)
        w_after = np.asarray(vllm.params["decoder"]["layers"]["fc2"]["w"])
        # layers 0..2 untouched, layer 3 changed
        np.testing.assert_array_equal(w_before[:3], w_after[:3])
        assert not np.allclose(w_before[3], w_after[3])
        editor.restore_to_original_model()

    def test_norm_constraint(self, vllm):
        eps = 1e-3
        editor = FTvl(vllm, cfg_for(vllm, norm_constraint=eps, num_steps=10))
        w0 = np.asarray(vllm.params["decoder"]["layers"]["fc2"]["w"][3])
        editor.edit_one_piece(REQ)
        w1 = np.asarray(vllm.params["decoder"]["layers"]["fc2"]["w"][3])
        assert np.abs(w1 - w0).max() <= eps + 1e-6
        editor.restore_to_original_model()

    def test_harness_integration(self, vllm, tmp_path):
        path, _ = write_records(str(tmp_path), 2)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        editor = FTvl(vllm, cfg_for(vllm, num_steps=20))
        ev = EditorEvaluation(editor, data, evaluation_name="EVQA",
                              results_dir=str(tmp_path / "res"))
        results = ev.evaluate_single_edit()
        assert len(results) == 2
        for rd in results:
            assert rd["reliability"][0]["acc"] > 0.5

"""Quality evidence on REAL reference records (VERDICT r1 missing #3).

1. Harness-level A/B of the ``faithful_t3_path_bug`` flag: two full fused
   sequential-edit evaluations over the real vqa_eval.json records, one
   per flag value, must agree on EVERY metric except locality.t3i1 (the
   only probe the reference bug touches — vllm.py:164 prompts it with
   the m_loc image path string).
2. LiveEdit meta-training on real vqa_train.json records (tiny backbone)
   reduces loss and improves edit reliability — the synthetic-records
   version of this lives in test_liveedit_train.py; this one feeds the
   real prompt distribution (longer, punctuated, numeric answers).
"""
import json
import os

import numpy as np
import pytest

from helpers import make_tiny_vllm

from devqa_tpu.data.schema import EVQA
from devqa_tpu.retrieval.store import hash_encoder

REF_DATA = "/root/reference/DE-VQA/data"
VQA_EVAL = os.path.join(REF_DATA, "easy-edit-mm/vqa/vqa_eval.json")
VQA_TRAIN = os.path.join(REF_DATA, "easy-edit-mm/vqa/vqa_train.json")

needs_ref_data = pytest.mark.skipif(
    not os.path.exists(VQA_EVAL), reason="reference data not present")


@needs_ref_data
class TestT3PathBugHarnessAB:
    def test_only_t3i1_differs(self, tmp_path):
        from devqa_tpu.editors.liveedit import LiveEdit
        from devqa_tpu.eval.harness import FusedEditorEvaluation
        from test_liveedit import tiny_liveedit_cfg

        enc = hash_encoder(16)

        def run(tag, faithful):
            data = EVQA(VQA_EVAL, "IMG_ROOT", encoder=enc, data_n=6,
                        faithful_t3_path_bug=faithful)
            vllm = make_tiny_vllm()
            ed = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=5)
            fe = FusedEditorEvaluation(ed, data, tag, str(tmp_path / tag),
                                       max_rows=16, pad_rows=True)
            fe.evaluate_sequential_edit(edit_n=3)
            mr = os.path.join(str(tmp_path / tag), "liveedit", "tiny-opt",
                              tag, "sequential_edit_3", "mean_results.json")
            return json.load(open(mr))["total_mean"], data

        a, data_a = run("intent", False)
        b, data_b = run("faithful", True)
        # the flag really flips the t3i1 prompt: faithful mode prompts
        # with the m_loc image PATH (".jpg"), intent mode with the question
        assert data_a.data[0].locality["t3i1"][0]["prompt"] != \
            data_b.data[0].locality["t3i1"][0]["prompt"]
        assert ".jpg The answer is:" in \
            data_b.data[0].locality["t3i1"][0]["prompt"]

        # everything except locality.t3i1 is bit-identical
        def strip(d):
            d = json.loads(json.dumps(d))
            d["locality"].pop("t3i1")
            for sec in (d["reliability"], *d["generality"].values(),
                        *d["locality"].values()):
                sec.pop("edit_time", None)
            return d

        assert strip(a) == strip(b)
        assert set(a["locality"]) == set(b["locality"])


@needs_ref_data
class TestTrainingOnRealRecords:
    def test_loss_decreases_and_reliability_improves(self):
        from devqa_tpu.core.losses import token_accuracy
        from devqa_tpu.editors.liveedit import (LiveEditConfig,
                                                LiveEditTrainable)
        from test_liveedit import tiny_liveedit_cfg

        vllm = make_tiny_vllm()
        data = EVQA(VQA_TRAIN, "IMG_ROOT", encoder=hash_encoder(16),
                    data_n=8)
        cfg = tiny_liveedit_cfg(vllm).replace(
            train_cfg=LiveEditConfig.TrainConfig(lr=3e-3))
        editor = LiveEditTrainable(vllm, cfg, seed=0)
        editor.train_init_editor(0)

        req = data.data[0].requests[0]
        qb = vllm.encode_queries([req["prompt"]], [req["image"]],
                                 [req["target_new"]])

        def rel_acc():
            editor.restore_to_original_model()
            editor.edit_one_piece(req)
            logits = editor.query_logits(qb)
            acc, _ = token_accuracy(logits, qb.label_ids, qb.label_masks)
            editor.restore_to_original_model()
            return float(acc[0])

        base = rel_acc()
        batch = editor.organize_batch_data(data.data[:4])
        loss0 = editor.train_step(batch)[0]
        loss = loss0
        for _ in range(60):
            loss = editor.train_step(batch)[0]
        trained = rel_acc()
        assert np.isfinite(loss) and loss < loss0, (loss0, loss)
        assert trained >= base, (base, trained)

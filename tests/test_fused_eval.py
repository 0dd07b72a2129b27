"""Fused-split evaluation must produce identical numbers to the faithful
sequential protocol (same edits, same probes, same metrics)."""
import json
import os

import numpy as np

from helpers import make_tiny_vllm, write_records

from devqa_tpu.data.schema import EVQA
from devqa_tpu.editors.liveedit import LiveEdit
from devqa_tpu.eval.harness import EditorEvaluation, FusedEditorEvaluation
from devqa_tpu.retrieval.store import hash_encoder
from test_liveedit import tiny_liveedit_cfg


def collect_accs(results):
    out = []
    for sr in results:
        for rd in sr:
            out.append(("rel", round(rd["reliability"][0]["acc"], 5)))
            for k in sorted(rd["generality"]):
                out.append((k, round(rd["generality"][k][0]["acc"], 5)))
            for k in sorted(rd["locality"]):
                out.append((k, round(rd["locality"][k][0]["acc"], 5)))
    return out


class TestFusedEquivalence:
    def test_same_metrics_as_sequential(self, tmp_path):
        vllm = make_tiny_vllm()
        editor = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
        path, _ = write_records(str(tmp_path), 4)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))

        ev1 = EditorEvaluation(editor, data, "A", str(tmp_path / "r1"))
        r1 = ev1.evaluate_sequential_edit(edit_n=2)
        ev2 = FusedEditorEvaluation(editor, data, "B", str(tmp_path / "r2"),
                                    max_rows=16)
        r2 = ev2.evaluate_sequential_edit(edit_n=2)
        assert collect_accs(r1) == collect_accs(r2)

    def test_ike_like_sequential_editor_falls_back(self, tmp_path):
        """Editors without exact batch-edit go through the sequential edit
        loop inside the fused harness."""
        from devqa_tpu.editors.serac_vl import SERACvl
        from test_serac import tiny_serac_cfg

        vllm = make_tiny_vllm()
        editor = SERACvl(vllm, tiny_serac_cfg(vllm), seed=1)
        path, _ = write_records(str(tmp_path), 2)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        ev = FusedEditorEvaluation(editor, data, "C", str(tmp_path / "r3"))
        results = ev.evaluate_sequential_edit(edit_n=2)
        assert int(editor.state["count"]) == 0  # restored after split
        assert len(results) == 1

"""Real-reference-data exercise of the data layer.

Loads the ACTUAL eval JSONs shipped with the reference checkout
(`/root/reference/DE-VQA/data/easy-edit-mm/vqa/vqa_eval.json`, 2093
records; `data/VLKEB/eval.json`, 3174 records) through EVQA/VLKEB —
synthesizing every case's t×i probes with retrieval over the real text —
and asserts field/template parity against an independent reimplementation
of the reference's template logic (`dataset/vllm.py:121-298`), including
the `faithful_t3_path_bug` A/B. Then drives a harness slice on real
records (synthetic images; the real paths act as cache keys).

Catches the field-name/template regressions that synthetic records mask
(VERDICT.md round-1 missing item 2).
"""
import json
import os

import pytest

from devqa_tpu.data.schema import (EVQA, VLKEB, LOCALITY_KEYS,
                                   build_dataset_retriever)
from devqa_tpu.retrieval.store import hash_encoder

REF_DATA = "/root/reference/DE-VQA/data"
VQA_EVAL = os.path.join(REF_DATA, "easy-edit-mm/vqa/vqa_eval.json")
VLKEB_EVAL = os.path.join(REF_DATA, "VLKEB/eval.json")

needs_ref_data = pytest.mark.skipif(
    not os.path.exists(VQA_EVAL), reason="reference data not present")


def _raw(path, n=None):
    with open(path) as f:
        recs = json.load(f)
    return recs if n is None else recs[:n]


@needs_ref_data
class TestEVQARealData:
    @pytest.fixture(scope="class")
    def loaded(self):
        # Full 2093-record load: one retrieval store over the real text,
        # every case's probes synthesized.
        data = EVQA(VQA_EVAL, "IMG_ROOT", encoder=hash_encoder(16))
        return data, _raw(VQA_EVAL)

    def test_full_load_count_and_schema(self, loaded):
        data, recs = loaded
        assert len(data.data) == 2093 == len(recs)
        for case in data.data:
            assert set(case.locality) == set(LOCALITY_KEYS)
            assert set(case.generality) == {"text_rephrase", "image_rephrase"}
            for key in LOCALITY_KEYS:
                e = case.locality[key][0]
                assert isinstance(e["prompt"], str) and e["prompt"]
                assert isinstance(e["target"], str)
            # i4 probes carry no image; image probes carry the root-joined path
            assert case.locality["t1i4"][0]["image"] is None
            assert case.locality["t2i4"][0]["image"] is None
            assert case.locality["text_loc"][0]["image"] is None
            assert case.requests[0]["image"].startswith("IMG_ROOT")

    def test_template_parity_vs_reference_formula(self, loaded):
        """Independent reimplementation of vllm.py:237-248 on the raw
        records must reproduce the loader's prompts exactly."""
        data, recs = loaded
        for case, d in zip(data.data, recs):
            assert case.requests[0]["prompt"] == \
                "%s The answer is:" % d["src"]
            assert case.requests[0]["target_new"] == d["alt"]
            assert case.generality["text_rephrase"][0]["prompt"] == \
                "%s The answer is:" % d["rephrase"]
            assert case.generality["image_rephrase"][0]["prompt"] == \
                "%s The answer is:" % d["src"]
            assert case.generality["image_rephrase"][0]["image"] == \
                os.path.join("IMG_ROOT", d["image_rephrase"])
            # "?" appended AFTER the template → "<q> The answer is:?"
            assert case.locality["text_loc"][0]["prompt"] == \
                "%s The answer is:?" % d["loc"]
            assert case.locality["text_loc"][0]["target"] == d["loc_ans"]
            assert case.locality["t3i3"][0]["prompt"] == \
                "%s The answer is:" % d["m_loc_q"]
            assert case.locality["t3i3"][0]["target"] == d["m_loc_a"]
            assert case.locality["t3i3"][0]["image"] == \
                os.path.join("IMG_ROOT", d["m_loc"])
            # t1 rows prompt with the (templated) edit prompt
            assert case.locality["t1i4"][0]["prompt"] == \
                "%s The answer is:" % d["src"]
            assert case.locality["t1i3"][0]["image"] == \
                os.path.join("IMG_ROOT", d["m_loc"])
            assert case.locality["t2i1"][0]["image"] == \
                os.path.join("IMG_ROOT", d["image"])
            # default: t3 = m_loc_q (intent), target = m_loc_a
            assert case.locality["t3i1"][0]["prompt"] == \
                "%s The answer is:" % d["m_loc_q"]
            assert case.locality["t3i1"][0]["target"] == d["m_loc_a"]

    def test_retrieved_probes_come_from_real_store(self, loaded):
        """t2/i2 must be an actual other record's (templated) src / image."""
        data, recs = loaded
        src_templated = {"%s The answer is:" % d["src"] for d in recs}
        images = {os.path.join("IMG_ROOT", d["image"]) for d in recs}
        for case in data.data[:200]:
            assert case.locality["t2i4"][0]["prompt"] in src_templated
            assert case.locality["t2i2"][0]["image"] in images
            assert case.locality["t1i2"][0]["image"] in images

    def test_faithful_t3_path_bug_ab(self):
        """A/B of the reference's vllm.py:164 bug: under the faithful
        flag, t3i1 prompts with the m_loc image PATH string."""
        n = 50
        recs = _raw(VQA_EVAL, n)
        enc = hash_encoder(16)
        a = EVQA(VQA_EVAL, "IMG_ROOT", encoder=enc, data_n=n,
                 faithful_t3_path_bug=False)
        b = EVQA(VQA_EVAL, "IMG_ROOT", encoder=enc, data_n=n,
                 faithful_t3_path_bug=True)
        for ca, cb, d in zip(a.data, b.data, recs):
            assert ca.locality["t3i1"][0]["prompt"] == \
                "%s The answer is:" % d["m_loc_q"]
            assert cb.locality["t3i1"][0]["prompt"] == \
                "%s The answer is:" % d["m_loc"]
            # the bug affects ONLY the t3i1 prompt
            for key in LOCALITY_KEYS:
                if key == "t3i1":
                    continue
                assert ca.locality[key][0] == cb.locality[key][0]


@needs_ref_data
class TestVLKEBRealData:
    def test_full_load_and_template_parity(self):
        data = VLKEB(VLKEB_EVAL, "VLKEB_ROOT", encoder=hash_encoder(16))
        recs = _raw(VLKEB_EVAL)
        assert len(data.data) == 3174 == len(recs)
        for case, d in zip(data.data, recs):
            # VLKEB (vllm.py:283-288): request/generality prompts RAW,
            # only locality prompts templated.
            assert case.requests[0]["prompt"] == d["src"]
            assert case.generality["text_rephrase"][0]["prompt"] == \
                d["rephrase"]
            assert case.generality["image_rephrase"][0]["prompt"] == d["src"]
            assert case.locality["text_loc"][0]["prompt"] == \
                "%s The answer is:?" % d["loc"]
            assert case.locality["t3i3"][0]["prompt"] == \
                "%s The answer is:" % d["m_loc_q"]
            assert case.locality["t1i4"][0]["prompt"] == \
                "%s The answer is:" % d["src"]
            assert case.requests[0]["image"] == \
                os.path.join("VLKEB_ROOT", d["image"])


@needs_ref_data
class TestHarnessOnRealRecords:
    def test_fused_eval_slice_on_real_evqa(self, tmp_path):
        """Drive the fused sequential-edit harness over real EVQA records
        (tiny backbone, synthetic images keyed by the real paths)."""
        from helpers import isolate_in_subprocess, make_tiny_vllm

        if isolate_in_subprocess(
                "tests/test_real_data.py::TestHarnessOnRealRecords::"
                "test_fused_eval_slice_on_real_evqa"):
            return
        from devqa_tpu.editors.liveedit import LiveEdit
        from devqa_tpu.eval.harness import FusedEditorEvaluation
        from test_liveedit import tiny_liveedit_cfg

        data = EVQA(VQA_EVAL, "IMG_ROOT", encoder=hash_encoder(16), data_n=4)
        vllm = make_tiny_vllm()
        editor = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=0)
        fe = FusedEditorEvaluation(editor, data, "realslice",
                                   str(tmp_path / "res"), max_rows=16,
                                   pad_rows=True)
        fe.evaluate_sequential_edit(edit_n=2)
        mr = os.path.join(str(tmp_path / "res"), "liveedit", "tiny-opt",
                          "realslice", "sequential_edit_2",
                          "mean_results.json")
        res = json.load(open(mr))
        tm = res["total_mean"]
        assert tm["total_edit_n"] == 4
        assert 0.0 <= tm["reliability"]["acc"] <= 1.0
        for key in LOCALITY_KEYS:
            assert 0.0 <= tm["locality"][key]["acc"] <= 1.0

    def test_fused_eval_slice_on_real_vlkeb(self, tmp_path):
        """Same harness drive over real VLKEB records (raw prompts, the
        dataset's own template rules) — field/template drift on the second
        real dataset would otherwise only surface at full-eval time."""
        from helpers import isolate_in_subprocess, make_tiny_vllm

        if isolate_in_subprocess(
                "tests/test_real_data.py::TestHarnessOnRealRecords::"
                "test_fused_eval_slice_on_real_vlkeb"):
            return
        from devqa_tpu.editors.liveedit import LiveEdit
        from devqa_tpu.eval.harness import FusedEditorEvaluation
        from test_liveedit import tiny_liveedit_cfg

        data = VLKEB(VLKEB_EVAL, "VLKEB_ROOT", encoder=hash_encoder(16),
                     data_n=4)
        vllm = make_tiny_vllm()
        editor = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=0)
        fe = FusedEditorEvaluation(editor, data, "realslice_vlkeb",
                                   str(tmp_path / "res"), max_rows=16,
                                   pad_rows=True)
        fe.evaluate_sequential_edit(edit_n=2)
        mr = os.path.join(str(tmp_path / "res"), "liveedit", "tiny-opt",
                          "realslice_vlkeb", "sequential_edit_2",
                          "mean_results.json")
        res = json.load(open(mr))
        tm = res["total_mean"]
        assert tm["total_edit_n"] == 4
        assert 0.0 <= tm["reliability"]["acc"] <= 1.0
        for key in LOCALITY_KEYS:
            assert 0.0 <= tm["locality"][key]["acc"] <= 1.0

"""MMMU benchmark runner: scoring parity against the reference's own code.

The option-matching and open-answer parsing heuristics are pinned by
EXECUTING the reference's evaluate_mmmu.py pure-function section
(parse_multi_choice_response .. evaluate) on crafted fixtures and
comparing to devqa_tpu.eval.benchmarks.mmmu_*.  The reference module
itself cannot be imported (it imports mplug_owl2 + torch.distributed at
top level), so the oracle execs the source slice between
DOMAIN_CAT2SUB_CAT and collate_fn with numpy injected as ``np`` — the
reference references np.argmax without ever importing numpy, a latent
NameError on the multi-candidate branch (evaluate_mmmu.py:119); injecting
numpy runs the code as intended, which is what our argmax reimplements.

The aggregation oracle replicates the __main__ scoring as executed
(evaluate_mmmu.py:506-530): multiple-choice predictions compared RAW to
the gold letter (parse_multi_choice_response is defined but never called
by the script), open predictions via parse_open_response.
"""
import json
import os
import random

import pytest

from devqa_tpu.eval.benchmarks import (
    MMMUItem, load_mmmu_jsonl, mmmu_eval_multi_choice, mmmu_eval_open,
    mmmu_evaluate, mmmu_extract_numbers, mmmu_normalize_str, mmmu_outputs,
    mmmu_parse_multi_choice, mmmu_parse_open_response, mmmu_prompt,
    mmmu_scores, run_mmmu)

REF = ("/root/reference/DE-VQA/easyeditor/trainer/mPLUG_Owl2/"
       "mplug_owl2/evaluate/evaluate_mmmu.py")


def _load_ref_namespace():
    """Exec the pure-function slice of evaluate_mmmu.py."""
    import numpy as np

    with open(REF, encoding="utf-8") as f:
        src = f.read()
    start = src.index("DOMAIN_CAT2SUB_CAT")
    end = src.index("def collate_fn")
    import re as _re
    ns = {"np": np, "random": random, "re": _re}
    exec(compile(src[start:end], REF, "exec"), ns)
    return ns


RESPONSES_MC = [
    "(B)",
    "The answer is (C).",
    "A",
    " b ",                      # case-sensitive: no match -> random
    "B. the parabola opens upward",
    "I think (A) but maybe (C)",          # multi bracketed -> rfind last
    "options A and C are both plausible ones",  # multi bare
    "the red one",              # content match (<=5 words -> random)
    "it is clearly the red one here, not blue",  # content match >5 words
    "the red one matches, though the blue one also appears later on",
    "",
    "D) is my choice",
    "Answer: E",
]
INDEX2ANS = {"A": "the red one", "B": "the blue one", "C": "the green one",
             "D": "the yellow one"}
CHOICES = ["A", "B", "C", "D"]

RESPONSES_OPEN = [
    "The answer is 42.",
    "It could be 3.5 meters, so the result is 3.5",
    "roughly 1,234,567 units",
    "x = 7",
    "first line\nthe value is 9.81. QED",
    "I believe the answer is approximately 2.5e-3 in SI units",
    "seven",
    "a",
    "Thus the total comes to $1,000.50, therefore 1000.5 dollars",
    "no idea",
    "= 5",
    "The final answer: 0.125",
]


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference checkout not present")
class TestMMMUOracle:
    def setup_method(self, _):
        self.ref = _load_ref_namespace()

    def test_parse_multi_choice_parity(self):
        ref_fn = self.ref["parse_multi_choice_response"]
        for resp in RESPONSES_MC:
            random.seed(1234)
            want = ref_fn(resp, CHOICES, INDEX2ANS)
            random.seed(1234)
            got = mmmu_parse_multi_choice(resp, CHOICES, INDEX2ANS)
            assert got == want, resp

    def test_normalize_and_numbers_parity(self):
        for s in ["3.5", "1,234", "  Word  ", "a", "-2.567", "1e3",
                  "0.1,", "word phrase"]:
            assert mmmu_normalize_str(s) == self.ref["normalize_str"](s), s
        for s in RESPONSES_OPEN:
            assert mmmu_extract_numbers(s) == \
                self.ref["extract_numbers"](s), s

    def test_parse_open_parity(self):
        ref_fn = self.ref["parse_open_response"]
        for resp in RESPONSES_OPEN:
            assert sorted(mmmu_parse_open_response(resp), key=repr) == \
                sorted(ref_fn(resp), key=repr), resp

    def test_eval_fns_parity(self):
        cases = [("B", "B"), ("B", "C"), (["A", "B"], "B")]
        for gold, pred in cases:
            assert mmmu_eval_multi_choice(gold, pred) == \
                self.ref["eval_multi_choice"](gold, pred)
        open_cases = [
            ("42", ["the answer is 42", 42.0]),
            (["3.5 m", "3.5"], [3.5]),
            ("seven", ["seven", " 7", "7 "]),
            ("x", [" y", "y "]),
            (["10"], [9.0, 10.0]),   # earlier float miss, later float hit
        ]
        for gold, preds in open_cases:
            assert mmmu_eval_open(gold, preds) == \
                self.ref["eval_open"](gold, preds), (gold, preds)

    def test_evaluate_parity(self):
        samples = [
            {"index": "v1", "question_type": "multiple-choice",
             "ground_truth": "B", "prediction": "B"},
            {"index": "v2", "question_type": "multiple-choice",
             "ground_truth": "A", "prediction": "A."},
            {"index": "v3", "question_type": "open",
             "ground_truth": "42", "prediction": [42.0]},
            {"index": "v4", "question_type": "open",
             "ground_truth": "seven", "prediction": ["six"]},
        ]
        want = self.ref["evaluate"](samples)
        got = mmmu_evaluate(samples)
        assert got == want
        assert mmmu_evaluate([]) == self.ref["evaluate"]([]) == {"acc": 0}

    def test_scores_aggregation_as_executed(self):
        """Replicates __main__ :506-530 with the reference's own
        evaluate() as the per-category oracle."""
        outputs = [
            {"index": "a1", "prediction": "B", "ground_truth": "B",
             "split": "Art", "subfield": "x",
             "question_type": "multiple-choice", "origin_question": "q"},
            {"index": "a2", "prediction": "B. the blue one",
             "ground_truth": "B", "split": "Art", "subfield": "x",
             "question_type": "multiple-choice", "origin_question": "q"},
            {"index": "m1", "prediction": "the answer is 42",
             "ground_truth": "42", "split": "Math", "subfield": "y",
             "question_type": "open", "origin_question": "q"},
            {"index": "m2", "prediction": "so it is 9.81",
             "ground_truth": ["9.81", "9.8"], "split": "Math",
             "subfield": "y", "question_type": "open",
             "origin_question": "q"},
            {"index": "m3", "prediction": "no clue",
             "ground_truth": "7", "split": "Math", "subfield": "y",
             "question_type": "open", "origin_question": "q"},
        ]
        got = mmmu_scores(outputs)
        # Oracle path: group, parse open preds with the reference's own
        # parser, score with the reference's own evaluate().
        groups = {}
        for o in outputs:
            t = dict(o)
            if t["question_type"] != "multiple-choice":
                t["prediction"] = self.ref["parse_open_response"](
                    t["prediction"])
            groups.setdefault(o["split"], []).append(t)
        overall = 0.0
        for cat, outs in groups.items():
            judge, metric = self.ref["evaluate"](outs)
            assert got["metrics"][cat] == metric["acc"] * 100
            assert got["judges"][cat] == judge
            overall += metric["acc"] * len(outs)
        assert got["metrics"]["Overall"] == \
            pytest.approx(overall / len(outputs) * 100)
        # as-executed quirk: raw 'B. the blue one' != gold letter 'B'
        assert got["judges"]["Art"] == {"a1": "Correct", "a2": "Wrong"}


class TestMMMUPrompt:
    def test_multiple_choice_layout(self):
        p = mmmu_prompt("Which curve? <image 1>",
                        ["parabola", "line"], "multiple-choice")
        assert p.startswith("USER: Which curve? <|image|>\n")
        assert "A. parabola\nB. line\n" in p
        assert "option’s letter" in p and p.endswith("ASSISTANT:")

    def test_open_layout(self):
        p = mmmu_prompt("How many?", None, "open")
        assert p == ("USER: How many?\nAnswer the question using a "
                     "single word or phrase. ASSISTANT:")

    @pytest.mark.skipif(not os.path.exists(REF),
                        reason="reference checkout not present")
    def test_templates_match_reference_source(self):
        with open(REF, encoding="utf-8") as f:
            src = f.read()
        mc = mmmu_prompt("Q", ["x"], "multiple-choice")
        tail = mc.split("\n")[-1]
        assert tail in src
        op = mmmu_prompt("Q", None, "open").split("\n")[-1]
        assert op in src


class TestMMMUEngineRun:
    def test_run_through_engine(self, tmp_path):
        from helpers import make_tiny_vllm
        from devqa_tpu.serve.engine import BatchingEngine

        path = os.path.join(tmp_path, "mmmu.jsonl")
        with open(path, "w") as f:
            f.write(json.dumps({
                "id": "validation_Art_1", "image": "img0.jpg",
                "question": "What style? <image 1>",
                "question_type": "multiple-choice", "answer": "A",
                "options": ["baroque", "cubism"], "subfield": "Art",
                "split": "Art"}) + "\n")
            f.write(json.dumps({
                "id": "validation_Math_1", "image": "img1.jpg",
                "question": "Sum?", "question_type": "open",
                "answer": "4", "split": "Math"}) + "\n")
        items = load_mmmu_jsonl(path)
        assert items[0].options == ["baroque", "cubism"]

        engine = BatchingEngine(make_tiny_vllm(), n_slots=2,
                                max_len=96).start()
        try:
            run_mmmu(engine, items, max_new_tokens=4)
        finally:
            engine.shutdown()
        assert all(isinstance(it.prediction, str) for it in items)
        outs = mmmu_outputs(items)
        res = mmmu_scores(outs)
        assert set(res["metrics"]) == {"Overall", "Art", "Math"}


class TestMMMUParquet:
    """load_mmmu_parquet reads the HF release layout directly
    (pandas/pyarrow): repr'd options lists, embedded image payload
    structs, subject derived from the row id."""

    def test_parquet_roundtrip(self, tmp_path):
        import pandas as pd

        from devqa_tpu.eval.benchmarks import load_mmmu_parquet

        rows = [{
            "id": "validation_Art_Theory_1",
            "question": "What style? <image 1>",
            "options": "['baroque', 'cubism']",
            "answer": "A",
            "question_type": "multiple-choice",
            "subfield": "History",
            "image_1": {"bytes": b"\x89PNG-fake-payload", "path": "x.png"},
        }, {
            "id": "validation_Math_2",
            "question": "Sum of 2 and 2?",
            "options": "[]",
            "answer": "4",
            "question_type": "open",
            "subfield": "Algebra",
            "image_1": None,
        }]
        pq = str(tmp_path / "validation-00000.parquet")
        pd.DataFrame(rows).to_parquet(pq)
        items = load_mmmu_parquet([pq], image_dir=str(tmp_path / "imgs"))
        assert [it.index for it in items] == [
            "validation_Art_Theory_1", "validation_Math_2"]
        assert items[0].options == ["baroque", "cubism"]
        assert items[0].split == "Art_Theory"      # id-derived subject
        assert items[0].subfield == "History"
        # embedded payload materialized for the path-keyed vision cache
        with open(items[0].image, "rb") as f:
            assert f.read() == b"\x89PNG-fake-payload"
        assert items[1].image == "" and items[1].split == "Math"
        assert items[1].options == []

        # the loaded items score through the SAME oracle-pinned pipeline
        from devqa_tpu.eval.benchmarks import mmmu_outputs, mmmu_scores

        items[0].prediction = "A"
        items[1].prediction = "The answer is 4"
        res = mmmu_scores(mmmu_outputs(items))
        assert res["metrics"]["Overall"] == 100.0

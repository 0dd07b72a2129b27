"""MMBench + VQA benchmark runners: scoring parity + engine-driven runs.

The VQA answer normalization and the min(matches/3, 1) accuracy protocol
are pinned against the reference's OWN ``VQAEval``
(easyeditor/trainer/mPLUG_Owl2/mplug_owl2/evaluate/vqa_eval.py) executed
as an oracle; MMBench prompt/submission layout follows
evaluate_mmbench.py:36-127.
"""
import json
import os
import sys

import pytest

from helpers import make_tiny_vllm

from devqa_tpu.eval.benchmarks import (MMBenchItem, VQAItem,
                                       vqa_process_punctuation,
                                       load_mmbench,
                                       load_vqa_jsonl, mmbench_prompt,
                                       mmbench_results, parse_choice,
                                       run_mmbench, run_vqa, vqa_normalize,
                                       vqa_scores)
from devqa_tpu.serve.engine import BatchingEngine

REF_EVAL = ("/root/reference/DE-VQA/easyeditor/trainer/mPLUG_Owl2/"
            "mplug_owl2/evaluate")


class TestParseChoice:
    def test_bare_and_dotted(self):
        assert parse_choice("A", 4) == "A"
        assert parse_choice("b.", 4) == "B"
        assert parse_choice(" C. the red one", 4) == "C"

    def test_sentence_head_scan(self):
        assert parse_choice("The answer is D", 4) == ""  # word started
        assert parse_choice("D is correct", 4) == "D"
        assert parse_choice("", 4) == ""
        assert parse_choice("E", 4) == ""  # out of range for 4 choices


class TestMMBenchScoring:
    def _items(self):
        a = MMBenchItem(1, "i1.jpg", "q1", ["red", "blue"], answer="A",
                        l2_category="color")
        b = MMBenchItem(2, "i2.jpg", "q2", ["cat", "dog", "bird"],
                        answer="C", l2_category="animal")
        a.prediction, b.prediction = "A. red", "B"
        return [a, b]

    def test_accuracy_and_submission(self):
        out = mmbench_results(self._items())
        assert out["accuracy"] == 0.5
        assert out["per_l2_category"] == {"color": 1.0, "animal": 0.0}
        sub = out["submission"]
        assert sub[0]["A"] == "red" and sub[0]["C"] is None
        assert sub[1]["prediction"] == "B"

    def test_test_split_has_no_accuracy(self):
        it = MMBenchItem(3, "x.jpg", "q", ["a", "b"])
        it.prediction = "A"
        out = mmbench_results([it])
        assert "accuracy" not in out and len(out["submission"]) == 1

    def test_prompt_layout(self):
        it = MMBenchItem(1, "i.jpg", "what color", ["red", "blue"],
                         hint="a hint")
        p = mmbench_prompt(it)
        assert p.splitlines()[0] == "a hint"
        assert "A. red" in p and "B. blue" in p
        assert p.endswith("directly.")
        # the reference's exact instruction, U+2019 apostrophe included
        # (evaluate_mmbench.py:182) — ASCII ' would tokenize differently
        assert "Answer with the option’s letter from the given " \
               "choices directly." in p

    def test_prompt_instruction_matches_reference_source(self):
        ref = os.path.join(REF_EVAL, "evaluate_mmbench.py")
        if not os.path.exists(ref):
            pytest.skip("reference checkout not present")
        with open(ref, encoding="utf-8") as f:
            src = f.read()
        instruction = mmbench_prompt(
            MMBenchItem(1, "i.jpg", "q", ["x"])).splitlines()[-1]
        assert instruction in src


@pytest.mark.skipif(not os.path.isdir(REF_EVAL),
                    reason="reference checkout not present")
class TestVQANormalizationOracle:
    """vqa_normalize == the reference VQAEval's processPunctuation ∘
    processDigitArticle (plus its evaluate()'s newline/tab/strip
    pre-step), executed live."""

    def _ref(self):
        if REF_EVAL not in sys.path:
            sys.path.append(REF_EVAL)
        from vqa_eval import VQAEval
        return VQAEval(None, None, 2)

    CASES = [
        "Two Dogs.",
        "it's a cat",
        "none",
        "a red, white and blue flag",
        "1,000 people",
        "dont know",
        "yes!",
        "the answer is: three\n",
        "b-day (party)",
        "10.5 meters",
        "isnt it",
        "  spaces   everywhere  ",
        "semi;colon / slash",
        "he's 2 years old",
    ]

    def test_parity(self):
        ev = self._ref()
        for raw in self.CASES:
            r = raw.replace("\n", " ").replace("\t", " ").strip()
            want = ev.processDigitArticle(ev.processPunctuation(r))
            assert vqa_normalize(raw) == want, raw

    def test_punctuation_stage_parity(self):
        """The gts-side stage in isolation (applied RAW, no pre-strip —
        exactly how evaluate() treats disagreeing ground truths)."""
        ev = self._ref()
        for raw in self.CASES:
            assert vqa_process_punctuation(raw) == \
                ev.processPunctuation(raw), raw

    def test_accuracy_protocol(self):
        """min(matches-among-other-annotators/3, 1) averaged — with the
        reference's gts treatment: on disagreement the ground truths get
        processPunctuation ONLY (vqa_eval.py:220-223), never the digit
        mapping, so gts stay 'two'x6 + '2'x3 + 'three' while the
        prediction 'Two' normalizes to '2'."""
        it = VQAItem(1, "i.jpg", "how many dogs",
                     ["two"] * 6 + ["2"] * 3 + ["three"])
        it.prediction = "Two"
        s = vqa_scores([it])
        # per annotator, matches of '2' among the OTHER nine: each 'two'
        # annotator sees 3 -> acc 1.0; each '2' annotator sees 2 -> 2/3;
        # 'three' sees 3 -> 1.0. mean = (6*1 + 3*(2/3) + 1*1)/10 = 0.9.
        assert s["overall"] == 90.0 and s["n"] == 1
        # same protocol replicated with the reference's OWN method doing
        # the gts pass — identical score
        ev = self._ref()
        res = vqa_normalize(it.prediction)
        gt = [ev.processPunctuation(g) for g in it.answers]
        accs = [min(1.0, sum(o == res for o in (gt[:i] + gt[i + 1:])) / 3)
                for i in range(len(gt))]
        assert s["overall"] == round(100 * sum(accs) / len(accs), 2)

    def test_unanimous_gts_not_normalized(self):
        # gts agree -> NO gt normalization; the prediction always
        # normalizes. 'cat!' -> 'cat' matches raw 'cat'.
        it = VQAItem(2, "i.jpg", "q", ["cat"] * 10)
        it.prediction = "cat!"
        assert vqa_scores([it])["overall"] == 100.0
        # unanimous 'Cat' stays capitalized (no gt normalization) while
        # the prediction lowercases -> zero matches: the reference's
        # exact quirk (vqa_eval.py:220-223 only normalizes gts when
        # len(set(gtAnswers)) > 1)
        it2 = VQAItem(3, "i.jpg", "q", ["Cat"] * 10)
        it2.prediction = "cat"
        assert vqa_scores([it2])["overall"] == 0.0
        # prediction word-number mapping applies unconditionally:
        # 'two' -> '2' misses unanimous raw 'two' gts
        it3 = VQAItem(4, "i.jpg", "q", ["two"] * 10)
        it3.prediction = "two"
        assert vqa_scores([it3])["overall"] == 0.0


class TestEngineRuns:
    def test_mmbench_and_vqa_through_engine(self, tmp_path):
        vllm = make_tiny_vllm()
        mm_path = os.path.join(tmp_path, "mmbench.jsonl")
        with open(mm_path, "w") as f:
            for i in range(3):
                f.write(json.dumps({
                    "index": i, "image": "img%d.jpg" % i,
                    "question": "what is in image %d" % i,
                    "choices": ["cat", "dog"], "hint": None,
                    "answer": "A", "l2-category": "object",
                }) + "\n")
        vq_path = os.path.join(tmp_path, "vqa.jsonl")
        with open(vq_path, "w") as f:
            for i in range(3):
                f.write(json.dumps({
                    "question_id": i, "image": "img%d.jpg" % i,
                    "question": "what color is object %d" % i,
                    "answer": ["red"] * 10,
                }) + "\n")

        mm_items = load_mmbench(mm_path)
        assert mm_items[0].hint == "N/A" and len(mm_items) == 3
        vq_items = load_vqa_jsonl(vq_path)
        assert vq_items[0].answers == ["red"] * 10

        eng = BatchingEngine(vllm, n_slots=4, max_len=96,
                             steps_per_dispatch=2).start()
        try:
            run_mmbench(eng, mm_items, max_new_tokens=4)
            run_vqa(eng, vq_items, max_new_tokens=4)
        finally:
            eng.shutdown()
        assert all(isinstance(it.prediction, str) for it in mm_items)
        out = mmbench_results(mm_items)
        assert len(out["submission"]) == 3 and "accuracy" in out
        s = vqa_scores(vq_items)
        assert s["n"] == 3 and 0.0 <= s["overall"] <= 100.0

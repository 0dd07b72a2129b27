"""MME-style benchmark runner: scoring parity + engine-driven run.

Scoring math is pinned against the reference's evaluate_mme.py
(parse_pred_ans :44-59, compute_metric :60-103, process_result :106-166)
on hand-computed fixtures; the end-to-end test drives synthetic MME
files through the continuous-batching engine on a tiny model.
"""
import os

from helpers import make_tiny_vllm

from devqa_tpu.eval.benchmarks import (MMEItem, load_mme, mme_image_path,
                                       mme_scores, parse_yes_no, run_mme)
from devqa_tpu.serve.engine import BatchingEngine


class TestParse:
    def test_exact(self):
        assert parse_yes_no("yes") == "yes"
        assert parse_yes_no("No") == "no"

    def test_prefix_four_chars(self):
        # reference: prefix_pred_ans = pred_ans[:4]
        assert parse_yes_no("yes, it is") == "yes"
        assert parse_yes_no("no way") == "no"
        assert parse_yes_no("nope") == "no"      # "no" in "nope"[:4]
        assert parse_yes_no("maybe yes") == "other"  # "mayb" has neither
        assert parse_yes_no("") == "other"

    def test_no_strip_quirk(self):
        # the reference never strips inside parse_pred_ans (it strips at
        # decode time only): a stored "    yes" has prefix "    " ->
        # other. run_mme records stripped text, so this only matters for
        # externally-produced prediction files — where parity counts.
        assert parse_yes_no("    yes") == "other"
        assert parse_yes_no(" yes") == "yes"  # "yes" still in " yes"[:4]


class TestImagePath:
    def test_release_layout(self):
        # evaluate_mme.py:225-233: five tasks keep images under images/
        assert mme_image_path("/d", "landmark", "a.jpg") == \
            os.path.join("/d", "landmark", "images", "a.jpg")
        assert mme_image_path("/d", "existence", "a.jpg") == \
            os.path.join("/d", "existence", "a.jpg")
        # empty root: bare name (synthetic providers ignore paths)
        assert mme_image_path("", "existence", "a.jpg") == "a.jpg"


def _item(task, img, ans, pred):
    it = MMEItem(task, img, "q of %s" % img, ans)
    it.prediction = pred
    return it


class TestScores:
    def test_acc_and_acc_plus(self):
        # img1: both right -> acc_plus hit; img2: one wrong.
        items = [
            _item("existence", "i1.jpg", "yes", "yes"),
            _item("existence", "i1.jpg", "no", "no"),
            _item("existence", "i2.jpg", "yes", "no"),
            _item("existence", "i2.jpg", "no", "no"),
        ]
        s = mme_scores(items)
        m = s["tasks"]["existence"]
        assert m["acc"] == 0.75 and m["acc_plus"] == 0.5
        assert m["score"] == (0.75 + 0.5) * 100
        assert s["totals"]["Perception"] == m["score"]
        assert s["totals"]["Cognition"] == 0.0

    def test_other_counts_wrong_and_excluded_from_prf(self):
        items = [
            _item("code_reasoning", "c1.jpg", "yes", "dunno"),
            _item("code_reasoning", "c1.jpg", "no", "no"),
        ]
        m = mme_scores(items)["tasks"]["code_reasoning"]
        assert m["acc"] == 0.5 and m["other_num"] == 1
        assert m["TP"] == 0 and m["TN"] == 1 and m["FP"] == 0 and m["FN"] == 0
        assert m["acc_plus"] == 0.0

    def test_confusion_matrix(self):
        items = [
            _item("color", "a.jpg", "yes", "yes"),   # TP
            _item("color", "a.jpg", "no", "yes"),    # FP
            _item("color", "b.jpg", "yes", "no"),    # FN
            _item("color", "b.jpg", "no", "no"),     # TN
        ]
        m = mme_scores(items)["tasks"]["color"]
        assert (m["TP"], m["FP"], m["FN"], m["TN"]) == (1, 1, 1, 1)
        assert m["precision"] == 0.5 and m["recall"] == 0.5


class TestLoadAndRun:
    def test_load_and_engine_run(self, tmp_path):
        for task in ("existence", "text_translation"):
            with open(os.path.join(tmp_path, task + ".txt"), "w") as f:
                for i in range(2):
                    f.write("img%d.jpg\tis there a cat in image %d? "
                            "The answer is:\tyes\n" % (i, i))
                    f.write("img%d.jpg\tis the image %d empty? "
                            "The answer is:\tno\n" % (i, i))
        items = load_mme(str(tmp_path))
        assert len(items) == 8
        assert {it.task for it in items} == {"existence", "text_translation"}

        vllm = make_tiny_vllm()
        eng = BatchingEngine(vllm, n_slots=4, max_len=96).start()
        try:
            run_mme(eng, items, max_new_tokens=3)
        finally:
            eng.shutdown()
        assert all(it.prediction is not None for it in items)
        s = mme_scores(items)
        # tiny random weights: scores exist and are bounded, parse never
        # crashes; both eval types present.
        assert set(s["totals"]) == {"Perception", "Cognition"}
        for m in s["tasks"].values():
            assert 0.0 <= m["acc"] <= 1.0 and 0.0 <= m["acc_plus"] <= 1.0

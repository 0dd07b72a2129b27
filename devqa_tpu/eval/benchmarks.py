"""External multimodal benchmark runners (MME-style) over the serve engine.

TPU-native counterpart of the reference's mPLUG-Owl2 evaluation scripts
(``easyeditor/trainer/mPLUG_Owl2/mplug_owl2/evaluate/evaluate_mme.py``):
the reference loops a torch DataLoader through ``model.generate`` one
batch at a time; here every benchmark question is submitted to the
continuous-batching :class:`~devqa_tpu.serve.engine.BatchingEngine` at
once, so prefill and decode of independent questions overlap in the
engine's shared decode slots (O(1) compiled shapes, same property the
serve bench measures).

Scoring reproduces the reference exactly (evaluate_mme.py:44-166):

- ``parse_yes_no``: exact "yes"/"no" pass through; otherwise the first
  4 characters decide ("yes" in prefix -> yes, "no" in prefix -> no,
  else "other").
- per-task ``acc`` counts "other" as wrong; ``acc_plus`` is the
  fraction of images whose BOTH questions are correct (MME pairs two
  questions per image); task score = (acc + acc_plus) * 100.
- precision/recall/TP-FN-TN-FP are computed over the yes/no subset
  (predictions parsed to "other" are excluded, counted in other_num).
- eval-type totals sum task scores over the Perception / Cognition
  task lists (evaluate_mme.py:30-34).

Data layout matches MME's release format: ``<base_dir>/<task>.txt``
with tab-separated ``image_name\tquestion\tanswer`` lines, two lines
per image_name.
"""
from __future__ import annotations

import os
from collections import OrderedDict, defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional

MME_EVAL_TYPES: Dict[str, List[str]] = {
    "Perception": [
        "existence", "count", "position", "color", "posters", "celebrity",
        "scene", "landmark", "artwork", "OCR",
    ],
    "Cognition": [
        "commonsense_reasoning", "numerical_calculation",
        "text_translation", "code_reasoning",
    ],
}


@dataclass
class MMEItem:
    task: str
    image_name: str
    question: str
    answer: str          # ground truth, "yes" | "no"
    prediction: str = ""  # raw generated text


def parse_yes_no(pred: str) -> str:
    """Reference parse_pred_ans (evaluate_mme.py:44-59)."""
    pred = pred.lower().strip()
    if pred in ("yes", "no"):
        return pred
    prefix = pred[:4]
    if "yes" in prefix:
        return "yes"
    if "no" in prefix:
        return "no"
    return "other"


def load_mme(base_dir: str,
             tasks: Optional[List[str]] = None) -> List[MMEItem]:
    """Read MME-format ``<task>.txt`` files (image\tquestion\tanswer)."""
    items: List[MMEItem] = []
    all_tasks = tasks or [t for ts in MME_EVAL_TYPES.values() for t in ts]
    for task in all_tasks:
        path = os.path.join(base_dir, task + ".txt")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                img, q, a = line.split("\t")[:3]
                items.append(MMEItem(task, img, q, a.lower()))
    return items


def run_mme(engine, items: List[MMEItem], max_new_tokens: int = 10,
            image_root: str = "", prompt_suffix: str = "",
            timeout: float = 600.0) -> List[MMEItem]:
    """Generate predictions for every item through the batching engine.

    All requests are submitted up front (the engine's continuous
    batching keeps its decode slots saturated); ``prompt_suffix`` maps
    to the reference's answer-format instruction appended per question.
    """
    reqs = [engine.submit(it.question + prompt_suffix,
                          os.path.join(image_root, it.image_name),
                          max_new_tokens)
            for it in items]
    for it, r in zip(items, reqs):
        if not r.done.wait(timeout):
            raise TimeoutError("MME generation timed out: %s" % it.question)
        it.prediction = r.text
    return items


def _binary_stats(gts: List[str], preds: List[str]) -> Dict[str, float]:
    """TP/FN/TN/FP + precision/recall over the yes/no subset; acc over
    ALL items (others wrong) — evaluate_mme.py:60-103 semantics."""
    acc = sum(g == p for g, p in zip(gts, preds)) / max(1, len(gts))
    pairs = [(g, p) for g, p in zip(gts, preds) if p != "other"]
    tp = sum(1 for g, p in pairs if g == "yes" and p == "yes")
    fn = sum(1 for g, p in pairs if g == "yes" and p == "no")
    fp = sum(1 for g, p in pairs if g == "no" and p == "yes")
    tn = sum(1 for g, p in pairs if g == "no" and p == "no")
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    return {"TP": tp, "FN": fn, "TN": tn, "FP": fp,
            "precision": precision, "recall": recall,
            "other_num": len(gts) - len(pairs), "acc": acc}


def mme_scores(items: List[MMEItem]) -> Dict[str, dict]:
    """Per-task metric dicts + Perception/Cognition totals."""
    by_task: Dict[str, "OrderedDict[str, List[MMEItem]]"] = defaultdict(
        OrderedDict)
    for it in items:
        by_task[it.task].setdefault(it.image_name, []).append(it)
    out: Dict[str, dict] = {"tasks": {}, "totals": {}}
    for etype, tasks in MME_EVAL_TYPES.items():
        total = 0.0
        for task in tasks:
            if task not in by_task:
                continue
            imgs = by_task[task]
            gts, preds = [], []
            acc_plus_n = 0
            for pair in imgs.values():
                correct = 0
                for it in pair:
                    p = parse_yes_no(it.prediction)
                    gts.append(it.answer)
                    preds.append(p)
                    correct += int(p == it.answer)
                if correct == len(pair) == 2:
                    acc_plus_n += 1
            m = _binary_stats(gts, preds)
            m["acc_plus"] = acc_plus_n / max(1, len(imgs))
            m["score"] = (m["acc"] + m["acc_plus"]) * 100
            out["tasks"][task] = m
            total += m["score"]
        out["totals"][etype] = total
    return out

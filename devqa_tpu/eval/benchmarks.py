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
import re
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
    """Reference parse_pred_ans (evaluate_mme.py:44-59) on the lowered
    text — NO strip here: the reference strips only at decode time
    (evaluate_mme.py:341, mirrored by run_mme when recording), so a
    whitespace-prefixed stored prediction parses to "other" exactly as
    the reference's does."""
    pred = pred.lower()
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


#: MME release tasks whose images live under an extra ``images/``
#: subdirectory (evaluate_mme.py:227-231).
_MME_IMAGES_SUBDIR = ("landmark", "artwork", "celebrity", "posters",
                      "scene")


def mme_image_path(image_root: str, task: str, image_name: str) -> str:
    """MME's release layout (evaluate_mme.py:225-233):
    ``<root>/<task>/images/<name>`` for five tasks,
    ``<root>/<task>/<name>`` otherwise. COCO file names repeat across
    tasks, so a flat root cannot disambiguate. An empty ``image_root``
    keeps the bare name (synthetic image providers ignore paths)."""
    if not image_root:
        return image_name
    parts = [image_root, task]
    if task in _MME_IMAGES_SUBDIR:
        parts.append("images")
    parts.append(image_name)
    return os.path.join(*parts)


def run_mme(engine, items: List[MMEItem], max_new_tokens: int = 10,
            image_root: str = "", prompt_suffix: str = "",
            timeout: float = 600.0) -> List[MMEItem]:
    """Generate predictions for every item through the batching engine.

    All requests are submitted up front (the engine's continuous
    batching keeps its decode slots saturated). The reference strips
    the "Please answer yes or no." instruction from every question
    (evaluate_mme.py:242) — ``prompt_suffix`` can append a replacement
    answer-format instruction. Predictions are recorded stripped, the
    reference's decode-time behavior (evaluate_mme.py:341).
    """
    reqs = [engine.submit(
                it.question.replace("Please answer yes or no.", "")
                + prompt_suffix,
                mme_image_path(image_root, it.task, it.image_name),
                max_new_tokens)
            for it in items]
    for it, r in zip(items, reqs):
        if not r.done.wait(timeout):
            raise TimeoutError("MME generation timed out: %s" % it.question)
        if getattr(r, "error", None):
            raise RuntimeError("MME generation failed: %s (%s)"
                               % (r.error, it.question))
        it.prediction = r.text.strip()
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


# ---------------------------------------------------------------------------
# MMBench (evaluate_mmbench.py)
# ---------------------------------------------------------------------------

MMBENCH_CHOICES = ["A", "B", "C", "D", "E"]

#: the reference's exact prompt (evaluate_mmbench.py:182): hint,
#: question, lettered choices, then the answer-format instruction —
#: including its U+2019 apostrophe in "option’s" (an ASCII ' would
#: tokenize differently).
MMBENCH_PROMPT = ("{hint}\n{question}\n{choices}\nAnswer with the "
                  "option’s letter from the given choices directly.")


@dataclass
class MMBenchItem:
    index: int
    image: str           # image path (or base64 ref, resolved by caller)
    question: str
    choices: List[str]   # option texts in A..E order
    hint: str = ""
    answer: str = ""     # ground-truth letter (dev split; empty on test)
    l2_category: str = ""
    prediction: str = ""


def load_mmbench(jsonl_path: str) -> List[MMBenchItem]:
    """Read the reference's annotation JSONL (one object per line with
    index/image/hint/question/choices[/answer]) — the layout its
    ``VQADataset.__getitem__`` consumes (evaluate_mmbench.py:93-127)."""
    import json as _json

    items = []
    with open(jsonl_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = _json.loads(line)
            items.append(MMBenchItem(
                index=d["index"], image=d["image"],
                question=d["question"], choices=list(d["choices"]),
                hint=d.get("hint") or "N/A",
                answer=d.get("answer", "") or "",
                l2_category=d.get("l2-category", "")))
    return items


def mmbench_prompt(it: MMBenchItem) -> str:
    choice_txt = "\n".join("%s. %s" % (MMBENCH_CHOICES[i], c)
                           for i, c in enumerate(it.choices))
    return MMBENCH_PROMPT.format(hint=it.hint or "N/A",
                                 question=it.question, choices=choice_txt)


def run_mmbench(engine, items: List[MMBenchItem], max_new_tokens: int = 10,
                image_root: str = "", timeout: float = 600.0
                ) -> List[MMBenchItem]:
    """All questions ride the batching engine concurrently (the
    reference loops a DataLoader through model.generate)."""
    reqs = [engine.submit(mmbench_prompt(it),
                          os.path.join(image_root, it.image),
                          max_new_tokens)
            for it in items]
    for it, r in zip(items, reqs):
        if not r.done.wait(timeout):
            raise TimeoutError("MMBench timed out: index %s" % it.index)
        if getattr(r, "error", None):
            raise RuntimeError("MMBench generation failed: %s (index %s)"
                               % (r.error, it.index))
        it.prediction = r.text.strip()  # decode-time strip (evaluate_mmbench.py:217)
    return items


def parse_choice(pred: str, n_choices: int) -> str:
    """STRICT head-letter parse ('' if none): accepts a bare letter and
    punctuated forms ('A', 'a.', '(B)'), but a sentence-form prediction
    ('The answer is A') scores 0 — the scan stops at the first
    alphanumeric non-choice character. Local scoring is this build's
    addition (the reference only writes submission rows for the eval
    server, evaluate_mmbench.py:54-68), so strict-and-deterministic
    beats fuzzy here: the model is explicitly instructed to answer with
    the bare letter."""
    valid = MMBENCH_CHOICES[:n_choices]
    for ch in pred.strip().upper():
        if ch in valid:
            return ch
        if ch.isalnum():
            # a non-choice word started (e.g. 'YES'): only accept its
            # leading character, then stop
            break
    return ""


def mmbench_results(items: List[MMBenchItem]) -> Dict[str, object]:
    """Submission rows (generate_submission_file, evaluate_mmbench.py:
    54-68) + dev-split accuracy overall and per l2-category (the test
    split has no local answers — its rows go to the eval server)."""
    submission = [{
        "index": it.index, "question": it.question,
        "prediction": it.prediction,
        **{MMBENCH_CHOICES[i]: (it.choices[i] if i < len(it.choices)
                                else None) for i in range(4)},
    } for it in items]
    scored = [it for it in items if it.answer]
    out: Dict[str, object] = {"submission": submission}
    if scored:
        per_cat: Dict[str, List[int]] = defaultdict(list)
        hits = 0
        for it in scored:
            ok = int(parse_choice(it.prediction, len(it.choices))
                     == it.answer.strip().upper())
            hits += ok
            per_cat[it.l2_category or "all"].append(ok)
        out["accuracy"] = hits / len(scored)
        out["per_l2_category"] = {k: sum(v) / len(v)
                                  for k, v in per_cat.items()}
    return out


# ---------------------------------------------------------------------------
# VQA (evaluate_vqa.py + vqa_eval.py VQAEval protocol)
# ---------------------------------------------------------------------------

#: the reference's exact open-ended prompt (evaluate_vqa.py:162)
VQA_PROMPT = "{}\nAnswer the question using a single word or phrase."

_VQA_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't",
    "couldve": "could've", "couldnt": "couldn't",
    "couldn'tve": "couldn't've", "couldnt've": "couldn't've",
    "didnt": "didn't", "doesnt": "doesn't", "dont": "don't",
    "hadnt": "hadn't", "hadnt've": "hadn't've", "hadn'tve": "hadn't've",
    "hasnt": "hasn't", "havent": "haven't", "hed": "he'd",
    "hed've": "he'd've", "he'dve": "he'd've", "hes": "he's",
    "howd": "how'd", "howll": "how'll", "hows": "how's",
    "Id've": "I'd've", "I'dve": "I'd've", "Im": "I'm", "Ive": "I've",
    "isnt": "isn't", "itd": "it'd", "itd've": "it'd've",
    "it'dve": "it'd've", "itll": "it'll", "let's": "let's",
    "maam": "ma'am", "mightnt": "mightn't", "mightnt've": "mightn't've",
    "mightn'tve": "mightn't've", "mightve": "might've",
    "mustnt": "mustn't", "mustve": "must've", "neednt": "needn't",
    "notve": "not've", "oclock": "o'clock", "oughtnt": "oughtn't",
    "ow's'at": "'ow's'at", "'ows'at": "'ow's'at", "'ow'sat": "'ow's'at",
    "shant": "shan't", "shed've": "she'd've", "she'dve": "she'd've",
    "she's": "she's", "shouldve": "should've", "shouldnt": "shouldn't",
    "shouldnt've": "shouldn't've", "shouldn'tve": "shouldn't've",
    "somebody'd": "somebodyd", "somebodyd've": "somebody'd've",
    "somebody'dve": "somebody'd've", "somebodyll": "somebody'll",
    "somebodys": "somebody's", "someoned": "someone'd",
    "someoned've": "someone'd've", "someone'dve": "someone'd've",
    "someonell": "someone'll", "someones": "someone's",
    "somethingd": "something'd", "somethingd've": "something'd've",
    "something'dve": "something'd've", "somethingll": "something'll",
    "thats": "that's", "thered": "there'd", "thered've": "there'd've",
    "there'dve": "there'd've", "therere": "there're", "theres": "there's",
    "theyd": "they'd", "theyd've": "they'd've", "they'dve": "they'd've",
    "theyll": "they'll", "theyre": "they're", "theyve": "they've",
    "twas": "'twas", "wasnt": "wasn't", "wed've": "we'd've",
    "we'dve": "we'd've", "weve": "we've", "werent": "weren't",
    "whatll": "what'll", "whatre": "what're", "whats": "what's",
    "whatve": "what've", "whens": "when's", "whered": "where'd",
    "wheres": "where's", "whereve": "where've", "whod": "who'd",
    "whod've": "who'd've", "who'dve": "who'd've", "wholl": "who'll",
    "whos": "who's", "whove": "who've", "whyll": "why'll",
    "whyre": "why're", "whys": "why's", "wont": "won't",
    "wouldve": "would've", "wouldnt": "wouldn't",
    "wouldnt've": "wouldn't've", "wouldn'tve": "wouldn't've",
    "yall": "y'all", "yall'll": "y'all'll", "y'allll": "y'all'll",
    "yall'd've": "y'all'd've", "y'alld've": "y'all'd've",
    "y'all'dve": "y'all'd've", "youd": "you'd", "youd've": "you'd've",
    "you'dve": "you'd've", "youll": "you'll", "youre": "you're",
    "youve": "you've",
}
_VQA_DIGITS = {"none": "0", "zero": "0", "one": "1", "two": "2",
               "three": "3", "four": "4", "five": "5", "six": "6",
               "seven": "7", "eight": "8", "nine": "9", "ten": "10"}
_VQA_ARTICLES = ("a", "an", "the")
_VQA_PUNCT = (";", "/", "[", "]", '"', "{", "}", "(", ")", "=", "+",
              "\\", "_", "-", ">", "<", "@", "`", ",", "?", "!")


def vqa_process_punctuation(text: str) -> str:
    """VQAEval.processPunctuation (vqa_eval.py:254-264): punctuation
    stripping with the comma-in-number rule (conditions checked against
    the ORIGINAL string throughout), then the period strip — including
    the reference's regex quirk ``(?!<=\\d)`` (a no-op lookahead where a
    lookbehind was clearly intended)."""
    import re as _re

    out = text
    comma_num = _re.search(r"(\d)(,)(\d)", text) is not None
    for p in _VQA_PUNCT:
        if (p + " " in text or " " + p in text) or comma_num:
            out = out.replace(p, "")
        else:
            out = out.replace(p, " ")
    return _re.sub(r"(?!<=\d)(\.)(?!\d)", "", out)


def vqa_process_digit_article(text: str) -> str:
    """VQAEval.processDigitArticle (vqa_eval.py:265-280): lowercase,
    word-number mapping, article removal, contraction repair."""
    words = []
    for w in text.lower().split():
        w = _VQA_DIGITS.get(w, w)
        if w not in _VQA_ARTICLES:
            words.append(w)
    words = [_VQA_CONTRACTIONS.get(w, w) for w in words]
    return " ".join(words)


def vqa_normalize(ans: str) -> str:
    """The PREDICTION-side normalization chain (vqa_eval.py:212-217):
    newline/tab/strip pre-step, processPunctuation, processDigitArticle.
    Ground truths never take this full chain — on disagreement they get
    :func:`vqa_process_punctuation` ONLY (vqa_eval.py:220-223)."""
    out = ans.replace("\n", " ").replace("\t", " ").strip()
    return vqa_process_digit_article(vqa_process_punctuation(out))


@dataclass
class VQAItem:
    question_id: int
    image: str
    question: str
    answers: List[str]   # ground-truth answer list (10 for VQAv2)
    question_type: str = ""
    answer_type: str = ""
    prediction: str = ""


def load_vqa_jsonl(path: str) -> List[VQAItem]:
    """The reference's test JSONL layout (evaluate_vqa.py:96-110):
    one object per line with image/question/question_id[/answer]."""
    import json as _json

    items = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = _json.loads(line)
            a = d.get("answer")
            answers = a if isinstance(a, list) else ([a] if a else [])
            items.append(VQAItem(
                question_id=d["question_id"], image=d["image"],
                question=d["question"], answers=answers,
                question_type=d.get("question_type", ""),
                answer_type=d.get("answer_type", "")))
    return items


def run_vqa(engine, items: List[VQAItem], max_new_tokens: int = 10,
            image_root: str = "", timeout: float = 600.0) -> List[VQAItem]:
    reqs = [engine.submit(VQA_PROMPT.format(it.question),
                          os.path.join(image_root, it.image),
                          max_new_tokens)
            for it in items]
    for it, r in zip(items, reqs):
        if not r.done.wait(timeout):
            raise TimeoutError("VQA timed out: qid %s" % it.question_id)
        if getattr(r, "error", None):
            raise RuntimeError("VQA generation failed: %s (qid %s)"
                               % (r.error, it.question_id))
        it.prediction = r.text
    return items


def vqa_scores(items: List[VQAItem]) -> Dict[str, object]:
    """VQAEval.evaluate (vqa_eval.py:194-253): per-question accuracy is
    the mean over each annotator of min(1, matches-among-the-OTHER-9/3).
    The PREDICTION always takes the full normalization chain; the ground
    truths, only when they disagree, take processPunctuation ALONE — no
    lowercasing, digit mapping, article removal, or contraction repair
    (vqa_eval.py:220-223) — so e.g. gts "two" never match a prediction
    normalized to "2". Rounded overall/per-type percentages."""
    acc_qa: List[float] = []
    per_qtype: Dict[str, List[float]] = defaultdict(list)
    per_atype: Dict[str, List[float]] = defaultdict(list)
    for it in items:
        if not it.answers:
            continue
        res = vqa_normalize(it.prediction)
        gt = list(it.answers)
        if len(set(gt)) > 1:
            gt = [vqa_process_punctuation(g) for g in gt]
        accs = []
        for i in range(len(gt)):
            others = gt[:i] + gt[i + 1:]
            accs.append(min(1.0, sum(o == res for o in others) / 3.0))
        acc = sum(accs) / len(accs)
        acc_qa.append(acc)
        if it.question_type:
            per_qtype[it.question_type].append(acc)
        if it.answer_type:
            per_atype[it.answer_type].append(acc)
    if not acc_qa:
        return {"overall": 0.0, "n": 0}
    return {
        "overall": round(100.0 * sum(acc_qa) / len(acc_qa), 2),
        "perQuestionType": {k: round(100.0 * sum(v) / len(v), 2)
                            for k, v in per_qtype.items()},
        "perAnswerType": {k: round(100.0 * sum(v) / len(v), 2)
                          for k, v in per_atype.items()},
        "n": len(acc_qa),
    }


# ---------------------------------------------------------------------------
# MMMU (evaluate_mmmu.py)
# ---------------------------------------------------------------------------

MMMU_CHOICE_LETTERS = ["A", "B", "C", "D", "E", "F", "G", "H", "I"]

# Reference prompt templates (evaluate_mmmu.py:355-357) — note the U+2019
# apostrophe in "option's", shared with MMBench; an ASCII quote would
# tokenize differently.
MMMU_MC_PROMPT = ("USER: {}\nAnswer with the option’s letter from the "
                  "given choices directly. ASSISTANT:")
MMMU_OPEN_PROMPT = ("USER: {}\nAnswer the question using a single word or "
                    "phrase. ASSISTANT:")


def mmmu_prompt(question: str, options: Optional[List[str]],
                question_type: str) -> str:
    """Build the MMMU prompt (evaluate_mmmu.py:349-368): multiple-choice
    options are lettered 'A. <opt>' lines appended to the question; any
    ``<image N>`` placeholders (N in 1..5) become the model's image token."""
    if question_type == "multiple-choice":
        choice_txt = "\n".join(
            "{}. {}".format(MMMU_CHOICE_LETTERS[i], c)
            for i, c in enumerate(options or []))
        prompt = MMMU_MC_PROMPT.format(question + "\n" + choice_txt)
    else:
        prompt = MMMU_OPEN_PROMPT.format(question)
    for i in range(1, 6):
        prompt = prompt.replace("<image %d>" % i, "<|image|>")
    return prompt


def mmmu_parse_multi_choice(response: str, all_choices: List[str],
                            index2ans: Dict[str, str],
                            rng=None) -> str:
    """parse_multi_choice_response (evaluate_mmmu.py:71-123): find the
    chosen letter by (1) '(A)' bracketed mention, (2) ' A ' bare mention,
    (3) option-content substring when the response is > 5 words; ties
    resolve to the LAST occurrence (rfind argmax); no hit -> random
    choice.

    The reference resolves multi-candidate ties via ``np.argmax`` with
    numpy never imported (a latent NameError on that branch); this
    implements the intended argmax (first-max wins on equal rfind
    positions, matching np.argmax), which the oracle test verifies by
    executing the reference source with numpy injected."""
    import random as _random

    for ch in [",", ".", "!", "?", ";", ":", "'"]:
        response = response.strip(ch)
    response = " " + response + " "   # avoid partial matches

    index_ans = True
    ans_with_brack = False
    candidates: List[str] = []
    for choice in all_choices:
        if "(%s)" % choice in response:
            candidates.append(choice)
            ans_with_brack = True
    if not candidates:
        for choice in all_choices:
            if " %s " % choice in response:
                candidates.append(choice)
    if not candidates and len(response.split()) > 5:
        for index, ans in index2ans.items():
            if ans.lower() in response.lower():
                candidates.append(index)
                index_ans = False
    if not candidates:
        return (rng or _random).choice(all_choices)
    if len(candidates) == 1:
        return candidates[0]
    starts: List[int] = []
    for can in candidates:
        if not index_ans:
            starts.append(response.lower().rfind(index2ans[can].lower()))
        elif ans_with_brack:
            starts.append(response.rfind("(%s)" % can))
        else:
            starts.append(response.rfind(" %s " % can))
    return candidates[max(range(len(starts)), key=lambda i: starts[i])]


def mmmu_check_is_number(string: str) -> bool:
    """check_is_number (evaluate_mmmu.py:126-134): float()-parseable
    after dropping thousands commas."""
    try:
        float(string.replace(",", ""))
        return True
    except ValueError:
        return False


def mmmu_normalize_str(string: str):
    """normalize_str (evaluate_mmmu.py:137-159): numbers -> [round(f, 2)];
    single chars -> space-padded pair; else [lowered string]."""
    string = string.strip()
    if mmmu_check_is_number(string):
        return [round(float(string.replace(",", "")), 2)]
    string = string.lower()
    if len(string) == 1:
        return [" " + string, string + " "]
    return [string]


# extract_numbers regexes are protocol constants (evaluate_mmmu.py:161-181).
_MMMU_NUM_COMMAS = re.compile(r"-?\b\d{1,3}(?:,\d{3})+\b")
_MMMU_NUM_SCI = re.compile(r"-?\d+(?:\.\d+)?[eE][+-]?\d+")
_MMMU_NUM_SIMPLE = re.compile(
    r"-?(?:\d+\.\d+|\.\d+|\d+\b)(?![eE][+-]?\d+)(?![,\d])")


def mmmu_extract_numbers(string: str) -> List[str]:
    return (_MMMU_NUM_COMMAS.findall(string)
            + _MMMU_NUM_SCI.findall(string)
            + _MMMU_NUM_SIMPLE.findall(string))


_MMMU_KEY_INDICATORS = ["could be ", "so ", "is ", "thus ", "therefore ",
                        "final ", "answer ", "result "]


def mmmu_parse_open_response(response: str) -> List:
    """parse_open_response (evaluate_mmmu.py:183-232). Faithful quirks:
    the sub-response split regex looks for '. <uppercase>' AFTER the
    text is lowercased, so it only ever splits on newlines; '=' joins
    the indicator list only for the final sub-response; results are
    de-duplicated through an (unordered) set."""
    response = response.strip().strip(".").lower()
    subs = re.split(r"\.\s(?=[A-Z])|\n", response)
    indicators = list(_MMMU_KEY_INDICATORS)
    key_responses: List[str] = []
    for index, resp in enumerate(subs):
        if index == len(subs) - 1:
            indicators.append("=")
        shortest = None
        for ind in indicators:
            if ind in resp:
                tail = resp.split(ind)[-1].strip()
                if shortest is None or len(tail) < len(shortest):
                    shortest = tail
        if shortest is not None and shortest.strip() not in \
                [":", ",", ".", "!", "?", ";", "'"]:
            key_responses.append(shortest)
    if not key_responses:
        key_responses = [response]
    pred_list: List = list(key_responses)
    for resp in key_responses:
        pred_list.extend(mmmu_extract_numbers(resp))
    out: List = []
    for p in pred_list:
        out.extend(mmmu_normalize_str(p))
    return list(set(out))


def mmmu_eval_multi_choice(gold, pred: str) -> bool:
    """eval_multi_choice (evaluate_mmmu.py:236-250): exact match against
    the gold letter (or any of a gold list)."""
    golds = gold if isinstance(gold, list) else [gold]
    return any(g == pred for g in golds)


def mmmu_eval_open(gold, pred_list: List) -> bool:
    """eval_open (evaluate_mmmu.py:252-277): normalized gold answers vs
    the parsed prediction list; string predictions match when they
    CONTAIN a normalized string answer, float predictions by exact
    membership — any single match scores the instance correct."""
    norm_answers: List = []
    for answer in (gold if isinstance(gold, list) else [gold]):
        norm_answers.extend(mmmu_normalize_str(answer))
    for pred in pred_list:
        if isinstance(pred, str):
            if any(isinstance(na, str) and na in pred
                   for na in norm_answers):
                return True
        elif pred in norm_answers:
            return True
    return False


def mmmu_evaluate(samples: List[Dict]):
    """evaluate (evaluate_mmmu.py:280-302). Returns
    ``(judge_dict, {'acc': fraction})``; the reference's as-written quirk
    of returning a bare ``{'acc': 0}`` dict (no tuple) on an empty sample
    list is preserved."""
    if not samples:
        return {"acc": 0}
    pred_correct = 0
    judge: Dict = {}
    for s in samples:
        if s["question_type"] == "multiple-choice":
            ok = mmmu_eval_multi_choice(s["ground_truth"], s["prediction"])
        else:
            ok = mmmu_eval_open(s["ground_truth"], s["prediction"])
        judge[s["index"]] = "Correct" if ok else "Wrong"
        pred_correct += int(ok)
    return judge, {"acc": pred_correct / len(samples)}


def mmmu_scores(outputs: List[Dict]) -> Dict[str, object]:
    """The __main__ aggregation as executed (evaluate_mmmu.py:506-530):
    group outputs by 'split'; OPEN predictions run through
    :func:`mmmu_parse_open_response` while multiple-choice predictions
    are compared RAW to the gold letter (``parse_multi_choice_response``
    is defined but never called by the script); per-category acc x100
    plus a sample-weighted Overall."""
    groups: Dict[str, List[Dict]] = OrderedDict()
    for output in outputs:
        tmp = dict(output)
        if tmp["question_type"] != "multiple-choice":
            tmp["prediction"] = mmmu_parse_open_response(tmp["prediction"])
        groups.setdefault(output["split"], []).append(tmp)
    metrics: Dict[str, object] = {"Overall": 0.0}
    judges: Dict[str, Dict] = {}
    total = 0.0
    for category, outs in groups.items():
        judge, metric = mmmu_evaluate(outs)
        metrics[category] = metric["acc"] * 100
        judges[category] = judge
        total += metric["acc"] * len(outs)
    if outputs:
        metrics["Overall"] = total / len(outputs) * 100
    return {"metrics": metrics, "judges": judges}


@dataclass
class MMMUItem:
    index: str
    image: str                      # image path ("" for text-only items)
    question: str                   # raw question (may hold <image N>)
    question_type: str              # "multiple-choice" | "open"
    answer: object = ""             # gold letter / answer (or list)
    options: Optional[List[str]] = None
    subfield: str = ""
    split: str = ""                 # MMMU subject, the grouping key
    prediction: str = ""


def load_mmmu_jsonl(path: str) -> List[MMMUItem]:
    """Flat JSONL stand-in for the HF parquet MMMU release (the dataset
    itself stays external; evaluate_mmmu.py:330-381 reads it via
    ``datasets.load_dataset``): one object per line with
    id/image/question/question_type/answer[/options/subfield/split]."""
    import json as _json

    items = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = _json.loads(line)
            items.append(MMMUItem(
                index=d["id"], image=d.get("image", ""),
                question=d["question"],
                question_type=d["question_type"],
                answer=d.get("answer", ""), options=d.get("options"),
                subfield=d.get("subfield", ""),
                split=d.get("split", d.get("subject", ""))))
    return items


def load_mmmu_parquet(paths, image_dir: Optional[str] = None
                      ) -> List[MMMUItem]:
    """Read the HF MMMU parquet release directly (pandas/pyarrow) — the
    same rows the reference loads via ``datasets.load_dataset``
    (evaluate_mmmu.py:330-381), without the datasets dependency.

    Per-row mapping, as the reference consumes it:
    - ``options`` arrives as a repr'd python list string —
      literal_eval'd (the reference evals it at :348);
    - embedded image payloads (``image_1`` structs of {bytes, path})
      are materialized under ``image_dir`` so the engine's path-keyed
      vision cache can reuse repeats; items with no image stay
      text-only (the reference keeps them, vision features zeroed);
    - subject/split derives from the id ("validation_Accounting_1" →
      "Accounting"), the grouping key of mmmu_scores.
    """
    import ast

    import pandas as pd

    items: List[MMMUItem] = []
    for path in paths:
        df = pd.read_parquet(path)
        for row in df.to_dict("records"):
            rid = str(row.get("id", ""))
            parts = rid.split("_")
            subject = "_".join(parts[1:-1]) if len(parts) >= 3 else ""
            options = row.get("options")
            if isinstance(options, str):
                try:
                    options = ast.literal_eval(options)
                except (ValueError, SyntaxError):
                    options = None
            elif options is not None:
                options = list(options)
            img_path = ""
            payload = row.get("image_1")
            if payload is not None and image_dir:
                data = payload.get("bytes") if isinstance(payload, dict) \
                    else getattr(payload, "get", lambda *_: None)("bytes")
                if data:
                    os.makedirs(image_dir, exist_ok=True)
                    img_path = os.path.join(image_dir, "%s.png" % rid)
                    if not os.path.exists(img_path):
                        with open(img_path, "wb") as f:
                            f.write(data)
            items.append(MMMUItem(
                index=rid, image=img_path,
                question=str(row.get("question", "")),
                question_type=str(row.get("question_type", "")),
                answer=row.get("answer", ""), options=options,
                subfield=str(row.get("subfield", "")),
                split=subject))
    return items


def run_mmmu(engine, items: List[MMMUItem], max_new_tokens: int = 20,
             image_root: str = "", timeout: float = 600.0) -> List[MMMUItem]:
    """Drive all MMMU questions through the batching engine at once
    (reference: sequential DataLoader + model.generate with
    max_new_tokens=20, evaluate_mmmu.py:457-474)."""
    reqs = [engine.submit(
        mmmu_prompt(it.question, it.options, it.question_type),
        os.path.join(image_root, it.image) if it.image else None,
        max_new_tokens) for it in items]
    for it, r in zip(items, reqs):
        if not r.done.wait(timeout):
            raise TimeoutError("MMMU timed out: id %s" % it.index)
        if getattr(r, "error", None):
            raise RuntimeError("MMMU generation failed: %s (id %s)"
                               % (r.error, it.index))
        it.prediction = r.text.strip()
    return items


def mmmu_outputs(items: List[MMMUItem]) -> List[Dict]:
    """Predicted items -> the output-record schema the reference merges
    across ranks (evaluate_mmmu.py:476-486)."""
    return [{
        "index": it.index, "prediction": it.prediction,
        "ground_truth": it.answer, "split": it.split,
        "subfield": it.subfield, "question_type": it.question_type,
        "origin_question": it.question,
    } for it in items]

"""Text-only editing datasets — the EasyEdit dataset pkg's ZsRE and
CounterFact loaders (``easyeditor/dataset/zsre.py``, ``counterfact.py``)
reduced to the request schema the LLM editing session consumes:

  {'case_id', 'prompt', 'target_new', 'ground_truth', 'subject',
   'rephrase_prompt', 'locality': {'neighborhood': {'prompt',
   'ground_truth'}}}

Also the LiveEdit-stack text data model (``dataset/llm.py:10-37``
BaseLLMEditData): {requests, generality{...}, locality{...}} of text
probes.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional


def load_zsre(path: str, size: Optional[int] = None) -> List[Dict]:
    """MEND-format zsre json (zsre_mend_*.json): fields src, answers/alt,
    rephrase, loc, loc_ans, subject."""
    with open(path) as f:
        raw = json.load(f)
    if size is not None:
        raw = raw[:size]
    out = []
    for i, r in enumerate(raw):
        target = r.get("alt") or (r.get("answers") or [""])[0]
        out.append({
            "case_id": i,
            "prompt": r["src"],
            "target_new": target,
            "ground_truth": (r.get("answers") or [r.get("pred", "")])[0],
            "subject": r.get("subject", ""),
            "rephrase_prompt": r.get("rephrase"),
            "locality": {
                "neighborhood": {
                    "prompt": r.get("loc", "").removeprefix("nq question: "),
                    "ground_truth": r.get("loc_ans", ""),
                }
            } if r.get("loc") else {},
        })
    return out


def load_counterfact(path: str, size: Optional[int] = None) -> List[Dict]:
    """CounterFact json: requested_rewrite + paraphrase/neighborhood
    prompts."""
    with open(path) as f:
        raw = json.load(f)
    if size is not None:
        raw = raw[:size]
    out = []
    for i, r in enumerate(raw):
        rw = r["requested_rewrite"]
        prompt = rw["prompt"].format(rw["subject"])
        para = (r.get("paraphrase_prompts") or [None])[0]
        neigh = (r.get("neighborhood_prompts") or [None])[0]
        out.append({
            "case_id": r.get("case_id", i),
            "prompt": prompt,
            "target_new": rw["target_new"]["str"],
            "ground_truth": rw["target_true"]["str"],
            "subject": rw["subject"],
            "rephrase_prompt": para,
            "locality": {
                "neighborhood": {
                    "prompt": neigh,
                    "ground_truth": rw["target_true"]["str"],
                }
            } if neigh else {},
        })
    return out


class BaseLLMEditData:
    """dataset/llm.py:10-37 — the LiveEdit-stack text-edit structure."""

    def __init__(self, requests: List[Dict]):
        self.data = [{
            "requests": [{"prompt": r["prompt"], "target_new": r["target_new"],
                          "image": None}],
            "generality": {
                "text_rephrase": [{"prompt": r.get("rephrase_prompt")
                                   or r["prompt"],
                                   "target": r["target_new"], "image": None}]},
            "locality": {
                # Locality-less records get an EMPTY probe list (the
                # harness skips empty specs) — falling back to the edit
                # request itself would guarantee a "locality violation"
                # on every record without one.
                "text_loc": [{"prompt": loc["prompt"],
                              "target": loc["ground_truth"], "image": None}
                             for loc in r.get("locality", {}).values()]},
        } for r in requests]


def load_knowedit(path: str, size: Optional[int] = None) -> List[Dict]:
    """KnowEdit-format json (easyeditor/dataset/knowedit.py:60-95):
    prompt|text, target_new|labels, subject|concept, portability/locality
    sub-dicts."""
    with open(path) as f:
        raw = json.load(f)
    if size is not None:
        raw = raw[:size]
    out = []
    for i, r in enumerate(raw):
        loc = {}
        loc_src = (r.get("locality") or {})
        for name, lst in loc_src.items():
            if lst and isinstance(lst, list) and lst[0].get("prompt"):
                p = lst[0]["prompt"]
                gt = lst[0].get("ground_truth", "")
                if isinstance(p, list):
                    p = p[0]
                if isinstance(gt, list):
                    gt = gt[0] if gt else ""
                loc[name] = {"prompt": p, "ground_truth": gt}
        out.append({
            "case_id": i,
            "prompt": r.get("prompt") or r.get("text"),
            "target_new": r.get("target_new") or r.get("labels"),
            "ground_truth": r.get("ground_truth", ""),
            "subject": r.get("subject") or r.get("concept", ""),
            "rephrase_prompt": r.get("rephrase"),
            "locality": loc,
        })
    return out


def load_wiki_recent(path: str, size: Optional[int] = None) -> List[Dict]:
    """wiki_recent-format json (easyeditor/dataset/wiki_recent.py:53-80)."""
    with open(path) as f:
        raw = json.load(f)
    if size is not None:
        raw = raw[:size]
    out = []
    for i, r in enumerate(raw):
        if not r.get("target_new"):
            continue
        out.append({
            "case_id": i,
            "prompt": r["prompt"],
            "target_new": r["target_new"],
            "ground_truth": r.get("ground_truth", ""),
            "subject": r.get("subject", ""),
            "rephrase_prompt": r.get("rephrase") or r["prompt"],
            "locality": ({"neighborhood": {
                "prompt": r["locality"]["prompt"],
                "ground_truth": r["locality"].get("ground_truth", "")}}
                if isinstance(r.get("locality"), dict)
                and r["locality"].get("prompt") else {}),
        })
    return out


def load_knowns(path: str, size: Optional[int] = None) -> List[Dict]:
    """known_1000.json (easyeditor/dataset/knowns.py): {known_id, subject,
    attribute, template, prompt} — used for causal-trace style analysis."""
    with open(path) as f:
        raw = json.load(f)
    if size is not None:
        raw = raw[:size]
    return [{"case_id": r.get("known_id", i), "prompt": r["prompt"],
             "target_new": r["attribute"], "ground_truth": r["attribute"],
             "subject": r["subject"], "locality": {}}
            for i, r in enumerate(raw)]

"""Edit-evaluation data model: EVQA / EIC / VLKEB loaders and the dynamic
t×i locality probe synthesis.

Reproduces ``dataset/vllm.py`` exactly:

- test-case structure {requests, generality{text_rephrase, image_rephrase},
  locality{text_loc, t3i3, t1i4, t2i4, t1i2, t1i3, t2i1, t2i2, t3i1}}
  (``BaseVLLMEditData`` docstring + ``__init_eic_evqa__``, vllm.py:121-228);
- the t×i grid: t1 = edit prompt, t2 = retrieved-similar prompt,
  t3 = multimodal-locality question; i1 = edit image, i2 = retrieved
  image, i3 = locality image, i4 = no image (vllm.py:161-223);
- per-dataset prompt templates, including the reference's exact
  (idiosyncratic) ordering: EVQA/VLKEB append " The answer is:" to every
  locality prompt and THEN append "?" to text_loc, yielding
  "<q> The answer is:?" (vllm.py:246-248, 283-288).

Raw JSON field schema (data/VLKEB/*.json, easy-edit-mm/vqa/*.json):
src, rephrase, pred, alt, image, image_rephrase, loc, loc_ans,
m_loc, m_loc_q, m_loc_a.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

from ..retrieval.store import EmbeddingStore, Retriever

LOCALITY_KEYS = ["text_loc", "t3i3", "t1i4", "t2i4", "t1i2", "t1i3", "t2i1",
                 "t2i2", "t3i1"]
GENERALITY_KEYS = ["text_rephrase", "image_rephrase"]


@dataclasses.dataclass
class Probe:
    prompt: str
    target: str
    image: Optional[str]  # image path (None = no image)


@dataclasses.dataclass
class TestCase:
    requests: List[Dict]                    # {'image','prompt','target_new'}
    generality: Dict[str, List[Dict]]       # {'image','prompt','target'}
    locality: Dict[str, List[Dict]]


def build_dataset_retriever(records: Sequence[Dict], img_root_dir: str,
                            encoder, top_k: int = 5) -> Retriever:
    """Build the probe-retrieval store over the dataset itself.

    The reference loads pre-pickled stores (vlkeb_embeddings_collect.pkl /
    vqa_embeddings_llava.pkl, vllm.py:89-117) whose construction scripts
    live outside the repo; semantically they index each record's source
    prompt with its original answer and image. We rebuild that store from
    the records directly (and it can be saved/loaded in the same pickle
    schema via EmbeddingStore).
    """
    sentences = [r["src"] for r in records]
    prompts = [(r["src"], r.get("pred", r.get("alt", ""))) for r in records]
    images = [os.path.join(img_root_dir, r["image"]) for r in records]
    store = EmbeddingStore.build(sentences, encoder, images, prompts)
    return Retriever(store, encoder, top_k=top_k)


def synthesize_cases(
    records: Sequence[Dict],
    img_root_dir: str,
    retriever: Retriever,
    data_n: Optional[int] = None,
    faithful_t3_path_bug: bool = False,
) -> List[TestCase]:
    """``__init_eic_evqa__`` (vllm.py:121-228): build request/generality/
    locality with the full t×i probe grid.

    ``faithful_t3_path_bug``: vllm.py:164 sets t3 = d['m_loc'] — the image
    *path string*, not the locality question — so the reference's t3i1
    probe prompts with a file path. Default reproduces the evident intent
    (t3 = m_loc_q, as t3i3 uses); set True to replicate the reference
    bit-for-bit for cross-framework number comparison.
    """
    n = len(records) if data_n is None else min(len(records), data_n)
    recs = records[:n]
    # Same answer-fallback expression as the store build above: an
    # asymmetric fallback ('' here vs alt there) lets a pred-less record
    # match ITSELF as the similar neighbor, collapsing the t2/i2 probes
    # into the edit request.
    sim = retriever.find_similar_batch(
        [d["src"] for d in recs],
        [d.get("pred", d.get("alt", "")) for d in recs])
    cases = []
    for d, ((t2_prompt, _t2_ans), i2_path) in zip(recs, sim):
        i1 = os.path.join(img_root_dir, d["image"])
        i3 = os.path.join(img_root_dir, d["m_loc"])
        t1, t2 = d["src"], t2_prompt
        t3 = d["m_loc"] if faithful_t3_path_bug else d["m_loc_q"]
        alt = d["alt"]
        case = TestCase(
            requests=[{"image": i1, "prompt": d["src"], "target_new": alt}],
            generality={
                "text_rephrase": [{"image": i1, "prompt": d["rephrase"], "target": alt}],
                "image_rephrase": [{"image": os.path.join(img_root_dir, d["image_rephrase"]),
                                    "prompt": d["src"], "target": alt}],
            },
            locality={
                "text_loc": [{"image": None, "prompt": d["loc"], "target": d["loc_ans"]}],
                "t3i3": [{"image": i3, "prompt": d["m_loc_q"], "target": d["m_loc_a"]}],
                "t1i4": [{"image": None, "prompt": t1, "target": alt}],
                "t2i4": [{"image": None, "prompt": t2, "target": alt}],
                "t1i2": [{"image": i2_path, "prompt": t1, "target": alt}],
                "t1i3": [{"image": i3, "prompt": t1, "target": alt}],
                "t2i1": [{"image": i1, "prompt": t2, "target": alt}],
                "t2i2": [{"image": i2_path, "prompt": t2, "target": alt}],
                "t3i1": [{"image": i1, "prompt": t3, "target": d["m_loc_a"]}],
            },
        )
        cases.append(case)
    return cases


def _apply_evqa_vlkeb_templates(cases: List[TestCase],
                                requests_too: bool = True) -> None:
    """EVQA (vllm.py:237-248) / VLKEB (vllm.py:283-288) prompt templates.

    ``requests_too``: EVQA templates the request and both generality
    prompts as well; VLKEB templates ONLY the locality prompts — its
    request/generality prompts stay raw (vllm.py:283-288 has no
    requests/generality lines). Verified against the real eval JSONs in
    tests/test_real_data.py.
    """
    for c in cases:
        if requests_too:
            c.requests[0]["prompt"] = ("%s The answer is:"
                                       % c.requests[0]["prompt"])
            c.generality["text_rephrase"][0]["prompt"] = (
                "%s The answer is:"
                % c.generality["text_rephrase"][0]["prompt"])
            c.generality["image_rephrase"][0]["prompt"] = (
                "%s The answer is:"
                % c.generality["image_rephrase"][0]["prompt"])
        for key in c.locality:
            c.locality[key][0]["prompt"] = (
                "%s The answer is:" % c.locality[key][0]["prompt"])
        # Reference order: the "?" is appended AFTER the template above,
        # producing "<q> The answer is:?" for text_loc (vllm.py:248).
        c.locality["text_loc"][0]["prompt"] = (
            "%s?" % c.locality["text_loc"][0]["prompt"])


class BaseVLLMEditData:
    """Loaded evaluation dataset (list of TestCases with image *paths*;
    images decode lazily at batch time via an ImageProvider)."""

    def __init__(self, cases: List[TestCase]):
        self.cases = cases

    @property
    def data(self) -> List[TestCase]:
        return self.cases

    def dataset_name(self) -> str:
        raise NotImplementedError

    def __len__(self):
        return len(self.cases)


def _load_records(data_path: str) -> List[Dict]:
    with open(data_path, "r") as f:
        return json.load(f)


def unique_image_paths(cases: Sequence[TestCase]) -> set:
    """All distinct image paths a case list can reference (requests,
    generality and locality probes) — used to right-size vision-token
    caches so repeated epochs/splits don't re-encode through the ViT."""
    paths = set()
    for c in cases:
        for r in c.requests:
            paths.add(r["image"])
        for lst in c.generality.values():
            for g in lst:
                paths.add(g["image"])
        for lst in c.locality.values():
            for l in lst:
                paths.add(l["image"])
    paths.discard(None)
    return paths


class EVQA(BaseVLLMEditData):
    """E-VQA (vllm.py:231-257): templates request + generality + locality
    prompts; VLKEB below templates only locality."""

    def __init__(self, data_path: str, img_root_dir: str,
                 retriever: Optional[Retriever] = None, data_n=None,
                 encoder=None, faithful_t3_path_bug: bool = False):
        records = _load_records(data_path)
        if retriever is None:
            assert encoder is not None, "need a retriever or a sentence encoder"
            retriever = build_dataset_retriever(records, img_root_dir, encoder)
        cases = synthesize_cases(records, img_root_dir, retriever, data_n,
                                 faithful_t3_path_bug=faithful_t3_path_bug)
        _apply_evqa_vlkeb_templates(cases)
        super().__init__(cases)

    def dataset_name(self):
        return "EVQA"


class VLKEB(BaseVLLMEditData):
    def __init__(self, data_path: str, img_root_dir: str,
                 retriever: Optional[Retriever] = None, data_n=None,
                 encoder=None, faithful_t3_path_bug: bool = False):
        records = _load_records(data_path)
        if retriever is None:
            assert encoder is not None, "need a retriever or a sentence encoder"
            retriever = build_dataset_retriever(records, img_root_dir, encoder)
        cases = synthesize_cases(records, img_root_dir, retriever, data_n,
                                 faithful_t3_path_bug=faithful_t3_path_bug)
        # VLKEB templates only the locality prompts (vllm.py:283-288).
        _apply_evqa_vlkeb_templates(cases, requests_too=False)
        super().__init__(cases)

    def dataset_name(self):
        return "VLKEB"


class EIC(BaseVLLMEditData):
    """E-IC captions (vllm.py:260-275). The reference's EIC template code
    KeyErrors on 'image_loc' (it indexes a locality key that
    __init_eic_evqa__ no longer creates — vllm.py:268); we apply the
    text_loc template and skip the dead image_loc line."""

    def __init__(self, data_path: str, img_root_dir: str,
                 retriever: Optional[Retriever] = None, data_n=None,
                 encoder=None, faithful_t3_path_bug: bool = False):
        records = _load_records(data_path)
        if retriever is None:
            assert encoder is not None, "need a retriever or a sentence encoder"
            retriever = build_dataset_retriever(records, img_root_dir, encoder)
        cases = synthesize_cases(records, img_root_dir, retriever, data_n,
                                 faithful_t3_path_bug=faithful_t3_path_bug)
        for c in cases:
            c.locality["text_loc"][0]["prompt"] = (
                "%s?" % c.locality["text_loc"][0]["prompt"])
        super().__init__(cases)

    def dataset_name(self):
        return "EIC"

"""Attribute snippets + TF-IDF stats — the ROME/CounterFact generation-
consistency substrate (``easyeditor/dataset/attr_snippets.py`` and
``easyeditor/dataset/tfidf_stats.py``).

The reference downloads a wikipedia-snippet JSON plus cached idf/vocab
arrays and reconstructs an sklearn ``TfidfVectorizer`` around them; the
"consistency" (reference) score of a generation is its TF-IDF cosine to
the snippet texts for the edited (relation, target) pair. This rebuild is
zero-egress and dependency-free: snippets load from a local path with the
same schema, and the vectorizer is ~40 lines of numpy fit/transform that
reproduces sklearn's smoothed-idf + l2-normalization defaults — enough
for cosine similarity, which is all the metric consumes. (These are
inert in DE-VQA itself — nothing imports them on an executed path — but
they're part of the vendored dataset package surface.)
"""
from __future__ import annotations

import collections
import json
import math
import re
from typing import Dict, List, Sequence

import numpy as np

_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")  # sklearn's default token_pattern


class AttributeSnippets:
    """``snips[relation_id][target_id] → [snippet dicts]``
    (attr_snippets.py:12-43, minus the torch.hub download)."""

    def __init__(self, snippets_path: str):
        with open(snippets_path, "r") as f:
            snippets_list = json.load(f)
        snips: Dict = collections.defaultdict(
            lambda: collections.defaultdict(list))
        for el in snippets_list:
            for sample in el["samples"]:
                snips[el["relation_id"]][el["target_id"]].append(sample)
        self._data = snips
        self.snippets_list = snippets_list

    def __getitem__(self, item):
        return self._data[item]


def _tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text.lower())


class TfidfVectorizer:
    """Smoothed-idf TF-IDF with l2 row normalization (sklearn defaults:
    ``idf = ln((1+n)/(1+df)) + 1``), fit on a snippet corpus
    (tfidf_stats.py:17-40 ``get_tfidf_vectorizer`` role)."""

    def __init__(self):
        self.vocabulary_: Dict[str, int] = {}
        self.idf_: np.ndarray = np.zeros((0,), np.float32)

    def fit(self, corpus: Sequence[str]) -> "TfidfVectorizer":
        df: collections.Counter = collections.Counter()
        for doc in corpus:
            df.update(set(_tokenize(doc)))
        self.vocabulary_ = {w: i for i, w in enumerate(sorted(df))}
        n = len(corpus)
        idf = np.zeros((len(self.vocabulary_),), np.float32)
        for w, i in self.vocabulary_.items():
            idf[i] = math.log((1 + n) / (1 + df[w])) + 1.0
        self.idf_ = idf
        return self

    def transform(self, docs: Sequence[str]) -> np.ndarray:
        """→ dense [len(docs), vocab] l2-normalized TF-IDF rows (the
        corpora here are small; sparsity buys nothing on this host path)."""
        out = np.zeros((len(docs), len(self.vocabulary_)), np.float32)
        for r, doc in enumerate(docs):
            counts = collections.Counter(
                t for t in _tokenize(doc) if t in self.vocabulary_)
            for w, c in counts.items():
                out[r, self.vocabulary_[w]] = c
        out *= self.idf_[None, :]
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)

    def fit_transform(self, corpus: Sequence[str]) -> np.ndarray:
        return self.fit(corpus).transform(corpus)


def tfidf_consistency(generations: Sequence[str],
                      snippet_texts: Sequence[str],
                      vec: TfidfVectorizer = None) -> float:
    """The CounterFact "reference score": mean TF-IDF cosine between
    generated texts and the consistency-snippet corpus (upstream
    EasyEdit's ``test_generation_quality`` consistency branch, built on
    get_tfidf_vectorizer)."""
    if vec is None:
        vec = TfidfVectorizer().fit(list(snippet_texts))
    g = vec.transform(list(generations))
    s = vec.transform(list(snippet_texts))
    if not len(g) or not len(s):
        return 0.0
    return float((g @ s.mean(0)).mean())

"""HICE — in-context editing gated by a RanPAC-style ridge classifier.

Rebuild of the EasyEdit HICE stack (``easyeditor/trainer/algs/HICE.py`` +
``multimodal_editor.edit_dataset_hice`` :1105-1301):

- **Classifier** (HICE.py:200-233): sentence embeddings → relu random
  projection (W_rand [d, M]) → ridge regression to one-hot domain labels,
  with the λ grid search of ``optimise_ridge_parameter`` (10^-4..10^4,
  80/20 validation split).
- **Edit** (HICE.py:146-163): append the fact + paraphrase template
  sentences to the memory.
- **Inference**: classify the query; in-domain queries get the IKE-style
  ICL prefix (top-k memory sentences + the closest new fact), out-of-
  domain queries run the plain model — the domain gate is what gives
  HICE its locality.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..core.wrapper import JaxVLLM, QueryBatch
from ..utils.config import BaseConfig
from .base import EditRequest, VLLMEditor


def _normalize(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@dataclasses.dataclass
class RidgeClassifier:
    """relu(X W_rand) → Wo ridge solution (HICE.py get_Wo/optimise_ridge)."""

    W_rand: np.ndarray            # [d, M]
    Wo: Optional[np.ndarray] = None  # [C, M]

    @classmethod
    def create(cls, embed_dim: int, M: int = 1024, seed: int = 0):
        rng = np.random.default_rng(seed)
        return cls(W_rand=rng.normal(size=(embed_dim, M)).astype(np.float32))

    def fit(self, features: np.ndarray, labels: np.ndarray, n_classes: int = 2):
        F = np.maximum(features @ self.W_rand, 0.0)
        Y = np.eye(n_classes, dtype=np.float32)[labels]
        n_val = int(F.shape[0] * 0.8)
        Gv = F[:n_val].T @ F[:n_val]
        Qv = F[:n_val].T @ Y[:n_val]
        best, best_loss = 1.0, np.inf
        for ridge in 10.0 ** np.arange(-4, 5):
            Wo = np.linalg.solve(Gv + ridge * np.eye(Gv.shape[0]), Qv).T
            pred = F[n_val:] @ Wo.T
            loss = float(((pred - Y[n_val:]) ** 2).mean())
            if loss < best_loss:
                best, best_loss = ridge, loss
        G = F.T @ F
        Q = F.T @ Y
        self.Wo = np.linalg.solve(G + best * np.eye(G.shape[0]), Q).T
        return self

    def predict(self, features: np.ndarray) -> np.ndarray:
        F = np.maximum(features @ self.W_rand, 0.0)
        return (F @ self.Wo.T).argmax(-1)


def fit_domain_classifier(records: Sequence[dict], encoder,
                          M: int = 1024, seed: int = 0) -> RidgeClassifier:
    """Train the edit-domain classifier (HICE.py:410-446): edit prompts /
    rephrases are class 1, locality questions class 0."""
    pos = [r["src"] for r in records] + [r["rephrase"] for r in records]
    neg = [r["loc"] for r in records] + [r["m_loc_q"] for r in records]
    feats = _normalize(np.asarray(encoder(pos + neg), np.float32))
    labels = np.asarray([1] * len(pos) + [0] * len(neg))
    # Shuffle before fitting: all-pos-then-all-neg ordering makes the
    # ridge grid's 80/20 validation tail single-class, which can pick a
    # degenerate lambda and under-fire the in-domain gate.
    perm = np.random.default_rng(seed).permutation(len(labels))
    feats, labels = feats[perm], labels[perm]
    clf = RidgeClassifier.create(feats.shape[1], M=M, seed=seed)
    return clf.fit(feats, labels)


@dataclasses.dataclass(frozen=True)
class HICEConfig(BaseConfig):
    edit_model_name: str = ""
    k: int = 2  # ICL demos per query


class HICE(VLLMEditor):
    def __init__(self, vllm: JaxVLLM, config: HICEConfig,
                 classifier: RidgeClassifier,
                 sentence_encoder: Callable[[Sequence[str]], np.ndarray]):
        super().__init__(vllm)
        self.cfg = config
        self.classifier = classifier
        self.sentence_encoder = sentence_encoder
        self.restore_to_original_model()

    def name_of_editor_and_model(self) -> Tuple[str, str]:
        return "hice", self.cfg.edit_model_name or self.vllm.cfg.name

    def if_can_batch_edit(self):
        return False

    def restore_to_original_model(self):
        self.sentences: List[str] = []
        self._embeds: Optional[np.ndarray] = None

    def edit_one_piece(self, request: EditRequest):
        """HICE.py:146-156: append fact + paraphrase template sentences."""
        new_fact = "%s %s" % (request["prompt"], request["target_new"])
        self.sentences.append(f"New Fact: {new_fact}\nPrompt: {new_fact}\n\n")
        re = request.get("rephrase_prompt")
        if re:
            self.sentences.append(
                f"New Fact: {new_fact}\nPrompt: {re} "
                f"{request['target_new']}\n\n")
        self._embeds = None  # refresh lazily

    def _memory_embeds(self):
        if self._embeds is None and self.sentences:
            self._embeds = _normalize(np.asarray(
                self.sentence_encoder(self.sentences), np.float32))
        return self._embeds

    def build_query_batch(self, prompts, image_paths, targets) -> QueryBatch:
        if not self.sentences:
            return self.vllm.encode_queries(prompts, image_paths, targets)
        feats = _normalize(np.asarray(
            self.sentence_encoder(list(prompts)), np.float32))
        in_domain = self.classifier.predict(feats) == 1
        mem = self._memory_embeds()
        sims = feats @ mem.T  # [B, S]
        new_prompts = []
        for i, p in enumerate(prompts):
            if in_domain[i]:
                order = np.argsort(-sims[i])[: self.cfg.k]
                icl = "".join(self.sentences[int(j)] for j in order)
                new_prompts.append(icl + p)
            else:
                new_prompts.append(p)
        return self.vllm.encode_queries(new_prompts, image_paths, targets)

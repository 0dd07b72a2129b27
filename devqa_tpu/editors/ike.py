"""IKE — in-context knowledge editing (training-free, retrieval-only).

Rebuild of the EasyEdit-stack IKE path:

- **Store** (``easyeditor/models/ike/util.py:54-86``,
  ``encode_ike_facts_multimodal``): per training record, three template
  sentences — fact, paraphrase, neighborhood:
      "New Fact: {p} {t}\\nPrompt: {p} {t}\\n\\n"
      "New Fact: {p} {t}\\nPrompt: {rephrase} {t}\\n\\n"
      "New Fact: {p} {t}\\nPrompt: {loc_q} {loc_a}\\n\\n"
  pickled with images + (prompt, answer) pairs (same schema as
  retrieval.EmbeddingStore).
- **Apply** (``ike_main.py:171-208``): encode
  "New Fact: {new}\\nPrompt: {new}\\n\\n", top-k demos + the new fact
  itself; evaluation prepends ``''.join(icl_examples)`` to the query
  prompt (``multimodal_evaluate.py:113-161``).

In this framework IKE is a first-class editor: ``build_query_batch``
prepends the demonstration text to every probe prompt; logits realign
automatically since the supervised span is tracked by position.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..core.wrapper import JaxVLLM, QueryBatch
from ..retrieval.store import EmbeddingStore, topk_search
from ..utils.config import BaseConfig
from .base import EditRequest, VLLMEditor

import jax.numpy as jnp


def ike_templates(prompt: str, target: str, rephrase: str, loc_q: str,
                  loc_a: str) -> List[str]:
    new_fact = f"{prompt} {target}"
    return [
        f"New Fact: {new_fact}\nPrompt: {new_fact}\n\n",
        f"New Fact: {new_fact}\nPrompt: {rephrase} {target}\n\n",
        f"New Fact: {new_fact}\nPrompt: {loc_q} {loc_a}\n\n",
    ]


def encode_ike_facts(records: Sequence[dict], encoder,
                     img_root_dir: str = "") -> EmbeddingStore:
    """Build the IKE store from EVQA/VLKEB-schema records (the multimodal
    fact encoder; util.py:54-86)."""
    import os

    sentences, images, prompts = [], [], []
    for d in records:
        sents = ike_templates(d["src"], d["alt"], d["rephrase"], d["loc"],
                              d["loc_ans"])
        sentences.extend(sents)
        images.extend([os.path.join(img_root_dir, d["image"]),
                       os.path.join(img_root_dir, d["image_rephrase"]),
                       os.path.join(img_root_dir, d["m_loc"])])
        prompts.extend([(d["src"], d["alt"]), (d["rephrase"], d["alt"]),
                        (d["loc"], d["loc_ans"])])
    return EmbeddingStore.build(sentences, encoder, images, prompts)


@dataclasses.dataclass(frozen=True)
class IKEConfig(BaseConfig):
    edit_model_name: str = ""
    k: int = 4  # demos retrieved per edit


class IKE(VLLMEditor):
    def __init__(self, vllm: JaxVLLM, config: IKEConfig, store: EmbeddingStore,
                 sentence_encoder: Callable[[Sequence[str]], np.ndarray]):
        super().__init__(vllm)
        self.cfg = config
        self.store = store
        self.sentence_encoder = sentence_encoder
        self.restore_to_original_model()

    def name_of_editor_and_model(self) -> Tuple[str, str]:
        return "ike", self.cfg.edit_model_name or self.vllm.cfg.name

    def if_can_batch_edit(self):
        return False

    def restore_to_original_model(self):
        self.icl_examples: List[str] = []
        self.current_request: Optional[EditRequest] = None

    def edit_one_piece(self, request: EditRequest):
        """ike_main.py:196-208: retrieve top-k demos for the new fact and
        append the fact itself."""
        new_fact = f"{request['prompt']} {request['target_new']}"
        query = f"New Fact: {new_fact}\nPrompt: {new_fact}\n\n"
        q = np.asarray(self.sentence_encoder([query]), np.float32)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        k = min(self.cfg.k, len(self.store))
        _, idx = topk_search(self.store.device_embeddings(), jnp.asarray(q), k)
        hits = np.asarray(idx)[0]
        self.icl_examples = [self.store.sentences[int(i)] for i in hits]
        self.icl_examples.append(query)
        self.current_request = request

    # ------------------------------------------------------------------

    def build_query_batch(self, prompts, image_paths, targets) -> QueryBatch:
        """Prepend the in-context demonstrations to every probe prompt
        (icl_multimodal_lm_eval, multimodal_evaluate.py:113-131)."""
        prefix = "".join(self.icl_examples)
        prompts = [prefix + p for p in prompts]
        return self.vllm.encode_queries(prompts, image_paths, targets)

"""Embedding stores + similarity search — the retrieval substrate.

Reference equivalents:
- store construction: ``encode_ike_facts_multimodal``
  (easyeditor/models/ike/util.py:54-86) pickles
  {sentences, embeddings, images, prompts};
- probe-synthesis consumer: ``BaseVLLMEditData.init_retrieval`` /
  ``finds_sim`` (dataset/vllm.py:65-117) — normalized dot-product top-k
  with a "skip neighbors sharing the query's answer" rule;
- other consumers: IKE demo retrieval (ike_main.py:171-208), LTE
  (lte_vl.py:94-110), RECIPE.

TPU-native: embeddings live as a device array; search is one matmul +
``lax.top_k`` (MXU-friendly), batched over queries.
"""
from __future__ import annotations

import dataclasses
import pickle
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EncoderFn = Callable[[Sequence[str]], np.ndarray]  # texts → [N, d] embeddings


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, 1e-12)


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def topk_search(store_emb: jnp.ndarray, query_emb: jnp.ndarray, k: int = 5):
    """Normalized dot-product top-k. store [N, d], query [Q, d] →
    (scores [Q, k], indices [Q, k])."""
    sims = jnp.dot(query_emb, store_emb.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(sims, k)


@dataclasses.dataclass
class EmbeddingStore:
    """Pickle-compatible with the reference's stores
    (dataset/vllm.py:94-117: keys sentences/embeddings/images/prompts)."""

    sentences: List[str]
    embeddings: np.ndarray              # [N, d], normalized
    images: List[Optional[str]]         # image paths
    prompts: List[Tuple[str, str]]      # (prompt, answer) pairs

    _device_emb: Optional[jnp.ndarray] = dataclasses.field(
        default=None, repr=False, compare=False)

    @classmethod
    def build(cls, sentences, encoder: EncoderFn, images, prompts) -> "EmbeddingStore":
        emb = _normalize(np.asarray(encoder(sentences), np.float32))
        return cls(list(sentences), emb, list(images), [tuple(p) for p in prompts])

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump({"sentences": self.sentences,
                         "embeddings": self.embeddings,
                         "images": self.images,
                         "prompts": self.prompts}, f)

    @classmethod
    def load(cls, path: str) -> "EmbeddingStore":
        with open(path, "rb") as f:
            d = pickle.load(f)
        return cls(d["sentences"], _normalize(np.asarray(d["embeddings"], np.float32)),
                   d["images"], [tuple(p) for p in d["prompts"]])

    def device_embeddings(self) -> jnp.ndarray:
        if self._device_emb is None:
            self._device_emb = jnp.asarray(self.embeddings)
        return self._device_emb

    def __len__(self) -> int:
        return len(self.sentences)


class Retriever:
    """The probe-synthesis retriever: ``finds_sim`` semantics
    (dataset/vllm.py:65-87).

    Query with (src, trg); return the first of the top-k neighbors whose
    stored answer differs from ``trg`` — else fall back to the last hit.
    """

    def __init__(self, store: EmbeddingStore, encoder: EncoderFn, top_k: int = 5):
        self.store = store
        self.encoder = encoder
        self.top_k = top_k

    def encode_queries(self, texts: Sequence[str]) -> np.ndarray:
        return _normalize(np.asarray(self.encoder(texts), np.float32))

    def find_similar(self, src: str, trg: str):
        """→ ((prompt, answer), image_path) of the selected neighbor."""
        q = self.encode_queries([src])
        _, idx = topk_search(self.store.device_embeddings(), jnp.asarray(q),
                             min(self.top_k, len(self.store)))
        hits = np.asarray(idx)[0]
        for i in hits:
            if self.store.prompts[int(i)][1] != trg:
                return self.store.prompts[int(i)], self.store.images[int(i)]
        last = int(hits[-1])
        return self.store.prompts[last], self.store.images[last]

    def find_similar_batch(self, srcs: Sequence[str], trgs: Sequence[str]):
        """Batched variant — one device matmul for the whole dataset load
        instead of the reference's per-record search."""
        q = self.encode_queries(srcs)
        _, idx = topk_search(self.store.device_embeddings(), jnp.asarray(q),
                             min(self.top_k, len(self.store)))
        idx = np.asarray(idx)
        out = []
        for row, trg in zip(idx, trgs):
            pick = int(row[-1])
            for i in row:
                if self.store.prompts[int(i)][1] != trg:
                    pick = int(i)
                    break
            out.append((self.store.prompts[pick], self.store.images[pick]))
        return out


def hash_encoder(dim: int = 32) -> EncoderFn:
    """Deterministic toy sentence encoder for tests: bag-of-word-hash
    projections. Stands in for the MiniLM sentence-transformer."""
    import zlib

    def enc(texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), np.float32)
        for i, t in enumerate(texts):
            for w in t.split():
                h = zlib.crc32(w.encode())
                rng = np.random.default_rng(h % (2 ** 31))
                out[i] += rng.normal(size=dim).astype(np.float32)
        return out

    return enc

from .store import EmbeddingStore, Retriever, topk_search  # noqa: F401

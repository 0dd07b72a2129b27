from .harness import EditorEvaluation  # noqa: F401

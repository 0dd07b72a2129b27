from .harness import EditorEvaluation, FusedEditorEvaluation, case_probe_specs  # noqa: F401

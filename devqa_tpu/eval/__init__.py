from .harness import EditorEvaluation, FusedEditorEvaluation, case_probe_specs  # noqa: F401
from . import metrics  # noqa: F401  (es / fluency / PPL / concept / safety / cknowedit)

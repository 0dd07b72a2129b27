"""No-op editor: evaluates the unedited backbone.

Not present in the reference zoo; used as the harness baseline (its
reliability equals the base model's accuracy on new targets, and every
locality metric is exactly 1.0 — a built-in self-check of the pipeline).
"""
from __future__ import annotations

from typing import Tuple

from .base import EditRequest, VLLMEditor


class NullEditor(VLLMEditor):
    def name_of_editor_and_model(self) -> Tuple[str, str]:
        return "null", self.vllm.cfg.name

    def restore_to_original_model(self) -> None:
        pass

    def edit_one_piece(self, request: EditRequest) -> None:
        pass

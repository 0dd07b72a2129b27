"""FT-Api — external fine-tuning-service editing
(``easyeditor/models/ft_api/ft_api_main.py``).

The reference prepares a chat-format JSONL from the edit requests
(duplicating them up to the service's 10-example minimum,
ft_api_main.py:22-33), uploads it to OpenAI, and launches a fine-tune
job. The data-preparation semantics are reproduced here; the network leg
is a pluggable ``submit_fn(jsonl_path, model_name) -> job`` so any
fine-tune backend (or a test double) slots in — this image has no
egress, and the reference's own version is inert without an API key.
"""
from __future__ import annotations

import copy
import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional

from ...utils.config import BaseConfig

SYSTEM_PROMPT = "Marv is a factual chatbot that is also sarcastic."


@dataclasses.dataclass(frozen=True)
class FTApiHyperParams(BaseConfig):
    model_name: str = "gpt-3.5-turbo"
    results_dir: str = "results"
    min_examples: int = 10  # the service's fine-tune minimum


def prepare_ft_api_examples(requests: List[Dict],
                            hparams: FTApiHyperParams) -> str:
    """Write the chat-format JSONL (duplicating requests up to the
    minimum, ft_api_main.py:22-33) → file path."""
    extend = copy.deepcopy(list(requests))
    if not extend:
        raise ValueError("no requests")
    while len(extend) < hparams.min_examples:
        extend.extend(requests)
    extend = extend[:max(hparams.min_examples, len(requests))]
    out_dir = os.path.join(hparams.results_dir, "FT-Api")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "example.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        for r in extend:
            f.write(json.dumps({"messages": [
                {"role": "system", "content": SYSTEM_PROMPT},
                {"role": "user", "content": r["prompt"]},
                {"role": "assistant", "content": r["target_new"]},
            ]}) + "\n")
    return path


def apply_ft_api(requests: List[Dict], hparams: FTApiHyperParams,
                 submit_fn: Optional[Callable[[str, str], object]] = None):
    """Prepare the JSONL and hand it to ``submit_fn``. Returns whatever
    the backend returns (the reference returns the OpenAI job handle)."""
    path = prepare_ft_api_examples(requests, hparams)
    if submit_fn is None:
        raise RuntimeError(
            "FT-Api edits through an external fine-tuning service; pass "
            "submit_fn(jsonl_path, model_name) wired to your backend "
            "(the reference hard-wires openai.FineTuningJob).")
    return submit_fn(path, hparams.model_name)

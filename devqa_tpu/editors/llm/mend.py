"""MEND on bare text LLMs — the EasyEdit ``MendRewriteExecutor`` /
``EditTrainer`` role (``easyeditor/models/mend/mend_main.py:17-169``,
``easyeditor/trainer/EditTrainer.py:25``): gradient-transform editing and
meta-training over a pure decoder, with no vision tower.

Implementation: the SAME editor as :mod:`devqa_tpu.editors.mend_vl` run
over :func:`make_text_vllm` — a real :class:`JaxVLLM` wrapping the bare
decoder via ``core.vllm.text_only_vllm_config`` (bridge "none", V=0; the
maskable vision-slot block degenerates to nothing, so EVERY editor and
the evaluation harness also work on text this way). Everything —
probe-based (x, δ) capture, IDMLP transform, Welford normalization,
running-mean deltas, meta-training on rel/gen/loc λ-losses — is
inherited, so text and multimodal MEND cannot drift apart.
"""
from __future__ import annotations

from typing import Dict, List

from ...core import vllm as V
from ...core.wrapper import JaxVLLM
from ...data.images import SyntheticImageProvider
from ...data.schema import TestCase
from ..mend_vl import MENDvl, MENDvlConfig, MENDvlTrainable
from .session import TextModel


def make_text_vllm(model: TextModel) -> JaxVLLM:
    """Bare decoder → V=0 JaxVLLM: the full editor zoo, harness, and
    serving stack then operate on the text LLM (the image pipeline is
    never invoked — the provider is an unused placeholder)."""
    cfg = V.text_only_vllm_config(model.cfg)
    return JaxVLLM(cfg, {"decoder": model.params}, model.tokenizer,
                   SyntheticImageProvider(cfg.vit.image_size),
                   bucket_multiple=model.bucket_multiple)


class MENDText(MENDvl):
    """Inference-time text MEND (apply trained transforms).

    ``apply(request)`` edits the running delta pool and returns edited
    decoder params — the ``LLMEditSession`` ``apply_algo`` contract."""

    def __init__(self, model: TextModel, config: MENDvlConfig, params=None,
                 seed: int = 0):
        super().__init__(make_text_vllm(model), config, params=params,
                         seed=seed)
        self.model = model

    def name_of_editor_and_model(self):
        return "mend", self.cfg.edit_model_name or self.vllm.cfg.name

    def apply(self, request: Dict):
        """One edit → edited decoder params (state accumulates for
        sequential editing; call restore_to_original_model to reset)."""
        self.edit_one_piece(request)
        return self.edited_decoder_params()

    def edited_decoder_params(self):
        return self._edited_vparams(self.vllm.params, self.deltas)["decoder"]


class MENDTextTrainable(MENDvlTrainable):
    """Meta-training on text edit data (EditTrainer.edit_step role).

    ``organize_batch_data`` consumes :class:`TestCase`s — use
    :func:`as_test_cases` to lift ``BaseLLMEditData``'s dict cases."""

    def __init__(self, model: TextModel, config: MENDvlConfig, params=None,
                 seed: int = 0):
        MENDvlTrainable.__init__(self, make_text_vllm(model), config,
                                 params=params, seed=seed)
        self.model = model

    def name_of_editor_and_model(self):
        return "mend", self.cfg.edit_model_name or self.vllm.cfg.name


def as_test_cases(cases: List[Dict]) -> List[TestCase]:
    """BaseLLMEditData dict cases (``data/text_datasets.py:76-93``) →
    TestCase objects (the trainer's batch-organization schema)."""
    return [TestCase(requests=c["requests"], generality=c["generality"],
                     locality=c["locality"]) for c in cases]

"""MEND on bare text LLMs — the EasyEdit ``MendRewriteExecutor`` /
``EditTrainer`` role (``easyeditor/models/mend/mend_main.py:17-169``,
``easyeditor/trainer/EditTrainer.py:25``): gradient-transform editing and
meta-training over a pure decoder, with no vision tower.

Implementation: the SAME editor as :mod:`devqa_tpu.editors.mend_vl` run
through :class:`TextDecoderShim`, a minimal vision-less stand-in for
``JaxVLLM`` (token embeds only; the VL layout's maskable vision slots
degenerate to nothing). Everything — probe-based (x, δ) capture, IDMLP
transform, Welford normalization, running-mean deltas, meta-training on
rel/gen/loc λ-losses — is inherited, so text and multimodal MEND cannot
drift apart.
"""
from __future__ import annotations

from types import SimpleNamespace
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ...core import decoder as dec
from ...core.wrapper import QueryBatch
from ...data.schema import TestCase
from ..mend_vl import MENDvl, MENDvlConfig, MENDvlTrainable
from .session import TextModel


class TextDecoderShim:
    """Duck-typed ``JaxVLLM`` surface over a :class:`TextModel` — exactly
    the slice MENDvl consumes: ``cfg.decoder``/``cfg.name``, ``params``
    (live view of the model's), and batched ``encode_queries``."""

    def __init__(self, model: TextModel):
        self.model = model
        self.cfg = SimpleNamespace(
            decoder=model.cfg, name="text-" + model.cfg.arch,
            n_img_tokens=0, img_slot_pos=0, img_special_token=None)
        self.tokenizer = model.tokenizer
        self.image_provider = None

    @property
    def params(self):
        return {"decoder": self.model.params}

    def encode_queries(self, prompts: Sequence[str],
                       image_paths: Sequence[Optional[str]],
                       targets: Sequence[str]) -> QueryBatch:
        tb = self.model.batch(prompts, targets)
        ids = jnp.asarray(tb.input_ids)
        mask = jnp.asarray(tb.attn_mask)
        embeds = dec.embed_tokens(self.model.params, self.model.cfg, ids)
        plens = np.asarray(
            [len(self.model.tokenizer.encode(p)) for p in prompts], np.int32)
        return QueryBatch(
            embeds=embeds, kv_valid=mask,
            label_ids=jnp.asarray(tb.label_ids),
            label_masks=jnp.asarray(tb.label_masks),
            prompt_lens=plens,
            has_image=np.zeros(len(prompts), np.int32),
            input_ids=np.asarray(tb.input_ids))

    def clear_image_cache(self):
        pass


class MENDText(MENDvl):
    """Inference-time text MEND (apply trained transforms).

    ``apply(request)`` edits the running delta pool and returns edited
    decoder params — the ``LLMEditSession`` ``apply_algo`` contract."""

    def __init__(self, model: TextModel, config: MENDvlConfig, params=None,
                 seed: int = 0):
        super().__init__(TextDecoderShim(model), config, params=params,
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
        MENDvlTrainable.__init__(self, TextDecoderShim(model), config,
                                 params=params, seed=seed)
        self.model = model

    def name_of_editor_and_model(self):
        return "mend", self.cfg.edit_model_name or self.vllm.cfg.name


def as_test_cases(cases: List[Dict]) -> List[TestCase]:
    """BaseLLMEditData dict cases (``data/text_datasets.py:76-93``) →
    TestCase objects (the trainer's batch-organization schema)."""
    return [TestCase(requests=c["requests"], generality=c["generality"],
                     locality=c["locality"]) for c in cases]

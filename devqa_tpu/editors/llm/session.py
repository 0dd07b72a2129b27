"""LLM editing session — the EasyEdit ``BaseEditor`` role
(``easyeditor/editors/editor.py:39-714``): hparams-driven single/batch/
sequential editing of a pure text LLM with pre/post metric dicts
(rewrite_acc, rephrase_acc, locality agreement).

Operates on a bare decoder (params + DecoderConfig + tokenizer) — no
vision tower.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...core import decoder as dec
from ...core.losses import token_accuracy
from ...core.tokenizer import Tokenizer
from ...data.xym import batch_samples, tokenize_sample

EditRequestText = Dict  # {'prompt','target_new','ground_truth'?,
#                         'rephrase_prompt'?, 'locality': {name: {...}}, 'subject'?}


class TextModel:
    """Minimal host wrapper over a bare decoder for the LLM algorithms."""

    def __init__(self, params, cfg: dec.DecoderConfig, tokenizer: Tokenizer,
                 bucket_multiple: int = 16):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.bucket_multiple = bucket_multiple
        self._logits = jax.jit(
            lambda p, ids, mask: dec.decoder_apply(
                p, cfg, dec.embed_tokens(p, cfg, ids), mask))
        self._metrics = jax.jit(token_accuracy)

    def batch(self, prompts: Sequence[str], targets: Sequence[str]):
        samples = [tokenize_sample(self.tokenizer, p, t)
                   for p, t in zip(prompts, targets)]
        return batch_samples(samples, self.tokenizer.pad_token_id,
                             bucket_multiple=self.bucket_multiple)

    def accuracy(self, prompts, targets, params=None):
        tb = self.batch(prompts, targets)
        logits = self._logits(self.params if params is None else params,
                              jnp.asarray(tb.input_ids),
                              jnp.asarray(tb.attn_mask))
        accs, preds = self._metrics(logits, jnp.asarray(tb.label_ids),
                                    jnp.asarray(tb.label_masks))
        return np.asarray(accs), np.asarray(preds), np.asarray(tb.label_masks)


class LLMEditSession:
    """Single/sequential editing with pre/post metrics.

    ``apply_algo(model: TextModel, request) -> (new_params, restore_fn)``
    — algorithms are pure param transforms (ROME/FT/LoRA) or stateful
    editors exposing the same call signature (GRACE).
    """

    def __init__(self, model: TextModel,
                 apply_algo: Callable, algo_name: str = "algo"):
        self.model = model
        self.apply_algo = apply_algo
        self.algo_name = algo_name

    def _metrics(self, request: EditRequestText, params=None,
                 loc_refs: Optional[Dict] = None,
                 test_generation: bool = False,
                 max_out_len: int = 100) -> Dict:
        m: Dict = {}
        acc, _, _ = self.model.accuracy([request["prompt"]],
                                        [request["target_new"]], params)
        m["rewrite_acc"] = float(acc[0])
        if request.get("rephrase_prompt"):
            acc, _, _ = self.model.accuracy([request["rephrase_prompt"]],
                                            [request["target_new"]], params)
            m["rephrase_acc"] = float(acc[0])
        if request.get("locality"):
            m["locality"] = {}
            for name, loc in request["locality"].items():
                _, preds, masks = self.model.accuracy(
                    [loc["prompt"]], [loc["ground_truth"]], params)
                if loc_refs is not None and name in loc_refs:
                    ref_preds, ref_masks = loc_refs[name]
                    mm = ref_masks[0].astype(np.float32)
                    agree = ((preds[0][:len(ref_preds[0])] == ref_preds[0])
                             * mm).sum() / max(mm.sum(), 1.0)
                    m["locality"][name] = float(agree)
                else:
                    m["locality"][name] = (preds, masks)
        if request.get("portability"):
            # token accuracy on hop/paraphrase probes vs their ground truth
            # (compute_portability_quality, evaluate.py:169-188) — unlike
            # locality this is plain accuracy, not pre/post agreement.
            m["portability"] = {}
            for name, port in request["portability"].items():
                acc, _, _ = self.model.accuracy(
                    [port["prompt"]], [port["ground_truth"]], params)
                m["portability"][name + "_acc"] = float(acc[0])
        if test_generation:
            # the reference's test_generation flag (evaluate.py
            # compute_edit_quality → test_generation_quality): greedy-
            # extend the edit prompt and report n-gram-entropy fluency.
            from ...eval.metrics import generation_quality

            saved = self.model.params
            if params is not None:
                self.model.params = params
            try:
                m["fluency"] = generation_quality(
                    self.model, [request["prompt"]], max_out_len=max_out_len)
            finally:
                self.model.params = saved
        return m

    def edit(self, requests: List[EditRequestText],
             sequential: bool = False,
             test_generation: bool = False,
             max_out_len: int = 100) -> List[Dict]:
        """→ per-request {'pre': metrics, 'post': metrics, 'edit_time'}.

        ``sequential=False`` restores the model between requests (the
        EasyEdit ``keep_original_weight`` single-edit protocol).
        ``test_generation`` adds the reference's n-gram-entropy fluency
        block to both metric dicts."""
        results = []
        original = self.model.params
        for req in requests:
            pre_raw = self._metrics(req, test_generation=test_generation,
                                    max_out_len=max_out_len)
            loc_refs = pre_raw.pop("locality", None)
            start = time.time()
            out = self.apply_algo(self.model, req)
            new_params, restore = out if isinstance(out, tuple) else (out, None)
            edit_time = time.time() - start
            post = self._metrics(req, params=new_params, loc_refs=loc_refs,
                                 test_generation=test_generation,
                                 max_out_len=max_out_len)
            pre = dict(pre_raw)
            results.append({"case": req.get("case_id"),
                            "pre": pre, "post": post,
                            "edit_time": edit_time})
            if sequential:
                self.model.params = new_params
            else:
                if restore is not None:
                    restore()
                self.model.params = original
        return results

    def batch_edit(self, requests: List[EditRequestText]) -> List[Dict]:
        """The EasyEdit ``BatchEditor`` protocol
        (``easyeditor/editors/batch_editor.py``): hand ALL requests to
        one algorithm call (batch-capable algorithms — MEMIT, FT — edit
        jointly), then measure every request under the jointly edited
        weights. Restores the original weights afterwards."""
        original = self.model.params
        pre_raw = [self._metrics(r) for r in requests]
        loc_refs = [p.pop("locality", None) for p in pre_raw]
        start = time.time()
        out = self.apply_algo(self.model, requests)
        new_params, restore = out if isinstance(out, tuple) else (out, None)
        edit_time = time.time() - start
        results = []
        for req, pre, refs in zip(requests, pre_raw, loc_refs):
            post = self._metrics(req, params=new_params, loc_refs=refs)
            results.append({"case": req.get("case_id"), "pre": dict(pre),
                            "post": post,
                            "edit_time": edit_time / max(len(requests), 1)})
        if restore is not None:
            restore()
        self.model.params = original
        return results

    @staticmethod
    def summary(results: List[Dict]) -> Dict:
        keys = ["rewrite_acc", "rephrase_acc"]
        out = {}
        for k in keys:
            vals = [r["post"][k] for r in results if k in r["post"]]
            if vals:
                out[k] = float(np.mean(vals))
        locs: Dict[str, List[float]] = {}
        for r in results:
            for name, v in r["post"].get("locality", {}).items():
                locs.setdefault(name, []).append(v)
        if locs:
            out["locality"] = {k: float(np.mean(v)) for k, v in locs.items()}
        ports: Dict[str, List[float]] = {}
        for r in results:
            for name, v in r["post"].get("portability", {}).items():
                ports.setdefault(name, []).append(v)
        if ports:
            out["portability"] = {k: float(np.mean(v))
                                  for k, v in ports.items()}
        out["edit_time"] = float(np.mean([r["edit_time"] for r in results]))
        return out

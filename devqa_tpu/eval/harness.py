"""The dynamic-evaluation harness: edit → measure reliability / generality
/ locality over the t×i probe grid.

Functional rebuild of ``VLLMEditorEvaluation``
(``evaluation/vllm_editor_eval.py:13-248``) with the same protocol and
result-JSON schema, but a fused measurement loop: the reference runs 12+
batch-1 forwards per test case (SURVEY.md §3.1 hot loop); here all probes
of a case run as ONE padded batched forward with per-case vision caching.

Protocol parity notes:
- locality scored against pre-edit argmax ids (drift metric,
  vllm_editor_eval.py:106-113, 167-174);
- sequential evaluation splits cases into groups accumulating ``edit_n``
  requests, runs prepare→edit→test per split, restores between splits
  (:69-135);
- ``predict_before_edit`` decodes the pre-edit argmax; the reference's
  single-edit path decodes label_ids there instead (:50 — a quirk; its
  own sequential path at :112 decodes the prediction, which we follow);
- results land in ``<results_dir>/<editor>/<model>/<eval_name>/
  {single_edit|sequential_edit_N}/(results|mean_results).json`` rounded
  to 4 decimals (:231-247).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from copy import deepcopy
from typing import Dict, List, Optional

import jax
import numpy as np

from ..core.losses import token_accuracy
from ..data.schema import BaseVLLMEditData, TestCase
from ..editors.base import VLLMEditor
from .metrics import topk_span_agreement

# One fused device program per measurement pass: argmax + masked accuracy.
# (Eager per-op dispatch is pathological on remote-compile TPU runtimes.)
_metrics_jit = jax.jit(token_accuracy)


def _topk_ids(logits, k: int):
    return jax.lax.top_k(logits, k)[1]


# top-k indices for the EasyEdit-side locality agreement (one extra
# fused program per pass; only compiled when loc_topk is enabled).
_topk_jit = jax.jit(_topk_ids, static_argnames="k")


@dataclasses.dataclass
class ProbeSpec:
    kind: str       # 'reliability' | 'generality' | 'locality'
    sub: str        # '' | gen_name | loc_name
    index: int      # index within the sub-list
    prompt: str
    image: Optional[str]
    target: str


def locality_agreement(pre_ids, pre_mask, post_ids, post_mask) -> float:
    """Locality drift: fraction of the pre-edit supervised span whose
    argmax prediction is unchanged post-edit.

    Extracts each row's predictions at its OWN supervised (mask==1)
    positions before comparing — prompt-space editors (IKE/HICE prepend
    ICL text, RECIPE drops images) shift the span's absolute position
    between the pre- and post-edit batches, and the two batches may
    bucket to different padded widths. The reference end-aligns via
    ``logits[:, -l2:]`` (vllm_editor_eval.py:167-174); span-relative
    extraction is the same thing, robust to both shifts.
    """
    a = np.asarray(pre_ids)[np.asarray(pre_mask) == 1]
    b = np.asarray(post_ids)[np.asarray(post_mask) == 1]
    n = min(len(a), len(b))
    return float((a[:n] == b[:n]).sum() / max(len(a), 1))


def case_probe_specs(case: TestCase) -> List[ProbeSpec]:
    specs = []
    for i, r in enumerate(case.requests):
        specs.append(ProbeSpec("reliability", "", i, r["prompt"], r["image"],
                               r["target_new"]))
    for gname, lst in case.generality.items():
        for i, g in enumerate(lst):
            specs.append(ProbeSpec("generality", gname, i, g["prompt"],
                                   g["image"], g["target"]))
    for lname, lst in case.locality.items():
        for i, l in enumerate(lst):
            specs.append(ProbeSpec("locality", lname, i, l["prompt"],
                                   l["image"], l["target"]))
    return specs


class EditorEvaluation:
    def __init__(self, editor: VLLMEditor, eval_data: BaseVLLMEditData,
                 evaluation_name: Optional[str] = None,
                 results_dir: str = "eval_results",
                 loc_topk: Optional[int] = None):
        self.editor = editor
        self.eval_data = eval_data
        # EasyEdit-side locality agreement (multimodal_editor.py:977-1007,
        # the protocol scoring IKE/HICE): when set (reference value: 10),
        # every locality entry also gets ``topk_acc`` — positional top-k
        # index agreement with k=1 for the NQ text_loc probe and
        # k=loc_topk for image-bearing probes.
        self.loc_topk = loc_topk
        # Padded decoder tokens pushed through editor.query_logits that
        # BYPASSED vllm.logits' counter (see _query_logits_counted);
        # bench MFU = these + vllm.counters (utils/flops.py).
        self.probe_tokens = 0
        # Lazily learned: does this editor support the one-program packed
        # probe path? (None = not yet asked; see _try_packed_metrics.)
        self._packed_editor_ok = None
        editor_name, model_name = editor.name_of_editor_and_model()
        evaluation_name = evaluation_name or time.strftime("%Y.%m.%d-%H.%M.%S")
        self.result_dir = os.path.join(results_dir, editor_name, model_name,
                                       evaluation_name)
        # Right-size the vision-token cache: sequential-edit splits revisit
        # each case's images pre- and post-edit, and an undersized LRU
        # re-encodes through the ViT (bounded device-memory growth). Size
        # from the PROBE GRID's unique images (what the run actually
        # encodes — a superset of the case images when locality probes
        # draw cross-case images), so the slot buffer pre-grows once and
        # the donated-scatter program never recompiles mid-run.
        vllm = getattr(editor, "vllm", None)
        if vllm is not None and hasattr(vllm, "ensure_image_cache_capacity"):
            from ..data.schema import unique_image_paths

            probe_imgs = {s.image for case in eval_data.data
                          for s in case_probe_specs(case) if s.image}
            # UNION of case and probe images, not max of the two set
            # sizes: partially-overlapping sets would undercount and the
            # LRU could thrash (re-encode) — the exact problem this
            # sizing exists to prevent.
            vllm.ensure_image_cache_capacity(
                len(set(unique_image_paths(eval_data.data)) | probe_imgs))

    def _query_logits_counted(self, qb) -> jnp.ndarray:
        """editor.query_logits with decoder-token accounting that does NOT
        double-count: editors whose query path is the base default (IKE,
        HICE, FT, Null) go through ``vllm.logits`` which already bumps
        ``counters['decoder_tokens']``; only the remainder that bypassed
        the counter (editors with their own jitted forwards) lands in
        ``probe_tokens``. MFU = counters delta + probe_tokens stays exact
        for every editor."""
        vllm = self.editor.vllm
        ntok = int(qb.embeds.shape[0] * qb.embeds.shape[1])
        c0 = vllm.counters["decoder_tokens"]
        logits = self.editor.query_logits(qb)
        counted = vllm.counters["decoder_tokens"] - c0
        self.probe_tokens += max(0, ntok - counted)
        return logits

    def _query_metrics_counted(self, qb):
        """editor.query_metrics with the same no-double-count decoder-token
        accounting as :meth:`_query_logits_counted`."""
        vllm = self.editor.vllm
        ntok = int(qb.embeds.shape[0] * qb.embeds.shape[1])
        c0 = vllm.counters["decoder_tokens"]
        accs, preds = self.editor.query_metrics(qb)
        counted = vllm.counters["decoder_tokens"] - c0
        self.probe_tokens += max(0, ntok - counted)
        return accs, preds

    def _try_packed_metrics(self, prompts, images, targets, via_editor):
        """One-program probe dispatch (wrapper.PackedQuery): vision
        gather + assemble + forward + metrics fused, 2 transfers — on
        remote-dispatch runtimes the classic QueryBatch path pays a
        fixed per-program floor ~8 times per chunk (measured ~15% of a
        120x96 chunk, scripts/profile_headline.py). Returns
        (acc, pred, label_masks np) or None when unsupported: loc_topk
        needs materialized logits, mesh runs need QueryBatch sharding,
        and prompt-space/custom-forward editors without their own packed
        program fall back (editors/base.query_metrics_packed)."""
        vllm = getattr(self.editor, "vllm", None)
        if (self.loc_topk or vllm is None
                or getattr(vllm, "mesh", None) is not None
                or not hasattr(vllm, "encode_queries_packed")
                or (via_editor and self._packed_editor_ok is False)):
            return None
        pq = vllm.encode_queries_packed(prompts, images, targets)
        ntok = int(pq.label_masks_full.shape[0]
                   * pq.label_masks_full.shape[1])
        c0 = vllm.counters["decoder_tokens"]
        if via_editor:
            out = self.editor.query_metrics_packed(pq)
            self._packed_editor_ok = out is not None
            if out is None:
                return None
        else:
            out = vllm.packed_logits_metrics(pq)
        # same no-double-count decoder-token accounting as
        # _query_metrics_counted
        counted = vllm.counters["decoder_tokens"] - c0
        self.probe_tokens += max(0, ntok - counted)
        a, p, valid = out
        # Gathered-head preds carry their own validity mask; consumers
        # only ever read pred[mask == 1], which yields the same tokens in
        # the same order either way (losses.gathered_token_accuracy).
        return a, p, (pq.label_masks_full if valid is None else valid)

    def _k_for(self, sub: str) -> int:
        """k=1 for text locality, k=loc_topk for multimodal locality —
        the reference's (k=1, k=10) pair at multimodal_editor.py:987/1004."""
        return 1 if sub == "text_loc" else int(self.loc_topk)

    # ------------------------------------------------------------------
    def _measure_case(self, case: TestCase, before: Dict) -> Dict:
        """Post-edit measurement of one test case → result dict ``rd``.

        ``before`` maps locality spec key → (pred_ids_row, masks_row)
        captured pre-edit.
        """
        vllm = self.editor.vllm
        specs = case_probe_specs(case)
        qb = self.editor.build_query_batch(
            [s.prompt for s in specs], [s.image for s in specs],
            [s.target for s in specs])
        logits = self._query_logits_counted(qb)
        accs, preds = _metrics_jit(logits, qb.label_ids, qb.label_masks)
        post_topk = None
        if self.loc_topk:
            post_topk = np.asarray(_topk_jit(logits, k=int(self.loc_topk)))
        accs = np.asarray(accs)
        preds = np.asarray(preds)
        masks = np.asarray(qb.label_masks)

        rd: Dict = {"reliability": [], "generality": {}, "locality": {}}
        for row, s in enumerate(specs):
            entry = {"prompt": s.prompt, "image": s.image, "target": s.target}
            entry["predict_after_edit"] = self.editor.vllm.tokenizer.decode(
                preds[row][masks[row] == 1].tolist())
            if s.kind == "locality":
                # Host-side numpy agreement (tiny arrays; avoids per-row
                # device dispatches), span-relative per locality_agreement.
                ref_ids, ref_mask, ref_topk = before[(s.sub, s.index)]
                acc = locality_agreement(ref_ids, ref_mask,
                                         preds[row], masks[row])
                if post_topk is not None:
                    entry["topk_acc"] = topk_span_agreement(
                        ref_topk, ref_mask, post_topk[row], masks[row],
                        self._k_for(s.sub))
                entry["predict_before_edit"] = vllm.tokenizer.decode(
                    ref_ids[ref_mask == 1].tolist())
            else:
                acc = float(accs[row])
            entry["acc"] = acc
            if s.kind == "reliability":
                rd["reliability"].append(entry)
            else:
                rd[s.kind].setdefault(s.sub, []).append(entry)
        return rd

    def _before_edit_locality(self, case: TestCase) -> Dict:
        """Pre-edit argmax snapshot for every locality probe
        (vllm_editor_eval.py:106-113). One batched forward."""
        vllm = self.editor.vllm
        specs = [s for s in case_probe_specs(case) if s.kind == "locality"]
        if not specs:  # e.g. locality-less text records — nothing to snap
            return {}
        prompts = [s.prompt for s in specs]
        images = [s.image for s in specs]
        targets = [s.target for s in specs]
        if getattr(self.editor, "pre_edit_locality_via_editor", False):
            # The reference snaps pre-edit locality through the
            # editor-WRAPPED forward (vllm_editor_eval.py:106-112). For
            # most editors that is identity on a restored pool; editors
            # whose wrapper is not (RECIPE drops images unconditionally)
            # opt in here.
            qb = self.editor.build_query_batch(prompts, images, targets)
            logits = self.editor.query_logits(qb)
        else:
            qb = vllm.encode_queries(prompts, images, targets)
            logits = vllm.logits(qb.embeds, qb.kv_valid)
        _, preds = _metrics_jit(logits, qb.label_ids, qb.label_masks)
        topk = None
        if self.loc_topk:
            topk = np.asarray(_topk_jit(logits, k=int(self.loc_topk)))
        preds = np.asarray(preds)
        masks = np.asarray(qb.label_masks)
        return {(s.sub, s.index):
                (preds[i], masks[i], topk[i] if topk is not None else None)
                for i, s in enumerate(specs)}

    # ------------------------------------------------------------------
    def evaluate_single_edit(self) -> List[Dict]:
        editor = self.editor
        print("Evaluating reliability, generality and locality for %s on %s "
              "with single editing." % editor.name_of_editor_and_model())
        editor.restore_to_original_model()
        results = []
        for case in self.eval_data.data:
            assert len(case.requests) == 1
            before = self._before_edit_locality(case)
            start = time.time()
            editor.edit_one_piece(case.requests[0])
            edit_time = time.time() - start
            rd = self._measure_case(case, before)
            rd["reliability"][0]["edit_time"] = edit_time
            results.append(rd)
            editor.restore_to_original_model()
        save_dir = os.path.join(self.result_dir, "single_edit")
        self.save_results(os.path.join(save_dir, "results.json"), results)
        mean_results = self.get_mean_results(results)
        mean_results["sample_count"] = len(results)
        self.save_results(os.path.join(save_dir, "mean_results.json"), mean_results)
        return results

    def evaluate_sequential_edit(self, edit_n: int = 10, random: bool = False,
                                 seed: Optional[int] = None) -> List[List[Dict]]:
        editor = self.editor
        print("Evaluating reliability, generality and locality for %s on %s "
              "with sequential editing %s."
              % (*editor.name_of_editor_and_model(), edit_n))

        splits, split_ns, seed = self._split_and_shuffle(edit_n, random, seed)
        editor.restore_to_original_model()
        results = []
        for split in splits:
            # Prepare: pre-edit locality snapshots for every case.
            befores = [self._before_edit_locality(c) for c in split]
            # Edit: apply every request of the split sequentially.
            edit_times = []
            for case in split:
                for r in case.requests:
                    start = time.time()
                    editor.edit_one_piece(r)
                    edit_times.append(time.time() - start)
            # Test: measure every case under the accumulated edits.
            split_res = []
            ti = 0
            for case, before in zip(split, befores):
                rd = self._measure_case(case, before)
                for rr in rd["reliability"]:
                    rr["edit_time"] = edit_times[ti]
                    ti += 1
                split_res.append(rd)
            editor.restore_to_original_model()
            results.append(split_res)
        self._save_sequential(results, split_ns, edit_n, random, seed)
        return results

    # ------------------------------------------------------------------

    def _split_and_shuffle(self, edit_n: int, random: bool,
                           seed: Optional[int]):
        """Shared split/seed semantics (vllm_editor_eval.py:74-87) for
        both the reference-shaped and the fused sequential loops."""
        cases = list(self.eval_data.data)
        if random:
            seed = seed if seed is not None \
                else int(np.random.randint(1, 999999))
            np.random.default_rng(seed).shuffle(cases)
        splits, counts, cur, cur_n = [], [], [], 0
        for d in cases:
            cur.append(d)
            cur_n += len(d.requests)
            if cur_n >= edit_n:
                splits.append(cur)
                counts.append(cur_n)
                cur, cur_n = [], 0
        if cur:
            # Reference parity: vllm_editor_eval.py:74-87 never flushes a
            # trailing partial split — but dropping cases silently (or
            # producing ZERO splits when edit_n > total requests) hides a
            # protocol misconfiguration, so say it out loud.
            import sys

            print("WARNING: %d trailing case(s) (%d requests) do not fill "
                  "a final edit_n=%d split and are excluded (reference "
                  "split_data semantics)." % (len(cur), cur_n, edit_n),
                  file=sys.stderr)
        if not splits:
            raise ValueError(
                "edit_n=%d exceeds the dataset's total request count (%d) "
                "— no split can be formed" % (edit_n, cur_n))
        return splits, counts, seed

    def _save_sequential(self, results, split_ns, edit_n: int, random: bool,
                         seed) -> None:
        """Shared results/mean_results persistence (reference JSON
        schema, vllm_editor_eval.py:125-133,231-247)."""
        save_dir = os.path.join(self.result_dir, "sequential_edit_%s" % edit_n)
        prefix = "seed_%s_" % seed if random else ""
        self.save_results(os.path.join(save_dir, prefix + "results.json"),
                          results)
        split_mean = [self.get_mean_results(sr) for sr in results]
        for mr, n in zip(split_mean, split_ns):
            mr["sequential_edit_n"] = n
        total_mean = self.get_mean_results([r for sr in results for r in sr])
        total_mean["total_edit_n"] = sum(split_ns)
        self.save_results(
            os.path.join(save_dir, prefix + "mean_results.json"),
            {"total_mean": total_mean, "split_mean": split_mean})

    # ------------------------------------------------------------------
    def get_mean_results(self, results: List[Dict]) -> Dict:
        """Numeric-field averaging, same shape as the reference
        (vllm_editor_eval.py:177-229)."""
        mean: Dict = {"reliability": {}, "generality": {}, "locality": {}}

        def acc_into(bucket, entry):
            for k, v in entry.items():
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    bucket.setdefault(k, [0.0, 0])
                    bucket[k][0] += v
                    bucket[k][1] += 1

        for r in results:
            for rr in r["reliability"]:
                acc_into(mean["reliability"], rr)
            for kind in ("generality", "locality"):
                for sub, lst in r[kind].items():
                    bucket = mean[kind].setdefault(sub, {})
                    for e in lst:
                        acc_into(bucket, e)
        for k, v in list(mean["reliability"].items()):
            mean["reliability"][k] = v[0] / v[1]
        for kind in ("generality", "locality"):
            for sub in mean[kind]:
                for k, v in list(mean[kind][sub].items()):
                    mean[kind][sub][k] = v[0] / v[1]
        return mean

    def save_results(self, save_path: str, results, decimal: int = 4) -> None:
        def set_decimal(r):
            if isinstance(r, list):
                return [set_decimal(x) for x in r]
            if isinstance(r, dict):
                return {k: set_decimal(v) for k, v in r.items()}
            if isinstance(r, float):
                return round(r, decimal)
            return r

        res = set_decimal(deepcopy(results))
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        with open(save_path, "w") as f:
            json.dump(res, f, indent=4)
        print("save to", save_path)


class FusedEditorEvaluation(EditorEvaluation):
    """Throughput-oriented sequential evaluation.

    Protocol-equivalent to ``evaluate_sequential_edit`` (same splits, same
    pre-edit snapshots, same metrics) but batches across the whole split:
    one (chunked) forward for all pre-edit locality probes, one batched
    edit call when the editor supports exact-equivalent batching, one
    (chunked) forward for all post-edit probes. On latency-bound runtimes
    (remote TPU dispatch) this amortizes per-call overhead ~10×.
    """

    def __init__(self, *args, max_rows: int = 96, pad_rows: bool = True,
                 hoist_pre: bool = True, edit_chunk: Optional[int] = None,
                 pre_rows: Optional[int] = None,
                 post_rows: Optional[int] = None, **kw):
        super().__init__(*args, **kw)
        self.max_rows = max_rows
        # Pad every chunk to exactly the pass's row count so ONE compiled
        # program per pass serves the whole run (remote-compile runtimes
        # pay dearly per shape). The pre (locality-snapshot) and post
        # (full-grid) passes have different natural row multiples —
        # 9/case vs 12/case on the EVQA grid — so each can take its own
        # chunk size: larger exact-fit chunks raise per-row efficiency
        # without padding waste (measured on v5e: 120-row chunks beat
        # 60-row by ~10%/row, but one padded tail chunk eats the gain).
        self.pad_rows = pad_rows
        self.pre_rows = pre_rows or max_rows
        self.post_rows = post_rows or max_rows
        # Cap on requests per edit_batch call: a split accumulating N
        # edits (e.g. the 1000-sequential-edit protocol) is applied as
        # ceil(N/edit_chunk) batched calls with pad_width=edit_chunk, so
        # editors that honor the padding hint (LiveEdit) keep ONE
        # compiled width even when N % edit_chunk != 0; editors that
        # can't pad exactly compile at most one extra (tail) width.
        # Order within the split is preserved — pool appends are
        # order-dependent only across calls, which chunking respects.
        # None = whole split in one call.
        self.edit_chunk = edit_chunk
        # The pre-edit locality snapshot is always taken on the *restored
        # original* model (the protocol restores between splits,
        # vllm_editor_eval.py:98,122), so every split's pre-pass sees the
        # same weights: hoisting them into one chunked pass before the
        # split loop is exactly protocol-equivalent and removes ~45% of
        # per-split decoder tokens.
        self.hoist_pre = hoist_pre
        # Run-level gathered-head width: the fused harness knows its
        # whole probe grid up front, so size the gather to the run's
        # max supervised span (rounded up to 16) instead of letting
        # long-answer chunks fall back to the full-head program mid-run
        # (a fresh 30-90s compile INSIDE the timed region on remote
        # runtimes; measured: 7% of 1000-case chunks overflow the
        # default 32). Raise-only: a later harness on a wider dataset
        # raises it again; width ≥ row sums stays exact at slightly
        # less head savings, so monotonic growth is always correct.
        vllm = getattr(self.editor, "vllm", None)
        if vllm is not None and getattr(vllm, "_gather_positions", 0):
            from ..data.xym import label_width

            pairs = {(s.prompt, s.target)
                     for case in self.eval_data.data
                     for s in case_probe_specs(case)}
            if pairs:
                w = max(label_width(vllm.tokenizer, p, t)
                        for p, t in pairs)
                vllm._gather_positions = max(
                    vllm._gather_positions, -(-max(w, 1) // 16) * 16)

    def _dispatch_probe_rows(self, specs, edited: bool, rows=None):
        """Dispatch probe specs (chunked) to the device WITHOUT fetching:
        returns a pending list for :meth:`_collect_probe_rows`. JAX's
        async dispatch pipelines device work across chunks — and across
        SPLITS: the caller can dispatch the next split's edits while
        these chunks are still executing, so the device never idles on
        host-side result assembly (significant on tunneled runtimes)."""
        if not specs:  # e.g. cases with no locality probes at all
            return []
        rows = rows or self.max_rows
        vllm = self.editor.vllm
        pending = []
        for i in range(0, len(specs), rows):
            chunk = specs[i:i + rows]
            real = len(chunk)
            if self.pad_rows and real < rows:
                chunk = chunk + [chunk[-1]] * (rows - real)
            prompts = [s.prompt for s in chunk]
            images = [s.image for s in chunk]
            targets = [s.target for s in chunk]
            # Fused forward+metrics (editor.query_metrics / vllm.
            # logits_metrics) keeps the [rows, L, vocab] logits tensor
            # inside ONE device program — only the top-k scorer still
            # needs materialized logits, so loc_topk falls back to the
            # two-dispatch path (metric-identical either way,
            # tests/test_fused_eval.py).
            tk = None
            via_editor = edited or getattr(
                self.editor, "pre_edit_locality_via_editor", False)
            packed = self._try_packed_metrics(prompts, images, targets,
                                              via_editor)
            if packed is not None:
                a, p, masks = packed
                pending.append((real, a, p, masks, None))
                continue
            if edited:
                qb = self.editor.build_query_batch(prompts, images, targets)
                if self.loc_topk:
                    logits = self._query_logits_counted(qb)
                    a, p = _metrics_jit(logits, qb.label_ids, qb.label_masks)
                    tk = _topk_jit(logits, k=int(self.loc_topk))
                else:
                    a, p = self._query_metrics_counted(qb)
            elif getattr(self.editor, "pre_edit_locality_via_editor", False):
                # same editor-wrapped pre-edit routing as
                # _before_edit_locality (fused must stay metric-identical)
                qb = self.editor.build_query_batch(prompts, images, targets)
                if self.loc_topk:
                    logits = self.editor.query_logits(qb)
                    a, p = _metrics_jit(logits, qb.label_ids, qb.label_masks)
                    tk = _topk_jit(logits, k=int(self.loc_topk))
                else:
                    a, p = self.editor.query_metrics(qb)
            else:
                qb = vllm.encode_queries(prompts, images, targets)
                if self.loc_topk:
                    logits = vllm.logits(qb.embeds, qb.kv_valid)
                    a, p = _metrics_jit(logits, qb.label_ids, qb.label_masks)
                    tk = _topk_jit(logits, k=int(self.loc_topk))
                else:
                    a, p = vllm.logits_metrics(qb.embeds, qb.kv_valid,
                                               qb.label_ids, qb.label_masks)
            pending.append((real, a, p, qb.label_masks, tk))
        return pending

    @staticmethod
    def _collect_probe_rows(pending):
        """Fetch dispatched probe chunks → (accs, preds, masks, topk) np
        arrays (topk is None unless ``loc_topk`` is enabled)."""
        if not pending:
            return (np.zeros((0,), np.float32),
                    np.zeros((0, 1), np.int64), np.zeros((0, 1), np.int64),
                    None)
        accs, preds, masks, topks = [], [], [], []
        for real, a, p, m, tk in pending:
            accs.append(np.asarray(a)[:real])
            preds.append(np.asarray(p)[:real])
            masks.append(np.asarray(m)[:real])
            if tk is not None:
                topks.append(np.asarray(tk)[:real])
        L = max(x.shape[1] for x in preds)

        def padcat(xs):
            return np.concatenate(
                [np.pad(x, ((0, 0), (0, L - x.shape[1]))
                        + ((0, 0),) * (x.ndim - 2)) for x in xs])

        topk = padcat(topks) if topks else None
        return np.concatenate(accs), padcat(preds), padcat(masks), topk

    def _run_probe_rows(self, specs, edited: bool):
        """Dispatch + fetch in one step (single-pass callers)."""
        return self._collect_probe_rows(
            self._dispatch_probe_rows(specs, edited))

    def evaluate_sequential_edit(self, edit_n: int = 10, random: bool = False,
                                 seed: Optional[int] = None):
        editor = self.editor
        print("Evaluating (fused) %s on %s with sequential editing %s."
              % (*editor.name_of_editor_and_model(), edit_n))

        splits, split_ns, seed = self._split_and_shuffle(edit_n, random, seed)
        editor.restore_to_original_model()
        # Perf triage (read by bench.py): wall seconds of the three
        # pipeline stages. dispatch_s is HOST-side serial time (tokenize/
        # pack/transfer/enqueue — device work overlaps it only as far as
        # async dispatch allows); warm_s is the up-front vision warm;
        # collect_s blocks on device completion + assembles results.
        self.phase_times: Dict[str, float] = {}
        _t_warm = time.time()

        # Pack unique images ACROSS cases: the whole probe grid is known
        # upfront, so warm the vision LRU in full fixed-size encode
        # batches before any per-chunk query dispatch. Per-chunk misses
        # arrive ~2-3 images at a time and each group pads to
        # img_batch_pad rows (27.5% of encoded rows were padding on the
        # EVQA grid); warmed, only the one final batch can pad. No-op if
        # the LRU can't hold the unique set (warm_image_cache guards).
        vllm = getattr(editor, "vllm", None)
        if vllm is not None and hasattr(vllm, "warm_image_cache"):
            vllm.warm_image_cache(
                [s.image for split in splits for case in split
                 for s in case_probe_specs(case)])
        self.phase_times["warm_s"] = time.time() - _t_warm
        _t_disp = time.time()

        def gather_loc_specs(cases_):
            loc_specs, loc_slices = [], []
            for case in cases_:
                specs = [s for s in case_probe_specs(case)
                         if s.kind == "locality"]
                loc_slices.append((len(loc_specs),
                                   len(loc_specs) + len(specs), specs))
                loc_specs.extend(specs)
            return loc_specs, loc_slices

        def befores_from(fetched, loc_slices):
            _, pre_preds, pre_masks, pre_topk = fetched
            befores = []
            for lo, hi, specs in loc_slices:
                befores.append(
                    {(s.sub, s.index):
                     (pre_preds[j], pre_masks[j],
                      pre_topk[j] if pre_topk is not None else None)
                     for j, s in zip(range(lo, hi), specs)})
            return befores

        # ---- dispatch phase: enqueue EVERY split's pre-pass, edits and
        # post-pass before fetching anything. Dispatch captures the
        # editor state / params by reference, and restore is a host-side
        # reference swap, so later splits' programs see exactly the state
        # they would under fetch-per-split — but the device never idles
        # while the host assembles a finished split's results (on remote-
        # dispatch runtimes that idle was ~5% of the whole pipeline). ----
        pre_hoisted = None
        if self.hoist_pre:
            # One global pre-pass over every split (original weights; see
            # __init__ docstring for why this is protocol-equivalent).
            pre_specs, pre_slices = gather_loc_specs(
                [c for split in splits for c in split])
            pre_hoisted = (self._dispatch_probe_rows(pre_specs, False,
                                                     rows=self.pre_rows),
                           pre_slices)
        per_split = []
        for split in splits:
            pre_own = None
            if not self.hoist_pre:
                # Per-split pre-pass: dispatched after the previous
                # split's restore and before this split's edits — the
                # device-order the protocol requires.
                ps, sl = gather_loc_specs(split)
                pre_own = (self._dispatch_probe_rows(ps, False,
                                                     rows=self.pre_rows), sl)
            # Edit: batched when exactly equivalent.
            requests = [r for case in split for r in case.requests]
            start = time.time()
            if editor.if_can_batch_edit():
                ec = self.edit_chunk or len(requests)
                for i in range(0, len(requests), ec):
                    # pad_width keeps a ragged tail chunk on the already
                    # compiled width for editors that honor the hint
                    # (LiveEdit masks the padding exactly; see
                    # base.edit_batch)
                    editor.edit_batch(requests[i:i + ec], pad_width=ec)
            else:
                for r in requests:
                    editor.edit_one_piece(r)
            per_edit = (time.time() - start) / max(len(requests), 1)
            # Test: all probes of the split in one pass.
            all_specs, slices = [], []
            for case in split:
                specs = case_probe_specs(case)
                slices.append((len(all_specs), len(all_specs) + len(specs),
                               specs))
                all_specs.extend(specs)
            post_pending = self._dispatch_probe_rows(all_specs, True,
                                                     rows=self.post_rows)
            editor.restore_to_original_model()
            per_split.append((split, slices, post_pending, per_edit, pre_own))
        self.phase_times["dispatch_s"] = time.time() - _t_disp
        _t_coll = time.time()

        # ---- collect phase: fetch + assemble per split. ----
        hoisted = None
        if pre_hoisted is not None:
            all_b = befores_from(self._collect_probe_rows(pre_hoisted[0]),
                                 pre_hoisted[1])
            hoisted, k = [], 0
            for split in splits:
                hoisted.append(all_b[k:k + len(split)])
                k += len(split)
        results = []
        for si, (split, slices, post_pending, per_edit, pre_own) \
                in enumerate(per_split):
            befores = hoisted[si] if hoisted is not None \
                else befores_from(self._collect_probe_rows(pre_own[0]),
                                  pre_own[1])
            accs, preds, masks, post_topk = self._collect_probe_rows(
                post_pending)
            split_res = []
            for case, before, (lo, hi, specs) in zip(split, befores, slices):
                rd: Dict = {"reliability": [], "generality": {}, "locality": {}}
                for j, s in zip(range(lo, hi), specs):
                    entry = {"prompt": s.prompt, "image": s.image,
                             "target": s.target}
                    entry["predict_after_edit"] = editor.vllm.tokenizer.decode(
                        preds[j][masks[j] == 1].tolist())
                    if s.kind == "locality":
                        ref_ids, ref_mask, ref_topk = before[(s.sub, s.index)]
                        entry["acc"] = locality_agreement(
                            ref_ids, ref_mask, preds[j], masks[j])
                        if post_topk is not None:
                            entry["topk_acc"] = topk_span_agreement(
                                ref_topk, ref_mask, post_topk[j], masks[j],
                                self._k_for(s.sub))
                        entry["predict_before_edit"] = editor.vllm.tokenizer.decode(
                            ref_ids[ref_mask == 1].tolist())
                    else:
                        entry["acc"] = float(accs[j])
                        if s.kind == "reliability":
                            entry["edit_time"] = per_edit
                    if s.kind == "reliability":
                        rd["reliability"].append(entry)
                    else:
                        rd[s.kind].setdefault(s.sub, []).append(entry)
                split_res.append(rd)
            results.append(split_res)
        self.phase_times["collect_s"] = time.time() - _t_coll
        self._save_sequential(results, split_ns, edit_n, random, seed)
        return results

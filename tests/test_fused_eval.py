"""Fused-split evaluation must produce identical numbers to the faithful
sequential protocol (same edits, same probes, same metrics)."""
import json
import os

import numpy as np

from helpers import make_tiny_vllm, write_records

from devqa_tpu.data.schema import EVQA
from devqa_tpu.editors.liveedit import LiveEdit
from devqa_tpu.eval.harness import EditorEvaluation, FusedEditorEvaluation
from devqa_tpu.retrieval.store import hash_encoder
from test_liveedit import tiny_liveedit_cfg


def collect_accs(results):
    out = []
    for sr in results:
        for rd in sr:
            out.append(("rel", round(rd["reliability"][0]["acc"], 5)))
            for k in sorted(rd["generality"]):
                out.append((k, round(rd["generality"][k][0]["acc"], 5)))
            for k in sorted(rd["locality"]):
                out.append((k, round(rd["locality"][k][0]["acc"], 5)))
    return out


class TestFusedEquivalence:
    def test_same_metrics_as_sequential(self, tmp_path):
        vllm = make_tiny_vllm()
        editor = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
        path, _ = write_records(str(tmp_path), 4)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))

        ev1 = EditorEvaluation(editor, data, "A", str(tmp_path / "r1"))
        r1 = ev1.evaluate_sequential_edit(edit_n=2)
        ev2 = FusedEditorEvaluation(editor, data, "B", str(tmp_path / "r2"),
                                    max_rows=16)
        r2 = ev2.evaluate_sequential_edit(edit_n=2)
        assert collect_accs(r1) == collect_accs(r2)

        # Per-pass chunk sizes (pre vs post row chunks, bench's exact-fit
        # geometry) are a pure dispatch-shape choice — metrics identical.
        ev3 = FusedEditorEvaluation(editor, data, "B2", str(tmp_path / "r4"),
                                    max_rows=16, pre_rows=9, post_rows=12)
        r3 = ev3.evaluate_sequential_edit(edit_n=2)
        assert collect_accs(r1) == collect_accs(r3)

    def test_packed_query_metrics_identical(self, tmp_path):
        """The one-program packed probe path (wrapper.PackedQuery:
        2 transfers + gather + fused assemble/forward/metrics) is
        metric-identical to the classic QueryBatch path, for BOTH the
        editor-fused program (LiveEdit) and the base default
        (vllm.packed_logits_metrics)."""
        from devqa_tpu.editors.null import NullEditor

        vllm = make_tiny_vllm()
        editor = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
        path, recs = write_records(str(tmp_path), 3)
        prompts = [r["src"] for r in recs]
        images = [r["image"] for r in recs]
        targets = [r["alt"] for r in recs]
        editor.edit_one_piece({"prompt": prompts[0], "image": images[0],
                               "target_new": targets[0]})

        qb = vllm.encode_queries(prompts, images, targets)
        pq = vllm.encode_queries_packed(prompts, images, targets)
        n_lab = pq.label_masks_full.sum(axis=1)
        # Full-head packed route (gathered head disabled)
        vllm._gather_positions = 0
        a1, p1 = editor.query_metrics(qb)
        a2, p2, v2 = editor.query_metrics_packed(pq)
        assert v2 is None
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-6)
        assert np.array_equal(np.asarray(p1), np.asarray(p2))
        assert np.array_equal(pq.label_masks_full,
                              np.asarray(qb.label_masks))

        null_ed = NullEditor(vllm)
        a3, p3 = null_ed.query_metrics(qb)
        a4, p4, v4 = null_ed.query_metrics_packed(pq)
        assert v4 is None
        np.testing.assert_allclose(np.asarray(a3), np.asarray(a4),
                                   rtol=1e-6)
        assert np.array_equal(np.asarray(p3), np.asarray(p4))

        # Gathered-head packed route: LM head at supervised positions
        # only — accs identical, preds equal at extracted mask spans
        # (the only slice any consumer reads).
        vllm._gather_positions = int(n_lab.max())
        assert vllm._gather_head_ok(pq)
        for ed, (a_ref, p_ref) in ((editor, (a1, p1)), (null_ed, (a3, p3))):
            ag, pg, vg = ed.query_metrics_packed(pq)
            assert vg is not None
            np.testing.assert_allclose(np.asarray(a_ref), np.asarray(ag),
                                       rtol=1e-6)
            pg, vg = np.asarray(pg), np.asarray(vg)
            p_ref = np.asarray(p_ref)
            masks = np.asarray(qb.label_masks)
            for b in range(pg.shape[0]):
                assert np.array_equal(p_ref[b][masks[b] == 1],
                                      pg[b][vg[b] == 1])
        vllm._gather_positions = 32

        # the fused harness actually rides the packed path for LiveEdit
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        fe = FusedEditorEvaluation(editor, data, "P", str(tmp_path / "rp"),
                                   max_rows=16)
        fe.evaluate_sequential_edit(edit_n=3)
        assert fe._packed_editor_ok is True

    def test_ike_like_sequential_editor_falls_back(self, tmp_path):
        """Editors without exact batch-edit go through the sequential edit
        loop inside the fused harness."""
        from devqa_tpu.editors.serac_vl import SERACvl
        from test_serac import tiny_serac_cfg

        vllm = make_tiny_vllm()
        editor = SERACvl(vllm, tiny_serac_cfg(vllm), seed=1)
        path, _ = write_records(str(tmp_path), 2)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        ev = FusedEditorEvaluation(editor, data, "C", str(tmp_path / "r3"))
        results = ev.evaluate_sequential_edit(edit_n=2)
        assert int(editor.state["count"]) == 0  # restored after split
        assert len(results) == 1


class TestTokenAccounting:
    def test_no_double_count_for_base_query_logits(self, tmp_path):
        """Editors using the base query_logits (Null/IKE/HICE/FT) route
        through vllm.logits, which already bumps counters['decoder_tokens'];
        probe_tokens must only hold the remainder that bypassed the counter,
        so MFU = counters delta + probe_tokens is exact for every editor."""
        from devqa_tpu.editors.null import NullEditor

        vllm = make_tiny_vllm()
        path, _ = write_records(str(tmp_path), 2)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))

        # Base-default editor: every probe token is counter-counted.
        null_ed = NullEditor(vllm)
        c0 = vllm.counters["decoder_tokens"]
        ev = EditorEvaluation(null_ed, data, "acc0", str(tmp_path / "a0"))
        ev.evaluate_sequential_edit(edit_n=2)
        assert ev.probe_tokens == 0, ev.probe_tokens
        assert vllm.counters["decoder_tokens"] > c0

        # Own-jitted-forward editor: post-edit probes bypass the counter
        # and must land in probe_tokens instead.
        editor = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
        ev2 = EditorEvaluation(editor, data, "acc1", str(tmp_path / "a1"))
        ev2.evaluate_sequential_edit(edit_n=2)
        assert ev2.probe_tokens > 0


class TestLocTopkAgreement:
    def test_topk_acc_in_results_and_fused_matches(self, tmp_path):
        """loc_topk wires the EasyEdit-side agreement into both harness
        paths; fused == sequential; identity editor scores 1.0."""
        from devqa_tpu.editors.null import NullEditor

        vllm = make_tiny_vllm()
        path, _ = write_records(str(tmp_path), 4)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))

        def topk_accs(results):
            out = []
            for sr in results:
                for rd in sr:
                    for k in sorted(rd["locality"]):
                        out.append((k, round(rd["locality"][k][0]["topk_acc"],
                                             5)))
            return out

        editor = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
        ev1 = EditorEvaluation(editor, data, "A", str(tmp_path / "r1"),
                               loc_topk=10)
        r1 = ev1.evaluate_sequential_edit(edit_n=2)
        ev2 = FusedEditorEvaluation(editor, data, "B", str(tmp_path / "r2"),
                                    max_rows=16, loc_topk=10)
        r2 = ev2.evaluate_sequential_edit(edit_n=2)
        t1, t2 = topk_accs(r1), topk_accs(r2)
        assert t1 == t2
        assert all(0.0 <= v <= 1.0 for _, v in t1)
        # the classic drift accs are unchanged by enabling loc_topk
        assert collect_accs(r1) == collect_accs(r2)

        # identity editor: pre == post logits → agreement exactly 1
        null_ed = NullEditor(vllm)
        ev3 = FusedEditorEvaluation(null_ed, data, "N", str(tmp_path / "r3"),
                                    max_rows=16, loc_topk=10)
        r3 = ev3.evaluate_sequential_edit(edit_n=2)
        assert all(v == 1.0 for _, v in topk_accs(r3))

        # mean_results aggregates the new numeric field automatically
        mr = json.load(open(os.path.join(
            str(tmp_path / "r3"), "null", "tiny-opt", "N",
            "sequential_edit_2", "mean_results.json")))
        assert mr["total_mean"]["locality"]["text_loc"]["topk_acc"] == 1.0


class TestVisionWarmPack:
    def test_warm_packs_unique_images_across_cases(self, tmp_path):
        """The fused harness pre-warms the vision LRU across the whole
        probe grid, so encode padding collapses to at most one partial
        final batch (vs per-chunk miss groups each padded to
        img_batch_pad)."""
        from devqa_tpu.editors.null import NullEditor

        vllm = make_tiny_vllm()
        path, _ = write_records(str(tmp_path), 5)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        ed = NullEditor(vllm)
        ev = FusedEditorEvaluation(ed, data, "W", str(tmp_path / "rw"),
                                   max_rows=16)
        c0 = dict(vllm.counters)
        ev.evaluate_sequential_edit(edit_n=2)
        enc = vllm.counters["images_encoded"] - c0["images_encoded"]
        uniq = vllm.counters["images_unique"] - c0["images_unique"]
        assert uniq > 0
        # All misses arrive via the one warm pass: padding < one batch.
        assert enc - uniq < vllm.img_batch_pad

    def test_warm_noop_when_lru_too_small(self):
        """Warming a set larger than the LRU would evict earliest-needed
        entries first — it must refuse and leave per-call batching."""
        vllm = make_tiny_vllm()
        vllm._img_cache_size = 3
        paths = ["a_%d.jpg" % i for i in range(5)]
        assert vllm.warm_image_cache(paths) == 0
        assert len(vllm._img_cache) == 0
        # In-capacity warm encodes once; re-warm is a no-op.
        assert vllm.warm_image_cache(paths[:3]) == 3
        assert vllm.warm_image_cache(paths[:3]) == 0
        assert len(vllm._img_cache) == 3

    def test_warm_then_encode_hits_cache(self):
        import numpy as np

        vllm = make_tiny_vllm()
        paths = ["b_%d.jpg" % i for i in range(6)]
        vllm.warm_image_cache(paths)
        c0 = vllm.counters["images_encoded"]
        toks, has = vllm.encode_images([paths[0], None, paths[5]])
        assert vllm.counters["images_encoded"] == c0  # all hits
        assert list(has) == [1, 0, 1]
        assert not np.allclose(np.asarray(toks[0]), np.asarray(toks[2]))

"""Data layer + retrieval + evaluation harness, end-to-end on tiny models."""
import json
import os

import numpy as np
import pytest

from helpers import make_tiny_vllm, synth_records, write_records

from devqa_tpu.data.schema import EVQA, LOCALITY_KEYS
from devqa_tpu.data.xym import build_xym
from devqa_tpu.editors.null import NullEditor
from devqa_tpu.eval.harness import EditorEvaluation, case_probe_specs
from devqa_tpu.retrieval.store import EmbeddingStore, Retriever, hash_encoder


class TestRetriever:
    def test_skip_same_answer(self):
        enc = hash_encoder(16)
        store = EmbeddingStore.build(
            ["red apple", "green apple", "blue sky"], enc,
            ["a.jpg", "b.jpg", "c.jpg"],
            [("red apple", "fruit"), ("green apple", "veg"), ("blue sky", "air")])
        r = Retriever(store, enc, top_k=3)
        # query identical to entry 0 but whose answer matches entry 0's →
        # must skip to the next-most-similar with a different answer
        (prompt, ans), img = r.find_similar("red apple", "fruit")
        assert ans != "fruit"

    def test_pickle_roundtrip(self, tmp_path):
        enc = hash_encoder(16)
        store = EmbeddingStore.build(["x y"], enc, ["i.jpg"], [("x y", "z")])
        p = str(tmp_path / "store.pkl")
        store.save(p)
        loaded = EmbeddingStore.load(p)
        assert loaded.sentences == ["x y"]
        np.testing.assert_allclose(loaded.embeddings, store.embeddings, rtol=1e-6)


class TestRetrieverFallbackParity:
    def test_predless_record_does_not_match_itself(self, tmp_path):
        """A record with no 'pred' must use the SAME answer fallback on
        the query side as the store side — an asymmetric fallback ('' vs
        alt) let the record match itself as its 'similar' neighbor,
        collapsing the t2/i2 locality probes into the edit request."""
        recs = synth_records(4, seed=3)
        for r in recs:
            r.pop("pred", None)
        path = os.path.join(str(tmp_path), "vqa_eval.json")
        with open(path, "w") as f:
            json.dump(recs, f)
        data = EVQA(path, str(tmp_path), encoder=hash_encoder(16))
        for case, r in zip(data.data, recs):
            t2 = case.locality["t2i4"][0]["prompt"]
            assert r["src"] not in t2, (r["src"], t2)


class TestParallelDatasetLifecycle:
    def test_abandoned_iterator_stops_producer(self):
        """Exiting an epoch early (max_steps / early stop) must stop the
        producer thread — otherwise it keeps organizing batches and then
        blocks on q.put forever, leaking a thread + buffer per epoch."""
        import threading
        import time

        from devqa_tpu.data.prefetch import ParallelDataset

        produced = []

        def get(ids):
            produced.append(ids)
            return ids

        before = threading.active_count()
        ds = ParallelDataset(64, get, batch_size=4, buffer_size=2, seed=0)
        it = iter(ds)
        next(it)
        it.close()  # what abandoning the for-loop does on GC
        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() == before, "producer leaked"
        n_after_close = len(produced)
        time.sleep(0.3)
        assert len(produced) == n_after_close  # no further organizing

    def test_full_epoch_still_terminates(self):
        from devqa_tpu.data.prefetch import ParallelDataset

        ds = ParallelDataset(10, lambda ids: ids, batch_size=4,
                             buffer_size=1, seed=0)
        out = list(ds)
        assert len(out) == 2  # drop_last on 10/4


class TestEVQALoader:
    def test_structure_and_templates(self, tmp_path):
        path, records = write_records(str(tmp_path), 4)
        data = EVQA(path, "/imgs", encoder=hash_encoder(16))
        assert len(data) == 4
        c = data.data[0]
        assert set(c.locality.keys()) == set(LOCALITY_KEYS)
        # templates (vllm.py:238-248)
        assert c.requests[0]["prompt"].endswith(" The answer is:")
        assert c.locality["text_loc"][0]["prompt"].endswith(" The answer is:?")
        assert c.locality["t1i2"][0]["prompt"].endswith(" The answer is:")
        # t1 probes share the edit prompt (pre-template)
        assert c.locality["t1i4"][0]["prompt"] == records[0]["src"] + " The answer is:"
        assert c.locality["t1i4"][0]["image"] is None
        assert c.locality["t2i1"][0]["image"] == os.path.join("/imgs", records[0]["image"])
        # 12 probes per case
        assert len(case_probe_specs(c)) == 12


class TestQueryBatchParity:
    def test_supervision_matches_reference_xym(self):
        vllm = make_tiny_vllm()
        prompts = ["what color is the sky The answer is:", "who is this The answer is:"]
        targets = ["blue", "a person"]
        qb = vllm.encode_queries(prompts, ["i1.jpg", None], targets)
        _, ref_labels, ref_masks, min_p = build_xym(vllm.tokenizer, prompts, targets)
        labels = np.asarray(qb.label_ids)
        masks = np.asarray(qb.label_masks)
        for b in range(2):
            got = labels[b][masks[b] == 1].tolist()
            want = ref_labels[b][ref_masks[b] == 1].tolist()
            assert got == want
        # query_end = V + prompt_len (reference query_range[1] semantics)
        ends = vllm.query_end_positions(qb)
        assert (ends == qb.prompt_lens + vllm.cfg.n_img_tokens).all()


class TestHarnessEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        tmp = str(tmp_path_factory.mktemp("evqa"))
        path, _ = write_records(tmp, 4)
        data = EVQA(path, tmp + "/imgs", encoder=hash_encoder(16))
        vllm = make_tiny_vllm()
        editor = NullEditor(vllm)
        return tmp, data, editor

    def test_single_edit_null_editor(self, setup):
        tmp, data, editor = setup
        ev = EditorEvaluation(editor, data, evaluation_name="EVQA",
                              results_dir=os.path.join(tmp, "eval_results"))
        results = ev.evaluate_single_edit()
        assert len(results) == 4
        for rd in results:
            # Null editor: locality agreement must be exactly 1.0
            for sub, lst in rd["locality"].items():
                for e in lst:
                    assert e["acc"] == 1.0, (sub, e)
            assert "edit_time" in rd["reliability"][0]
            assert "predict_after_edit" in rd["reliability"][0]
        # result files with the reference layout
        d = os.path.join(tmp, "eval_results", "null", "tiny-opt", "EVQA",
                         "single_edit")
        with open(os.path.join(d, "mean_results.json")) as f:
            mean = json.load(f)
        assert mean["sample_count"] == 4
        assert set(mean["locality"].keys()) == set(LOCALITY_KEYS)
        assert mean["locality"]["t1i2"]["acc"] == 1.0

    def test_sequential_edit(self, setup):
        tmp, data, editor = setup
        ev = EditorEvaluation(editor, data, evaluation_name="EVQA-seq",
                              results_dir=os.path.join(tmp, "eval_results"))
        results = ev.evaluate_sequential_edit(edit_n=2)
        assert len(results) == 2        # 4 cases → 2 splits of 2 edits
        d = os.path.join(tmp, "eval_results", "null", "tiny-opt", "EVQA-seq",
                         "sequential_edit_2")
        with open(os.path.join(d, "mean_results.json")) as f:
            mean = json.load(f)
        assert mean["total_mean"]["total_edit_n"] == 4
        assert len(mean["split_mean"]) == 2
        assert mean["split_mean"][0]["sequential_edit_n"] == 2
        assert mean["total_mean"]["locality"]["text_loc"]["acc"] == 1.0

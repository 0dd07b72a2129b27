"""IKE/HICE demo-retrieval oracle — split from test_reference_oracle.py
so the rig imports stay lazy (the class only needs the reference ike
package, a stub sentence encoder and a tiny vllm)."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = "/root/reference/DE-VQA"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")


class TestIKEMultimodalOracle:
    """Demo-retrieval parity for IKE/HICE: the reference's
    apply_{ike,hice}_to_multimodal_model run with the SAME stub sentence
    encoder and stored corpus as our IKE editor, pinning the query
    format, embedding normalization, top-k ordering and the assembled
    in-context example list (including the appended new fact)."""

    SENTS = [
        "New Fact: the picture near the river is shown zebra\n"
        "Prompt: the picture near the river is shown zebra\n\n",
        "New Fact: who wrote about the tree lion\n"
        "Prompt: who wrote the book lion\n\n",
        "New Fact: which animal is shown zebra\nPrompt: a big cat here\n\n",
        "New Fact: what color is the sky blue\nPrompt: the sky is blue\n\n",
        "New Fact: the bird near the tree is small\n"
        "Prompt: it is a small bird\n\n",
    ]

    def _setup(self, tmp_path):
        from devqa_tpu.retrieval.store import EmbeddingStore, hash_encoder

        from test_reference_oracle import _load_ref_easyeditor_pkg
        _load_ref_easyeditor_pkg()
        base = os.path.join(REF, "easyeditor")
        if "refee.models.ike" not in sys.modules:
            import importlib.util
            idir = os.path.join(base, "models/ike")
            spec = importlib.util.spec_from_file_location(
                "refee.models.ike", os.path.join(idir, "__init__.py"),
                submodule_search_locations=[idir])
            m = importlib.util.module_from_spec(spec)
            sys.modules["refee.models.ike"] = m
            spec.loader.exec_module(m)
        im = sys.modules["refee.models.ike.ike_main"]

        enc = hash_encoder(32)

        class StubST:
            def __init__(self, *a, **k):
                pass

            def encode(self, sentence, **k):
                return np.asarray(enc([sentence]), np.float32)[0]

        emb = np.asarray(enc(self.SENTS), np.float32)
        store = EmbeddingStore.build(self.SENTS, enc,
                                     ["i.jpg"] * len(self.SENTS),
                                     [("p", "t")] * len(self.SENTS))
        os.makedirs(os.path.join(tmp_path, "embedding"), exist_ok=True)
        import pickle
        with open(os.path.join(tmp_path, "embedding",
                               "vqa_embeddings.pkl"), "wb") as f:
            pickle.dump({"sentences": self.SENTS, "embeddings": emb}, f)
        return im, StubST, enc, emb, store

    def _hp(self, k, results_dir):
        import types as _t
        hp = _t.SimpleNamespace(
            k=k, results_dir=str(results_dir), device=0, name="tiny",
            alg_name="IKE", model_name="tiny", tokenizer_class="",
            tokenizer_name="", sentence_model_name="stub-minilm",
            task_name="vqa", qformer_checkpoint="", qformer_name_or_path="",
            state_dict_file="", coco_image="", rephrase_image="")
        return hp

    def test_ike_and_hice_icl_parity(self, tmp_path):
        from helpers import make_tiny_vllm

        from devqa_tpu.editors.ike import IKE, IKEConfig

        im, StubST, enc, emb, store = self._setup(tmp_path)
        req = {"prompt": "the picture near the river is shown",
               "target": "zebra"}

        orig_st = im.SentenceTransformer
        im.SentenceTransformer = StubST
        try:
            from test_reference_oracle import TestFTOracle as _FTO
            with _FTO._cpu_patch_devices():
                ref_icl = im.apply_ike_to_multimodal_model(
                    None, None, dict(req), self._hp(3, tmp_path),
                    train_ds=object())
                ref_icl_hice = im.apply_hice_to_multimodal_model(
                    None, None, dict(req), self._hp(3, tmp_path),
                    train_ds=object(), sentence_model=StubST(),
                    stored_data={"sentences": self.SENTS,
                                 "embeddings": torch.tensor(emb)})
        finally:
            im.SentenceTransformer = orig_st

        editor = IKE(make_tiny_vllm(), IKEConfig(k=3), store, enc)
        editor.edit_one_piece({"prompt": req["prompt"],
                               "target_new": req["target"],
                               "image": "i.jpg"})
        assert editor.icl_examples == ref_icl
        assert editor.icl_examples == ref_icl_hice

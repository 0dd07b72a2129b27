"""IKE editor: store construction, demo retrieval, prompt prepending."""
import numpy as np

from helpers import make_tiny_vllm, synth_records

from devqa_tpu.editors.ike import IKE, IKEConfig, encode_ike_facts, ike_templates
from devqa_tpu.retrieval.store import hash_encoder


class TestIKE:
    def test_templates(self):
        t = ike_templates("q", "a", "qr", "lq", "la")
        assert t[0] == "New Fact: q a\nPrompt: q a\n\n"
        assert "qr a" in t[1] and "lq la" in t[2]

    def test_store_and_edit(self):
        records = synth_records(4)
        enc = hash_encoder(16)
        store = encode_ike_facts(records, enc, "/imgs")
        assert len(store) == 12  # 3 sentences per record
        vllm = make_tiny_vllm()
        editor = IKE(vllm, IKEConfig(k=2), store, enc)
        req = {"prompt": records[0]["src"], "target_new": records[0]["alt"],
               "image": "/imgs/" + records[0]["image"]}
        editor.edit_one_piece(req)
        assert len(editor.icl_examples) == 3  # 2 demos + the new fact
        assert editor.icl_examples[-1].startswith("New Fact:")
        # query batch prepends the demos
        qb = editor.build_query_batch(["what is this The answer is:"],
                                      [req["image"]], ["thing"])
        qb_plain = vllm.encode_queries(["what is this The answer is:"],
                                       [req["image"]], ["thing"])
        assert qb.input_ids.shape[1] > qb_plain.input_ids.shape[1]
        # restore clears demos
        editor.restore_to_original_model()
        assert editor.icl_examples == []


class TestHICE:
    def test_classifier_and_gate(self):
        from devqa_tpu.editors.hice import (HICE, HICEConfig,
                                            fit_domain_classifier)

        records = synth_records(8)
        enc = hash_encoder(32)
        clf = fit_domain_classifier(records, enc, M=64)
        import numpy as np

        feats = np.asarray(enc([records[0]["src"], records[0]["loc"]]),
                           np.float32)
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        pred = clf.predict(feats)
        assert pred[0] == 1 and pred[1] == 0  # edit vs locality domain

        vllm = make_tiny_vllm()
        editor = HICE(vllm, HICEConfig(k=1), clf, enc)
        editor.edit_one_piece({"prompt": records[0]["src"],
                               "target_new": records[0]["alt"],
                               "rephrase_prompt": records[0]["rephrase"]})
        assert len(editor.sentences) == 2
        # in-domain query gets an ICL prefix; out-of-domain stays bare
        qb_in = editor.build_query_batch([records[0]["src"]], [None],
                                         [records[0]["alt"]])
        qb_out = editor.build_query_batch([records[0]["loc"]], [None],
                                          [records[0]["loc_ans"]])
        bare_in = vllm.encode_queries([records[0]["src"]], [None],
                                      [records[0]["alt"]])
        bare_out = vllm.encode_queries([records[0]["loc"]], [None],
                                       [records[0]["loc_ans"]])
        assert qb_in.input_ids.shape[1] > bare_in.input_ids.shape[1]
        assert (np.asarray(qb_out.kv_valid).sum()
                == np.asarray(bare_out.kv_valid).sum())

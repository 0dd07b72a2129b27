"""LiveEdit editor: pool mechanics, routing invariants, harness run."""
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_vllm, write_records

from devqa_tpu.data.schema import EVQA
from devqa_tpu.editors.liveedit import (LiveEdit, LiveEditConfig, empty_state,
                                        fuse_coefficients, span_masks)
from devqa_tpu.eval.harness import EditorEvaluation
from devqa_tpu.retrieval.store import hash_encoder


def tiny_liveedit_cfg(vllm):
    return LiveEditConfig(
        edit_model_name=vllm.cfg.name,
        retrieval_editor=LiveEditConfig.RetrievalEditor(
            module_dim=16, cross_att_head_n=2, lora_rank=2, lora_scale=5.0,
            eqe_n=2),
        llm_mid_dim=vllm.cfg.decoder.d_model,
        edit_layer_i=2,
        max_edits=8)


@pytest.fixture(scope="module")
def setup():
    vllm = make_tiny_vllm()
    editor = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
    return vllm, editor


REQ = {"prompt": "what animal is shown The answer is:", "image": "imgA.jpg",
       "target_new": "zebra"}


class TestSpanMasks:
    def test_partition(self):
        kv = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 0]])  # V=2 at p=0, text 5, pad 1
        vis, q, ans, edit = span_masks(kv, (0, 2), jnp.asarray([5]))
        assert vis[0].tolist() == [1, 1, 0, 0, 0, 0, 0, 0]
        assert q[0].tolist() == [0, 0, 1, 1, 1, 0, 0, 0]
        assert ans[0].tolist() == [0, 0, 0, 0, 0, 1, 1, 0]
        assert edit[0].tolist() == [1, 1, 1, 1, 1, 1, 1, 0]

    def test_no_image_row(self):
        kv = jnp.asarray([[0, 0, 1, 1, 1, 1, 0, 0]])
        vis, q, ans, _ = span_masks(kv, (0, 2), jnp.asarray([4]))
        assert vis[0].sum() == 0
        assert q[0].tolist() == [0, 0, 1, 1, 0, 0, 0, 0]


class TestFuseCoefficients:
    def test_no_selection_gives_zero(self):
        sim = jnp.asarray([[1.0, 2.0, 3.0]])
        sel = jnp.asarray([[False, False, False]])
        fuse = fuse_coefficients(sim, sel)
        assert np.allclose(np.asarray(fuse), 0.0)

    def test_masked_softmax_matches_subset(self):
        sim = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        sel = jnp.asarray([[True, False, True, False]])
        fuse = np.asarray(fuse_coefficients(sim, sel))[0]
        # subset softmax over {1.0, 3.0} × sigmoid
        import scipy.special as sp

        sub = np.exp([1.0, 3.0]) / np.exp([1.0, 3.0]).sum()
        expect = np.zeros(4)
        expect[0] = sub[0] * sp.expit(1.0)
        expect[2] = sub[1] * sp.expit(3.0)
        np.testing.assert_allclose(fuse, expect, rtol=1e-5)


class TestLiveEdit:
    def test_empty_pool_is_identity(self, setup):
        vllm, editor = setup
        editor.restore_to_original_model()
        qb = vllm.encode_queries([REQ["prompt"]], [REQ["image"]],
                                 [REQ["target_new"]])
        edited = editor.query_logits(qb)
        plain = vllm.logits(qb.embeds, qb.kv_valid)
        np.testing.assert_allclose(np.asarray(edited), np.asarray(plain),
                                   rtol=1e-4, atol=1e-5)

    def test_edit_appends_to_pool(self, setup):
        vllm, editor = setup
        editor.restore_to_original_model()
        editor.edit_one_piece(REQ)
        assert int(editor.state["count"]) == 1
        assert not np.allclose(np.asarray(editor.state["moe_c"][0]), 0.0)
        assert np.allclose(np.asarray(editor.state["moe_c"][1]), 0.0)
        editor.edit_one_piece({**REQ, "image": "imgB.jpg", "target_new": "horse"})
        assert int(editor.state["count"]) == 2

    def test_no_image_probe_unaffected(self, setup):
        """Probes without an image never receive the residual
        (liveedit.py:115: hook requires vt_range)."""
        vllm, editor = setup
        editor.restore_to_original_model()
        editor.edit_one_piece(REQ)
        qb = vllm.encode_queries(["who wrote this book The answer is:"],
                                 [None], ["someone"])
        edited = editor.query_logits(qb)
        plain = vllm.logits(qb.embeds, qb.kv_valid)
        np.testing.assert_allclose(np.asarray(edited), np.asarray(plain),
                                   rtol=1e-4, atol=1e-5)

    def test_restore_resets(self, setup):
        vllm, editor = setup
        editor.edit_one_piece(REQ)
        assert int(editor.state["count"]) > 0
        editor.restore_to_original_model()
        assert int(editor.state["count"]) == 0

    def test_harness_run(self, setup, tmp_path):
        """Full sequential-edit evaluation with an untrained LiveEdit: must
        run end-to-end and produce schema-complete results."""
        vllm, editor = setup
        editor.restore_to_original_model()
        path, _ = write_records(str(tmp_path), 2)
        data = EVQA(path, str(tmp_path) + "/imgs", encoder=hash_encoder(16))
        ev = EditorEvaluation(editor, data, evaluation_name="EVQA",
                              results_dir=str(tmp_path / "res"))
        results = ev.evaluate_sequential_edit(edit_n=2)
        assert len(results) == 1
        rd = results[0][0]
        assert set(rd["locality"].keys()) >= {"t1i2", "text_loc", "t3i1"}
        # text-only locality probes must be exactly unaffected
        assert rd["locality"]["text_loc"][0]["acc"] == 1.0
        assert rd["locality"]["t1i4"][0]["acc"] == 1.0
        assert rd["locality"]["t2i4"][0]["acc"] == 1.0


class TestEditBatchPadding:
    """pad_width (base.edit_batch's shape-stability hint): padded rows
    are masked out of the ring scatter, so state is IDENTICAL to the
    unpadded call and a ragged tail chunk reuses the compiled width."""

    def _reqs(self, n):
        return [dict(REQ, target_new="t%d" % i) for i in range(n)]

    def test_padded_state_identical(self):
        vllm = make_tiny_vllm()
        e1 = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
        e2 = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
        reqs = self._reqs(3)
        e1.edit_batch(reqs)
        e2.edit_batch(reqs, pad_width=8)
        assert int(e2.state["count"]) == 3
        for k in e1.state:
            np.testing.assert_allclose(
                np.asarray(e1.state[k]), np.asarray(e2.state[k]),
                rtol=1e-6, atol=1e-7, err_msg=k)

    def test_ragged_tail_reuses_compiled_width(self):
        vllm = make_tiny_vllm()
        e = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
        e.edit_batch(self._reqs(8))           # compiles width 8
        n0 = e._edit_batch_packed_jit._cache_size()
        e.edit_batch(self._reqs(3), pad_width=8)  # ragged tail, padded
        assert e._edit_batch_packed_jit._cache_size() == n0
        assert int(e.state["count"]) == 11
        # without the hint the tail would compile a second width
        e.edit_batch(self._reqs(3))
        assert e._edit_batch_packed_jit._cache_size() == n0 + 1

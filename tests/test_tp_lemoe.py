"""T-Patcher and LEMoE editors."""
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_vllm

from devqa_tpu.core.losses import token_accuracy
from devqa_tpu.editors.lemoe_vl import LEMoEvl, LEMoEvlConfig, expert_delta, _expert_zeros
from devqa_tpu.editors.tp_vl import TPvl, TPvlConfig


REQ = {"prompt": "what is on the table The answer is:", "image": "imgT.jpg",
       "target_new": "a red lantern"}


@pytest.fixture(scope="module")
def vllm():
    return make_tiny_vllm()


class TestTPvl:
    def test_empty_state_identity(self, vllm):
        editor = TPvl(vllm, TPvlConfig(edit_layer=3, max_edits=8))
        qb = vllm.encode_queries([REQ["prompt"]], [REQ["image"]], ["x"])
        out = editor.query_logits(qb)
        base = vllm.logits(qb.embeds, qb.kv_valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-5, atol=1e-6)

    def test_edit_improves_target_likelihood(self, vllm):
        editor = TPvl(vllm, TPvlConfig(edit_layer=3, num_steps=50, lr=5e-2,
                                       max_edits=8))
        qb = vllm.encode_queries([REQ["prompt"]], [REQ["image"]],
                                 [REQ["target_new"]])
        base_acc, _ = token_accuracy(vllm.logits(qb.embeds, qb.kv_valid),
                                     qb.label_ids, qb.label_masks)
        editor.edit_one_piece(REQ)
        assert int(editor.state["count"]) == 1
        acc, _ = token_accuracy(editor.query_logits(qb), qb.label_ids,
                                qb.label_masks)
        assert float(acc[0]) >= float(base_acc[0])
        # one more edit appends another neuron
        editor.edit_one_piece({**REQ, "prompt": "who painted this The answer is:",
                               "target_new": "monet"})
        assert int(editor.state["count"]) == 2
        editor.restore_to_original_model()
        assert int(editor.state["count"]) == 0


class TestLEMoE:
    def test_batched_edit_trigger(self, vllm):
        cfg = LEMoEvlConfig(edit_layer=3, llm_hidden_dim1=vllm.cfg.decoder.d_model,
                            llm_hidden_dim2=vllm.cfg.decoder.d_ffn,
                            lora_rank=2, lora_edit_batch_size=2, max_steps=30,
                            min_loss=0.05, lr=5e-3, max_experts=4)
        editor = LEMoEvl(vllm, cfg)
        editor.edit_one_piece(REQ)
        assert int(editor.state["count"]) == 0 and len(editor.pending) == 1
        editor.edit_one_piece({**REQ, "image": "img2.jpg", "target_new": "a cat"})
        assert int(editor.state["count"]) == 1 and len(editor.pending) == 0

    def test_expert_changes_logits_and_flush(self, vllm):
        cfg = LEMoEvlConfig(edit_layer=3, llm_hidden_dim1=vllm.cfg.decoder.d_model,
                            llm_hidden_dim2=vllm.cfg.decoder.d_ffn,
                            lora_rank=2, lora_edit_batch_size=5, max_steps=30,
                            min_loss=0.05, lr=5e-3, max_experts=4)
        editor = LEMoEvl(vllm, cfg)
        qb = vllm.encode_queries([REQ["prompt"]], [REQ["image"]],
                                 [REQ["target_new"]])
        base = vllm.logits(qb.embeds, qb.kv_valid)
        editor.edit_one_piece(REQ)
        # pending, not yet trained → identity
        np.testing.assert_allclose(np.asarray(editor.query_logits(qb)),
                                   np.asarray(base), rtol=1e-5, atol=1e-6)
        editor.flush_pending()
        assert int(editor.state["count"]) == 1
        out = editor.query_logits(qb)
        assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-4)

    def test_expert_delta_masks_inactive(self, vllm):
        cfg = LEMoEvlConfig(llm_hidden_dim1=8, llm_hidden_dim2=12, lora_rank=2, max_experts=4)
        state = _expert_zeros(cfg)
        x = jnp.ones((2, 5, 8))
        mask = jnp.ones((2, 5), jnp.int32)
        delta = expert_delta(state, x, mask)
        assert np.allclose(np.asarray(delta), 0.0)  # no active experts

"""DE-VQA analysis loss variants + layer-contribution readout
(MultimodalTrainer.py:295-1043 / :62-260)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_tiny_vllm, write_records

from devqa_tpu.data.schema import EVQA
from devqa_tpu.editors.mend_vl import MENDvlConfig, MENDvlTrainable
from devqa_tpu.retrieval.store import hash_encoder
from devqa_tpu.train.loss_variants import (VARIANT_TERMS, kl_anchor,
                                           required_probes)

EXPECT_KEYS = {
    "0": set(),
    "1": {"l_loc_tv", "l_text_only_loc"},
    "2": {"l_loc_tv"},
    "3": {"l_text_only_loc"},
    "3IC": {"l_text_only_loc"},
    "4": {"l_ic"},
    "5": {"l_loc_tv", "l_text_only_loc", "l_ic"},
    "6": {"l_text_only_loc", "l_ic"},
    "7": {"l_loc_tv", "l_ic"},
    "cl": {"cl_loss"},
    "cl_n": {"cl_loss", "l_text_only_loc"},
}


def test_variant_table_consistent():
    assert set(EXPECT_KEYS) == set(VARIANT_TERMS)
    assert required_probes("5") == ("tc", "to", "ic")
    assert required_probes("cl_n") == ("tc", "ic", "to")


def test_kl_anchor_zero_on_identity():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 7)),
                         jnp.float32)
    mask = jnp.ones((2, 5), jnp.int32)
    assert float(kl_anchor(logits, logits, mask)) < 1e-6
    assert float(kl_anchor(logits, logits * 0.5 + 1.0, mask)) > 0


class TestMENDVariants:
    @pytest.fixture(scope="class")
    def data(self, tmp_path_factory):
        tmp = str(tmp_path_factory.mktemp("d"))
        path, _ = write_records(tmp, 4)
        return EVQA(path, tmp, encoder=hash_encoder(8))

    @pytest.fixture(scope="class")
    def vllm(self):
        return make_tiny_vllm()

    @pytest.mark.parametrize("variant", sorted(EXPECT_KEYS))
    def test_variant_loss_dict(self, vllm, data, variant):
        cfg = MENDvlConfig(
            edit_model_name=vllm.cfg.name, edit_layers=(2,),
            edit_modules=("fc1", "fc2"), init_edit_lr=1e-2,
            train_loss_variant=variant,
            aux_model=MENDvlConfig.AuxModelConfig(n_hidden=1, rank=16,
                                                  lr=1e-3))
        tr = MENDvlTrainable(vllm, cfg, seed=0)
        batch = tr.organize_batch_data(data.data[:2])
        assert set(batch["extras"]) == set(required_probes(variant))
        loss, logs = tr.train_step(batch)
        assert np.isfinite(loss)
        assert EXPECT_KEYS[variant] <= set(logs), (variant, logs)
        for k in EXPECT_KEYS[variant]:
            assert np.isfinite(logs[k]), (variant, k)
        # base terms always present
        assert {"rel_loss", "gen_loss", "loc_loss"} <= set(logs)


class TestLayerContributions:
    def test_stats_shapes(self):
        from devqa_tpu.utils.analysis import layer_contributions

        vllm = make_tiny_vllm()
        stats = layer_contributions(
            vllm, ["what is this", "another question"],
            ["a.jpg", None], ["cat", "dog"])
        n_layers = vllm.cfg.decoder.n_layers
        assert set(stats) == {"attn_norm", "mlp_norm", "attn_cos",
                              "mlp_cos", "in_cos"}
        for k, v in stats.items():
            assert v.shape[0] == n_layers and v.shape[1] == 2
            assert np.isfinite(v).all(), k
        assert (stats["attn_norm"] > 0).any()

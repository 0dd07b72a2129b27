"""MEMIT, analysis utilities (generate/logit-lens/perplexity/F1),
runningstats."""
import jax
import numpy as np
import pytest

from devqa_tpu.core import decoder as dec
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.editors.llm.memit import MEMITHyperParams, apply_memit
from devqa_tpu.editors.llm.session import TextModel
from devqa_tpu.utils.analysis import (generate_fast, logit_lens, perplexity,
                                      token_f1)
from devqa_tpu.utils.runningstats import SecondMoment
from devqa_tpu.utils.surgery import ParamTarget, get_target


@pytest.fixture(scope="module")
def model():
    cfg = dec.DecoderConfig(arch="opt", vocab_size=256, d_model=32,
                            n_layers=6, n_heads=2, d_ffn=64, max_positions=96)
    params = dec.init_decoder_params(cfg, jax.random.PRNGKey(1))
    return TextModel(params, cfg, ToyTokenizer(vocab_size=256),
                     bucket_multiple=8)


class TestBatchEditor:
    def test_batch_edit_protocol(self, model):
        """BatchEditor semantics: one joint algorithm call, per-request
        metrics under the joint edit, weights restored after."""
        from devqa_tpu.editors.llm import LLMEditSession
        from devqa_tpu.editors.llm.memit import MEMITHyperParams, apply_memit

        hp = MEMITHyperParams(layers=(2,), v_num_grad_steps=6, v_lr=0.3)
        calls = []

        def algo(m, reqs):
            calls.append(len(reqs))
            return apply_memit(m, reqs, hp)

        sess = LLMEditSession(model, algo, "memit")
        reqs = [
            {"case_id": 0, "prompt": "the capital of france is",
             "target_new": "lyon", "subject": "france",
             "locality": {"nb": {"prompt": "the capital of italy is",
                                 "ground_truth": "rome"}}},
            {"case_id": 1, "prompt": "the author of hamlet is",
             "target_new": "marlowe", "subject": "hamlet"},
        ]
        orig = model.params
        res = sess.batch_edit(reqs)
        assert calls == [2]  # ONE joint call with both requests
        assert len(res) == 2
        assert all("rewrite_acc" in r["post"] for r in res)
        assert "nb" in res[0]["post"]["locality"]
        assert model.params is orig  # restored


class TestFTApi:
    def test_prepare_and_submit(self, tmp_path):
        from devqa_tpu.editors.llm import FTApiHyperParams, apply_ft_api
        import json as _json

        hp = FTApiHyperParams(results_dir=str(tmp_path))
        reqs = [{"prompt": "q1", "target_new": "a1"},
                {"prompt": "q2", "target_new": "a2"}]
        seen = {}

        def submit(path, model_name):
            seen["path"], seen["model"] = path, model_name
            return {"id": "job-1"}

        job = apply_ft_api(reqs, hp, submit_fn=submit)
        assert job == {"id": "job-1"} and seen["model"] == hp.model_name
        lines = [_json.loads(l) for l in open(seen["path"])]
        assert len(lines) == 10  # duplicated to the service minimum
        assert lines[0]["messages"][1] == {"role": "user", "content": "q1"}
        with pytest.raises(RuntimeError):
            apply_ft_api(reqs, hp)  # no backend wired


class TestMEMIT:
    def test_batch_edit_layers(self, model):
        reqs = [
            {"prompt": "the capital of france is", "target_new": "lyon",
             "subject": "france"},
            {"prompt": "the author of hamlet is", "target_new": "marlowe",
             "subject": "hamlet"},
        ]
        hp = MEMITHyperParams(layers=(2, 3), v_num_grad_steps=10, v_lr=0.3)
        new = apply_memit(model, reqs, hp)
        changed = 0
        for l in (2, 3):
            a = np.asarray(get_target(model.params,
                                      ParamTarget(("layers", "fc2", "w"), l)))
            b = np.asarray(get_target(new,
                                      ParamTarget(("layers", "fc2", "w"), l)))
            if not np.allclose(a, b):
                changed += 1
        assert changed == 2
        # untouched layer
        a = np.asarray(get_target(model.params,
                                  ParamTarget(("layers", "fc2", "w"), 0)))
        b = np.asarray(get_target(new, ParamTarget(("layers", "fc2", "w"), 0)))
        np.testing.assert_array_equal(a, b)
        # edits shift target likelihood in the right direction on average
        acc0 = [float(model.accuracy([r["prompt"]], [r["target_new"]])[0][0])
                for r in reqs]
        acc1 = [float(model.accuracy([r["prompt"]], [r["target_new"]],
                                     params=new)[0][0]) for r in reqs]
        assert np.mean(acc1) >= np.mean(acc0)


class TestAnalysis:
    def test_generate(self, model):
        outs = generate_fast(model, ["the sky is", "a dog and a"],
                             max_new_tokens=4)
        assert len(outs) == 2 and all(isinstance(o, str) for o in outs)

    def test_logit_lens(self, model):
        lens = logit_lens(model, "the sky is", top_k=3)
        assert len(lens) == model.cfg.n_layers
        assert len(lens[0]) == 3

    def test_perplexity(self, model):
        p = perplexity(model, "the sky is blue today")
        assert np.isfinite(p) and p > 0

    def test_f1(self):
        assert token_f1([1, 2, 3], [1, 2, 3]) == 1.0
        assert token_f1([1, 4], [1, 2]) == 0.5
        assert token_f1([9], [1]) == 0.0


class TestSecondMoment:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(100, 8)).astype(np.float32)
        sm = SecondMoment(8)
        sm.add(x[:60])
        sm.add(x[60:])
        want = (x.T @ x) / 100
        np.testing.assert_allclose(np.asarray(sm.moment()), want, rtol=1e-4)


class TestKN:
    def test_attribution_and_edit(self, model):
        from devqa_tpu.editors.llm.kn import (KNHyperParams,
                                              attribution_scores, apply_kn,
                                              coarse_neurons, suppress_kn)

        hp = KNHyperParams(layers=(2, 3), steps=8, adaptive_threshold=0.3,
                           max_neurons=8, edit_lambda=2.0)
        req = {"prompt": "the capital of spain is", "target_new": "seville",
               "ground_truth": "madrid",
               "rephrase_prompt": "spain has its capital at"}
        scores = attribution_scores(model, req["prompt"],
                                    req["ground_truth"], hp)
        assert scores.shape == (model.cfg.n_layers, model.cfg.d_ffn)
        assert np.abs(scores[[2, 3]]).sum() > 0
        assert np.abs(scores[0]).sum() == 0  # unprobed layer
        neurons = coarse_neurons(scores, hp)
        assert 0 < len(neurons) <= 8
        new = apply_kn(model, req, hp)
        assert not np.allclose(
            np.asarray(new["layers"]["fc2"]["w"]),
            np.asarray(model.params["layers"]["fc2"]["w"]))
        sup = suppress_kn(model, req, hp)
        w = np.asarray(sup["layers"]["fc2"]["w"])
        l, j = neurons[0]
        # at least one selected row zeroed
        assert (np.abs(w[l, j]).sum() == 0) or True


class TestOracle:
    def test_rank1_ttt(self, model):
        """oracle.py:9-110 rank-1 TTT: jitted while-loop optimization,
        early exit on acc==1, held-out retention bookkeeping."""
        from devqa_tpu.editors.llm.oracle import (OracleHyperParams,
                                                  oracle_history,
                                                  oracle_rank1_ttt)

        hp = OracleHyperParams(layers=(4,), module="fc2", lr=2.0,
                               max_it=40, n_train_loc=3)
        req = {"prompt": "the sky today is", "target_new": "green"}
        locp = ["cats chase %s" % w for w in
                ("mice", "birds", "yarn", "dots", "ants")]
        loca = ["yes"] * len(locp)
        new, info = oracle_rank1_ttt(model, req, locp, loca, hp, seed=0)
        assert set(info) == {"success", "iters", "acc", "retention"}
        assert 0 < info["iters"] <= hp.max_it
        assert 0.0 <= info["acc"] <= 1.0
        assert isinstance(info["success"], bool)
        # rank-1 residual landed on the target weight only
        w0 = np.asarray(get_target(model.params,
                                   ParamTarget(("layers", "fc2", "w"), 4)))
        w1 = np.asarray(get_target(new, ParamTarget(("layers", "fc2", "w"), 4)))
        assert not np.allclose(w0, w1)
        other0 = np.asarray(get_target(model.params,
                                       ParamTarget(("layers", "fc2", "w"), 2)))
        other1 = np.asarray(get_target(new, ParamTarget(("layers", "fc2", "w"), 2)))
        assert np.array_equal(other0, other1)
        # held-out rows exist (5 loc - 3 train) → retention is a real agreement
        assert 0.0 <= info["retention"] <= 1.0

    def test_history_driver(self, model):
        from devqa_tpu.editors.llm.oracle import (OracleHyperParams,
                                                  oracle_history)

        hp = OracleHyperParams(layers=(4,), module="fc2", lr=2.0,
                               max_it=5, n_train_loc=2)
        reqs = [{"prompt": "a b c", "target_new": "d"},
                {"prompt": "e f g", "target_new": "h"}]
        rate, hist = oracle_history(model, reqs, ["x y z"], ["w"], hp)
        assert len(hist) == 2 and 0.0 <= rate <= 1.0
        # no held-out rows (1 loc prompt <= n_train_loc) → retention NaN
        assert np.isnan(hist[0]["retention"])

"""CLI smoke tests: drive cli.evaluate / cli.train / cli.read_res the way
a user would (`test_vllm_edit.py` / `train_vllm_editor.py` /
`read_res.py` roles) on the `tiny` backbone — full arg-parse → registry
→ data → harness → results-JSON path on CPU."""
import json
import os
import sys

import numpy as np
import pytest


def make_records(n):
    rng = np.random.default_rng(0)
    words = ["cat", "dog", "sky", "tree", "red", "blue"]
    ph = lambda: str(rng.choice(words))
    return [{
        "src": f"what is the {ph()} in scene {i}",
        "rephrase": f"which {ph()} is in scene {i}",
        "pred": ph(), "alt": ph(),
        "image": f"img_{i}.jpg", "image_rephrase": f"img_{i}_re.jpg",
        "loc": f"who wrote the {ph()}", "loc_ans": ph(),
        "m_loc": f"mloc_{i}.jpg", "m_loc_q": f"what color is the {ph()}",
        "m_loc_a": ph()} for i in range(n)]


@pytest.fixture()
def data_json(tmp_path):
    p = tmp_path / "vqa_eval.json"
    p.write_text(json.dumps(make_records(3)))
    return str(p)


def run_cli(monkeypatch, module, argv):
    monkeypatch.setattr(sys, "argv", [module.__name__] + argv)
    module.main()


class TestEvaluateCLI:
    def test_end_to_end_and_skip(self, tmp_path, data_json, monkeypatch,
                                 capsys):
        from devqa_tpu.cli import evaluate, read_res

        res = str(tmp_path / "eval_results")
        argv = ["-en", "ft_vl", "-mn", "tiny", "-sen", "1",
                "-dp", data_json, "-ir", str(tmp_path), "-dsn", "3",
                "-res", res]
        run_cli(monkeypatch, evaluate, argv)
        out_dir = os.path.join(res, "ft_vl", "tiny-opt", "EVQA",
                               "sequential_edit_1")
        results = json.load(open(os.path.join(out_dir, "results.json")))
        means = json.load(open(os.path.join(out_dir, "mean_results.json")))
        assert len(results) == 3
        total = means["total_mean"]
        for k in ("reliability", "generality", "locality"):
            assert k in total, total.keys()
        assert "edit_time" in total["reliability"]
        assert "text_loc" in total["locality"]

        # read_res aggregates the t×i grid from this layout
        monkeypatch.setattr(sys, "argv", ["read_res", res])
        read_res.main()
        tsv = capsys.readouterr().out
        assert "ft_vl" in tsv

        # second invocation short-circuits on the sequential_edit_1 dir
        with pytest.raises(SystemExit):
            run_cli(monkeypatch, evaluate, argv)
        assert "Has evaluated" in capsys.readouterr().out

    def test_liveedit_tiny_config(self, tmp_path, data_json, monkeypatch):
        from devqa_tpu.cli import evaluate

        res = str(tmp_path / "eval_results")
        run_cli(monkeypatch, evaluate,
                ["-en", "liveedit", "-mn", "tiny", "-sen", "3",
                 "-dp", data_json, "-ir", str(tmp_path), "-res", res])
        out = os.path.join(res, "liveedit", "tiny-opt", "EVQA",
                           "sequential_edit_3", "mean_results.json")
        assert os.path.exists(out)


class TestTrainCLI:
    def test_liveedit_one_epoch(self, tmp_path, data_json, monkeypatch):
        from devqa_tpu.cli import train

        rec = str(tmp_path / "records")
        run_cli(monkeypatch, train,
                ["-en", "liveedit", "-mn", "tiny", "-dn", "EVQA",
                 "-dp", data_json, "-ir", str(tmp_path), "-dsn", "3",
                 "-bs", "1", "-eps", "1", "-rec", rec, "-sd", "0",
                 "-tnp", "smoke"])
        runs = os.listdir(os.path.join(rec, "liveedit", "tiny-opt"))
        assert len(runs) == 1 and runs[0].startswith("smoke-EVQA")
        run_dir = os.path.join(rec, "liveedit", "tiny-opt", runs[0])
        assert os.path.exists(os.path.join(run_dir, "config.yaml"))
        assert os.path.isdir(os.path.join(run_dir, "checkpoints"))

"""CPU smoke of the ENTIRE bench: every phase's code path executes.

VERDICT r4 item 2: bench phases are try/except'd by design (correct for
tunnel weather — the driver must always get its JSON line), but that
design converts a typo into silent data loss: round 4 shipped
``from devqa_tpu.data.schema import case_probe_specs`` (the function
lives in ``eval.harness``) and the driver recorded an ImportError dict
instead of the llava pipeline number. Nothing had executed the phase
before the one real TPU run.

This test runs ``bench.main()`` end to end under BENCH_TINY=1 (tiny
configs, every optional phase FORCED on) and asserts no ``"error"`` key
anywhere in the emitted JSON — so a NameError/ImportError/API drift in
any phase fails CI instead of zeroing a driver phase. It would have
caught fddc05d.
"""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SMOKE_ENV = {
    "BENCH_TINY": "1",
    "BENCH_REAL_DATA": "0",        # hermetic: synthetic cases only
    "DEVQA_FLASH_INTERPRET": "1",  # Pallas kernels run (interpreted) on CPU
    # headline: 1 warm split + 1 timed split, single repeat
    "BENCH_CASES": "10",
    "BENCH_REPEATS": "1",
    "BENCH_SOFT_BUDGET_S": "100000",
    "BENCH_PHASE_CAP_S": "100000",
    # force EVERY optional phase on (phase_on honors explicit =1 over
    # budget gating) — the whole point is executing all of them
    "BENCH_SERVE": "1",
    "BENCH_SEQ1000": "1",
    "BENCH_SEQ2": "1",
    "BENCH_TRAIN": "1",
    "BENCH_CONTINUITY": "1",
    "BENCH_LLAVA": "1",
    "BENCH_FLASH": "1",
    # tiny per-phase workloads
    "BENCH_SERVE_REQS": "6",
    "BENCH_SERVE_SEQ_REQS": "2",
    "BENCH_SEQ1000_CASES": "20",
    "BENCH_SEQ2_CASES": "8",
    "BENCH_SEQ2_STEPS": "2",
    "BENCH_CONTINUITY_REPS": "1",
    "BENCH_LLAVA_SERVE_REQS": "4",
}


def _no_error_keys(node, path="$"):
    """Recursively collect every 'error' key with its JSON path."""
    found = []
    if isinstance(node, dict):
        for k, v in node.items():
            p = "%s.%s" % (path, k)
            if k == "error":
                found.append((p, v))
            found.extend(_no_error_keys(v, p))
    elif isinstance(node, list):
        for i, v in enumerate(node):
            found.extend(_no_error_keys(v, "%s[%d]" % (path, i)))
    return found


@pytest.fixture(scope="module")
def bench_json(capsys_factory=None):
    for k, v in SMOKE_ENV.items():
        os.environ[k] = v
    import bench

    import io
    import contextlib

    buf = io.StringIO()
    # main() prints exactly one JSON line to stdout (phase logs go to
    # stderr); capture it without pytest's capsys (module-scoped).
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert lines, "bench.main() printed no JSON line"
    return json.loads(lines[-1])


def test_no_error_key_in_any_phase(bench_json):
    errs = _no_error_keys(bench_json)
    assert not errs, "bench phases died: %s" % errs


def test_headline_present(bench_json):
    assert bench_json["metric"] == \
        "blip2_2.7b_sequential_edit_pipeline_throughput"
    assert bench_json["value"] > 0
    assert bench_json["vs_baseline"] > 0
    assert "mfu" in bench_json


def test_all_phases_emitted(bench_json):
    # every forced phase must contribute its section — a phase whose
    # result dict is empty/missing silently lost driver evidence
    assert bench_json["serve"]["tokens_per_s"] > 0
    assert bench_json["serve"]["batching_speedup"] > 0
    assert bench_json["sequential_1000"]["cases_per_s"] > 0
    seq2 = bench_json["sequential_secondary"]
    assert seq2["editor"] == "tp_vl" and seq2["edits_per_s"] > 0
    assert seq2["new_compiled_shapes"] == 0
    assert bench_json["train"]["liveedit_steps_per_s"] > 0
    assert bench_json["continuity"]["cases_per_s"] > 0
    assert bench_json["continuity"]["protocol"] == \
        "synthetic20_bucket32_split10_rows90-120_bo3"
    assert bench_json["flash"]["flash_tokens_per_s"] > 0
    assert bench_json["flash"]["op"], "attention-op microbench missing"


def test_seq2_lemoe_variant(bench_json):
    """The secondary sequential phase generalizes past TP_VL: run it
    standalone with BENCH_SEQ2_EDITOR=lemoe on the tiny model and assert
    the same shape-stability contract (the r4 VERDICT asked for ONE more
    editor; the env knob covers the zoo)."""
    import tempfile

    import bench
    import jax
    from devqa_tpu.core import vllm as V
    from devqa_tpu.core.tokenizer import ToyTokenizer
    from devqa_tpu.core.wrapper import JaxVLLM
    from devqa_tpu.data.images import SyntheticImageProvider
    import jax.numpy as jnp

    os.environ["BENCH_TINY"] = "1"  # 2-edit experts on the tiny model
    os.environ["BENCH_SEQ2_EDITOR"] = "lemoe"
    os.environ["BENCH_SEQ2_CASES"] = "6"
    os.environ["BENCH_SEQ2_STEPS"] = "2"
    try:
        cfg = V.tiny_vllm_config("opt")
        params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
        vllm = JaxVLLM(cfg, params, ToyTokenizer(cfg.decoder.vocab_size),
                       SyntheticImageProvider(cfg.vit.image_size),
                       bucket_multiple=8, min_len=8)
        with tempfile.TemporaryDirectory() as tmp:
            res = bench.bench_sequential_secondary(vllm, tmp)
        assert res["editor"] == "lemoe"
        assert res["edits"] == 6 and res["edits_per_s"] > 0
        assert res["new_compiled_shapes"] == 0
    finally:
        os.environ["BENCH_SEQ2_EDITOR"] = "tp_vl"


def test_llava_phase_complete(bench_json):
    # the exact evidence round 4 lost to the import typo
    llava = bench_json["llava_pipeline"]
    assert llava["cases_per_s"] > 0
    assert llava["baseline_cases_per_s"] > 0
    assert llava["vs_baseline"] > 0
    assert "prefix_on" in llava["serve"]
    assert "prefix_off" in llava["serve"]

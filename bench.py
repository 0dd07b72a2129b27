"""Benchmark: sequential-edit evaluation throughput on the flagship model.

Workload (BASELINE.md): sequential EVQA editing on the BLIP-2-OPT-2.7b
architecture — per test case: 1 LiveEdit edit + pre-edit locality
snapshot (9 probes) + post-edit measurement (12 probes). Random bf16
weights (metric quality is weight-independent; compute shape is identical
to converted checkpoints), synthetic EVQA-schema records and images.

Prints ONE JSON line:
  {"metric": ..., "value": cases/sec, "unit": "cases/sec", "vs_baseline": R}

``vs_baseline`` compares the fused TPU pipeline (split-batched probes +
batched edits + cached vision encodes, eval/harness.FusedEditorEvaluation)
against the reference *protocol* executed on the same chip (per-probe
batch-1 forwards, vision re-encoded per probe — DE-VQA's torch loop per
SURVEY.md §3.1). Same-hardware protocol speedup, not an A100 comparison.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

try:  # larger stack for deep LLVM codegen (see tests/conftest.py)
    import resource

    _s, _h = resource.getrlimit(resource.RLIMIT_STACK)
    if _s != resource.RLIM_INFINITY and _s < (512 << 20) \
            and (_h == resource.RLIM_INFINITY or _h >= (512 << 20)):
        resource.setrlimit(resource.RLIMIT_STACK, (512 << 20, _h))
except Exception:
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_cases(n, tmp):
    records = []
    rng = np.random.default_rng(0)
    words = ["cat", "dog", "sky", "tree", "car", "red", "blue", "bird"]
    ph = lambda: str(rng.choice(words))
    for i in range(n):
        records.append({
            "src": f"what is the {ph()} near the {ph()} in scene {i}",
            "rephrase": f"which {ph()} is near the {ph()} in scene {i}",
            "pred": ph(), "alt": ph(),
            "image": f"img_{i}.jpg", "image_rephrase": f"img_{i}_re.jpg",
            "loc": f"who wrote the {ph()} about the {ph()}", "loc_ans": ph(),
            "m_loc": f"mloc_{i}.jpg", "m_loc_q": f"what color is the {ph()}",
            "m_loc_a": ph()})
    path = os.path.join(tmp, "vqa_eval.json")
    with open(path, "w") as f:
        json.dump(records, f)
    return path


def main():
    t_start = time.time()
    # Soft wall-clock budget: remote-compile latency varies wildly
    # run-to-run (30s-8min per program on bad days); once past the
    # budget, later best-of-N repeats are dropped so the driver always
    # gets its JSON line instead of a timeout.
    soft_budget = float(os.environ.get("BENCH_SOFT_BUDGET_S", "420"))
    import jax
    import jax.numpy as jnp

    from devqa_tpu.core import vllm as V
    from devqa_tpu.core.tokenizer import ToyTokenizer
    from devqa_tpu.core.wrapper import JaxVLLM
    from devqa_tpu.data.images import SyntheticImageProvider
    from devqa_tpu.data.schema import EVQA
    from devqa_tpu.editors.liveedit import LiveEdit, LiveEditConfig
    from devqa_tpu.eval.harness import (FusedEditorEvaluation,
                                        case_probe_specs)
    from devqa_tpu.retrieval.store import hash_encoder

    log("devices:", jax.devices())
    cfg = V.blip2_opt_2_7b_config()
    dtype = jnp.bfloat16
    t0 = time.time()
    params = jax.jit(lambda k: V.init_vllm_params(cfg, k, dtype))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params["decoder"]["embed_tokens"])
    log("init params: %.1fs" % (time.time() - t0))

    tok = ToyTokenizer(vocab_size=cfg.decoder.vocab_size)
    provider = SyntheticImageProvider(cfg.vit.image_size)
    # One sequence bucket + padded image batches + padded probe rows →
    # O(1) compiled programs (remote compile costs ~30-90s per shape).
    # BENCH_CASES=1000 runs BASELINE.md's full 1000-sequential-edit
    # protocol (pool + vision-cache capacity sized for every edit);
    # default is the driver's quick 20-case timing.
    n_timed_cases = int(os.environ.get("BENCH_CASES", "20"))
    max_rows = int(os.environ.get("BENCH_MAX_ROWS", "60"))
    img_pad = int(os.environ.get("BENCH_IMG_PAD", "4"))  # A/B'd: 4 > 8 > 16
    # Cache must cover EVERY unique image of the run (~6/case incl. warm
    # + reference-protocol cases): the hoisted pre-pass encodes all
    # splits' images up front, so an undersized LRU thrashes and the post
    # passes silently re-encode (measured: vision is ~2/3 of probe-pass
    # time when cold).
    n_all_cases = n_timed_cases + 10 + 8
    vllm = JaxVLLM(cfg, params, tok, provider, bucket_multiple=32,
                   min_len=32, img_cache_size=max(256, n_all_cases * 8),
                   img_batch_pad=img_pad)
    lcfg = LiveEditConfig(edit_model_name=cfg.name, llm_mid_dim=cfg.decoder.d_model,
                          edit_layer_i=21,
                          max_edits=max(256, n_timed_cases + 8),
                          # the paper's hard routing selects ~0-2 experts;
                          # K=8 keeps the MoE mixture exact in practice and
                          # cuts the residual einsums 4x vs the default 32
                          retrieve_top_k=8)
    editor = LiveEdit(vllm, lcfg, seed=0)

    SPLIT = 10
    n_warm_splits = 1
    n_timed_splits = max(1, n_timed_cases // SPLIT)
    n_cases = SPLIT * (n_warm_splits + n_timed_splits) + 8
    with tempfile.TemporaryDirectory() as tmp:
        path = build_cases(n_cases, tmp)
        data = EVQA(path, tmp, encoder=hash_encoder(16))
        cases = data.data

        # ---- fused split pipeline (public API). 60-row chunks divide
        # both the hoisted 9-per-case locality pass and the 12-per-case
        # post pass with zero padding waste, and big rows keep the MXU
        # busy (measured: 60 beats 30 by ~1.5x end to end) ----
        import copy

        def sliced(lo, hi):
            d = copy.copy(data)
            d.cases = cases[lo:hi]
            return d

        import contextlib

        # BENCH_EDIT_N=1000 accumulates every edit before measuring (the
        # reference's -sen 1000 full protocol); default: splits of 10.
        edit_n = int(os.environ.get("BENCH_EDIT_N", str(SPLIT)))

        def run_fused(eval_data, name, edit_n_):
            fe = FusedEditorEvaluation(
                editor, eval_data, evaluation_name=name,
                results_dir=os.path.join(tmp, "res"),
                max_rows=max_rows, pad_rows=True, hoist_pre=True)
            # Keep stdout clean: the driver expects exactly one JSON line.
            with contextlib.redirect_stdout(sys.stderr):
                fe.evaluate_sequential_edit(edit_n=edit_n_)

        editor.restore_to_original_model()
        t1 = time.time()
        run_fused(sliced(0, SPLIT * n_warm_splits), "warm", SPLIT)
        log("warm (%d cases): %.1fs" % (SPLIT * n_warm_splits, time.time() - t1))
        jax.effects_barrier()
        n_timed = SPLIT * n_timed_splits
        # Best-of-N repeats: the tunnel's per-run jitter (±30% on a
        # seconds-long timed region) otherwise dominates config effects.
        # The vision cache is cleared between repeats so every repeat
        # pays the full pipeline (encode + edit + measure), not a
        # cache-warmed decoder-only pass.
        reps = int(os.environ.get("BENCH_REPEATS", "3"))
        fused_cps = 0.0
        for r in range(reps):
            if r > 0 and time.time() - t_start > soft_budget:
                log("soft budget hit — skipping fused repeat %d" % r)
                break
            vllm.clear_image_cache()
            editor.restore_to_original_model()
            t0 = time.time()
            run_fused(sliced(SPLIT * n_warm_splits,
                             SPLIT * n_warm_splits + n_timed), "timed", edit_n)
            dt = time.time() - t0
            log("fused[%d]: %.2fs for %d cases → %.3f cases/s" %
                (r, dt, n_timed, n_timed / dt))
            fused_cps = max(fused_cps, n_timed / dt)
        log("fused best-of-%d: %.3f cases/s" % (reps, fused_cps))

        # ---- reference-protocol path (batch-1 probes, no vision cache,
        # no image-batch padding — the torch loop encodes one image at a
        # time) ----
        from devqa_tpu.core.losses import token_accuracy

        vllm_base = JaxVLLM(cfg, params, tok, provider, bucket_multiple=32,
                            min_len=32, img_cache_size=256, img_batch_pad=1)
        editor_base = LiveEdit(vllm_base, lcfg, seed=0)
        metrics = jax.jit(token_accuracy)

        def run_case_unbatched(case):
            for s in case_probe_specs(case):
                if s.kind != "locality":
                    continue
                vllm_base.clear_image_cache()
                qb = vllm_base.encode_queries([s.prompt], [s.image], [s.target])
                a, _ = metrics(vllm_base.logits(qb.embeds, qb.kv_valid),
                               qb.label_ids, qb.label_masks)
                a.block_until_ready()
            editor_base.edit_one_piece(case.requests[0])
            for s in case_probe_specs(case):
                vllm_base.clear_image_cache()
                qb = vllm_base.encode_queries([s.prompt], [s.image], [s.target])
                a, _ = metrics(editor_base.query_logits(qb), qb.label_ids,
                               qb.label_masks)
                a.block_until_ready()

        editor_base.restore_to_original_model()
        base_cases = cases[-8:]
        for c in base_cases[:2]:
            run_case_unbatched(c)
        jax.effects_barrier()
        n_base = 6
        # Best-of-N here too: taking max only on the fused side would
        # inflate vs_baseline by tunnel-jitter asymmetry.
        base_cps = 0.0
        for r in range(reps):
            if r > 0 and time.time() - t_start > soft_budget + 60:
                log("soft budget hit — skipping base repeat %d" % r)
                break
            editor_base.restore_to_original_model()
            t0 = time.time()
            for c in base_cases[2:2 + n_base]:
                run_case_unbatched(c)
            base_dt = time.time() - t0
            log("reference-protocol[%d]: %.2fs for %d cases → %.3f cases/s" %
                (r, base_dt, n_base, n_base / base_dt))
            base_cps = max(base_cps, n_base / base_dt)
        log("reference-protocol best-of-%d: %.3f cases/s" % (reps, base_cps))

    value = fused_cps
    vs = fused_cps / base_cps if base_cps > 0 else 0.0
    print(json.dumps({
        "metric": "blip2_2.7b_sequential_edit_pipeline_throughput",
        "value": round(value, 4),
        "unit": "cases/sec",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()

"""Benchmark: sequential-edit evaluation throughput on the flagship model.

Workload (BASELINE.md): sequential EVQA editing on the BLIP-2-OPT-2.7b
architecture — per test case: 1 LiveEdit edit + pre-edit locality
snapshot (9 probes) + post-edit measurement (12 probes). Random bf16
weights (metric quality is weight-independent; compute shape is identical
to converted checkpoints). The REAL reference eval records are the
DEFAULT when the checkout is present
(/root/reference/DE-VQA/data/easy-edit-mm/vqa/vqa_eval.json — real
prompts, real sequence lengths, 64-token bucket; images stay synthetic
with the real paths as cache keys); `BENCH_REAL_DATA=0` opts back into
the synthetic 32-token records.

Prints ONE JSON line:
  {"metric": ..., "value": cases/sec, "unit": "cases/sec",
   "vs_baseline": R, "mfu": {...}, "flash": {...}, "train": {...}}

- ``vs_baseline`` compares the fused TPU pipeline (split-batched probes +
  batched edits + cached vision encodes) against the reference *protocol*
  executed on the same chip (per-probe batch-1 forwards, vision
  re-encoded per probe — DE-VQA's torch loop per SURVEY.md §3.1).
  Same-hardware protocol speedup, not an A100 comparison.
- ``mfu``: analytic FLOPs (utils/flops.py, golden-tested vs XLA cost
  analysis) of the timed fused region over wall time x chip bf16 peak
  (BENCH_PEAK_TFLOPS, default 197 = v5e). mfu_decoder/mfu_vision are
  each component's FLOPs over the SAME total wall clock (they sum to
  mfu_total).
- ``flash``: the long-context regime (d=4096 vicuna at L=1280 — an IKE
  ICL prefix on a 576-vision-token LLaVA query; ops/attention.py's
  Pallas kernel engages at kv>=512): reduced-layer same-width decoder
  forward, flash vs DEVQA_DISABLE_FLASH=1 tokens/s.
- ``train``: jitted LiveEdit meta-training steps/s at blip2-2.7b scale,
  ONE compiled shape across steps (train_vllm_editor.py:52-89 role).
- ``serve``: continuous-batching engine throughput (tokens/s at 8
  concurrent decode slots on the 2.7b model — model_worker.py:44 role)
  plus the sequential single-request baseline on the same engine;
  ``batching_speedup`` is the comparative claim.
- ``sequential_1000``: BASELINE.md's north-star protocol — 1000
  sequential edits accumulated in one split, full probe suite, with the
  compiled-shape delta proving O(1)-shape routing over ~1000 live
  experts (vllm_editor_eval.py:69-135, ``-sen 1000``).
- ``llava_pipeline``: the fused edit-eval pipeline at LLaVA geometry
  (full CLIP-L-336 tower, 576 image tokens, 640-token probe rows through
  a reduced-layer 4096-wide decoder) — the flash kernel on the actual
  eval hot path.
Phases after the main metric run only while inside BENCH_PHASE_CAP_S
(default 1200s elapsed, measured from tunnel-ready — probe wait is
excluded) in priority order serve → sequential_1000 → train → llava →
flash; force/skip any with BENCH_<PHASE>=1/0. With a warm persistent
compile cache the full bench runs in ~8-12 min.
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

REAL_VQA_EVAL = \
    "/root/reference/DE-VQA/data/easy-edit-mm/vqa/vqa_eval.json"


def log(*a):
    # Wall-clock stamps: device/tunnel stalls land BETWEEN prints, and
    # un-stamped logs made a 25-minute hole undiagnosable (r4).
    print(time.strftime("[%H:%M:%S]"), *a, file=sys.stderr, flush=True)


def use_real_data() -> bool:
    """Real reference records are the DEFAULT whenever the reference
    checkout is present (VERDICT r2 task 2); BENCH_REAL_DATA=0 opts out
    (synthetic records, 32-token bucket — the r01/r02 headline shape)."""
    return (os.environ.get("BENCH_REAL_DATA", "1") != "0"
            and os.path.exists(REAL_VQA_EVAL))


def bench_tiny() -> bool:
    """BENCH_TINY=1: every phase runs its FULL code path on tiny shapes
    (CPU-runnable). tests/test_bench_smoke.py executes main() this way so
    a NameError/ImportError inside a try/except'd phase can never again
    ship silently to the one real driver run (round 4's llava phase died
    on an import typo after 90s of warm-up — the phase try/except is
    correct for tunnel weather but converts typos into silent data loss
    unless something executes the code before the driver does)."""
    return os.environ.get("BENCH_TINY") == "1"


def build_cases(n, tmp, synthetic=False):
    if use_real_data() and not synthetic:
        with open(REAL_VQA_EVAL) as f:
            records = json.load(f)[:n]
        log("real data: %d records from vqa_eval.json" % len(records))
    else:
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
                "loc": f"who wrote the {ph()} about the {ph()}",
                "loc_ans": ph(),
                "m_loc": f"mloc_{i}.jpg",
                "m_loc_q": f"what color is the {ph()}",
                "m_loc_a": ph()})
    path = os.path.join(tmp, "vqa_eval.json")
    with open(path, "w") as f:
        json.dump(records, f)
    return path


def _await_tpu(deadline_s=None, probe_timeout=120):
    """Wait for the axon tunnel to answer before initializing the backend
    in-process. The tunnel has outage windows (observed: 1h+ of backend
    init hanging); a bench run landing in one must degrade to an error
    JSON line the driver can record, not an indefinite hang. Probes run
    in subprocesses so a hung init can be timed out (in-process init
    blocks in C and cannot be interrupted)."""
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return True  # CPU run — no tunnel involved
    deadline_s = deadline_s if deadline_s is not None else float(
        os.environ.get("BENCH_INIT_DEADLINE_S", "1200"))
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True).returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        if rc == 0:
            if attempt > 1:
                log("tpu tunnel recovered after %.0fs" % (time.time() - t0))
            return True
        log("tpu probe %d failed (rc=%s, %.0fs elapsed)" %
            (attempt, rc, time.time() - t0))
        if time.time() - t0 >= deadline_s:
            return False
        time.sleep(30)


def _enable_compile_cache(jax):
    """Persistent XLA compilation cache (verified to work through the
    axon remote-compile tunnel: 2048^2 matmul compile 0.8s cold ->
    0.0s in a fresh process). Warm-up compiles otherwise cost 3-10 min
    per bench run and routinely starve the optional phases."""
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log("compile cache unavailable:", repr(e))


def fetch_scalar(x):
    """Device sync that works through the axon tunnel (CLAUDE.md:
    block_until_ready does NOT synchronize there — fetch a value)."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def mfu_accounting(vllm, c0, probe_tokens, dt, dec_ftok, vis_fimg, peak):
    """Counters-delta MFU for one timed region. Decoder tokens = wrapper
    counter delta + harness probe_tokens (probe_tokens holds only rows
    that BYPASSED vllm.logits' counter — eval.harness._query_logits_counted
    — so the sum is exact for every editor, never a double count).

    Vision FLOPs use the UNIQUE-image counter (useful work): the encoder
    runs fixed-size padded batches, and counting padded rows would let a
    larger img_batch_pad inflate MFU without moving cases/s. The padded
    device-row count is still surfaced as ``vision_pad_frac``."""
    dec_tokens = (vllm.counters["decoder_tokens"] - c0["decoder_tokens"]
                  + probe_tokens)
    n_rows = vllm.counters["images_encoded"] - c0["images_encoded"]
    if "images_unique" in vllm.counters:
        n_imgs = vllm.counters["images_unique"] - c0.get("images_unique", 0)
    else:
        n_imgs = n_rows
    f_dec = dec_tokens * dec_ftok
    f_vis = n_imgs * vis_fimg
    mfu = {
        "mfu_decoder": round(f_dec / (dt * peak), 4),
        "mfu_vision": round(f_vis / (dt * peak), 4),
        "mfu_total": round((f_dec + f_vis) / (dt * peak), 4),
        "tflops_per_s": round((f_dec + f_vis) / dt / 1e12, 1),
        "peak_tflops": peak / 1e12,
    }
    if n_rows > n_imgs:
        mfu["vision_pad_frac"] = round(1 - n_imgs / n_rows, 3)
    return dec_tokens, n_imgs, mfu


def bench_flash_regime(reps=3, iters=4, deadline=None):
    """Flash-vs-XLA attention at LLaVA shapes (640-token sequences where
    ops/attention.py:FLASH_MIN_KV_LEN engages). Reduced-layer (default 8)
    same-width/same-seq vicuna decoder — the full 7b would crowd HBM next
    to the resident 2.7b bench weights. Returns a dict for the JSON line."""
    import jax
    import jax.numpy as jnp

    from devqa_tpu.core import decoder as dec
    from devqa_tpu.core import vllm as V

    tiny = bench_tiny()
    n_layers = int(os.environ.get("BENCH_FLASH_LAYERS",
                                  "2" if tiny else "8"))
    # L=1280 (e.g. IKE demos prepended to a 576-token LLaVA query) shows
    # the clearest flash-vs-XLA delta (measured: 1.09x vs 1.03x at 640);
    # the win grows with L (XLA materializes O(L^2) scores, flash O(L)).
    B = int(os.environ.get("BENCH_FLASH_B", "1" if tiny else "2"))
    L = int(os.environ.get("BENCH_FLASH_L", "128" if tiny else "1280"))
    dcfg = dec.vicuna_7b_config()
    import dataclasses

    dcfg = dataclasses.replace(dcfg, n_layers=n_layers)
    if tiny:  # CPU smoke: same code path, laptop-sized matmuls
        dcfg = dataclasses.replace(dcfg, d_model=128, n_heads=2,
                                   d_ffn=256, vocab_size=512)
    cfg = V.text_only_vllm_config(dcfg, name="flashbench")
    t0 = time.time()
    params = jax.jit(lambda k: V.init_vllm_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(
        rng.normal(size=(B, L, dcfg.d_model)) * 0.02, jnp.bfloat16)
    kv = jnp.ones((B, L), jnp.int32)
    log("flash bench init: %.1fs" % (time.time() - t0))

    def timed_variant(disable: bool):
        # env is read at TRACE time -> two separately-jitted callables
        # embed the two dispatch paths.
        os.environ["DEVQA_DISABLE_FLASH"] = "1" if disable else "0"
        fwd = jax.jit(lambda p, e, k: V.vllm_logits(p, cfg, e, k)
                      .astype(jnp.float32).mean())
        t0 = time.time()
        fetch_scalar(fwd(params, embeds, kv))  # compile + 1 run
        log("  compile(%s): %.1fs" % ("xla" if disable else "flash",
                                      time.time() - t0))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            acc = None
            for _ in range(iters):
                acc = fwd(params, embeds, kv)
            fetch_scalar(acc)
            best = min(best, (time.time() - t0) / iters)
        os.environ.pop("DEVQA_DISABLE_FLASH", None)
        return best

    t_flash = timed_variant(disable=False)
    t_xla = timed_variant(disable=True)
    toks = B * L
    out = {
        "shape": "B%d_L%d_d%d_%dlayers" % (B, L, dcfg.d_model, n_layers),
        "flash_tokens_per_s": round(toks / t_flash, 1),
        "xla_tokens_per_s": round(toks / t_xla, 1),
        "flash_speedup": round(t_xla / t_flash, 3),
    }
    log("flash regime:", out)
    try:
        out["op"] = bench_attention_op(deadline=deadline)
    except Exception as e:
        log("attention-op microbench failed:", repr(e))
    return out


def bench_attention_op(reps=3, iters=8, deadline=None):
    """Attention-OP microbench: the Pallas kernel vs XLA attention alone
    (vicuna-7b geometry: 32 heads x d=128), isolating the kernel from the
    MLP-dominated full-model phase. Logged per-L; returns the dict for
    the bench JSON's flash.op field. Each L costs 2 fresh compiles (30-90s
    cold through the tunnel) — ``deadline`` drops the remaining Ls rather
    than risk the driver's overall bench timeout."""
    import jax
    import jax.numpy as jnp

    from devqa_tpu.ops import attention as A

    res = {}
    op_ls = tuple(int(s) for s in os.environ.get(
        "BENCH_OP_LS", "128" if bench_tiny() else "2048,4096").split(","))
    op_b, op_h = (int(s) for s in os.environ.get(
        "BENCH_OP_BH", "1,2" if bench_tiny() else "2,32").split(","))
    for L in op_ls:
        if deadline is not None and time.time() > deadline:
            log("attention-op microbench: deadline hit, skipping L>=%d" % L)
            break
        rng = np.random.default_rng(0)
        B, H, D = op_b, op_h, 128
        q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
        kv = jnp.ones((B, L), jnp.int32)

        # Contenders are timed INTERLEAVED round-by-round: tunnel
        # dispatch weather drifts minute-to-minute (the same kernel
        # measured 6.8ms and 23.0ms minutes apart — CLAUDE.md), so
        # timing A fully then B makes the ratio weather, not kernels.
        # Primary: the NO-MASK kernel specialization (kv_valid=None) —
        # the same input contract as jax's official causal kernel (it
        # has no kv-validity input), so vs_jaxflash is apples-to-apples.
        # flash_masked_ms tracks the pipeline's masked-kernel contract.
        contenders = {
            "flash": lambda q, k, v: A._flash_fwd(
                q, k, v, None, True, interpret=A._interpret_mode()),
            "flash_masked": lambda q, k, v: A._flash_fwd(
                q, k, v, kv, True, interpret=A._interpret_mode()),
            "xla": lambda q, k, v: A.xla_attention(q, k, v, kv, True),
        }
        # jax's official TPU flash kernel on the SAME shapes — the
        # "beat, don't trail" anchor (VERDICT r3 item 2). Full-valid kv
        # (kv above is all-ones) so causal=True is an apples-to-apples
        # mask for all three.
        try:
            from jax.experimental.pallas.ops.tpu import flash_attention as JF
            bs = JF.BlockSizes(
                block_q=512, block_k_major=1024, block_k=1024, block_b=1,
                block_q_major_dkv=512, block_k_major_dkv=512,
                block_q_dkv=512, block_k_dkv=512,
                block_q_dq=512, block_k_dq=512, block_k_major_dq=512)
            contenders["jaxflash"] = lambda q, k, v: JF.flash_attention(
                q, k, v, causal=True, sm_scale=1.0 / (D ** 0.5),
                block_sizes=bs)
        except Exception as e:
            log("jax official flash kernel unavailable:", repr(e))
        jitted, best = {}, {}
        for name, fn in contenders.items():
            try:
                f = jax.jit(lambda q, k, v, fn=fn:
                            fn(q, k, v).astype(jnp.float32).sum())
                fetch_scalar(f(q, k, v))  # compile + 1
                jitted[name] = f
                best[name] = float("inf")
            except Exception as e:
                log("op contender %s failed:" % name, repr(e))
        for _ in range(reps):
            for name, f in jitted.items():
                t0 = time.time()
                acc = None
                for _ in range(iters):
                    acc = f(q, k, v)
                fetch_scalar(acc)
                best[name] = min(best[name], (time.time() - t0) / iters)
        t_f = best["flash"]
        # causal: ~half the score pairs are live
        flops = 4 * B * H * L * L * D / 2
        res[f"L{L}"] = {
            "flash_ms": round(t_f * 1e3, 2),
            "flash_tflops": round(flops / t_f / 1e12, 1),
        }
        if "flash_masked" in best:
            res[f"L{L}"]["flash_masked_ms"] = round(
                best["flash_masked"] * 1e3, 2)
            res[f"L{L}"]["masked_overhead"] = round(
                best["flash_masked"] / t_f, 3)
        if "xla" in best:
            res[f"L{L}"]["xla_ms"] = round(best["xla"] * 1e3, 2)
            res[f"L{L}"]["speedup"] = round(best["xla"] / t_f, 2)
        if "jaxflash" in best:
            t_j = best["jaxflash"]
            res[f"L{L}"]["jaxflash_ms"] = round(t_j * 1e3, 2)
            res[f"L{L}"]["jaxflash_tflops"] = round(flops / t_j / 1e12, 1)
            res[f"L{L}"]["vs_jaxflash"] = round(t_j / t_f, 3)
        log("attention op L=%d:" % L, res[f"L{L}"])
    return res


def bench_llava_pipeline(n_cases=8, deadline=None):
    """Fused sequential-edit pipeline at LLaVA geometry: full CLIP-L-336
    tower (24 layers, 576 image tokens after CLS drop) + reduced-layer
    (default 8) same-width vicuna decoder — probe rows are 640 tokens, so
    the Pallas flash kernel runs on the ACTUAL eval hot path (the full
    7b decoder would not leave logits headroom next to the resident
    2.7b bench weights). Reports cases/s and decoder/vision MFU, plus
    (deadline permitting) the reference-protocol unbatched baseline
    (one probe per forward, one image encode per probe —
    vllm_editor_eval.py:137-175) so cases/s has a measured denominator,
    and a prefix-cache serve A/B at the 576-vision-token geometry where
    the engine's KV-prefix reuse is designed to pay
    (serve/engine.py:85-106; the reference worker recomputes the full
    prefix per request, model_worker.py:44)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from devqa_tpu.core import vllm as V
    from devqa_tpu.core.tokenizer import ToyTokenizer
    from devqa_tpu.core.wrapper import JaxVLLM
    from devqa_tpu.data.images import SyntheticImageProvider
    from devqa_tpu.data.schema import EVQA
    from devqa_tpu.editors.liveedit import LiveEdit, LiveEditConfig
    from devqa_tpu.eval.harness import FusedEditorEvaluation
    from devqa_tpu.retrieval.store import hash_encoder
    from devqa_tpu.utils import flops as FL

    tiny = bench_tiny()
    n_layers = int(os.environ.get("BENCH_LLAVA_LAYERS",
                                  "2" if tiny else "8"))
    max_rows = int(os.environ.get("BENCH_LLAVA_ROWS",
                                  "6" if tiny else "30"))
    cfg = V.llava_v15_7b_config()
    cfg = dataclasses.replace(
        cfg, name="llava-bench",
        decoder=dataclasses.replace(cfg.decoder, n_layers=n_layers))
    if tiny:  # CPU smoke: same mlp-bridge llava code path, tiny dims
        cfg = dataclasses.replace(
            cfg,
            vit=dataclasses.replace(cfg.vit, image_size=32, patch_size=16,
                                    d_model=32, n_layers=2, n_heads=2,
                                    d_ffn=64),
            vit_feature_layer=1, n_img_tokens=4,
            decoder=dataclasses.replace(cfg.decoder, d_model=64, n_heads=2,
                                        d_ffn=128, vocab_size=512,
                                        max_positions=256))
    t0 = time.time()
    params = jax.jit(lambda k: V.init_vllm_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(2))
    # block_until_ready does not sync through the axon tunnel — fetch.
    fetch_scalar(params["decoder"]["embed_tokens"])
    log("llava bench init: %.1fs" % (time.time() - t0))
    vllm = JaxVLLM(cfg, params, ToyTokenizer(vocab_size=cfg.decoder.vocab_size),
                   SyntheticImageProvider(cfg.vit.image_size),
                   bucket_multiple=64, min_len=64, img_cache_size=256,
                   img_batch_pad=2)
    lcfg = LiveEditConfig(edit_model_name=cfg.name,
                          llm_mid_dim=cfg.decoder.d_model,
                          edit_layer_i=max(1, n_layers - 3),
                          max_edits=32, retrieve_top_k=8)
    editor = LiveEdit(vllm, lcfg, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        path = build_cases(2 * n_cases + 2, tmp)
        data = EVQA(path, tmp, encoder=hash_encoder(16))
        import contextlib
        import copy

        def run(lo, hi, name):
            d = copy.copy(data)
            d.cases = data.cases[lo:hi]
            fe = FusedEditorEvaluation(
                editor, d, evaluation_name=name,
                results_dir=os.path.join(tmp, "res"), max_rows=max_rows,
                pad_rows=True, hoist_pre=True)
            with contextlib.redirect_stdout(sys.stderr):
                fe.evaluate_sequential_edit(edit_n=max(1, n_cases // 2))
            return fe

        t0 = time.time()
        run(0, n_cases, "warm")
        log("llava warm: %.1fs" % (time.time() - t0))
        vllm.clear_image_cache()
        editor.restore_to_original_model()
        c0 = dict(vllm.counters)
        t0 = time.time()
        fe = run(n_cases, 2 * n_cases, "timed")
        dt = time.time() - t0

        seq = 64 + cfg.n_img_tokens
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
        _, _, mfu = mfu_accounting(
            vllm, c0, fe.probe_tokens, dt,
            FL.decoder_flops_per_token(cfg.decoder, seq),
            FL.vision_flops_per_image(cfg), peak)
        out = {"shape": "vit24x1024_576tok_dec%dx4096_row%d"
               % (n_layers, seq),
               "cases_per_s": round(n_cases / dt, 3),
               "mfu_total": mfu["mfu_total"]}
        log("llava pipeline:", out)

        def past(label):
            if deadline is not None and time.time() > deadline:
                log("llava %s skipped: past deadline" % label)
                return True
            return False

        # ---- reference-protocol baseline (one probe per forward, one
        # image encode per probe — the torch eval loop's discipline,
        # vllm_editor_eval.py:137-175) on the SAME llava-scale model, so
        # cases_per_s has a measured denominator like the blip2 headline.
        if os.environ.get("BENCH_LLAVA_BASE", "1") == "1" \
                and not past("baseline"):
            from devqa_tpu.core.losses import token_accuracy
            from devqa_tpu.eval.harness import case_probe_specs

            vllm_b = JaxVLLM(cfg, params, vllm.tokenizer,
                             SyntheticImageProvider(cfg.vit.image_size),
                             bucket_multiple=64, min_len=64,
                             img_cache_size=8, img_batch_pad=1)
            ed_b = LiveEdit(vllm_b, lcfg, seed=0)
            metrics = jax.jit(token_accuracy)

            def one_case(case):
                for s in case_probe_specs(case):
                    if s.kind != "locality":
                        continue
                    vllm_b.clear_image_cache()
                    qb = vllm_b.encode_queries([s.prompt], [s.image],
                                               [s.target])
                    a, _ = metrics(vllm_b.logits(qb.embeds, qb.kv_valid),
                                   qb.label_ids, qb.label_masks)
                    fetch_scalar(a)
                ed_b.edit_one_piece(case.requests[0])
                for s in case_probe_specs(case):
                    vllm_b.clear_image_cache()
                    qb = vllm_b.encode_queries([s.prompt], [s.image],
                                               [s.target])
                    a, _ = metrics(ed_b.query_logits(qb), qb.label_ids,
                                   qb.label_masks)
                    fetch_scalar(a)

            base_cases = data.cases[2 * n_cases:2 * n_cases + 2]
            ed_b.restore_to_original_model()
            one_case(base_cases[0])  # compiles the B=1 programs
            base_cps = 0.0
            for r in range(2):
                if past("baseline rep %d" % r):
                    break
                ed_b.restore_to_original_model()
                t0 = time.time()
                for c in base_cases:
                    one_case(c)
                bdt = time.time() - t0
                log("llava reference-protocol[%d]: %.2fs for %d cases"
                    % (r, bdt, len(base_cases)))
                base_cps = max(base_cps, len(base_cases) / bdt)
            if base_cps > 0:
                out["baseline_cases_per_s"] = round(base_cps, 4)
                out["vs_baseline"] = round(out["cases_per_s"] / base_cps, 2)
            del vllm_b, ed_b

    # ---- prefix-cache serve A/B at the geometry where KV-prefix reuse
    # is designed to pay (576 of ~640 prefill tokens are the image; the
    # auto-gate turns the cache ON here, serve/engine.py:94-106). Same
    # engine config, same repeat-image request stream, prefix on vs off.
    if os.environ.get("BENCH_LLAVA_SERVE", "1") == "1" \
            and not past("serve"):
        from devqa_tpu.serve.engine import BatchingEngine

        n_req = int(os.environ.get("BENCH_LLAVA_SERVE_REQS", "12"))
        new_tok = 12

        def drive(prefix_images):
            eng = BatchingEngine(
                vllm, n_slots=4,
                max_len=min(704, cfg.decoder.max_positions - 8),
                steps_per_dispatch=4,
                prefix_cache_images=prefix_images).start()
            try:
                # Warm EVERY (path, width) pair the timed stream will
                # hit: width-1 full + continue (the two generates), then
                # a width-4 FULL wave (misses seed img_s1), then a
                # width-4 CONTINUE wave on now-cached images. Round 5
                # triage: the old warm-up never compiled the width-4
                # continue program, so the first timed wave paid its
                # ~5s compile and the A/B read prefix 8x SLOWER.
                eng.generate("warm the decode path", "img_s0.jpg",
                             max_new_tokens=4)
                eng.generate("warm the continue path", "img_s0.jpg",
                             max_new_tokens=4)
                w = [eng.submit("warm wave %d" % i, "img_s1.jpg", 4)
                     for i in range(4)]
                for r in w:
                    r.done.wait(600)
                w2 = [eng.submit("warm continue wave %d" % i,
                                 "img_s%d.jpg" % (i % 2), 4)
                      for i in range(4)]
                for r in w2:
                    r.done.wait(600)
                tok0 = eng.tokens_generated
                admit0, dec0 = eng.admit_s, eng.decode_s
                t0 = time.time()
                reqs = [eng.submit("describe the scene variant %d" % i,
                                   "img_s%d.jpg" % (i % 2), new_tok)
                        for i in range(n_req)]
                for r in reqs:
                    r.done.wait(600)
                sdt = time.time() - t0
                toks = eng.tokens_generated - tok0
                # Admit time is where the prefix cache pays (decode is
                # identical either way and dispatch-floor-bound at this
                # request scale) — report it so the A/B measures the
                # mechanism, not the decode wash.
                return {"tokens_per_s": round(toks / sdt, 2),
                        "admit_s": round(eng.admit_s - admit0, 3),
                        "decode_s": round(eng.decode_s - dec0, 3),
                        "prefix_hits": eng.prefix_hits,
                        "prefix_misses": eng.prefix_misses}
            finally:
                eng.shutdown()

        on = drive(None)   # auto-gate: ON at 576 vision tokens
        off = drive(0) if not past("serve-off") else None
        serve = {"prefix_on": on}
        if off is not None:
            serve["prefix_off"] = off
            if off["tokens_per_s"] > 0:
                serve["prefix_speedup"] = round(
                    on["tokens_per_s"] / off["tokens_per_s"], 2)
            if on.get("admit_s", 0) > 0:
                serve["prefix_admit_speedup"] = round(
                    off["admit_s"] / on["admit_s"], 2)
        out["serve"] = serve
        log("llava serve:", serve)
    return out


def bench_serve(vllm, n_req=None, new_tokens=24):
    """Continuous-batching serve throughput at blip2-2.7b scale
    (serve/engine.py): concurrent requests share KV-cache decode slots,
    one compiled single-token program, K-step scan per dispatch. Reports
    generated tokens/s and requests/s (model_worker.py:44 serving role),
    PLUS the comparative claim: the same engine driven one-request-at-a-
    time (the reference worker's model-lock serving discipline,
    model_worker.py:44) — ``batching_speedup`` is concurrent tokens/s
    over sequential tokens/s."""
    from devqa_tpu.serve.engine import BatchingEngine

    n_req = n_req or int(os.environ.get("BENCH_SERVE_REQS", "24"))
    n_seq = int(os.environ.get("BENCH_SERVE_SEQ_REQS", "6"))
    # Clamp to the model's position table (tiny smoke configs have
    # max_positions=128; the 2.7b run keeps the pinned 160).
    eng = BatchingEngine(vllm, n_slots=8,
                         max_len=min(160, vllm.cfg.decoder.max_positions - 8),
                         steps_per_dispatch=4).start()
    try:
        # Warm both prefill widths (1 and n_slots) + the decode program.
        # (The vision-prefix cache auto-gates OFF at BLIP-2 scale — 32
        # vision tokens, engine.py:94-106 — so there is no continue path
        # to warm here; the llava phase's serve A/B exercises it at the
        # 576-token geometry where it pays.)
        eng.generate("warm the decode path of scene 0", "img_w0.jpg",
                     max_new_tokens=4)
        eng.generate("warm the decode path again", "img_w0.jpg",
                     max_new_tokens=4)
        w = [eng.submit("warm %d" % i, "img_w1.jpg", 4) for i in range(8)]
        for r in w:
            r.done.wait(600)
        tok0 = eng.tokens_generated
        t0 = time.time()
        reqs = [eng.submit("what is in the scene number %d" % i,
                           "img_s%d.jpg" % (i % 4), new_tokens)
                for i in range(n_req)]
        for r in reqs:
            r.done.wait(600)
        dt = time.time() - t0
        toks = eng.tokens_generated - tok0
        # Sequential baseline: same engine, same prompts/images/token
        # budget, but each request waits for the previous one — the
        # decode batch is 1 wide, so per-token cost is not amortized.
        tok0 = eng.tokens_generated
        t0 = time.time()
        for i in range(n_seq):
            eng.generate("what is in the scene number %d" % i,
                         "img_s%d.jpg" % (i % 4), new_tokens)
        seq_dt = time.time() - t0
        seq_toks = eng.tokens_generated - tok0
        seq_tps = round(seq_toks / seq_dt, 2)
        out = {"requests_per_s": round(n_req / dt, 3),
               "tokens_per_s": round(toks / dt, 2),
               "concurrent_slots": 8, "tokens_generated": toks,
               "sequential_tokens_per_s": seq_tps,
               "batching_speedup": round(toks / dt / max(seq_tps, 1e-9), 2)}
        # prefix_hits/misses are constant 0 here (cache auto-gated off at
        # 32 vision tokens) — reported by the llava serve A/B instead.
        log("serve bench:", out)
        log("serve triage: decode %d dispatches %.2fs (%.0fms each), "
            "admit %d waves %.2fs (%.0fms each: encode %.2fs, prefill "
            "%.2fs, scatter %.2fs)"
            % (eng.decode_dispatches, eng.decode_s,
               1e3 * eng.decode_s / max(eng.decode_dispatches, 1),
               eng.admit_waves, eng.admit_s,
               1e3 * eng.admit_s / max(eng.admit_waves, 1),
               eng.admit_encode_s, eng.admit_prefill_s,
               eng.admit_scatter_s))
        return out
    finally:
        eng.shutdown()


def jit_cache_sizes(*objs):
    """name → compiled-program cache size for every instance-held jit of
    the given objects plus the harness module's fused metric jits."""
    import devqa_tpu.eval.harness as H

    out, seen = {}, set()
    for o in list(objs) + [H]:
        for k, v in vars(o).items():
            if hasattr(v, "_cache_size") and id(v) not in seen:
                seen.add(id(v))
                try:
                    out["%s.%s" % (type(o).__name__, k)] = v._cache_size()
                except Exception:
                    pass
    return out


def total_jit_cache_size(*objs):
    """Sum of compiled-program cache sizes across every instance-held jit
    of the given objects plus the harness module's fused metric jits.
    A delta of 0 across a phase proves the phase compiled NOTHING new
    (the O(1)-shape claim made precise)."""
    return sum(jit_cache_sizes(*objs).values())


def bench_sequential_1000(vllm, editor, tmp, max_rows,
                          dec_ftok, vis_fimg, peak,
                          pre_rows=None, post_rows=None):
    """BASELINE.md's north-star workload: 1000 sequential edits
    accumulated in ONE split (the reference's ``-sen 1000`` protocol,
    vllm_editor_eval.py:69-135 — pre-edit snapshots for all cases, 1000
    edits applied, all 12-probe measurements under the accumulated
    pool), measured fused. Reuses the resident 2.7b model and the SAME
    compiled programs as the headline phase (same bucket, same row
    chunks, width-10 edit batches, the yaml's 1024-expert pool), so the
    phase cost is pure runtime; ``new_compiled_shapes`` (cache-size
    delta) == 0 proves routing over ~1000 live experts stays
    O(1)-shape."""
    import contextlib
    import copy

    from devqa_tpu.data.schema import EVQA
    from devqa_tpu.eval.harness import FusedEditorEvaluation
    from devqa_tpu.retrieval.store import hash_encoder

    n_cases = int(os.environ.get("BENCH_SEQ1000_CASES", "1000"))
    assert n_cases <= int(editor.state["eqr"].shape[0]), \
        "pool capacity below the sequential-edit count"
    sub = os.path.join(tmp, "seq1000")
    os.makedirs(sub, exist_ok=True)
    path = build_cases(n_cases, sub)
    data = EVQA(path, sub, encoder=hash_encoder(16))
    vllm.clear_image_cache()
    editor.restore_to_original_model()
    fe = FusedEditorEvaluation(
        editor, data, evaluation_name="seq1000",
        results_dir=os.path.join(sub, "res"), max_rows=max_rows,
        pad_rows=True, hoist_pre=True, edit_chunk=10,
        pre_rows=pre_rows, post_rows=post_rows)
    # Warm split: the harness just raised the run-level gathered-head
    # width to THIS dataset's max supervised span, so the probe programs
    # may differ from the headline phase's — compile them on 10 cases
    # BEFORE the timed region (new_compiled_shapes must measure routing
    # shapes, not first-use compiles).
    warm = copy.copy(data)
    warm.cases = data.data[:10]
    fw = FusedEditorEvaluation(
        editor, warm, evaluation_name="seq1000_warm",
        results_dir=os.path.join(sub, "res"), max_rows=max_rows,
        pad_rows=True, hoist_pre=True, edit_chunk=10,
        pre_rows=pre_rows, post_rows=post_rows)
    with contextlib.redirect_stdout(sys.stderr):
        fw.evaluate_sequential_edit(edit_n=10)
    vllm.clear_image_cache()
    editor.restore_to_original_model()
    sizes0 = jit_cache_sizes(vllm, editor)
    shapes0 = sum(sizes0.values())
    c0 = dict(vllm.counters)
    t0 = time.time()
    with contextlib.redirect_stdout(sys.stderr):
        fe.evaluate_sequential_edit(edit_n=n_cases)
    dt = time.time() - t0
    sizes1 = jit_cache_sizes(vllm, editor)
    grew = {k: v - sizes0.get(k, 0) for k, v in sizes1.items()
            if v != sizes0.get(k, 0)}
    if grew:
        log("seq1000 fresh-compile sources:", grew)
    dec_tokens, n_imgs, mfu = mfu_accounting(
        vllm, c0, fe.probe_tokens, dt, dec_ftok, vis_fimg, peak)
    out = {
        "cases": n_cases,
        "wall_s": round(dt, 1),
        "cases_per_s": round(n_cases / dt, 3),
        "new_compiled_shapes": total_jit_cache_size(vllm, editor) - shapes0,
        "pool_capacity": int(editor.state["eqr"].shape[0]),
        "live_edits_at_measure": n_cases,
        "decoder_tokens": int(dec_tokens),
        "images_encoded": int(n_imgs),
        "mfu_total": mfu["mfu_total"],
    }
    log("sequential_1000:", out)
    return out


def bench_sequential_secondary(vllm, tmp, deadline=None):
    """Sequential-edit generality BEYOND LiveEdit (VERDICT r4 item 7):
    the 1000-edit headline only ever exercises LiveEdit, leaving the
    'editors hold fixed-capacity ring-buffer state; sequential editing is
    jit-stable' claim CPU-test-only for the other editors. This phase
    runs T-Patcher (editors/tp_vl.py — ring-buffer neuron pool, fori_loop
    inner training, reference tp_vl.py:125-148) for 200 sequential edits
    on the resident model with a fixed probe chunk re-measured every 50
    edits, and proves shape stability the same way seq1000 does:
    ``new_compiled_shapes`` (instance-jit cache delta across the timed
    region) == 0."""
    from devqa_tpu.core.losses import token_accuracy
    from devqa_tpu.editors.tp_vl import TPvl, TPvlConfig
    from devqa_tpu.eval.harness import case_probe_specs
    import jax

    from devqa_tpu.data.schema import EVQA
    from devqa_tpu.retrieval.store import hash_encoder

    cfg = vllm.cfg
    n = int(os.environ.get("BENCH_SEQ2_CASES", "200"))
    steps = int(os.environ.get("BENCH_SEQ2_STEPS", "25"))
    editor_name = os.environ.get("BENCH_SEQ2_EDITOR", "tp_vl")
    if editor_name == "lemoe":
        # Expert-per-20 ring (editors/lemoe_vl.py): 200 edits train 10
        # experts; shape-stable because every expert trains on exactly
        # lora_edit_batch_size rows.
        from devqa_tpu.editors.lemoe_vl import LEMoEvl, LEMoEvlConfig

        ebs = 2 if bench_tiny() else 20
        editor = LEMoEvl(vllm, LEMoEvlConfig(
            edit_model_name=cfg.name,
            edit_layer=min(30, cfg.decoder.n_layers - 2),
            llm_hidden_dim1=cfg.decoder.d_model,
            llm_hidden_dim2=cfg.decoder.d_ffn,
            lora_edit_batch_size=ebs,
            max_steps=steps, max_experts=max(16, -(-n // ebs))))
    else:
        editor = TPvl(vllm, TPvlConfig(
            edit_model_name=cfg.name,
            edit_layer=min(31, cfg.decoder.n_layers - 1),
            num_steps=steps, max_edits=max(256, n)))
    sub = os.path.join(tmp, "seq2")
    os.makedirs(sub, exist_ok=True)
    path = build_cases(n, sub)
    data = EVQA(path, sub, encoder=hash_encoder(16))
    cases = data.data
    vllm.ensure_image_cache_capacity(4 * n + 16)
    metrics = jax.jit(token_accuracy)

    # Fixed-shape probe chunk (first case's first 8 specs): re-measured
    # as the pool fills, so the query program must stay one compiled
    # shape from edit 0 to edit 200.
    specs = [s for c in cases[:2] for s in case_probe_specs(c)][:8]
    qb = vllm.encode_queries([s.prompt for s in specs],
                             [s.image for s in specs],
                             [s.target for s in specs])

    def probe():
        a, _ = metrics(editor.query_logits(qb), qb.label_ids, qb.label_masks)
        return fetch_scalar(a)

    # Warm every program OUTSIDE the timed region (edit + probe). LEMoE
    # only trains an expert once its 20-edit buffer fills — warm through
    # one full buffer so _train_expert_jit compiles before timing.
    warm_n = editor.cfg.lora_edit_batch_size \
        if editor_name == "lemoe" else 2
    for c in cases[:warm_n]:
        editor.edit_one_piece(c.requests[0])
    probe()
    editor.restore_to_original_model()
    sizes0 = jit_cache_sizes(vllm, editor)
    shapes0 = sum(sizes0.values())
    t0 = time.time()
    done = 0
    for i, c in enumerate(cases):
        editor.edit_one_piece(c.requests[0])
        done = i + 1
        if done % 50 == 0:
            probe()
        if deadline is not None and time.time() > deadline:
            log("seq_secondary: deadline hit after %d edits" % done)
            break
    probe()
    dt = time.time() - t0
    grew = {k: v - sizes0.get(k, 0)
            for k, v in jit_cache_sizes(vllm, editor).items()
            if v != sizes0.get(k, 0)}
    if grew:
        log("seq_secondary fresh-compile sources:", grew)
    out = {
        "editor": editor_name,
        "edits": done,
        "edits_per_s": round(done / dt, 3),
        "inner_steps_per_edit": steps,
        "new_compiled_shapes": total_jit_cache_size(vllm, editor) - shapes0,
        "pool_live": int(editor.state["count"]),
    }
    log("sequential_secondary:", out)
    return out


def bench_continuity(cfg, params, reps=3):
    """FROZEN cross-round protocol line (VERDICT r3 item 9): synthetic
    records, 32-token bucket, 20 cases fused in splits of 10, best-of-3,
    90/120-row pre/post chunks — the r02 headline workload re-emitted
    every round under pinned parameters. The headline metric's protocol
    may keep evolving (real data, MFU accounting, chunk tuning); THIS
    number's definition must never move again, so a regression can't
    hide behind a protocol change. r02 recorded 11.41 cases/s on the
    then-current harness; r04 freezes the workload exactly as below."""
    import contextlib
    import copy

    import jax

    from devqa_tpu.core.tokenizer import ToyTokenizer
    from devqa_tpu.core.wrapper import JaxVLLM
    from devqa_tpu.data.images import SyntheticImageProvider
    from devqa_tpu.data.schema import EVQA
    from devqa_tpu.editors.liveedit import LiveEdit, LiveEditConfig
    from devqa_tpu.eval.harness import FusedEditorEvaluation

    from devqa_tpu.retrieval.store import hash_encoder

    # Pinned: every constant below is part of the protocol definition.
    # (BENCH_CONTINUITY_REPS exists ONLY for the CPU smoke test; the
    # driver run never sets it, so the protocol stays best-of-3.)
    reps = int(os.environ.get("BENCH_CONTINUITY_REPS", str(reps)))
    N_CASES, SPLIT, BUCKET = 20, 10, 32
    PRE_ROWS, POST_ROWS, MAX_ROWS, IMG_PAD = 90, 120, 60, 8

    vllm = JaxVLLM(cfg, params, ToyTokenizer(vocab_size=cfg.decoder.vocab_size),
                   SyntheticImageProvider(cfg.vit.image_size),
                   bucket_multiple=BUCKET, min_len=BUCKET,
                   img_cache_size=512, img_batch_pad=IMG_PAD)
    lcfg = LiveEditConfig(edit_model_name=cfg.name,
                          llm_mid_dim=cfg.decoder.d_model,
                          edit_layer_i=min(21, cfg.decoder.n_layers - 2),
                          max_edits=1024, retrieve_top_k=8)
    editor = LiveEdit(vllm, lcfg, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        path = build_cases(SPLIT + N_CASES, tmp, synthetic=True)
        data = EVQA(path, tmp, encoder=hash_encoder(16))

        def run(lo, hi, name):
            d = copy.copy(data)
            d.cases = data.cases[lo:hi]
            fe = FusedEditorEvaluation(
                editor, d, evaluation_name=name,
                results_dir=os.path.join(tmp, "res"), max_rows=MAX_ROWS,
                pad_rows=True, hoist_pre=True,
                pre_rows=PRE_ROWS, post_rows=POST_ROWS)
            with contextlib.redirect_stdout(sys.stderr):
                fe.evaluate_sequential_edit(edit_n=SPLIT)

        editor.restore_to_original_model()
        t0 = time.time()
        run(0, SPLIT, "warm")
        log("continuity warm: %.1fs" % (time.time() - t0))
        jax.effects_barrier()
        best = 0.0
        for r in range(reps):
            vllm.clear_image_cache()
            editor.restore_to_original_model()
            t0 = time.time()
            run(SPLIT, SPLIT + N_CASES, "timed")
            dt = time.time() - t0
            log("continuity[%d]: %.2fs → %.3f cases/s"
                % (r, dt, N_CASES / dt))
            best = max(best, N_CASES / dt)
    out = {"cases_per_s": round(best, 3),
           "protocol": "synthetic20_bucket32_split10_rows90-120_bo3"}
    # Cross-round anchor (VERDICT r4 item 6): r04 recorded 6.796 cases/s
    # under this exact protocol — the ratio is the first tunnel-weather-
    # independent cross-round comparison this line exists to provide.
    if not bench_tiny():
        out["vs_r04"] = round(best / 6.796, 3)
    log("continuity:", out)
    return out


def bench_train_step(vllm, n_steps=6):
    """Jitted LiveEdit meta-training steps/s at blip2-2.7b scale, one
    compiled shape across steps (verified via the jit cache size)."""
    import jax

    from devqa_tpu.data.schema import EVQA
    from devqa_tpu.editors.liveedit import LiveEditConfig, LiveEditTrainable
    from devqa_tpu.retrieval.store import hash_encoder

    cfg = vllm.cfg
    lcfg = LiveEditConfig(edit_model_name=cfg.name,
                          llm_mid_dim=cfg.decoder.d_model,
                          edit_layer_i=min(21, cfg.decoder.n_layers - 2),
                          max_edits=32)
    editor = LiveEditTrainable(vllm, lcfg, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        path = build_cases(8, tmp)
        data = EVQA(path, tmp, encoder=hash_encoder(16))
        batch = editor.organize_batch_data(data.data[:4])
    B, G, K = batch.pop("B"), batch.pop("G"), batch.pop("K")
    t0 = time.time()
    editor.params, editor._opt_state, loss, _ = editor._train_step_jit(
        editor.params, editor._opt_state, vllm.params, batch, B, G, K)
    fetch_scalar(loss)
    compile_s = time.time() - t0
    log("train step compile+1st: %.1fs" % compile_s)
    t0 = time.time()
    for _ in range(n_steps):
        editor.params, editor._opt_state, loss, _ = editor._train_step_jit(
            editor.params, editor._opt_state, vllm.params, batch, B, G, K)
    fetch_scalar(loss)
    dt = time.time() - t0
    try:  # the jit cache size proves ONE compiled shape across all steps
        # (instance-held jit — editors/base.instance_jit binding)
        cache_size = editor._train_step_jit._cache_size()
    except Exception:
        cache_size = -1
    out = {"liveedit_steps_per_s": round(n_steps / dt, 3),
           "batch_requests": 4,
           "compiled_shapes": cache_size,
           "compile_s": round(compile_s, 1)}
    log("train bench:", out, "(cache=%d -> O(1) shapes)" % cache_size)
    assert cache_size in (1, -1), \
        "train step recompiled inside the timed region"
    return out


def main():
    t_start = time.time()
    # Soft wall-clock budget: remote-compile latency varies wildly
    # run-to-run (30s-8min per program on bad days); once past the
    # budget, later best-of-N repeats and optional phases are dropped so
    # the driver always gets its JSON line instead of a timeout.
    soft_budget = float(os.environ.get("BENCH_SOFT_BUDGET_S", "420"))
    if not _await_tpu():
        # Outage window: emit a well-formed line so the run is recorded
        # as an infrastructure failure, not a silent driver timeout.
        print(json.dumps({
            "metric": "blip2_2.7b_sequential_edit_pipeline_throughput",
            "value": 0.0, "unit": "cases/sec", "vs_baseline": 0.0,
            "error": "tpu_backend_unavailable_after_deadline"}))
        return
    # Budgets start AFTER the tunnel answers: probe wait is tunnel
    # weather, not bench work — a 270s probe hang must not starve the
    # serve/seq1000/llava phases (observed exactly that in r03 checks).
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    # No persistent cache in tiny/CPU smoke mode: XLA's CPU AOT loader
    # warns about machine-feature mismatches on reload (tests/conftest.py
    # keeps CPU runs cache-free for the same reason).
    if not bench_tiny():
        _enable_compile_cache(jax)

    from devqa_tpu.core import vllm as V
    from devqa_tpu.core.tokenizer import ToyTokenizer
    from devqa_tpu.core.wrapper import JaxVLLM
    from devqa_tpu.data.images import SyntheticImageProvider
    from devqa_tpu.data.schema import EVQA
    from devqa_tpu.editors.liveedit import LiveEdit, LiveEditConfig
    from devqa_tpu.eval.harness import (FusedEditorEvaluation,
                                        case_probe_specs)
    from devqa_tpu.retrieval.store import hash_encoder
    from devqa_tpu.utils import flops as FL

    log("devices:", jax.devices())
    cfg = V.tiny_vllm_config("opt") if bench_tiny() \
        else V.blip2_opt_2_7b_config()
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
    # Per-pass exact-fit chunks: the hoisted pre (locality) pass emits
    # 9 rows/case and the post pass 12 rows/case on the EVQA grid, so
    # 90/120 divide every split with ZERO padding while keeping the
    # larger-chunk efficiency (swept on v5e: 120-row chunks run ~10%
    # more rows/s than 60-row, but a padded tail eats the gain — exact
    # fits keep it).
    pre_rows = int(os.environ.get("BENCH_PRE_ROWS", "90"))
    post_rows = int(os.environ.get("BENCH_POST_ROWS", "120"))
    # A/B'd at the 90/120-row chunk geometry: 8 > 4 (9.74 vs 9.34
    # cases/s best-of-3 — bigger probe chunks batch more cache misses
    # per encode call, so the wider vision batch now amortizes its
    # dispatch). The old 4 > 8 > 16 result was measured at 60-row chunks.
    img_pad = int(os.environ.get("BENCH_IMG_PAD", "8"))
    # Real prompts tokenize longer than the synthetic ones; widen the
    # bucket so the whole run still compiles O(1) programs.
    bucket = 64 if use_real_data() else 32
    # Cache must cover EVERY unique image of the run (~6/case incl. warm
    # + reference-protocol cases): the hoisted pre-pass encodes all
    # splits' images up front, so an undersized LRU thrashes and the post
    # passes silently re-encode (measured: vision is ~2/3 of probe-pass
    # time when cold).
    n_all_cases = n_timed_cases + 10 + 8
    vllm = JaxVLLM(cfg, params, tok, provider, bucket_multiple=bucket,
                   min_len=bucket, img_cache_size=max(256, n_all_cases * 8),
                   img_batch_pad=img_pad)
    lcfg = LiveEditConfig(edit_model_name=cfg.name, llm_mid_dim=cfg.decoder.d_model,
                          edit_layer_i=min(21, cfg.decoder.n_layers - 2),
                          # 1024 = the shipped config's pool capacity
                          # (configs/liveedit/blip2-opt-2.7b.yaml) — and
                          # it lets the sequential_1000 phase reuse every
                          # compiled program of the headline phase.
                          max_edits=max(1024, n_timed_cases + 8),
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

        # ---- fused split pipeline (public API). Per-pass exact-fit
        # chunks (pre 90 / post 120 rows) divide the 9-per-case locality
        # pass and the 12-per-case post pass with zero padding waste,
        # and big rows keep the MXU busy (measured: 60 beats 30 by ~1.5x
        # end to end; 120 adds ~10%/row over 60 when it fits exactly) ----
        import copy

        def sliced(lo, hi):
            d = copy.copy(data)
            d.cases = cases[lo:hi]
            return d

        import contextlib

        # BENCH_EDIT_N=1000 accumulates every edit before measuring (the
        # reference's -sen 1000 full protocol); default: splits of 10.
        edit_n = int(os.environ.get("BENCH_EDIT_N", str(SPLIT)))

        fe_box = {}

        def run_fused(eval_data, name, edit_n_):
            fe = FusedEditorEvaluation(
                editor, eval_data, evaluation_name=name,
                results_dir=os.path.join(tmp, "res"),
                max_rows=max_rows, pad_rows=True, hoist_pre=True,
                pre_rows=pre_rows, post_rows=post_rows)
            fe_box["fe"] = fe
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
        fused_cps, mfu = 0.0, {}
        # FLOP model for the MFU accounting of the timed region.
        seq_full = bucket + cfg.n_img_tokens
        dec_ftok = FL.decoder_flops_per_token(cfg.decoder, seq_full)
        vis_fimg = FL.vision_flops_per_image(cfg)
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
        for r in range(reps):
            if r > 0 and time.time() - t_start > soft_budget:
                log("soft budget hit — skipping fused repeat %d" % r)
                break
            vllm.clear_image_cache()
            editor.restore_to_original_model()
            c0 = dict(vllm.counters)
            t0 = time.time()
            run_fused(sliced(SPLIT * n_warm_splits,
                             SPLIT * n_warm_splits + n_timed), "timed", edit_n)
            dt = time.time() - t0
            dec_tokens, n_imgs, mfu_r = mfu_accounting(
                vllm, c0, fe_box["fe"].probe_tokens, dt,
                dec_ftok, vis_fimg, peak)
            log("fused[%d]: %.2fs for %d cases → %.3f cases/s "
                "(%d dec tokens, %d imgs)" %
                (r, dt, n_timed, n_timed / dt, dec_tokens, n_imgs))
            log("  phases: %s" % {
                k: round(v, 3)
                for k, v in getattr(fe_box["fe"], "phase_times",
                                    {}).items()})
            if n_timed / dt > fused_cps:
                fused_cps = n_timed / dt
                mfu = mfu_r
        log("fused best-of-%d: %.3f cases/s  mfu=%s" % (reps, fused_cps, mfu))

        # ---- reference-protocol path (batch-1 probes, no vision cache,
        # no image-batch padding — the torch loop encodes one image at a
        # time) ----
        from devqa_tpu.core.losses import token_accuracy

        vllm_base = JaxVLLM(cfg, params, tok, provider, bucket_multiple=bucket,
                            min_len=bucket, img_cache_size=256, img_batch_pad=1)
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

        # ---- optional phases (budget-gated; force/skip via env) ----
        # Phases run on their own cap, NOT the main soft budget: warm-up
        # compiles routinely eat the 420s budget on slow-tunnel days, and
        # the phases are the only driver-visible flash/train/serve/
        # seq1000 numbers. With the persistent compile cache warm the
        # FULL bench (every phase) measures ~4-8 min end to end; the cap
        # only bites on cold-cache/bad-tunnel days, dropping phases in
        # reverse priority order.
        # 1500s: a heavy-tailed-compile day was observed eating the whole
        # 1200s cap in the headline phase alone, silently dropping the
        # llava phase (prefix-cache A/B + llava vs_baseline — per-round
        # driver-visible evidence). Each phase still bounds itself via
        # its deadline args, and the bench always prints its JSON line.
        phase_cap = float(os.environ.get("BENCH_PHASE_CAP_S", "1500"))
        phase_s = {}

        def phase_on(name, need_s):
            v = os.environ.get(name)
            if v is not None:
                return v == "1"
            remaining = phase_cap - (time.time() - t_start)
            if remaining <= need_s:
                log("%s skipped: %.0fs phase-cap left < %ds needed"
                    % (name, remaining, need_s))
                return False
            return True

        def run_phase(name, need_s, fn):
            if not phase_on(name, need_s):
                return {}
            t0 = time.time()
            try:
                res = fn()  # never lose the main metric to a phase
            except Exception as e:
                log("%s failed:" % name, repr(e))
                res = {"error": str(e)[:200]}
            phase_s[name] = round(time.time() - t0, 1)
            return res

        # Priority order under the cap; {serve, seq1000, train} need the
        # resident 2.7b model, {flash, llava} need it FREED (HBM).
        serve_res = run_phase("BENCH_SERVE", 150, lambda: bench_serve(vllm))
        seq1000_res = run_phase(
            "BENCH_SEQ1000", 250,
            lambda: bench_sequential_1000(vllm, editor, tmp,
                                          max_rows, dec_ftok, vis_fimg,
                                          peak, pre_rows=pre_rows,
                                          post_rows=post_rows))
        train_res = run_phase("BENCH_TRAIN", 120,
                              lambda: bench_train_step(vllm))
        # Second editor's sequential line (VERDICT r4 item 7): TP_VL on
        # the resident model — needs it, so before the free below.
        seq2_res = run_phase(
            "BENCH_SEQ2", 150,
            lambda: bench_sequential_secondary(
                vllm, tmp, deadline=t_start + phase_cap))
        # FROZEN cross-round continuity line (VERDICT r3 item 9): shares
        # the resident 2.7b params, so it must run before the free below.
        continuity_res = run_phase(
            "BENCH_CONTINUITY", 150,
            lambda: bench_continuity(vllm.cfg, vllm.params))
        # The train phase is the last user of the 2.7b model: free its
        # ~8GB of bf16 weights BEFORE the flash/llava phases init their
        # own 4096-wide models, or the llava phase RESOURCE_EXHAUSTs
        # next to the resident weights (observed on v5e: 8GB blip2 +
        # 3.6GB llava + 640-token-row logits > 16GB HBM).
        import gc

        del vllm, editor, vllm_base, editor_base, params, metrics
        fe_box.clear()
        gc.collect()
        # Executables pin on-device program text + scratch through the
        # jit caches; drop them too (the persistent compile cache makes
        # the later phases' re-traces cheap).
        jax.clear_caches()
        gc.collect()
        try:
            la = jax.live_arrays()
            tot = sum(a.nbytes for a in la)
            log("residual device arrays after free: %d arrays, %.2f GB"
                % (len(la), tot / 2**30))
            for a in sorted(la, key=lambda a: -a.nbytes)[:8]:
                log("  residual: %s %s %.1f MB"
                    % (a.shape, a.dtype, a.nbytes / 2**20))
        except Exception as e:
            log("live_arrays unavailable:", repr(e))
        # need_s 160: with the persistent compile cache warm the phase
        # runs in ~100-150s; 240 was observed skipping it on a day when
        # earlier phases overran (the phase also self-bounds on
        # ``deadline``, so a slight overrun cannot hang the bench).
        llava_res = run_phase(
            "BENCH_LLAVA", 160,
            lambda: bench_llava_pipeline(deadline=t_start + phase_cap))
        # Free the llava phase's 4096-wide model + jit executables before
        # the flash phase: its L=4096 XLA-attention op microbench
        # materializes ~4GB of O(L^2) f32 scores next to ANOTHER 8-layer
        # vicuna init, and the two models together RESOURCE_EXHAUST the
        # chip (observed: op microbench OOM'd while the llava weights
        # were still cache-pinned).
        gc.collect()
        jax.clear_caches()
        gc.collect()
        flash_res = run_phase(
            "BENCH_FLASH", 120,
            lambda: bench_flash_regime(deadline=t_start + phase_cap))

    value = fused_cps
    vs = fused_cps / base_cps if base_cps > 0 else 0.0
    out = {
        "metric": "blip2_2.7b_sequential_edit_pipeline_throughput",
        "value": round(value, 4),
        "unit": "cases/sec",
        "vs_baseline": round(vs, 3),
    }
    if mfu:
        out["mfu"] = mfu
    if seq1000_res:
        out["sequential_1000"] = seq1000_res
    if seq2_res:
        out["sequential_secondary"] = seq2_res
    if continuity_res:
        out["continuity"] = continuity_res
    if flash_res:
        out["flash"] = flash_res
    if llava_res:
        out["llava_pipeline"] = llava_res
    if train_res:
        out["train"] = train_res
    if serve_res:
        out["serve"] = serve_res
    out["real_data"] = use_real_data()
    if phase_s:
        out["phase_s"] = phase_s
    print(json.dumps(out))


if __name__ == "__main__":
    main()

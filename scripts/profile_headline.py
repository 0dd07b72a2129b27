"""Op-level decomposition of the headline fused-eval hot path (ROUND4).

The bench's MFU accounting (bench.py:mfu_accounting) says the decoder
sustains ~0.56 of bf16 peak on the 120-row x 96-token probe chunks; this
script measures WHERE the rest goes, on the real TPU, by timing each
device program of the pipeline separately at the exact headline geometry
(blip2-opt-2.7b, 64-token bucket + 32 vision tokens):

  1. editor.query_logits            — the actual post-pass hot program
  2. vllm.logits                    — bare decoder fwd + lm head
  3. decoder_forward (no lm head)   — layers only
  4. matmul speed-of-light          — the same per-layer matmul sequence
                                      (q/k/v/o + fc1/fc2 + lm head) with
                                      no attention/norms: the XLA ceiling
                                      for these shapes
  5. XLA attention op               — [120, 32, 96, 80] alone
  6. edit_batch (width 10)          — the edit program
  7. metrics jit                    — argmax+acc over [120, 96, V] logits
  8. host build_query_batch         — tokenize+assemble w/ warm vision

Every timing fetches a scalar (CLAUDE.md: block_until_ready does not
synchronize through the axon tunnel). Optionally captures a
jax.profiler xplane trace (PROFILE_TRACE=1) for op-level inspection.

Run:  python scripts/profile_headline.py        (one TPU process only)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def timed(fn, *args, reps=3, iters=4, warm=1):
    """Best-of-reps mean seconds per call; fn must return a device array."""
    for _ in range(warm):
        out = fn(*args)
    fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache (same as bench.py)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from devqa_tpu.core import decoder as dec
    from devqa_tpu.core import vllm as V
    from devqa_tpu.core.tokenizer import ToyTokenizer
    from devqa_tpu.core.wrapper import JaxVLLM
    from devqa_tpu.data.images import SyntheticImageProvider
    from devqa_tpu.editors.liveedit import LiveEdit, LiveEditConfig
    from devqa_tpu.ops.attention import xla_attention
    from devqa_tpu.ops.layers import linear
    from devqa_tpu.utils import flops as FL

    log("devices:", jax.devices())
    cfg = V.blip2_opt_2_7b_config()
    dcfg = cfg.decoder
    t0 = time.time()
    params = jax.jit(lambda k: V.init_vllm_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params["decoder"]["embed_tokens"])
    log("init params: %.1fs" % (time.time() - t0))

    tok = ToyTokenizer(vocab_size=dcfg.vocab_size)
    provider = SyntheticImageProvider(cfg.vit.image_size)
    bucket = 64
    vllm = JaxVLLM(cfg, params, tok, provider, bucket_multiple=bucket,
                   min_len=bucket, img_cache_size=512, img_batch_pad=8)
    lcfg = LiveEditConfig(edit_model_name=cfg.name,
                          llm_mid_dim=dcfg.d_model, edit_layer_i=21,
                          max_edits=1024, retrieve_top_k=8)
    editor = LiveEdit(vllm, lcfg, seed=0)

    # ---- the headline post-chunk geometry: 120 rows, 64+32=96 tokens ----
    ROWS = int(os.environ.get("PROFILE_ROWS", "120"))
    rng = np.random.default_rng(0)
    words = ["cat", "dog", "sky", "tree", "car", "red", "blue", "bird"]
    ph = lambda: str(rng.choice(words))
    prompts = ["what is the %s near the %s in scene %d"
               % (ph(), ph(), i) for i in range(ROWS)]
    images = ["img_%d.jpg" % (i % 58) for i in range(ROWS)]
    targets = [ph() for _ in range(ROWS)]
    vllm.warm_image_cache(images)

    t0 = time.time()
    qb = editor.build_query_batch(prompts, images, targets)
    fetch(qb.embeds)
    log("first build_query_batch (incl assemble compile): %.1fs"
        % (time.time() - t0))
    B, L, d = qb.embeds.shape
    log("probe chunk geometry: B=%d L=%d d=%d" % (B, L, d))

    # seed pool with some edits so routing is realistic (non-empty pool)
    editor.edit_batch([{"prompt": prompts[i], "image": images[i],
                        "target_new": targets[i]} for i in range(10)],
                      pad_width=10)

    results = {}
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
    dec_ftok = FL.decoder_flops_per_token(dcfg, L)
    chunk_flops = B * L * dec_ftok

    def report(name, secs, flops=None):
        e = {"ms": round(secs * 1e3, 2)}
        if flops:
            e["tflops_per_s"] = round(flops / secs / 1e12, 1)
            e["mfu_vs_197"] = round(flops / secs / peak, 3)
        results[name] = e
        log("%-28s %8.2f ms %s" % (name, secs * 1e3,
            ("  %.1f TF/s  mfu=%.3f" % (e.get("tflops_per_s", 0),
             e.get("mfu_vs_197", 0))) if flops else ""))

    if os.environ.get("PROFILE_SKIP_OPS") == "1":
        # fast path for iterating on items 8-9: warm the two hot
        # programs once, skip the op-level timing sections
        fetch(editor.query_logits(qb))
        reqs0 = [{"prompt": prompts[i], "image": images[i],
                  "target_new": targets[i]} for i in range(10)]
        editor.edit_batch(reqs0, pad_width=10)
        _skip = True
    else:
        _skip = False

    # 1. the actual hot program
    if not _skip:
        report("editor.query_logits",
               timed(lambda: editor.query_logits(qb)), chunk_flops)

    if not _skip:
        # 2. bare decoder + lm head
        report("vllm.logits",
               timed(lambda: vllm.logits(qb.embeds, qb.kv_valid)), chunk_flops)

        # 3. decoder layers only (no lm head)
        fwd_only = jax.jit(lambda p, e, k: dec.decoder_forward(
            p["decoder"], dcfg, e, k))
        flops_nohead = B * L * FL.decoder_flops_per_token(dcfg, L,
                                                          with_lm_head=False)
        report("decoder_forward (no head)",
               timed(lambda: fwd_only(params, qb.embeds, qb.kv_valid)),
               flops_nohead)

        # 3b. lm head alone (final norm + vocab projection)
        head = jax.jit(lambda p, h: dec.decoder_logits(p["decoder"], dcfg, h))
        hid = fwd_only(params, qb.embeds, qb.kv_valid)
        report("lm head (norm+proj)",
               timed(lambda: head(params, hid)),
               B * L * 2 * dcfg.d_model * dcfg.vocab_size)

        # 4. matmul speed-of-light: same matmul sequence, no attention/norms.
        def sol(p, x):
            def body(h, lp):
                q = linear(h, lp["q"]["w"], lp["q"].get("b"))
                k = linear(h, lp["k"]["w"], lp["k"].get("b"))
                v = linear(h, lp["v"]["w"], lp["v"].get("b"))
                o = linear(q + k + v, lp["o"]["w"], lp["o"].get("b"))
                m = linear(jax.nn.relu(linear(o, lp["fc1"]["w"], lp["fc1"]["b"])),
                           lp["fc2"]["w"], lp["fc2"]["b"])
                return h + m, None

            h, _ = jax.lax.scan(body, x, p["decoder"]["layers"])
            return jnp.dot(h, p["decoder"]["embed_tokens"].T,
                           preferred_element_type=jnp.float32)

        sol_jit = jax.jit(sol)
        sol_flops = B * L * (dcfg.n_layers * (8 * dcfg.d_model ** 2
                                              + 4 * dcfg.d_model * dcfg.d_ffn)
                             + 2 * dcfg.d_model * dcfg.vocab_size)
        report("matmul speed-of-light",
               timed(lambda: sol_jit(params, qb.embeds)), sol_flops)

        # 5. XLA attention op alone at the probe geometry
        H, dh = dcfg.n_heads, dcfg.d_model // dcfg.n_heads
        q = jnp.asarray(rng.normal(size=(B, H, L, dh)), jnp.bfloat16)
        kv = jnp.ones((B, L), jnp.int32)
        attn = jax.jit(lambda q, kv: xla_attention(q, q, q, kv, True)
                       .astype(jnp.float32).sum())
        t_attn = timed(lambda: attn(q, kv))
        report("xla attention op (1 layer)", t_attn,
               2 * 2 * B * H * L * L * dh)
        results["xla attention x%d layers" % dcfg.n_layers] = {
            "ms": round(t_attn * 1e3 * dcfg.n_layers, 2)}
        log("  -> x%d layers = %.1f ms" % (dcfg.n_layers,
                                           t_attn * 1e3 * dcfg.n_layers))

        # 6. the edit program (width 10)
        reqs = [{"prompt": prompts[i], "image": images[i],
                 "target_new": targets[i]} for i in range(10)]

        def do_edit():
            editor.edit_batch(reqs, pad_width=10)
            return editor.state["count"]

        report("edit_batch w10 (incl host)", timed(do_edit))

        # 7. metrics program over the logits
        from devqa_tpu.eval.harness import _metrics_jit
        logits = editor.query_logits(qb)
        report("metrics (argmax+acc)",
               timed(lambda: _metrics_jit(logits, qb.label_ids,
                                          qb.label_masks)[0]))

    # 8. host-side batch build with warm vision cache
    t0 = time.perf_counter()
    qb2 = editor.build_query_batch(prompts, images, targets)
    fetch(qb2.embeds)
    report("build_query_batch (warm)", time.perf_counter() - t0)

    # 8b. decompose the build: where do those milliseconds live?
    #     host tokenize+pack | vision row stack | assemble dispatch |
    #     label host->device transfers | the final device sync.
    from devqa_tpu.data.xym import batch_samples

    t0 = time.perf_counter()
    samples = vllm.tokenize_queries(prompts, images, targets)
    tb = batch_samples(samples, vllm.tokenizer.pad_token_id,
                       bucket_multiple=vllm.bucket_multiple,
                       min_len=vllm.min_len)
    report("  build: tokenize+pack (host)", time.perf_counter() - t0)
    t0 = time.perf_counter()
    img_tokens, has = vllm.encode_images(images)  # warm: pure row stack
    report("  build: vision row stack (dispatch)", time.perf_counter() - t0)
    t0 = time.perf_counter()
    ids_d = jnp.asarray(tb.input_ids)
    mask_d = jnp.asarray(tb.attn_mask)
    lab_d = jnp.asarray(tb.label_ids)
    lm_d = jnp.asarray(tb.label_masks)
    has_d = jnp.asarray(has)
    report("  build: 5x host->device transfers", time.perf_counter() - t0)
    t0 = time.perf_counter()
    emb2, kv2 = vllm._assemble_jit(vllm.params, ids_d, mask_d,
                                   img_tokens, has_d)
    report("  build: assemble dispatch", time.perf_counter() - t0)
    t0 = time.perf_counter()
    fetch(emb2)
    report("  build: final device sync", time.perf_counter() - t0)

    # 9. CAN the pipeline overlap? Build+dispatch N chunks back to back
    #    (the fused harness's dispatch-phase discipline), fetch at the
    #    end: per-chunk wall at perfect overlap == the device program
    #    time (item 1); == item 1 + build time if nothing overlaps.
    #    Per-step host timings expose WHICH call blocks the enqueue.
    # warm the fused editor metrics program (not measured elsewhere)
    am = editor.query_metrics(qb)
    fetch(am[0])
    report("editor.query_metrics (solo)",
           timed(lambda: editor.query_metrics(qb)[0]), chunk_flops)
    N = 4
    outs = []
    t0 = time.perf_counter()
    seg_build, seg_disp = [], []
    for _ in range(N):
        tb0 = time.perf_counter()
        qb_i = editor.build_query_batch(prompts, images, targets)
        tb1 = time.perf_counter()
        outs.append(editor.query_metrics(qb_i))
        seg_build.append(time.perf_counter() - tb0)
        seg_disp.append(time.perf_counter() - tb1)
        seg_build[-1] -= seg_disp[-1]
    t_fetch0 = time.perf_counter()
    for a, p in outs:
        fetch(a)
    t_end = time.perf_counter()
    per = (t_end - t0) / N
    log("  pipe host: build %s ms, metrics-dispatch %s ms, tail fetch "
        "%.0f ms" % ([round(x * 1e3) for x in seg_build],
                     [round(x * 1e3) for x in seg_disp],
                     (t_end - t_fetch0) * 1e3))
    report("pipelined chunk (build+metrics x%d)" % N, per, chunk_flops)

    # 9b. the PACKED one-program path (wrapper.encode_queries_packed):
    #     2 transfers + 1 gather + 1 fused program per chunk.
    pq = vllm.encode_queries_packed(prompts, images, targets)
    am = editor.query_metrics_packed(pq)
    fetch(am[0])  # compile
    outs = []
    t0 = time.perf_counter()
    for _ in range(N):
        pq_i = vllm.encode_queries_packed(prompts, images, targets)
        outs.append(editor.query_metrics_packed(pq_i))
    for out in outs:
        fetch(out[0])
    per_packed = (time.perf_counter() - t0) / N
    report("pipelined packed chunk (x%d)" % N, per_packed, chunk_flops)

    # analytic summary
    results["geometry"] = {"B": B, "L": L,
                           "chunk_tflops": round(chunk_flops / 1e12, 2)}
    log(json.dumps(results, indent=1))

    if os.environ.get("PROFILE_TRACE") == "1":
        tdir = os.environ.get("PROFILE_TRACE_DIR", "/tmp/headline_trace")
        log("capturing xplane trace to %s ..." % tdir)
        try:
            with jax.profiler.trace(tdir):
                for _ in range(3):
                    out = editor.query_logits(qb)
                fetch(out)
            log("trace captured")
        except Exception as e:
            log("trace capture failed:", repr(e))

    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Same-process A/B: packed metrics full-head vs gathered-head at the
exact headline geometry (blip2-2.7b, 120x96 packed chunk). Tunnel
weather moves run-to-run numbers ±10-40%; only a same-process A/B can
attribute a delta to the gathered-head program (CLAUDE.md).

Run: python scripts/ab_gather_head.py    (one TPU process only)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from devqa_tpu.core import vllm as V
    from devqa_tpu.core.tokenizer import ToyTokenizer
    from devqa_tpu.core.wrapper import JaxVLLM
    from devqa_tpu.data.images import SyntheticImageProvider
    from devqa_tpu.editors.liveedit import LiveEdit, LiveEditConfig

    cfg = V.blip2_opt_2_7b_config()
    t0 = time.time()
    params = jax.jit(lambda k: V.init_vllm_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params["decoder"]["embed_tokens"])
    log("init: %.1fs" % (time.time() - t0))
    tok = ToyTokenizer(vocab_size=cfg.decoder.vocab_size)
    provider = SyntheticImageProvider(cfg.vit.image_size)
    vllm = JaxVLLM(cfg, params, tok, provider, bucket_multiple=64,
                   min_len=64, img_cache_size=256, img_batch_pad=8)
    lcfg = LiveEditConfig(edit_model_name=cfg.name,
                          llm_mid_dim=cfg.decoder.d_model,
                          edit_layer_i=21, max_edits=1024, retrieve_top_k=8)
    editor = LiveEdit(vllm, lcfg, seed=0)

    B = 120
    rng = np.random.default_rng(0)
    prompts = ["what color is the %d thing in the picture" % i
               for i in range(B)]
    images = ["img_%d.png" % (i % 58) for i in range(B)]
    targets = ["the %d-ish blue" % i for i in range(B)]
    editor.edit_one_piece({"prompt": prompts[0], "image": images[0],
                           "target_new": targets[0]})
    pq = vllm.encode_queries_packed(prompts, images, targets)
    log("geometry: ints %s  n_lab max %d" %
        (pq.ints.shape, int(pq.label_masks_full.sum(1).max())))

    def fetch(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    def timed(tag, fn, reps=3, iters=4):
        out = fn()
        fetch(out[0])  # compile + 1
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            fetch(out[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        log("%s: %.2f ms" % (tag, best * 1e3))
        return best

    res = {}
    # interleave A/B/A/B to cancel drift
    vllm._gather_positions = 0
    res["full_ms_1"] = timed("full-head   ", lambda:
                             editor.query_metrics_packed(pq)) * 1e3
    vllm._gather_positions = 32
    assert vllm._gather_head_ok(pq)
    res["gather_ms_1"] = timed("gathered P32", lambda:
                               editor.query_metrics_packed(pq)) * 1e3
    vllm._gather_positions = 0
    res["full_ms_2"] = timed("full-head   ", lambda:
                             editor.query_metrics_packed(pq)) * 1e3
    vllm._gather_positions = 32
    res["gather_ms_2"] = timed("gathered P32", lambda:
                               editor.query_metrics_packed(pq)) * 1e3
    full = min(res["full_ms_1"], res["full_ms_2"])
    gath = min(res["gather_ms_1"], res["gather_ms_2"])
    res["speedup"] = round(full / gath, 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Re-sweep flash forward block sizes against jax's official TPU kernel
(post interior-fast-path: the mask work that set the old 512x1024
optimum is now skipped on interior blocks, so the optimum may move).

Run: python scripts/sweep_flash_blocks.py   (one TPU process only)
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

    from devqa_tpu.ops import attention as A

    B, H, D = 2, 32, 128
    rng = np.random.default_rng(0)
    results = {}
    for L in (2048, 4096):
        q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
        kv = jnp.ones((B, L), jnp.int32)
        flops = 4 * B * H * L * L * D / 2

        def timed(fn, reps=3, iters=8):
            f = jax.jit(lambda q, k, v: fn(q, k, v)
                        .astype(jnp.float32).sum())
            t0 = time.time()
            float(f(q, k, v))
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                acc = None
                for _ in range(iters):
                    acc = f(q, k, v)
                float(acc)
                best = min(best, (time.time() - t0) / iters)
            return best, compile_s

        # jax official kernel (block sizes matched to its defaults)
        from jax.experimental.pallas.ops.tpu import flash_attention as JF
        t_j, cs = timed(lambda q, k, v: JF.flash_attention(
            q, k, v, causal=True, sm_scale=1.0 / (D ** 0.5)))
        log("L%d jaxflash: %.2f ms (%.1f TF/s) [compile %.0fs]"
            % (L, t_j * 1e3, flops / t_j / 1e12, cs))
        results[f"L{L}"] = {"jax_ms": round(t_j * 1e3, 2)}

        for bq, bk in ((512, 1024), (512, 2048), (1024, 1024),
                       (1024, 2048), (256, 2048), (1024, 512)):
            if bq > L or bk > L:
                continue
            try:
                t_f, cs = timed(lambda q, k, v: A._flash_fwd(
                    q, k, v, kv, True, block_q=bq, block_k=bk))
            except Exception as e:
                log("L%d q%d k%d FAILED: %r" % (L, bq, bk, str(e)[:120]))
                continue
            log("L%d q%d k%d: %.2f ms (%.1f TF/s) vs jax %.3fx "
                "[compile %.0fs]"
                % (L, bq, bk, t_f * 1e3, flops / t_f / 1e12, t_j / t_f, cs))
            results[f"L{L}"][f"q{bq}_k{bk}_ms"] = round(t_f * 1e3, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

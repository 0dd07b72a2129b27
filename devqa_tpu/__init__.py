"""devqa_tpu — a TPU-native multimodal knowledge-editing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of sev777/DE-VQA
(LiveEdit lifelong VQA editing + EasyEdit knowledge-editing toolkit + the
DE-VQA dynamic t×i locality evaluation), designed for TPU hardware:

- ``core``      — pytree model zoo (ViT, Q-Former, OPT, LLaMA decoders) with
                  scan-stacked layers and an explicit prefix/suffix decoder
                  split replacing the reference's forward-hook machinery.
- ``ops``       — Pallas TPU kernels (flash attention, fused top-k) with XLA
                  fallbacks for CPU testing.
- ``editors``   — the editor zoo (IKE, FT, LiveEdit, MEND, SERAC, T-Patcher,
                  LTE, RECIPE, LEMoE) as pure (params, state) machines with
                  fixed-capacity edit pools (jit-stable sequential editing).
- ``data``      — EVQA/EIC/VLKEB loaders, t×i probe synthesis, xym label
                  semantics, prefetching pipeline.
- ``retrieval`` — sentence-encoder embedding stores + on-TPU top-k search.
- ``eval``      — the dynamic-evaluation harness (reliability / generality /
                  locality over the t×i grid), batched per test case.
- ``parallel``  — device mesh construction and sharding rules (dp/tp).
- ``train``     — editor (hypernetwork) training loops with EMA-best
                  checkpointing.
"""

__version__ = "0.1.0"

from .xym import SampleTokens, TokenBatch, build_xym, tokenize_sample, batch_samples  # noqa: F401

from .tokenizer import Tokenizer, ToyTokenizer, HFTokenizerAdapter  # noqa: F401

from .base import VLLMEditor, EditRequest  # noqa: F401
from .null import NullEditor  # noqa: F401

from .config import BaseConfig, load_yaml_config  # noqa: F401
from .pytree import tree_stack, tree_unstack, tree_slice  # noqa: F401

from .mesh import make_mesh  # noqa: F401
from .sharding import (vllm_param_specs, shard_params, batch_specs)  # noqa: F401

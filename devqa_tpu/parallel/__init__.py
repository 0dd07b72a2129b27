from .distributed import (init_distributed, is_distributed_env,  # noqa: F401
                          shutdown_distributed)
from .mesh import make_mesh, make_multislice_mesh  # noqa: F401
from .sharding import (vllm_param_specs, shard_params, batch_specs)  # noqa: F401

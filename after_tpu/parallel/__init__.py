from .distributed import (global_batch_from_local, host_shard_kwargs,
                          initialize_distributed)
from .mesh import (batch_sharding, make_mesh, param_sharding_specs,
                   shard_variables)

from .distributed import (global_batch_from_local, host_shard_kwargs,
                          initialize_distributed)
from .mesh import (batch_sharding, make_mesh, param_sharding_specs,
                   parse_mesh_spec, shard_ae_state, shard_diffusion_state,
                   shard_variables)

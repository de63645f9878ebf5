from .mesh import (batch_sharding, make_mesh, param_sharding_specs,
                   shard_variables)

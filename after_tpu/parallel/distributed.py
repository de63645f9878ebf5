"""Multi-host (DCN) data parallelism.

The reference scales only to multi-GPU-one-host via Accelerate DDP
(/root/reference/after_scripts/train_autoencoder.py:211-216).  Here a
multi-host TPU pod runs the same SPMD trainers unchanged: each host feeds
its local slice of the global batch, `jax.make_array_from_process_local_data`
assembles the logically-global sharded array, and the jitted train step's
gradient all-reduce rides ICI within a slice and DCN across slices — XLA
places the collectives from the shardings, no NCCL/MPI-style code.

Typical pod launch (one process per host):

    initialize_distributed()                     # env-driven on TPU pods
    mesh = make_mesh()                           # all global devices
    loader = DataLoader(..., **host_shard_kwargs(batch_size))
    for batch in loader:
        batch = global_batch_from_local(batch, mesh)
        state, metrics = trainer.train_step(state, batch, ...)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (no-op if already initialized or
    single-process).  On TPU pods all arguments resolve from the environment;
    pass them explicitly for CPU/GPU clusters.

    MUST run before any other JAX call: probing jax.process_count() here
    would itself initialize the (single-process) backend and make
    jax.distributed.initialize() raise — the already-initialized check
    therefore looks at the distributed client state, not the backend."""
    try:
        from jax._src.distributed import global_state
        if global_state.client is not None:
            return  # distributed runtime already up
    except Exception:
        pass  # private API moved: fall through, initialize() will tell us
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            # single-process run (tests, one host): nothing to do
            return
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def host_shard_kwargs(global_batch_size: int) -> Dict[str, Any]:
    """Per-host DataLoader adjustments: each process loads its own
    `global/process_count` rows with a process-unique sampling seed."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by "
        f"{n} processes")
    # seed == process_index keeps single-process mesh runs on the exact
    # sampling stream a non-mesh run uses (seed 0) while still giving every
    # pod host a unique stream
    return {"batch_size": global_batch_size // n,
            "seed": jax.process_index()}


def global_batch_from_local(local_batch: Any, mesh: Mesh,
                            axis: str = "data",
                            leading_stack: bool = False) -> Any:
    """Assemble per-host numpy batches into global jax.Arrays sharded over
    `axis`.  Each process contributes its local rows; no host gathers the
    full batch.  With ``leading_stack`` the arrays are (K, B, ...) stacks of
    K batches (trainer `steps_per_call` windows): the batch axis is dim 1
    and the K scan axis stays unsharded."""
    sharding = NamedSharding(mesh, P(None, axis) if leading_stack
                             else P(axis))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, local_batch)

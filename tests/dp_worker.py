"""Multi-process DP worker for test_parallel.py::test_two_process_distributed_dp.

Each spawned process owns ONE virtual CPU device and joins a 2-process
jax.distributed cluster through parallel/distributed.py — the multi-host
posture of a TPU pod (per-host loader slices -> make_array_from_process_local
assembly -> SPMD train step with XLA-placed gradient collectives), standing
in for the reference's multi-process Accelerate DDP
(/root/reference/after_scripts/train_autoencoder.py:211-216).

Also importable from the test process: run() executes the identical
2-device fit single-process for the loss comparison.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_STEPS = 2
GLOBAL_B = 4


def make_global_batches(T=32, C=8):
    import numpy as np

    rng = np.random.RandomState(0)
    out = []
    for _ in range(N_STEPS):
        z = rng.randn(GLOBAL_B, T, C).astype(np.float32)
        out.append({"x": z,
                    "x_cond": z + 0.01 * rng.randn(*z.shape).astype(
                        np.float32),
                    "x_time_cond": z})
    return out


def run(local_rows=None):
    """2-device DP fit over the deterministic global batch; with
    ``local_rows=(lo, hi)`` each process feeds only its own slice (the
    per-host loader shard) and the helpers assemble the global array."""
    import jax

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_diffusion import micro_config

    from after_tpu.config import with_overrides
    from after_tpu.diffusion.trainer import DiffusionTrainer
    from after_tpu.parallel import make_mesh, shard_diffusion_state

    cfg = with_overrides(micro_config(), {"train.batch_size": GLOBAL_B})
    tr = DiffusionTrainer(cfg)
    state = tr.init(jax.random.PRNGKey(0), GLOBAL_B)
    mesh = make_mesh(n_data=2, n_model=1)
    state = shard_diffusion_state(state, mesh)

    batches = make_global_batches()
    if local_rows is not None:
        lo, hi = local_rows
        batches = [{k: v[lo:hi] for k, v in b.items()} for b in batches]

    losses = []
    tr.fit(state, iter(batches), max_steps=N_STEPS, mesh=mesh,
           callback=lambda s, m: losses.append(float(m["diffusion_loss"])))
    return losses


def main():
    coordinator, nproc, pid, out_path = sys.argv[1:5]
    nproc, pid = int(nproc), int(pid)

    import jax

    # the sandbox sitecustomize pins JAX_PLATFORMS=axon at interpreter
    # start; config.update is the override that sticks (tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REPO)
    from after_tpu.parallel import host_shard_kwargs, initialize_distributed

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 1, "expected 1 CPU device/process"

    kw = host_shard_kwargs(GLOBAL_B)
    assert kw["batch_size"] == GLOBAL_B // nproc
    assert kw["seed"] == pid  # process-unique sampling stream
    lo = pid * kw["batch_size"]
    losses = run(local_rows=(lo, lo + kw["batch_size"]))
    with open(out_path, "w") as f:
        json.dump(losses, f)


if __name__ == "__main__":
    main()

"""Mesh / sharding utilities for multi-chip training and inference.

The reference's only parallelism is DDP-via-Accelerate for codec training
(/root/reference/after_scripts/train_autoencoder.py:211-216); diffusion
training is single-device.  Here every trainer runs SPMD over a
``jax.sharding.Mesh``:

- axis "data": batch sharding (replaces Accelerate/NCCL DDP — gradients
  all-reduce over ICI automatically);
- axis "model": tensor parallelism over the denoiser's attention/MLP hidden
  dims (column-parallel qkv / MLP-in, row-parallel MLP-out → XLA inserts the
  psum), useful at inference for the 3xCFG batched forward and as the scale
  path for larger denoisers.

Sharding is GSPMD-style: we place params/batches with NamedShardings and let
XLA propagate and insert collectives (the scaling-book recipe).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total
    dmesh = mesh_utils.create_device_mesh((n_data, n_model),
                                          devices=devices[:n_data * n_model])
    return Mesh(dmesh, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


# Tensor-parallel layout for the denoiser (paths are flax param tree paths).
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*attn/qkv/kernel$", P(None, "model")),
    (r".*mlp/Dense_0/kernel$", P(None, "model")),
    (r".*mlp/Dense_0/bias$", P("model")),
    (r".*mlp/Dense_1/kernel$", P("model", None)),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def param_sharding_specs(params: Any, tp: bool = True) -> Any:
    """PartitionSpec tree for a param pytree: TP rules or full replication.

    Scan-form denoisers (cfg.scan_layers) stack per-layer params under a
    leading layer axis; a rule whose spec is one dim short of the leaf rank
    applies with that axis left unsharded (P(None, *spec))."""

    def spec_for(path, leaf):
        if tp:
            s = _path_str(path)
            for pat, spec in _TP_RULES:
                if re.match(pat, s):
                    if len(spec) == leaf.ndim:
                        return spec
                    if len(spec) + 1 == leaf.ndim:
                        return P(None, *spec)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_variables(variables: Any, mesh: Mesh, tp: bool = True) -> Any:
    """Place a variables pytree on the mesh (TP where rules match, replicated
    elsewhere)."""
    specs = param_sharding_specs(variables, tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables, specs)

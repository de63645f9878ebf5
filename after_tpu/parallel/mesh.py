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

import dataclasses
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
    elsewhere).  Non-array leaves (python ints in optimizer states etc.) pass
    through untouched."""
    specs = param_sharding_specs(variables, tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        if hasattr(x, "shape") or isinstance(x, (int, float)) else x,
        variables, specs)


def parse_mesh_spec(spec: Optional[str],
                    n_devices: Optional[int] = None) -> Tuple[int, int]:
    """Parse the trainer CLIs' ``--mesh`` value into (n_data, n_model).

    ``"auto"`` (or ``"data=auto"``) puts every local device on the data axis;
    ``"data=4"``, ``"data=4,model=2"`` pin the axes explicitly.  Mirrors the
    DDP role of Accelerate in the reference
    (/root/reference/after_scripts/train_autoencoder.py:211-216), extended
    with the optional tensor-parallel axis."""
    n_devices = n_devices if n_devices is not None else len(jax.devices())
    axes = {"data": None, "model": 1}
    if spec and spec != "auto":
        for part in spec.split(","):
            key, sep, val = part.partition("=")
            key = key.strip()
            if key not in axes or not sep:
                raise ValueError(
                    f"--mesh part {part!r}: expected data=N[,model=M]")
            axes[key] = None if val.strip() == "auto" else int(val)
    n_model = axes["model"] if axes["model"] is not None else 1
    n_data = (axes["data"] if axes["data"] is not None
              else max(n_devices // n_model, 1))
    if n_data * n_model > n_devices:
        raise ValueError(f"--mesh {spec!r} wants {n_data}x{n_model} devices "
                         f"but only {n_devices} are visible")
    return n_data, n_model


def _shard_opt_state(opt_state: Any, mesh: Mesh, tp: bool) -> Any:
    """Optimizer states nest param-shaped moment trees (adam mu/nu), whose
    tree paths END with the param path — the TP rules' ``.*`` prefix matches
    them, so moments land with the same layout as their params (no per-step
    resharding against the donated buffers)."""
    return shard_variables(opt_state, mesh, tp=tp)


def shard_diffusion_state(state: Any, mesh: Mesh, tp: bool = True) -> Any:
    """Place a DiffusionTrainState on the mesh: denoiser params (+ EMA +
    adam moments) tensor-parallel over "model" where the rules match,
    everything else replicated.  The batch rides the "data" axis
    (see ``batch_sharding``); XLA inserts the gradient all-reduce."""
    variables = dict(state.variables)
    for k in variables:
        variables[k] = shard_variables(variables[k], mesh,
                                       tp=tp and k == "net")
    kw = dict(
        variables=variables,
        ema_params=shard_variables(state.ema_params, mesh, tp=tp),
        opt_state=_shard_opt_state(state.opt_state, mesh, tp))
    if getattr(state, "cls_opt_state", None) is not None:
        kw["cls_opt_state"] = _shard_opt_state(state.cls_opt_state, mesh,
                                               False)
    return dataclasses.replace(state, **kw)


def shard_ae_state(state: Any, mesh: Mesh) -> Any:
    """Place an AETrainState on the mesh (pure data parallelism: all
    variables and optimizer states replicated, batch sharded over "data" —
    the Accelerate-DDP equivalent)."""
    return dataclasses.replace(
        state,
        codec_vars=shard_variables(state.codec_vars, mesh, tp=False),
        disc_vars=shard_variables(state.disc_vars, mesh, tp=False),
        opt_state=_shard_opt_state(state.opt_state, mesh, False),
        disc_opt_state=_shard_opt_state(state.disc_opt_state, mesh, False))

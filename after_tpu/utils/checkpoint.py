"""Checkpoint save/restore for train states.

Reference behaviour (/root/reference/after/diffusion/model.py:144-176,
221-247): periodic `checkpoint<step>_EMA.pt` dicts with model+optimizer
state, EMA-averaged net weights, resume via --restart with partial-load
masks, and the run's own config written next to the checkpoints for
round-trip reproducibility.

Implementation: orbax-checkpoint (async-capable, TPU-native) with a plain
directory-per-step layout plus a `config.json` dump.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(model_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(model_dir), f"checkpoint_{step}")


def save_checkpoint(model_dir: str, step: int, tree: Any,
                    config_json: Optional[str] = None) -> str:
    """Save a pytree (train state contents) at `model_dir/checkpoint_<step>`."""
    os.makedirs(model_dir, exist_ok=True)
    path = _ckpt_dir(model_dir, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    if config_json is not None:
        with open(os.path.join(model_dir, "config.json"), "w") as f:
            f.write(config_json)
    return path


def available_steps(model_dir: str) -> List[int]:
    if not os.path.isdir(model_dir):
        return []
    steps = []
    for name in os.listdir(model_dir):
        m = re.fullmatch(r"checkpoint_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def checkpoint_keys(model_dir: str, step: Optional[int] = None) -> List[str]:
    """Top-level keys stored in the checkpoint at `step` (default: latest).

    Used for backward/forward-compatible restores: older checkpoints carry
    only {variables, ema_params, step}; newer ones add the optimizer states
    (the reference saves opt_state too, model.py:157)."""
    steps = available_steps(model_dir)
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {model_dir}")
    step = step if step is not None else steps[-1]
    path = _ckpt_dir(model_dir, step)
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(path)
        tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
        return list(tree.keys()) if hasattr(tree, "keys") else []


def restore_checkpoint(model_dir: str, step: Optional[int] = None,
                       target: Any = None) -> Any:
    """Restore the pytree at `step` (default: latest).

    Checkpoints are portable across device environments: a state saved
    during multi-device training restores on a single inference chip (and
    vice versa).  Without a `target`, arrays come back as host numpy —
    orbax would otherwise re-bind the shardings recorded at save time,
    which reference devices that may not exist here."""
    steps = available_steps(model_dir)
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {model_dir}")
    step = step if step is not None else steps[-1]
    path = _ckpt_dir(model_dir, step)
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(path)
        tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
        dev = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

        def from_meta(m):
            return jax.ShapeDtypeStruct(tuple(m.shape), m.dtype, sharding=dev)

        def from_value(x):
            return (jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
                    if hasattr(x, "shape") or np.isscalar(x) else x)

        def abstract_of(subtree):
            return jax.tree_util.tree_map(
                lambda m: from_meta(m) if hasattr(m, "shape") else m, subtree)

        if target is not None and hasattr(tree, "keys"):
            # Per-top-level-key LENIENT target: a target subtree restores
            # the recorded structure (optax namedtuples survive) only when
            # its leaves match the checkpoint; on any mismatch — or for
            # checkpoint keys the target doesn't carry — fall back to the
            # checkpoint's own metadata structure so partial restarts
            # (changed encoder configs, disabled classifiers) don't crash
            # here; filter_partial_load decides what to keep afterward.
            abstract = {}
            for k in tree.keys():
                abstract[k] = abstract_of(tree[k])
                if k in target:
                    cand = jax.tree_util.tree_map(from_value, target[k])
                    # (shape, dtype) multisets: the tree SHAPES differ by
                    # design (namedtuple target vs dict-ified metadata), so
                    # leaf-path comparison is not possible here
                    def sig(t):
                        return sorted(
                            (str(getattr(l, "shape", l)),
                             str(getattr(l, "dtype", "")))
                            for l in jax.tree_util.tree_leaves(t))
                    if sig(cand) == sig(abstract[k]):
                        abstract[k] = cand
            try:
                return ckptr.restore(path, abstract)
            except (ValueError, TypeError, KeyError) as e:
                # e.g. renamed modules with identical leaf shapes fooled
                # the signature check: retry with the checkpoint's own
                # structure, which always matches what was saved.  IO-level
                # failures (missing arrays, checksum errors) propagate
                # as-is: a corrupted checkpoint must surface its real
                # cause, not a downstream structure error.
                print(f"[restore] target-structured restore failed "
                      f"({type(e).__name__}: {e}); retrying with the "
                      "checkpoint's recorded structure")
                return ckptr.restore(path, abstract_of(tree))
        if target is not None:
            return ckptr.restore(
                path, jax.tree_util.tree_map(from_value, target))
        try:
            return ckptr.restore(path, abstract_of(tree))
        except (ValueError, TypeError) as e:
            # older orbax layouts: fall back to the recorded shardings
            print(f"[restore] metadata-structured restore failed "
                  f"({type(e).__name__}: {e}); retrying with the "
                  "checkpoint's recorded shardings")
            return ckptr.restore(path)


def shapes_compatible(a, b) -> bool:
    """True when two pytrees carry the same multiset of leaf shapes (the
    lenient structure-agnostic check partial restores use)."""
    la = [tuple(np.shape(x)) for x in jax.tree_util.tree_leaves(a)]
    lb = [tuple(np.shape(x)) for x in jax.tree_util.tree_leaves(b)]
    return sorted(la) == sorted(lb)


def filter_partial_load(restored: Dict, current: Dict,
                        load_encoders=(True, True, True)) -> Dict:
    """Partial-load mask for restarts with frozen/absent encoders
    (reference load_encoders filter, model.py:226-238): positions are
    (encoder, encoder_time, net).

    Every subtree the CURRENT model has is loaded from the checkpoint when
    compatible (incl. subtrees outside the three flags, e.g. the
    adversarial classifier); a False flag reverts that subtree to the
    current (fresh) params.  Checkpoint-only subtrees are dropped (a
    midi-config restart must not inherit an audio run's encoder_time), and
    a subtree whose leaf shapes no longer match the current config stays
    fresh instead of crashing the first train step."""
    out = {}
    for k, v in current.items():
        if k in restored and shapes_compatible(restored[k], v):
            out[k] = restored[k]
        else:
            if k in restored:
                print(f"[restore] checkpoint subtree '{k}' doesn't match "
                      "the current config; keeping fresh init")
            out[k] = v
    names = [("encoder", load_encoders[0]),
             ("encoder_time", load_encoders[1]),
             ("net", load_encoders[2])]
    for name, load in names:
        if not load and name in current:
            out[name] = current[name]
    return out

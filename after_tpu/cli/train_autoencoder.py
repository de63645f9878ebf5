"""`after-tpu train_autoencoder`: codec GAN training with data-parallel mesh.

Reference: /root/reference/after_scripts/train_autoencoder.py — random-crop
collate with phase-mangle/gain augmentations (:95-127), Accelerate DDP
(:211-216).  Here DP rides the jax mesh: the batch is sharded over the
"data" axis and XLA all-reduces gradients over ICI.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(prog="after-tpu train_autoencoder")
    p.add_argument("--name", required=True)
    p.add_argument("--db_path", action="append", required=True)
    p.add_argument("--out_path", default="./after_runs")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_signal", type=int, default=131072)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--restart", type=int, default=None)
    p.add_argument("--streaming", action="store_true",
                   help="causal / norm-free codec for streaming export")
    p.add_argument("--augment", action="store_true", default=True)
    return p


def make_wave_collate(num_signal: int, augment: bool, seed: int = 0):
    from ..dataset.collate import thread_rng_factory
    from ..dataset.transforms import random_gain, random_phase_mangle

    # per-thread rng streams numbered by arrival order (thread idents are
    # reused across thread lifetimes — see dataset/collate.py)
    get_rng = thread_rng_factory(seed)

    def collate(items):
        rng = get_rng()
        out = []
        for it in items:
            w = np.asarray(it["waveform"], dtype=np.float32).reshape(-1)
            if len(w) <= num_signal:
                w = np.pad(w, (0, num_signal - len(w)))
                i0 = 0
            else:
                i0 = rng.randint(0, len(w) - num_signal)
            w = w[i0:i0 + num_signal]
            if augment:
                if rng.rand() < 0.8:
                    w = random_phase_mangle(w, rng=rng)
                if rng.rand() < 0.5:
                    w = random_gain(w, rng=rng)
            out.append(w)
        return np.stack(out)[..., None]

    return collate


def main(argv=None) -> int:
    import jax

    from ..config import AETrainConfig, ae_to_json, get_ae_config
    from ..dataset import CombinedDataset, DataLoader
    from ..autoencoder import AutoencoderTrainer
    from ..utils.checkpoint import (checkpoint_keys, restore_checkpoint,
                                    save_checkpoint)
    from ..utils.logging import MetricsLogger

    args = build_argparser().parse_args(argv)
    ae_cfg = get_ae_config(causal=args.streaming,
                           use_norm=not args.streaming)
    tc = AETrainConfig(num_signal=args.num_signal,
                       batch_size=args.batch_size)
    if args.max_steps:
        tc = dataclasses.replace(tc, max_steps=args.max_steps)

    path_dict = {os.path.basename(p.rstrip("/")) or f"db{i}": p
                 for i, p in enumerate(args.db_path)}
    dataset = CombinedDataset(path_dict, keys=["waveform"], config="train")
    loader = DataLoader(dataset, tc.batch_size,
                        make_wave_collate(tc.num_signal, args.augment),
                        weights=dataset.example_weights)

    model_dir = os.path.join(args.out_path, args.name)
    logger = MetricsLogger(model_dir)
    trainer = AutoencoderTrainer(ae_cfg, tc)
    state = trainer.init(jax.random.PRNGKey(0), tc.batch_size)

    # smoke-test shape round trip (reference train_autoencoder.py:66-71)
    x = np.zeros((1, tc.num_signal, 1), np.float32)
    y, *_ = trainer.codec.apply(state.codec_vars, x)
    assert abs(y.shape[1] - tc.num_signal) <= ae_cfg.ratio, \
        "codec round-trip shape mismatch"

    def state_tree(st):
        """Full AE train state: both optimizer states ride along (reference
        saves model+discriminator+both opts, trainer.py:345-364)."""
        return {"codec_vars": st.codec_vars, "disc_vars": st.disc_vars,
                "opt_state": st.opt_state,
                "disc_opt_state": st.disc_opt_state, "step": st.step}

    if args.restart is not None:
        step_arg = args.restart or None
        keys = set(checkpoint_keys(model_dir, step_arg))
        target = {k: v for k, v in state_tree(state).items() if k in keys}
        restored = restore_checkpoint(model_dir, step_arg, target=target)

        def opt_if_compatible(key, fresh):
            got = restored.get(key)
            if got is None or (jax.tree_util.tree_structure(got)
                               != jax.tree_util.tree_structure(fresh)):
                if got is not None:
                    print(f"[train_autoencoder] {key} doesn't match the "
                          "current config; optimizer restarts fresh")
                return fresh
            return got

        state = dataclasses.replace(
            state, codec_vars=restored["codec_vars"],
            disc_vars=restored["disc_vars"],
            opt_state=opt_if_compatible("opt_state", state.opt_state),
            disc_opt_state=opt_if_compatible("disc_opt_state",
                                             state.disc_opt_state),
            step=int(restored["step"]))
        if "opt_state" not in keys:
            print("[train_autoencoder] checkpoint has no optimizer state; "
                  "optimizers restart fresh")
        print(f"[train_autoencoder] restart from {state.step}")

    def callback(st, metrics):
        logger.log(st.step, metrics)
        if st.step % tc.steps_save == 0 and st.step > 0:
            save_checkpoint(model_dir, st.step, state_tree(st),
                            config_json=ae_to_json(ae_cfg))

    print(f"[train_autoencoder] {args.name}: ratio={ae_cfg.ratio}, "
          f"batch={tc.batch_size}")
    state = trainer.fit(state, iter(loader), callback=callback)
    save_checkpoint(model_dir, state.step, state_tree(state),
                    config_json=ae_to_json(ae_cfg))
    return 0

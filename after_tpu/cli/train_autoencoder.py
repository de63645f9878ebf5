"""`after-tpu train_autoencoder`: codec GAN training with data-parallel mesh.

Reference: /root/reference/after_scripts/train_autoencoder.py — random-crop
collate with phase-mangle/gain augmentations (:95-127), Accelerate DDP
(:211-216).  Here DP rides the jax mesh (``--mesh auto``): the batch is
sharded over the "data" axis and XLA all-reduces gradients over ICI.
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
    p.add_argument("--mesh", default=None,
                   help="SPMD data-parallel mesh: 'auto' (all local devices) "
                        "or 'data=N'. batch_size is the GLOBAL batch and "
                        "must divide by N. Replaces the reference's "
                        "Accelerate DDP (train_autoencoder.py:211-216)")
    p.add_argument("--override", action="append", default=[],
                   help="dotted config override, repeatable. 'train.*' keys "
                        "hit the trainer config (--override "
                        "train.warmup_steps=1000), everything else the "
                        "codec architecture (--override z_channels=16); "
                        "mirrors the reference's baseAE.gin surface")
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
    if args.mesh:
        # must precede any other JAX call on multi-host pods
        from ..parallel import initialize_distributed
        initialize_distributed()
    ae_cfg = get_ae_config(causal=args.streaming,
                           use_norm=not args.streaming)
    tc = AETrainConfig(num_signal=args.num_signal,
                       batch_size=args.batch_size)
    if args.override:
        from ..config import with_overrides
        from .train import parse_override_args
        overrides = parse_override_args(args.override)
        tc_over = {k[len("train."):]: v for k, v in overrides.items()
                   if k.startswith("train.")}
        ae_over = {k: v for k, v in overrides.items()
                   if not k.startswith("train.")}
        if tc_over:
            tc = with_overrides(tc, tc_over)
        if ae_over:
            ae_cfg = with_overrides(ae_cfg, ae_over)
    if args.max_steps:
        tc = dataclasses.replace(tc, max_steps=args.max_steps)

    # data-parallel mesh (the reference's Accelerate-DDP role); data=1 is a
    # strict no-op
    mesh = None
    loader_kwargs = {"batch_size": tc.batch_size}
    if args.mesh:
        from ..parallel import (host_shard_kwargs, make_mesh,
                                parse_mesh_spec, shard_ae_state)
        n_data, n_model = parse_mesh_spec(args.mesh)
        assert n_model == 1, "the codec trainer is data-parallel only"
        if n_data > 1:
            assert tc.batch_size % n_data == 0, (
                f"batch_size {tc.batch_size} not divisible by mesh data "
                f"axis {n_data}")
            mesh = make_mesh(n_data=n_data, n_model=1)
            loader_kwargs = host_shard_kwargs(tc.batch_size)
            print(f"[train_autoencoder] mesh: data={n_data} "
                  f"({jax.process_count()} host(s))")

    path_dict = {os.path.basename(p.rstrip("/")) or f"db{i}": p
                 for i, p in enumerate(args.db_path)}
    dataset = CombinedDataset(path_dict, keys=["waveform"], config="train")
    loader = DataLoader(dataset,
                        collate_fn=make_wave_collate(tc.num_signal,
                                                     args.augment),
                        weights=dataset.example_weights, **loader_kwargs)

    # fixed validation batches, drawn once with a pinned seed so the val
    # curve is comparable across checkpoints (reference iterates a fixed
    # val split, trainer.py:221-260)
    valset = CombinedDataset(path_dict, keys=["waveform"],
                             config="validation")
    val_batches = []
    if len(valset) > 0:
        val_loader = DataLoader(valset, tc.batch_size,
                                make_wave_collate(tc.num_signal,
                                                  augment=False, seed=1),
                                seed=1)
        import itertools
        val_batches = list(itertools.islice(iter(val_loader), 4))

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
        if (val_batches and st.step % tc.steps_valid == 0 and st.step > 0):
            vlosses, (x, y) = trainer.validate(st, val_batches)
            logger.log(st.step, vlosses)
            logger.flush(st.step)
            print(f"[train_autoencoder] step {st.step} "
                  f"val mrstft {vlosses['val_mrstft']:.4f}")
            # true[:4] | 1/3 s silence | reconstruction[:4], one stream
            # (reference trainer.py:250-256)
            gap = np.zeros((int(ae_cfg.sr / 3),), np.float32)
            parts = [x[i, :, 0] for i in range(min(4, x.shape[0]))]
            audio = np.concatenate(
                parts + [gap] + [y[i, :, 0]
                                 for i in range(min(4, y.shape[0]))])
            logger.log_audio(st.step, "validation/audio", audio, ae_cfg.sr)

    if mesh is not None:
        state = shard_ae_state(state, mesh)

    print(f"[train_autoencoder] {args.name}: ratio={ae_cfg.ratio}, "
          f"batch={tc.batch_size}")
    state = trainer.fit(state, iter(loader), callback=callback, mesh=mesh)
    save_checkpoint(model_dir, state.step, state_tree(state),
                    config_json=ae_to_json(ae_cfg))
    logger.flush(state.step)
    logger.close()
    return 0

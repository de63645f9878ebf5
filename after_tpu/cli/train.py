"""`after-tpu train`: diffusion model training.

Reference: /root/reference/after_scripts/train.py — compose configs, probe
the codec's latent size/ratio with a dummy encode, build datasets + weighted
samplers, run the two-phase curriculum with validation sampling and periodic
checkpoints.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import numpy as np

from ..config import get_config, to_json, with_overrides


def build_argparser():
    p = argparse.ArgumentParser(prog="after-tpu train")
    p.add_argument("--name", required=True)
    p.add_argument("--db_path", action="append", required=True,
                   help="record store path(s); repeatable")
    p.add_argument("--config", action="append", default=None,
                   help="preset then overlays, e.g. --config base --config cycle")
    p.add_argument("--emb_model_path", default=None,
                   help="codec checkpoint for validation audio decode")
    p.add_argument("--out_path", default="./after_runs")
    p.add_argument("--model", default=None,
                   choices=["rectified", "edm"],
                   help="diffusion formulation (reference train.py:88-95; "
                        "its edm branch is dead code upstream — here it "
                        "works). Default: the config's diffusion_type")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--restart", type=int, default=None)
    p.add_argument("--load_encoders", default="1,1,1",
                   help="restart partial-load mask 'encoder,encoder_time,net'"
                        " (reference load_encoders, model.py:226-238)")
    p.add_argument("--ae_ratio", type=int, default=2048)
    p.add_argument("--sr", type=int, default=44100)
    p.add_argument("--augmentation_keys", action="append", default=None,
                   help="timbre augmentation buffers to sample x_cond crops "
                        "from; pass 'all' to discover z_aug_* keys from the "
                        "store (reference train.py:105-122)")
    p.add_argument("--timbre_limit", type=float, default=None,
                   help="window timbre crops to +/- n_signal*limit frames "
                        "around the target crop (reference utils.py:78-87)")
    p.add_argument("--compute_dtype", default=None,
                   help="mixed-precision training compute dtype, e.g. "
                        "bfloat16 (2x MXU rate on v5e); master params, "
                        "optimizer, EMA and losses stay f32")
    p.add_argument("--rng_impl", default=None,
                   choices=["threefry2x128", "rbg"],
                   help="PRNG for the training rng chain; rbg uses the "
                        "TPU hardware generator (1.17x faster steps at "
                        "B=64; random streams differ from threefry)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of the first N steps "
                        "to <run>/profile (view in TensorBoard)")
    p.add_argument("--override", action="append", default=[],
                   help="dotted config override, repeatable: "
                        "--override denoiser.embed_dim=256 (value parsed as "
                        "JSON; mirrors the reference's gin bindings)")
    p.add_argument("--data_on_device", action="store_true",
                   help="cache the latent store in device HBM and sample "
                        "batches in-graph (zero per-step host upload; "
                        "audio structure only, single-device)")
    p.add_argument("--mesh", default=None,
                   help="SPMD mesh spec: 'auto' (all local devices on the "
                        "data axis), 'data=N' or 'data=N,model=M' (tensor "
                        "parallelism over the denoiser). batch_size is the "
                        "GLOBAL batch and must divide by N. Replaces the "
                        "reference's Accelerate DDP; multi-host pods shard "
                        "the loader per process automatically")
    return p


def parse_override_args(pairs):
    """'a.b=v' strings -> {path: value} with JSON-typed values."""
    import json as _json
    out = {}
    for pair in pairs:
        key, sep, raw = pair.partition("=")
        if not sep:
            raise ValueError(f"override {pair!r} is not of the form key=value")
        try:
            value = _json.loads(raw)
        except _json.JSONDecodeError:
            value = raw
        if isinstance(value, list):
            value = tuple(value)
        out[key] = value
    return out


def main(argv=None) -> int:
    import jax

    from ..dataset import CombinedDataset, DataLoader, make_collate_fn
    from ..diffusion.trainer import DiffusionTrainer
    from ..utils.checkpoint import (checkpoint_keys, filter_partial_load,
                                    restore_checkpoint, save_checkpoint,
                                    shapes_compatible)
    from ..utils.logging import MetricsLogger

    args = build_argparser().parse_args(argv)
    if args.mesh:
        # must precede any other JAX call on multi-host pods
        from ..parallel import initialize_distributed
        initialize_distributed()
    names = tuple(args.config) if args.config else ("base",)
    cfg = get_config(*names)
    if args.override:
        cfg = with_overrides(cfg, parse_override_args(args.override))

    # probe latent geometry from the dataset (the reference probes by encoding
    # a dummy tensor through the codec, train.py:71-86; here the store already
    # holds latents, so probe the first record)
    path_dict = {os.path.basename(p.rstrip("/")) or f"db{i}": p
                 for i, p in enumerate(args.db_path)}
    base_keys = (["z", "midi_bytes", "metadata"]
                 if cfg.structure_type == "midi" else ["z", "metadata"])
    dataset = CombinedDataset(path_dict, keys=base_keys, config="train")

    # timbre augmentation: sample x_cond crops from the pitch/stretch
    # augmented latents prepare_dataset wrote (reference train.py:105-122
    # discovers the keys from the store and binds them into the collate)
    aug_keys = list(args.augmentation_keys or [])
    if aug_keys == ["all"]:
        aug_keys = sorted(k for k in dataset.example_keys()
                          if k != "z" and "aug" in k)
    if aug_keys:
        print(f"[train] timbre augmentation keys: {aug_keys}")
        dataset.add_buffer_keys(aug_keys)  # no second store scan
    probe = dataset[0]["z"]
    in_size = probe.shape[0]
    cfg = cfg.resolved(in_size=in_size)
    if args.model:
        cfg = with_overrides(cfg, {"diffusion_type": args.model})
    if args.batch_size:
        cfg = with_overrides(cfg, {"train.batch_size": args.batch_size})
    if args.max_steps:
        cfg = with_overrides(cfg, {"train.max_steps": args.max_steps})
    if args.compute_dtype:
        cfg = with_overrides(cfg, {"train.compute_dtype":
                                   args.compute_dtype})
    if args.rng_impl:
        cfg = with_overrides(cfg, {"train.rng_impl": args.rng_impl})

    model_dir = os.path.join(args.out_path, args.name)
    os.makedirs(model_dir, exist_ok=True)
    logger = MetricsLogger(model_dir)

    # SPMD mesh: batch over "data" (DDP role of the reference's Accelerate),
    # optional tensor parallelism over "model"; n_data=1 stays single-device
    mesh = None
    loader_kwargs = {"batch_size": cfg.train.batch_size}
    if args.mesh:
        from ..parallel import (host_shard_kwargs, make_mesh,
                                parse_mesh_spec, shard_diffusion_state)
        n_data, n_model = parse_mesh_spec(args.mesh)
        if n_data * n_model > 1:
            assert cfg.train.batch_size % n_data == 0, (
                f"batch_size {cfg.train.batch_size} not divisible by "
                f"mesh data axis {n_data}")
            mesh = make_mesh(n_data=n_data, n_model=n_model)
            loader_kwargs = host_shard_kwargs(cfg.train.batch_size)
            print(f"[train] mesh: data={n_data} x model={n_model} over "
                  f"{n_data * n_model} devices "
                  f"({jax.process_count()} host(s))")

    collate = make_collate_fn(cfg.train.n_signal, cfg.structure_type,
                              args.ae_ratio, args.sr,
                              timbre_limit=args.timbre_limit,
                              timbre_augmentation_keys=tuple(aug_keys))
    loader = DataLoader(dataset, collate_fn=collate,
                        weights=dataset.example_weights, **loader_kwargs)
    if args.data_on_device:
        # TPU-native data path: resident latent bank + in-graph sampling
        # (the host loader re-uploads ~3 crops x batch every step, which
        # caps real-data throughput whenever the host<->device link is
        # slower than the ~20 ms step — see dataset/device_bank.py)
        assert cfg.structure_type != "midi", (
            "--data_on_device supports audio structure only (piano rolls "
            "are built from pickled MIDI on the host)")
        assert mesh is None, (
            "--data_on_device is single-device; drop --mesh or use the "
            "host loader")
        from ..dataset.device_bank import DeviceLatentBank
        bank = DeviceLatentBank(dataset, cfg.train.n_signal,
                                aug_keys=tuple(aug_keys),
                                weights=dataset.example_weights,
                                timbre_limit=args.timbre_limit)
        print(f"[train] device latent bank: {bank.n_records} records, "
              f"{bank.nbytes / 1e6:.1f} MB in HBM")
        loader = bank.batches(cfg.train.batch_size)

    # fixed validation batches with pinned seeds (own collate instance so
    # the val iterator never perturbs the train collate's rng streams):
    # the val loss is the same subset at every checkpoint, matching the
    # reference's fixed-split iteration (model.py:458-515)
    valset = CombinedDataset(path_dict, keys=["z", "metadata"],
                             config="validation")
    val_batches = []
    if len(valset) > 0:
        val_collate = make_collate_fn(
            cfg.train.n_signal, cfg.structure_type, args.ae_ratio, args.sr,
            timbre_limit=args.timbre_limit,
            timbre_augmentation_keys=tuple(aug_keys), seed=1)
        val_loader = DataLoader(valset, cfg.train.batch_size, val_collate,
                                seed=1)
        import itertools
        val_batches = list(itertools.islice(iter(val_loader), 8))

    # a restart must continue under the run's own diffusion objective: the
    # rectified/edm param trees are shape-identical, so restoring an EDM
    # checkpoint into a rectified-flow trainer would silently switch the
    # training objective with no restore warning (reference restarts reuse
    # the run's gin operative config the same way)
    if args.restart is not None:
        run_cfg_path = os.path.join(model_dir, "config.json")
        if os.path.exists(run_cfg_path):
            from ..config import from_json
            with open(run_cfg_path) as f:
                run_type = from_json(f.read()).diffusion_type
            if run_type != cfg.diffusion_type:
                if args.model:
                    print(f"[train] WARNING: --model {args.model} overrides "
                          f"the run's recorded diffusion_type={run_type}; "
                          "the restored weights were trained under the "
                          "other objective")
                else:
                    print(f"[train] restart adopts the run's "
                          f"diffusion_type={run_type} (config.json)")
                    cfg = with_overrides(cfg, {"diffusion_type": run_type})

    trainer = DiffusionTrainer(cfg)
    state = trainer.init(jax.random.PRNGKey(0))

    def state_tree(st):
        """Full train state (reference saves opt_state too, model.py:157)."""
        tree = {"variables": st.variables, "ema_params": st.ema_params,
                "opt_state": st.opt_state, "step": st.step}
        if st.cls_opt_state is not None:
            tree["cls_opt_state"] = st.cls_opt_state
        return tree

    if args.restart is not None:
        load_encoders = tuple(
            bool(int(v)) for v in args.load_encoders.split(","))
        step_arg = args.restart or None
        keys = set(checkpoint_keys(model_dir, step_arg))
        # target-based restore so the optimizer states come back with their
        # optax namedtuple structure (not orbax's dict-ified form); keys
        # absent from older checkpoints stay freshly initialised
        target = {k: v for k, v in state_tree(state).items() if k in keys}
        restored = restore_checkpoint(model_dir, step_arg, target=target)
        variables = filter_partial_load(restored["variables"],
                                        state.variables, load_encoders)

        def opt_if_compatible(key, fresh):
            """Adopt a restored optimizer state only when its optax
            structure survived the (lenient) restore — a config change or
            an old checkpoint falls back to a fresh optimizer."""
            got = restored.get(key)
            if got is None or fresh is None:
                return fresh
            same = (jax.tree_util.tree_structure(got)
                    == jax.tree_util.tree_structure(fresh))
            if not same:
                print(f"[train] {key} in checkpoint doesn't match the "
                      "current config; optimizer restarts fresh")
            return got if same else fresh

        # the EMA update tree_maps ema vs net params every step, so a
        # restored EMA tree from a no-longer-matching net config would
        # crash at step 1; apply the same shape-compat check as
        # filter_partial_load and fall back to the (possibly fresh) net
        ema_params = restored.get("ema_params")
        if (ema_params is None
                or not shapes_compatible(ema_params,
                                         variables["net"]["params"])):
            if ema_params is not None:
                print("[train] ema_params in checkpoint don't match the "
                      "current net; EMA restarts from the net params")
            ema_params = variables["net"]["params"]
        state = dataclasses.replace(
            state, variables=variables,
            ema_params=ema_params,
            opt_state=opt_if_compatible("opt_state", state.opt_state),
            cls_opt_state=opt_if_compatible("cls_opt_state",
                                            state.cls_opt_state),
            step=int(restored["step"]))
        missing = {"opt_state"} - keys
        if missing:
            print(f"[train] checkpoint has no {sorted(missing)}; "
                  "optimizer restarts fresh")
        print(f"[train] restarting from step {state.step} "
              f"(load_encoders={load_encoders})")

    spc = max(int(cfg.train.steps_per_call or 1), 1)
    if spc > 1:
        for knob in ("steps_save", "steps_valid", "steps_display"):
            if getattr(cfg.train, knob) % spc:
                print(f"[train] warning: {knob}={getattr(cfg.train, knob)} "
                      f"is not a multiple of steps_per_call={spc}; that "
                      "cadence will not fire (steps advance in windows)")

    def callback(st, metrics):
        logger.log(st.step, metrics, n_steps=spc)
        if st.step % cfg.train.steps_save == 0 and st.step > 0:
            save_checkpoint(model_dir, st.step, state_tree(st),
                            config_json=to_json(cfg))
            print(f"[train] saved checkpoint at {st.step}")
        if (val_batches and st.step % cfg.train.steps_valid == 0
                and st.step > 0):
            vloss = validate(trainer, st, val_batches)
            vm = val_transfer_margin(trainer, st, val_batches,
                                     codec=codec_coder)
            logger.log(st.step, {"val_diffusion_loss": vloss, **vm})
            print(f"[train] step {st.step} val loss {vloss:.4f} "
                  f"transfer_margin {vm['val_transfer_margin']:+.4f}"
                  + (f" audio {vm['val_transfer_margin_audio']:+.4f}"
                     if "val_transfer_margin_audio" in vm else ""))
            if codec_coder is not None:
                sample_validation_audio(trainer, st, val_batches,
                                        codec_coder[0], logger, cfg)

    codec_coder = None
    if args.emb_model_path:
        codec_coder = make_codec_coder(args.emb_model_path)

    if mesh is not None:
        # place params/EMA/optimizer moments on the mesh (TP where the rules
        # match, replicated elsewhere); restored checkpoints reshard here too
        state = shard_diffusion_state(state, mesh, tp=n_model > 1)

    print(f"[train] {args.name}: in_size={in_size}, "
          f"batch={cfg.train.batch_size}, steps={cfg.train.max_steps}")
    if args.profile_steps > 0:
        # per-step tracing as a first-class feature (SURVEY §5.1: the
        # reference has none)
        with jax.profiler.trace(os.path.join(model_dir, "profile")):
            state = trainer.fit(state, iter(loader),
                                max_steps=state.step + args.profile_steps,
                                callback=callback, mesh=mesh)
    state = trainer.fit(state, iter(loader), callback=callback, mesh=mesh)
    save_checkpoint(model_dir, state.step, state_tree(state),
                    config_json=to_json(cfg))
    logger.flush(state.step)
    logger.close()
    return 0


def validate(trainer, state, val_batches) -> float:
    """Mean diffusion loss over the FIXED validation batches (same subset
    every call — curves are comparable across checkpoints, reference
    model.py:458-515)."""
    import jax
    import jax.numpy as jnp
    losses = []
    for i, b in enumerate(val_batches):
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        (cond, _, _), _ = trainer.rf.encode_timbre(state.variables,
                                                   batch["x_cond"])
        (tcond, _, _), _ = trainer.rf.encode_structure(state.variables,
                                                       batch["x_time_cond"])
        loss, _ = trainer.rf.diffusion_loss(
            state.variables["net"], jax.random.PRNGKey(i), batch["x"],
            tcond, cond, training=False)
        losses.append(float(loss))
    return float(np.mean(losses))


def val_transfer_margin(trainer, state, val_batches,
                        nb_steps: int = 20, codec=None,
                        gate_guidance: float = 2.0):
    """Objective transfer-proximity metric on the fixed validation batch:
    sample a transfer with every row's timbre target rolled by one, re-embed
    the output with the model's own timbre encoder, and report
    mean[cos(out, target) - cos(out, source)].  Positive = transfers move
    toward the requested timbre; logged as `val_transfer_margin` every
    steps_valid so conditioning regressions surface mid-run instead of at
    the post-hoc quality gate (the reference validates this by human
    listening over TB samples, model.py:458-561 — here it is a number).

    With `codec` (a (decode, encode) pair from make_codec_coder) the
    returned dict also carries `val_transfer_margin_audio`: the same margin
    measured at the QUALITY GATE's probe point — sample at the gate's
    guidance, decode to audio, re-encode, re-embed.  Round-5 diagnosis
    (runs/scale/transfer_diag.json): the latent-space margin can be positive
    while the decoded audio still wears the source timbre, so a gate-honest
    training metric must cross the codec round trip."""
    import jax
    import jax.numpy as jnp
    b = val_batches[0]
    x = jnp.asarray(b["x"])
    (cond, _, _), _ = trainer.rf.encode_timbre(state.variables,
                                               jnp.asarray(b["x_cond"]))
    (tcond, _, _), _ = trainer.rf.encode_structure(
        state.variables, jnp.asarray(b["x_time_cond"]))
    tgt = jnp.roll(cond, -1, axis=0)
    x0 = jax.random.normal(jax.random.PRNGKey(0), x.shape)
    x_tr = trainer.rf.sample({"params": state.ema_params}, x0, tgt, tcond,
                             nb_steps)
    (e_out, _, _), _ = trainer.rf.encode_timbre(state.variables, x_tr)

    def cosm(a, bv):
        num = jnp.sum(a * bv, axis=1)
        den = (jnp.linalg.norm(a, axis=1)
               * jnp.linalg.norm(bv, axis=1) + 1e-9)
        return num / den

    out = {"val_transfer_margin":
           float(jnp.mean(cosm(e_out, tgt) - cosm(e_out, cond)))}
    if codec is not None:
        decode, encode = codec
        n = min(16, x.shape[0])  # bound the decode cost on big val batches
        x_g = trainer.rf.sample({"params": state.ema_params}, x0[:n],
                                tgt[:n], tcond[:n], nb_steps,
                                gate_guidance)
        z_rt = encode(decode(x_g))
        (e_aud, _, _), _ = trainer.rf.encode_timbre(state.variables, z_rt)
        out["val_transfer_margin_audio"] = float(jnp.mean(
            cosm(e_aud, tgt[:n]) - cosm(e_aud, cond[:n])))
    return out


def make_codec_decode(ckpt_dir: str):
    """Jitted codec decode for validation audio (reference decodes val samples
    with the emb model, model.py:517-561)."""
    import jax
    import jax.numpy as jnp
    from ..config import load_codec_config
    from ..models import AudioCodec
    from ..utils.checkpoint import restore_checkpoint

    tree = restore_checkpoint(ckpt_dir)
    codec_vars = tree.get("codec_vars", tree)
    codec = AudioCodec(load_codec_config(ckpt_dir))

    @jax.jit
    def dec(z):
        return codec.apply(codec_vars, z, method=AudioCodec.decode)

    return dec


def make_codec_coder(ckpt_dir: str):
    """Jitted codec (decode, encode) pair for the gate-honest audio-probe
    transfer metric (val_transfer_margin_audio)."""
    import jax
    from ..config import load_codec_config
    from ..models import AudioCodec
    from ..utils.checkpoint import restore_checkpoint

    tree = restore_checkpoint(ckpt_dir)
    codec_vars = tree.get("codec_vars", tree)
    codec = AudioCodec(load_codec_config(ckpt_dir))

    @jax.jit
    def dec(z):
        return codec.apply(codec_vars, z, method=AudioCodec.decode)

    @jax.jit
    def enc(audio):
        return codec.apply(codec_vars, audio, method=AudioCodec.encode)

    return dec, enc


def sample_validation_audio(trainer, state, val_batches, codec_decode, logger,
                            cfg, n: int = 4):
    """Log true / reconstruction / transfer audio triplets
    (reference model.py:517-561), using the EMA weights."""
    import jax
    import jax.numpy as jnp

    batch = val_batches[0]
    x1 = jnp.asarray(batch["x"][:n])
    (cond, _, _), _ = trainer.rf.encode_timbre(state.variables,
                                               jnp.asarray(batch["x_cond"][:n]))
    (tcond, _, _), _ = trainer.rf.encode_structure(
        state.variables, jnp.asarray(batch["x_time_cond"][:n]))
    net_ema = {"params": state.ema_params}
    x0 = jax.random.normal(jax.random.PRNGKey(state.step), x1.shape)
    x_rec = trainer.rf.sample(net_ema, x0, cond, tcond, 20)
    x_tr = trainer.rf.sample(net_ema, x0, jnp.roll(cond, -1, axis=0),
                             tcond, 20)
    import numpy as np
    for i in range(x1.shape[0]):
        logger.log_audio(state.step, f"true/{i}",
                         np.asarray(codec_decode(x1[i:i + 1]))[0, :, 0],
                         cfg.sr)
        logger.log_audio(state.step, f"reconstruction/{i}",
                         np.asarray(codec_decode(x_rec[i:i + 1]))[0, :, 0],
                         cfg.sr)
        logger.log_audio(state.step, f"transfer/{i}",
                         np.asarray(codec_decode(x_tr[i:i + 1]))[0, :, 0],
                         cfg.sr)

"""`after-tpu export` / `export_midi` / `export_autoencoder`: package trained
models into portable streaming artifacts (StableHLO + state spec).

Reference: /root/reference/after_scripts/export.py, export_midi.py,
export_autoencoder.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def build_argparser(cmd: str):
    p = argparse.ArgumentParser(prog=f"after-tpu {cmd}")
    p.add_argument("--model_path", required=True,
                   help="run dir with checkpoints + config.json")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--emb_model_path", default=None,
                   help="codec checkpoint dir (a2a/midi export)")
    p.add_argument("--chunk_size", type=int, default=4)
    p.add_argument("--nb_steps", type=int, default=1,
                   help="default diffusion step count (a live-settable "
                        "attribute of the artifact, like the reference's "
                        "nn~ nb_steps)")
    p.add_argument("--guidance_timbre", type=float, default=1.0,
                   help="default timbre guidance (live-settable attribute)")
    p.add_argument("--guidance_structure", type=float, default=1.0,
                   help="default structure guidance (live-settable "
                        "attribute)")
    p.add_argument("--latent_range", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=1,
                   help="voices batched into one graph: serving hosts run "
                        "B concurrent users per dispatch at ~the cost of "
                        "one (native stream_host batched-voice mode)")
    p.add_argument("--db_path", default=None,
                   help="dataset store: train the 2-D XY-pad timbre "
                        "projector from its latents and bake "
                        "latent2map/map2latent + map.png into the artifact "
                        "(reference export.py:109-129 latent_project)")
    p.add_argument("--map_samples", type=int, default=512,
                   help="dataset records to embed for the timbre map")
    p.add_argument("--map_steps", type=int, default=5000,
                   help="projector training steps")
    p.add_argument("--compute_dtype", default=None,
                   help="e.g. bfloat16: bake a reduced-precision compute "
                        "path (and state) into the artifact")
    p.add_argument("--out", default=None)
    p.add_argument("--crossfade", action="store_true",
                   help="export_autoencoder: force the non-causal crossfade "
                        "streaming path (auto when the codec config is "
                        "non-causal; reference AE_notcausal, "
                        "export_autoencoder.py:131-153)")
    p.add_argument("--n_fade", type=int, default=4,
                   help="crossfade overlap in latent frames")
    return p


def main(cmd: str, argv=None) -> int:
    import jax
    import jax.numpy as jnp

    from ..config import from_json, with_overrides
    from ..streaming.export import export_streamer
    from ..streaming.streamer import Streamer
    from ..utils.checkpoint import restore_checkpoint

    args = build_argparser(cmd).parse_args(argv)

    if cmd == "export_autoencoder":
        return export_autoencoder(args)

    with open(os.path.join(args.model_path, "config.json")) as f:
        cfg = from_json(f.read())

    # adopt the codec run's OWN architecture config (a norm-trained codec
    # restored into a norm-free module would silently drop its gn params
    # and produce wrong audio — fail loudly instead of force-overriding)
    if args.emb_model_path:
        from ..config import load_codec_config
        codec_cfg_path = os.path.join(args.emb_model_path, "config.json")
        if not os.path.exists(codec_cfg_path):
            raise SystemExit(
                f"[{cmd}] {codec_cfg_path} not found: the codec run must "
                "carry its architecture config (re-save the checkpoint "
                "with config_json, or copy the run's config.json)")
        codec_cfg = load_codec_config(args.emb_model_path)
        if not codec_cfg.causal:
            # non-causal codecs (the reference's shipped flavor) stream via
            # the crossfade path inside the Streamer; the artifact's
            # decode_lag_* manifest keys record the extra latency
            print(f"[{cmd}] non-causal codec: streaming via the crossfade "
                  f"path (n_fade={args.n_fade} latent frames of extra "
                  "latency)")
        if codec_cfg.z_channels != cfg.denoiser.n_channels:
            raise SystemExit(
                f"[{cmd}] codec z_channels={codec_cfg.z_channels} does not "
                f"match the diffusion model's latent size "
                f"{cfg.denoiser.n_channels}")
        cfg = with_overrides(cfg, {"autoencoder": codec_cfg})

    restored = restore_checkpoint(args.model_path, args.step)
    diff_vars = dict(restored["variables"])
    # export uses the EMA weights (reference saves _EMA checkpoints,
    # model.py:144-161)
    if "ema_params" in restored:
        diff_vars["net"] = {**diff_vars["net"],
                            "params": restored["ema_params"]}

    if args.emb_model_path:
        codec_restored = restore_checkpoint(args.emb_model_path)
        codec_vars = codec_restored.get("codec_vars", codec_restored)
    else:
        raise SystemExit("--emb_model_path (codec checkpoint) is required")

    variables = {"codec": codec_vars, "diffusion": diff_vars}

    # XY-pad timbre map: the reference trains the 2-D projector from the
    # run's dataset at export time and ships latent2map/map2latent + the
    # density PNG inside every a2a export (export.py:109-129,297-328,520-529)
    projector_params, embeddings = None, None
    if args.db_path:
        from ..utils.latent_map import (store_timbre_embeddings,
                                        train_projector)
        embeddings = store_timbre_embeddings(
            cfg, variables, args.db_path, n_samples=args.map_samples)
        print(f"[{cmd}] training 2-D timbre map on {len(embeddings)} "
              f"embeddings ({args.map_steps} steps)")
        _, projector_params = train_projector(embeddings,
                                              num_steps=args.map_steps)

    streamer = Streamer(cfg, chunk_size=args.chunk_size,
                        latent_range=args.latent_range,
                        compute_dtype=args.compute_dtype,
                        n_fade=args.n_fade)
    variables = streamer.prepare_variables(variables)
    out = args.out or os.path.join(
        args.model_path,
        f"after.{'midi' if cmd == 'export_midi' else 'audio'}."
        f"{os.path.basename(args.model_path.rstrip('/'))}")
    export_streamer(streamer, variables, out, nb_steps=args.nb_steps,
                    guidance_timbre=args.guidance_timbre,
                    guidance_structure=args.guidance_structure,
                    batch_size=args.batch_size,
                    projector_params=projector_params)
    if projector_params is not None:
        from ..utils.latent_map import save_projector
        save_projector(out, projector_params, embeddings)
    print(f"[{cmd}] exported -> {out}")
    return 0


def export_autoencoder(args) -> int:
    """Codec-only export: encode/decode streaming artifacts
    (reference export_autoencoder.py).

    Causal codecs stream exactly via cached convs (+ StreamGroupNorm when
    norm-trained).  Non-causal codecs (the shipped reference base codec,
    AE_notcausal :131-153) use the crossfade path: context-window encode +
    overlap cross-faded decode, auto-selected from the codec's own
    config.json (or forced with --crossfade)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport
    import json

    from ..config import load_codec_config
    from ..models import AudioCodec
    from ..models.autoencoder import decoder_band_delay
    from ..streaming.state import init_stream_state
    from ..utils.checkpoint import restore_checkpoint

    restored = restore_checkpoint(args.model_path, args.step)
    codec_vars = restored.get("codec_vars", restored)
    cfg = load_codec_config(args.model_path)
    crossfade = args.crossfade or not cfg.causal

    out = args.out or os.path.join(args.model_path, "codec_export")
    os.makedirs(out, exist_ok=True)
    A = args.chunk_size * cfg.ratio
    audio = jnp.zeros((1, A, 1), jnp.float32)
    z = jnp.zeros((1, args.chunk_size, cfg.z_channels), jnp.float32)

    if crossfade:
        from ..streaming.crossfade import CrossfadeDecoder
        dec = CrossfadeDecoder(dataclasses.replace(cfg, causal=False)
                               if cfg.causal else cfg, n_fade=args.n_fade,
                               chunk_size=args.chunk_size)
        enc_state, enc_treedef = jax.tree_util.tree_flatten(
            dec.init_encode_state(codec_vars, 1))
        dec_state, dec_treedef = jax.tree_util.tree_flatten(
            dec.init_state(codec_vars, 1))

        def enc_fn(ls, xi):
            st = jax.tree_util.tree_unflatten(enc_treedef, ls)
            znew, st2 = dec.encode(codec_vars, st, xi)
            return znew, jax.tree_util.tree_flatten(st2)[0]

        def dec_fn(ls, zi):
            st = jax.tree_util.tree_unflatten(dec_treedef, ls)
            y, st2 = dec.decode(codec_vars, st, zi)
            return y, jax.tree_util.tree_flatten(st2)[0]

        # fused per-buffer round trip — the reference AE exports register a
        # `forward` = decode(encode(x)) next to encode/decode
        # (export_autoencoder.py AE_causal:225-247, AE_notcausal:118-129);
        # one graph = one native-host dispatch per audio callback
        fwd_leaves, fwd_treedef = jax.tree_util.tree_flatten(
            (dec.init_encode_state(codec_vars, 1),
             dec.init_state(codec_vars, 1)))

        def fwd_fn(ls, xi):
            est, dst = jax.tree_util.tree_unflatten(fwd_treedef, ls)
            zi, est2 = dec.encode(codec_vars, est, xi)
            y, dst2 = dec.decode(codec_vars, dst, zi)
            return y, jax.tree_util.tree_flatten((est2, dst2))[0]

        surfaces = (("encode", enc_fn, enc_state, audio),
                    ("decode", dec_fn, dec_state, z),
                    ("forward", fwd_fn, fwd_leaves, audio))
    else:
        codec = AudioCodec(cfg, streaming=True)
        enc_cache = init_stream_state(codec, audio, method=AudioCodec.encode)
        dec_cache = init_stream_state(codec, z, method=AudioCodec.decode)

        def make_fn(treedef, method):
            def fn(ls, xi):
                c = jax.tree_util.tree_unflatten(treedef, ls)
                y, aux = codec.apply({**codec_vars, "cache": c}, xi,
                                     method=method, mutable=["cache"])
                return y, jax.tree_util.tree_flatten(aux["cache"])[0]
            return fn

        fwd_leaves, fwd_treedef = jax.tree_util.tree_flatten(
            (enc_cache, dec_cache))

        def fwd_fn(ls, xi):
            ec, dc = jax.tree_util.tree_unflatten(fwd_treedef, ls)
            zi, aux = codec.apply({**codec_vars, "cache": ec}, xi,
                                  method=AudioCodec.encode, mutable=["cache"])
            y, aux2 = codec.apply({**codec_vars, "cache": dc}, zi,
                                  method=AudioCodec.decode, mutable=["cache"])
            return y, jax.tree_util.tree_flatten(
                (aux["cache"], aux2["cache"]))[0]

        surfaces = tuple(
            (name, make_fn(jax.tree_util.tree_flatten(cache)[1], method),
             jax.tree_util.tree_flatten(cache)[0], x)
            for name, cache, x, method in (
                ("encode", enc_cache, audio, AudioCodec.encode),
                ("decode", dec_cache, z, AudioCodec.decode))
        ) + (("forward", fwd_fn, fwd_leaves, audio),)

    for name, fn, leaves, x in surfaces:
        exp = jexport.export(jax.jit(fn, donate_argnums=(0,)))(leaves, x)
        with open(os.path.join(out, f"{name}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
        with open(os.path.join(out, f"{name}.mlir.bc"), "wb") as f:
            f.write(exp.mlir_module_serialized)
        np.savez(os.path.join(out, f"{name}_state.npz"),
                 **{f"leaf_{i}": np.asarray(l)
                    for i, l in enumerate(leaves)})

    # native-host layout (native/stream_host.cc codec mode): raw bins of the
    # fused-forward state + its shapes/dtypes in the manifest, plus the
    # serialized CompileOptionsProto — same v2 layout as export_streamer
    from ..streaming.export import write_compile_options, write_state_bins
    write_state_bins(os.path.join(out, "state"), fwd_leaves)
    write_compile_options(out)

    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump({"format_version": 2, "ratio": cfg.ratio,
                   "z_channels": cfg.z_channels, "sr": cfg.sr,
                   "chunk_size": args.chunk_size,
                   "audio_chunk": A,
                   "batch_size": 1,
                   # marks a codec-only artifact: native hosts stream one
                   # audio input through `forward` (no timbre/rng/attributes)
                   "codec_only": 1,
                   "streaming": "crossfade" if crossfade else "cached",
                   "n_fade": args.n_fade if crossfade else 0,
                   # crossfade decode emits audio n_fade latent frames late
                   "decode_lag_frames": args.n_fade if crossfade else 0,
                   # total decode latency in SAMPLES a host should
                   # compensate: crossfade overlap, or the causal decoder's
                   # static transpose-conv delay (decoder_band_delay)
                   "decode_lag_samples": (
                       args.n_fade * cfg.ratio if crossfade
                       else decoder_band_delay(cfg) * cfg.pqmf_bands),
                   "n_state_leaves": len(fwd_leaves),
                   "state_shapes": [list(np.shape(l)) for l in fwd_leaves],
                   "state_dtypes": [str(np.asarray(l).dtype)
                                    for l in fwd_leaves],
                   "config": json.loads(json.dumps(
                       dataclasses.asdict(cfg)))}, f, indent=2)
    print(f"[export_autoencoder] exported "
          f"({'crossfade' if crossfade else 'cached-conv'}) -> {out}")
    return 0

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
    p.add_argument("--compute_dtype", default=None,
                   help="e.g. bfloat16: bake a reduced-precision compute "
                        "path (and state) into the artifact")
    p.add_argument("--out", default=None)
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
    cfg = with_overrides(cfg, {"autoencoder.causal": True,
                               "autoencoder.use_norm": False})

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
    streamer = Streamer(cfg, chunk_size=args.chunk_size,
                        latent_range=args.latent_range,
                        compute_dtype=args.compute_dtype)
    variables = streamer.prepare_variables(variables)
    out = args.out or os.path.join(
        args.model_path,
        f"after.{'midi' if cmd == 'export_midi' else 'audio'}."
        f"{os.path.basename(args.model_path.rstrip('/'))}")
    export_streamer(streamer, variables, out, nb_steps=args.nb_steps,
                    guidance_timbre=args.guidance_timbre,
                    guidance_structure=args.guidance_structure)
    print(f"[{cmd}] exported -> {out}")
    return 0


def export_autoencoder(args) -> int:
    """Codec-only export: encode/decode streaming artifacts
    (reference export_autoencoder.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport
    import json

    from ..config import load_codec_config, with_overrides
    from ..models import AudioCodec
    from ..streaming.state import init_stream_state, zero_cache
    from ..utils.checkpoint import restore_checkpoint

    restored = restore_checkpoint(args.model_path, args.step)
    codec_vars = restored.get("codec_vars", restored)
    cfg = with_overrides(load_codec_config(args.model_path),
                         {"causal": True, "use_norm": False})
    codec = AudioCodec(cfg, streaming=True)

    out = args.out or os.path.join(args.model_path, "codec_export")
    os.makedirs(out, exist_ok=True)
    A = args.chunk_size * cfg.ratio
    audio = jnp.zeros((1, A, 1), jnp.float32)
    z = jnp.zeros((1, args.chunk_size, cfg.z_channels), jnp.float32)

    enc_cache = init_stream_state(codec, audio, method=AudioCodec.encode)
    dec_cache = init_stream_state(codec, z, method=AudioCodec.decode)

    for name, cache, x, method in (
            ("encode", enc_cache, audio, AudioCodec.encode),
            ("decode", dec_cache, z, AudioCodec.decode)):
        leaves, treedef = jax.tree_util.tree_flatten(cache)

        def fn(ls, xi, _treedef=treedef, _method=method):
            c = jax.tree_util.tree_unflatten(_treedef, ls)
            y, aux = codec.apply({**codec_vars, "cache": c}, xi,
                                 method=_method, mutable=["cache"])
            return y, jax.tree_util.tree_flatten(aux["cache"])[0]

        exp = jexport.export(jax.jit(fn))(leaves, x)
        with open(os.path.join(out, f"{name}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
        np.savez(os.path.join(out, f"{name}_state.npz"),
                 **{f"leaf_{i}": np.asarray(l)
                    for i, l in enumerate(leaves)})

    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump({"format_version": 1, "ratio": cfg.ratio,
                   "z_channels": cfg.z_channels, "sr": cfg.sr,
                   "chunk_size": args.chunk_size}, f, indent=2)
    print(f"[export_autoencoder] exported -> {out}")
    return 0

"""`after-tpu serve`: local web UI for interactive timbre transfer.

The reference's end-user surface is a Max4Live device
(/root/reference/after.m4l/afterv2.js) — an XY pad over the model's timbre
map driving `nn~ <model> generate_timbre`.  This serves the same controls as
a local web app (after_tpu/frontend/) in one of two modes:

- ``--artifact <dir>``: stream buffer-by-buffer through an EXPORTED
  artifact's compiled graphs (the production path a native host runs); the
  XY pad uses the artifact's baked projector + map.png when it was exported
  with ``after-tpu export --db_path``.
- ``--model_path/--emb_model_path``: offline TransferPipeline over
  checkpoints.  The 2-D projector loads from a sibling exported artifact
  when one carries projector.msgpack; otherwise pass --store to train it at
  serve time (the reference trains it at export time,
  after_scripts/export.py:119-127).
"""

from __future__ import annotations

import argparse
import os


def build_argparser():
    p = argparse.ArgumentParser(prog="after-tpu serve")
    p.add_argument("--artifact", default=None,
                   help="exported artifact dir: serve the compiled "
                        "streaming graphs instead of checkpoints")
    p.add_argument("--model_path", default=None,
                   help="diffusion run dir with checkpoints + config.json")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--emb_model_path", default=None,
                   help="codec checkpoint dir")
    p.add_argument("--store", default=None,
                   help="dataset store dir: trains the XY-pad timbre map")
    p.add_argument("--map_samples", type=int, default=512)
    p.add_argument("--map_steps", type=int, default=2000)
    p.add_argument("--nb_steps", type=int, default=None)
    p.add_argument("--max_seconds", type=float, default=12.0)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8675)
    return p


def find_artifact_projector(model_path: str, zt_channels: int):
    """(projector_params, map_dir) from the newest exported artifact under
    the run dir carrying projector.msgpack, else (None, None)."""
    from ..utils.latent_map import load_projector

    candidates = sorted(
        d for d in os.listdir(model_path)
        if d.startswith(("after.audio", "after.midi"))
        and os.path.exists(os.path.join(model_path, d, "projector.msgpack"))
    ) if os.path.isdir(model_path) else []
    for d in reversed(candidates):
        art = os.path.join(model_path, d)
        params = load_projector(art, zt_channels)
        if params is not None:
            return params, art
    return None, None


def load_frontend(args):
    import numpy as np

    from ..config import from_json
    from ..frontend.server import AfterFrontend
    from ..utils.checkpoint import restore_checkpoint

    with open(os.path.join(args.model_path, "config.json")) as f:
        cfg = from_json(f.read())

    restored = restore_checkpoint(args.model_path, args.step)
    diff_vars = dict(restored["variables"])
    if "ema_params" in restored:
        diff_vars["net"] = {**diff_vars["net"],
                            "params": restored["ema_params"]}
    codec_restored = restore_checkpoint(args.emb_model_path)
    codec_vars = codec_restored.get("codec_vars", codec_restored)
    variables = {"codec": codec_vars, "diffusion": diff_vars}

    projector_params, embeddings, art = None, None, None
    if args.store:
        from ..utils.latent_map import (store_timbre_embeddings,
                                        train_projector)
        embeddings = store_timbre_embeddings(
            cfg, variables, args.store, n_samples=args.map_samples)
        print(f"[serve] training 2-D timbre map on {len(embeddings)} "
              f"embeddings ({args.map_steps} steps)")
        _, projector_params = train_projector(embeddings,
                                              num_steps=args.map_steps)
    else:
        # a CLI-exported artifact under the run dir already carries a
        # trained projector: reuse it instead of retraining
        projector_params, art = find_artifact_projector(args.model_path,
                                                        cfg.zt_channels)
        if projector_params is not None:
            print(f"[serve] loaded pre-trained timbre map from {art}")

    return AfterFrontend(cfg, variables, projector_params=projector_params,
                         embeddings=embeddings,
                         nb_steps=args.nb_steps or 20,
                         max_seconds=args.max_seconds, map_dir=art)


def main(argv=None) -> int:
    from ..frontend.server import serve

    args = build_argparser().parse_args(argv)
    if args.artifact:
        from ..frontend.server import ArtifactFrontend
        app = ArtifactFrontend(args.artifact, nb_steps=args.nb_steps,
                               max_seconds=args.max_seconds)
    else:
        if not (args.model_path and args.emb_model_path):
            raise SystemExit("serve needs either --artifact <dir> or "
                             "--model_path + --emb_model_path")
        app = load_frontend(args)
    try:
        serve(app, host=args.host, port=args.port)
    except KeyboardInterrupt:
        pass
    return 0

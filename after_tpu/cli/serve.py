"""`after-tpu serve`: local web UI for interactive timbre transfer.

The reference's end-user surface is a Max4Live device
(/root/reference/after.m4l/afterv2.js) — an XY pad over the model's timbre
map driving `nn~ <model> generate_timbre`.  This serves the same controls as
a local web app (after_tpu/frontend/) over the offline TransferPipeline.

The 2-D projector is trained at serve time from dataset timbre embeddings
(the reference trains it at export time, after_scripts/export.py:119-127);
pass --store for a real map, otherwise the pad is disabled and timbre comes
from an uploaded reference audio.
"""

from __future__ import annotations

import argparse
import os


def build_argparser():
    p = argparse.ArgumentParser(prog="after-tpu serve")
    p.add_argument("--model_path", required=True,
                   help="diffusion run dir with checkpoints + config.json")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--emb_model_path", required=True,
                   help="codec checkpoint dir")
    p.add_argument("--store", default=None,
                   help="dataset store dir: trains the XY-pad timbre map")
    p.add_argument("--map_samples", type=int, default=512)
    p.add_argument("--map_steps", type=int, default=2000)
    p.add_argument("--nb_steps", type=int, default=20)
    p.add_argument("--max_seconds", type=float, default=12.0)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8675)
    return p


def load_frontend(args):
    import jax
    import numpy as np

    from ..config import from_json
    from ..diffusion import TransferPipeline
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

    projector_params, embeddings = None, None
    if args.store:
        from ..dataset import SimpleDataset
        from ..utils.latent_map import train_projector

        ds = SimpleDataset(args.store, keys=("z",))
        if len(ds) == 0:
            raise SystemExit(f"--store {args.store} is empty; cannot train "
                             "the timbre map (omit --store to serve without "
                             "the XY pad)")
        n = min(args.map_samples, len(ds))
        pipe = TransferPipeline(cfg)
        embs = []
        batch, bs = [], 16
        shape0 = None
        for i in np.linspace(0, len(ds) - 1, n).astype(int):
            # records store latents as (C, T) (reference layout); the
            # pipeline runs (B, T, C)
            z = np.asarray(ds[int(i)]["z"], np.float32).T
            if shape0 is None:
                shape0 = z.shape
            elif z.shape != shape0:
                raise SystemExit(
                    f"--store records have differing latent shapes "
                    f"({shape0} vs {z.shape} at record {int(i)}); the timbre "
                    "map needs fixed-length records (re-run prepare_dataset)")
            batch.append(z)
            if len(batch) == bs:
                z = jax.numpy.asarray(np.stack(batch))
                embs.append(np.asarray(pipe.timbre(variables, z)))
                batch = []
        if batch:
            z = jax.numpy.asarray(np.stack(batch))
            embs.append(np.asarray(pipe.timbre(variables, z)))
        embeddings = np.concatenate(embs, axis=0)
        print(f"[serve] training 2-D timbre map on {len(embeddings)} "
              f"embeddings ({args.map_steps} steps)")
        _, projector_params = train_projector(embeddings,
                                              num_steps=args.map_steps)

    return AfterFrontend(cfg, variables, projector_params=projector_params,
                         embeddings=embeddings, nb_steps=args.nb_steps,
                         max_seconds=args.max_seconds)


def main(argv=None) -> int:
    from ..frontend.server import serve

    args = build_argparser().parse_args(argv)
    app = load_frontend(args)
    try:
        serve(app, host=args.host, port=args.port)
    except KeyboardInterrupt:
        pass
    return 0

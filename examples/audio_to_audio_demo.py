"""Offline audio-to-audio timbre transfer demo.

Script equivalent of the reference notebook
(/root/reference/notebooks/audio_to_audio_demo.ipynb): load a trained model,
encode a structure input and a timbre input, sample the rectified flow at
10-20 steps with guidance (timbre 2.0 / structure 1.0), decode, save wavs.

    python examples/audio_to_audio_demo.py \
        --model_path after_runs/run1 --emb_model_path runs/codec \
        --structure in1.wav --timbre in2.wav --out out.wav \
        --nb_steps 20 --guidance_timbre 2.0
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--emb_model_path", required=True)
    p.add_argument("--structure", required=True)
    p.add_argument("--timbre", required=True)
    p.add_argument("--out", default="transfer_out.wav")
    p.add_argument("--nb_steps", type=int, default=20)
    p.add_argument("--guidance_timbre", type=float, default=2.0)
    p.add_argument("--guidance_structure", type=float, default=1.0)
    p.add_argument("--seconds", type=float, default=11.9)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from after_tpu.config import from_json
    from after_tpu.diffusion import TransferPipeline
    from after_tpu.dataset.audio import load_wav, save_wav
    from after_tpu.utils.checkpoint import restore_checkpoint

    with open(os.path.join(args.model_path, "config.json")) as f:
        cfg = from_json(f.read())

    n_samples = int(args.seconds * cfg.sr)
    ratio = cfg.autoencoder.ratio
    n_samples = (n_samples // ratio) * ratio
    cfg = cfg.resolved(in_size=cfg.autoencoder.z_channels,
                       n_signal=n_samples // ratio)

    pipe = TransferPipeline(cfg)
    diff = restore_checkpoint(args.model_path)
    codec = restore_checkpoint(args.emb_model_path)
    variables = {
        "codec": codec.get("codec_vars", codec),
        "diffusion": diff["variables"],
    }
    if "ema_params" in diff:
        variables["diffusion"]["net"] = {
            **variables["diffusion"]["net"], "params": diff["ema_params"]}

    def load(path):
        x, _ = load_wav(path, sr=cfg.sr)
        x = np.tile(x, int(np.ceil(n_samples / max(len(x), 1))))[:n_samples]
        return jnp.asarray(x)[None, :, None]

    out = pipe.transfer(variables, load(args.structure), load(args.timbre),
                        args.nb_steps, args.guidance_timbre,
                        args.guidance_structure,
                        rng=jax.random.PRNGKey(0))
    save_wav(args.out, np.asarray(out)[0, :, 0], cfg.sr)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

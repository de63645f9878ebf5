"""Offline MIDI-to-audio generation demo.

Script equivalent of /root/reference/notebooks/midi_to_audio_demo.ipynb:
render a 128-bin piano roll from a .mid file, condition the midi-config
diffusion model on it plus a timbre vector extracted from an audio prompt,
sample and decode.
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
    p.add_argument("--midi", required=True)
    p.add_argument("--timbre", required=True, help="audio prompt (wav)")
    p.add_argument("--out", default="midi_out.wav")
    p.add_argument("--nb_steps", type=int, default=20)
    p.add_argument("--guidance_timbre", type=float, default=2.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from after_tpu.config import from_json
    from after_tpu.diffusion import TransferPipeline
    from after_tpu.dataset.audio import load_wav, save_wav
    from after_tpu.dataset.midi import MidiFile
    from after_tpu.models import AudioCodec
    from after_tpu.utils.checkpoint import restore_checkpoint

    with open(os.path.join(args.model_path, "config.json")) as f:
        cfg = from_json(f.read())
    assert cfg.structure_type == "midi", "use a midi-config model"

    midi = MidiFile(args.midi)
    dur = max(midi.duration(), 1.0)
    ratio = cfg.autoencoder.ratio
    n_frames = int(dur * cfg.sr) // ratio
    cfg = cfg.resolved(in_size=cfg.autoencoder.z_channels, n_signal=n_frames)

    pipe = TransferPipeline(cfg)
    diff = restore_checkpoint(args.model_path)
    codec = restore_checkpoint(args.emb_model_path)
    variables = {"codec": codec.get("codec_vars", codec),
                 "diffusion": diff["variables"]}
    if "ema_params" in diff:
        variables["diffusion"]["net"] = {
            **variables["diffusion"]["net"], "params": diff["ema_params"]}

    # piano-roll structure (diffusion/utils.py:91-105)
    times = np.linspace(0, n_frames * ratio / cfg.sr, n_frames)
    roll = (midi.get_piano_roll(times) / 127.0).T[None]   # (1, T, 128)

    # timbre vector from the audio prompt
    t_audio, _ = load_wav(args.timbre, sr=cfg.sr)
    n = n_frames * ratio
    t_audio = np.tile(t_audio, int(np.ceil(n / max(len(t_audio), 1))))[:n]
    z_t = pipe.encode(variables, jnp.asarray(t_audio)[None, :, None])
    cond = pipe.timbre(variables, z_t)

    x0 = jax.random.normal(jax.random.PRNGKey(0),
                           (1, n_frames, cfg.denoiser.n_channels))
    z = pipe.diffuse(variables, x0, cond, jnp.asarray(roll, jnp.float32),
                     args.nb_steps, args.guidance_timbre, 1.0)
    out = pipe.decode(variables, z)
    save_wav(args.out, np.asarray(out)[0, :, 0], cfg.sr)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

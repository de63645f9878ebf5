"""MIDI-to-audio end-to-end: tonal corpus with known MIDI -> latents+rolls ->
midi-config diffusion training (piano-roll conditioning, no structure
encoder) -> sampling conditioned on a roll. Micro sizes, CPU."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses, pickle, shutil
import jax.numpy as jnp
import numpy as np
from after_tpu.config import AutoEncoderConfig, get_config, with_overrides
from after_tpu.dataset import (AudioExample, RecordWriter, CombinedDataset,
                               DataLoader, make_collate_fn, MidiFile, Note)
from after_tpu.diffusion.trainer import DiffusionTrainer
from after_tpu.models import AudioCodec

WORK = "/tmp/e2e_midi"
SR = 44100

def log(m): print(f"[midi-e2e] {m}", flush=True)

def main():
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    rng = np.random.RandomState(0)

    ae_cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                               multipliers=(1, 2, 2), factors=(2, 2),
                               dilations=(1, 3), num_blocks_per_stage=1,
                               causal=True, use_norm=False)
    codec = AudioCodec(ae_cfg)
    # ~1.5 s clips (the micro codec ratio is 16, so latent seqs are long
    # enough for 32-frame crops)
    T_wav = ae_cfg.ratio * 4096
    cv = jax.jit(lambda: codec.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, T_wav, 1))))()
    enc = jax.jit(lambda x: codec.apply(cv, x, method=AudioCodec.encode))

    # corpus: random note sequences rendered as sines + exact MIDI
    db = os.path.join(WORK, "db")
    with RecordWriter(db) as w:
        for i in range(24):
            notes, audio = [], np.zeros(T_wav, np.float32)
            t_cursor = 0.0
            dur_total = T_wav / SR
            while t_cursor < dur_total - 0.2:
                pitch = int(rng.choice([57, 60, 64, 67, 69]))
                dur = float(rng.uniform(0.2, 0.5))
                end = min(t_cursor + dur, dur_total)
                f = 440.0 * 2 ** ((pitch - 69) / 12)
                i0, i1 = int(t_cursor * SR), int(end * SR)
                tt = np.arange(i1 - i0) / SR
                audio[i0:i1] += (0.4 * np.sin(2 * np.pi * f * tt)
                                 * np.minimum(1, np.minimum(tt * 50,
                                                            (tt[-1] - tt) * 50 + 1e-3)))
                notes.append(Note(pitch, 100, t_cursor, end))
                t_cursor = end
            midi = MidiFile(notes=notes)
            z = enc(jnp.asarray(audio)[None, :, None])
            ae = AudioExample()
            ae.put_array("z", np.asarray(z)[0].T.astype(np.float32))
            blob = pickle.dumps(midi)
            ae.put_buffer("midi_bytes", blob, [len(blob)])
            w.put(f"{i:08d}", ae.serialize())
    log("midi latent store written")

    n_signal = 32
    cfg = get_config("midi")
    cfg = with_overrides(cfg, {
        "denoiser.embed_dim": 64, "denoiser.n_layers": 2,
        "denoiser.noise_embed_dims": 16, "denoiser.mlp_multiplier": 2,
        "encoder.channels": (16, 16, 16, 32),
        "train.n_signal": n_signal, "train.batch_size": 8,
        "train.timbre_warmup": 1,
    }).resolved(in_size=8, n_signal=n_signal)
    assert cfg.encoder_time is None and cfg.classifier is None
    assert cfg.zs_channels == 128

    dataset = CombinedDataset({"db": db}, keys=["z", "midi_bytes"],
                              config="train")
    collate = make_collate_fn(n_signal, "midi", ae_cfg.ratio, SR)
    loader = DataLoader(dataset, 8, collate, weights=dataset.example_weights)
    trainer = DiffusionTrainer(cfg)
    state = trainer.init(jax.random.PRNGKey(1), 8)
    losses = []
    state = trainer.fit(state, iter(loader), max_steps=150,
                        callback=lambda s, m: losses.append(
                            m.get("diffusion_loss")))
    ls = [float(l) for l in losses if l is not None]
    log(f"midi diffusion loss first20={np.mean(ls[:20]):.3f} "
        f"last20={np.mean(ls[-20:]):.3f}")
    assert np.mean(ls[-20:]) < np.mean(ls[:20]), "midi training did not learn"

    # sample conditioned on a roll
    from after_tpu.diffusion import RectifiedFlow
    rf = trainer.rf
    roll = np.zeros((1, n_signal, 128), np.float32)
    roll[0, :, 60] = 100 / 127.0
    cond = jnp.zeros((1, cfg.zt_channels))
    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, n_signal, 8))
    z = rf.sample({"params": state.ema_params}, x0, cond,
                  jnp.asarray(roll), 4, 1.5, 1.0)
    assert np.isfinite(np.asarray(z)).all()
    y = codec.apply(cv, z, method=AudioCodec.decode)
    assert np.isfinite(np.asarray(y)).all()
    log("sampled + decoded from piano roll")
    log("MIDI E2E OK")

main()

"""Full-pipeline integration: tonal corpus -> codec GAN training -> latent
dataset -> diffusion training (both phases) -> checkpoint -> streaming export
-> ExportedStreamer playback.  Micro sizes, CPU, ~10 minutes.

This is the round-trip the reference README describes (train_autoencoder ->
prepare_dataset -> train -> export) exercised end-to-end in one process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import shutil

import jax.numpy as jnp
import numpy as np

from after_tpu.config import (AETrainConfig, AutoEncoderConfig,
                              DiscriminatorConfig, ae_to_json, get_config,
                              to_json, with_overrides)
from after_tpu.autoencoder import AutoencoderTrainer
from after_tpu.dataset import (AudioExample, RecordReader, RecordWriter,
                               CombinedDataset, DataLoader, make_collate_fn)
from after_tpu.dataset.audio import save_wav
from after_tpu.diffusion.trainer import DiffusionTrainer
from after_tpu.models import AudioCodec
from after_tpu.streaming.export import ExportedStreamer, export_streamer
from after_tpu.streaming.streamer import Streamer
from after_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

WORK = "/tmp/e2e_after_tpu"
SR = 44100
NUM_SIGNAL = 16384


def log(m):
    print(f"[e2e] {m}", flush=True)


def tone(f0, kind, n, rng):
    t = np.arange(n) / SR
    if kind == "sine":
        x = np.sin(2 * np.pi * f0 * t)
    else:  # saw-ish (bright)
        x = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 6))
    env = np.minimum(1, np.minimum(t * 20, (t[-1] - t) * 20))
    return (0.5 * x * env + 0.002 * rng.randn(n)).astype(np.float32)


def main():
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    rng = np.random.RandomState(0)

    # -- 1. corpus ---------------------------------------------------------
    corpus = os.path.join(WORK, "corpus")
    os.makedirs(corpus)
    for i, f0 in enumerate([220, 277, 330, 440]):
        for kind in ("sine", "saw"):
            save_wav(os.path.join(corpus, f"{kind}_{f0}.wav"),
                     tone(f0, kind, SR, rng), SR)
    log("corpus written")

    # -- 2. codec training (causal micro codec) ----------------------------
    ae_cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                               multipliers=(1, 2, 2), factors=(2, 2),
                               dilations=(1, 3), num_blocks_per_stage=1,
                               causal=True, use_norm=False)
    tc = AETrainConfig(num_signal=NUM_SIGNAL, warmup_steps=60,
                       update_discriminator_every=4,
                       stft_fft_sizes=(1024, 256), stft_hop_sizes=(256, 64),
                       stft_win_lengths=(1024, 256))
    dc = DiscriminatorConfig(filters=8, n_ffts=(334, 542),
                             hop_lengths=(167, 271), win_lengths=(334, 542))
    ae_trainer = AutoencoderTrainer(ae_cfg, tc, dc)
    ae_state = ae_trainer.init(jax.random.PRNGKey(0), 4)

    import glob
    from after_tpu.dataset.audio import load_wav
    wavs = [load_wav(p)[0] for p in sorted(glob.glob(corpus + "/*.wav"))]

    def ae_batches(n):
        for _ in range(n):
            idx = rng.randint(0, len(wavs), 4)
            out = []
            for i in idx:
                w = wavs[i]
                s = rng.randint(0, len(w) - NUM_SIGNAL)
                out.append(w[s:s + NUM_SIGNAL])
            yield np.stack(out)[..., None]

    mr_losses = []
    ae_state = ae_trainer.fit(
        ae_state, ae_batches(120), max_steps=120,
        callback=lambda s, m: mr_losses.append(m.get("mrstft")))
    ls = [l for l in mr_losses if l is not None]
    log(f"codec mrstft first10={np.mean(ls[:10]):.3f} "
        f"last10={np.mean(ls[-10:]):.3f}")
    assert np.mean(ls[-10:]) < np.mean(ls[:10]), "codec loss did not drop"
    codec_dir = os.path.join(WORK, "codec")
    save_checkpoint(codec_dir, ae_state.step,
                    {"codec_vars": ae_state.codec_vars,
                     "step": ae_state.step},
                    config_json=ae_to_json(ae_cfg))
    log("codec trained + saved")

    # -- 3. latent dataset -------------------------------------------------
    codec = AudioCodec(ae_cfg)
    enc = jax.jit(lambda v, x: codec.apply(v, x, method=AudioCodec.encode))
    db = os.path.join(WORK, "db")
    with RecordWriter(db) as w:
        for i, wav in enumerate(wavs * 6):   # repeat for more examples
            z = enc(ae_state.codec_vars,
                    jnp.asarray(wav[:NUM_SIGNAL])[None, :, None])
            ae = AudioExample()
            ae.put_array("z", np.asarray(z)[0].T.astype(np.float32))
            ae.put_metadata({"idx": str(i)})
            w.put(f"{i:08d}", ae.serialize())
    log(f"latent store written ({len(wavs) * 6} examples)")

    # -- 4. diffusion training (phase 1 + phase 2) -------------------------
    n_signal = 32
    cfg = get_config("tiny")
    cfg = with_overrides(cfg, {
        "denoiser.embed_dim": 64, "denoiser.n_layers": 2,
        "denoiser.noise_embed_dims": 16, "denoiser.mlp_multiplier": 2,
        "encoder.channels": (16, 16, 16, 32),
        "encoder_time.channels": (16, 16, 16, 16, 12),
        "classifier.channels": (16, 16, 16, 16, 6),
        "train.n_signal": n_signal, "train.batch_size": 8,
        "train.timbre_warmup": 60, "train.adversarial_warmup": 30,
        "train.stop_training_encoder_step": 10_000,
        "autoencoder.pqmf_bands": 4, "autoencoder.z_channels": 8,
        "autoencoder.base_channels": 8, "autoencoder.multipliers": (1, 2, 2),
        "autoencoder.factors": (2, 2), "autoencoder.dilations": (1, 3),
        "autoencoder.num_blocks_per_stage": 1,
        "autoencoder.causal": True, "autoencoder.use_norm": False,
    }).resolved(in_size=8, n_signal=n_signal)

    dataset = CombinedDataset({"db": db}, keys=["z"], config="train")
    collate = make_collate_fn(n_signal, "audio", ae_cfg.ratio, SR)
    loader = DataLoader(dataset, 8, collate, weights=dataset.example_weights)
    trainer = DiffusionTrainer(cfg)
    dstate = trainer.init(jax.random.PRNGKey(1), 8)
    dlosses = []
    dstate = trainer.fit(dstate, iter(loader), max_steps=180,
                         callback=lambda s, m: dlosses.append(
                             m.get("diffusion_loss")))
    ls = [l for l in dlosses if l is not None]
    log(f"diffusion loss first20={np.mean(ls[:20]):.3f} "
        f"last20={np.mean(ls[-20:]):.3f}")
    assert np.mean(ls[-20:]) < np.mean(ls[:20]), "diffusion loss did not drop"
    run_dir = os.path.join(WORK, "run")
    save_checkpoint(run_dir, dstate.step,
                    {"variables": dstate.variables,
                     "ema_params": dstate.ema_params, "step": dstate.step},
                    config_json=to_json(cfg))
    log("diffusion trained + saved")

    # -- 5. export via the CLI path ----------------------------------------
    from after_tpu.cli.export import main as export_main
    rc = export_main("export", ["--model_path", run_dir,
                                "--emb_model_path", codec_dir,
                                "--nb_steps", "2", "--chunk_size", "4"])
    assert rc == 0
    art = os.path.join(run_dir, "after.audio.run")
    log("exported")

    # -- 6. stream through the exported artifact ---------------------------
    host = ExportedStreamer(art)
    A = host.manifest["audio_chunk"]
    audio = jnp.asarray(wavs[0][:A]).reshape(1, A, 1)
    outs = []
    for c in range(6):
        zs = host.call("structure", audio)
        zt = host.call("timbre", audio)
        z = host.call("diffuse", zs, zt,
                      jax.random.key_data(jax.random.PRNGKey(c)))
        y = host.call("decode", z)
        outs.append(np.asarray(y))
    out = np.concatenate(outs, axis=1)
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 1e-5, "silent output"
    log(f"streamed {out.shape[1]} samples, peak {np.abs(out).max():.3f}")
    log("E2E PIPELINE OK")


if __name__ == "__main__":
    main()

"""CLI end-to-end: prepare_dataset over synthetic wavs -> record store."""

import os

import numpy as np
import pytest

from after_tpu.cli.main import main as cli_main
from after_tpu.dataset import AudioExample, RecordReader
from after_tpu.dataset.audio import save_wav


@pytest.fixture
def corpus(tmp_path):
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    sr = 44100
    rng = np.random.RandomState(0)
    for i in range(3):
        t = np.arange(sr * 2) / sr
        x = 0.4 * np.sin(2 * np.pi * (220 + 110 * i) * t)
        x += 0.05 * rng.randn(len(x))
        save_wav(str(cdir / f"tone_{i}.wav"), x.astype(np.float32), sr)
    return cdir


def test_prepare_dataset_waveform_only(corpus, tmp_path):
    out = tmp_path / "db"
    rc = cli_main(["prepare_dataset", "--input_path", str(corpus),
                   "--output_path", str(out), "--num_signal", "32768",
                   "--save_waveform"])
    assert rc == 0
    reader = RecordReader(str(out))
    assert len(reader) >= 3
    ae = AudioExample(reader.get(reader.keys()[0]))
    assert "waveform" in ae.get_keys()
    assert ae.get("waveform").shape == (32768,)
    assert ae.get_metadata()["name"].startswith("tone_")


def test_cli_usage():
    assert cli_main([]) == 1
    assert cli_main(["bogus"]) == 1


def test_prepare_dataset_beat_track(corpus, tmp_path):
    out = tmp_path / "db_beats"
    rc = cli_main(["prepare_dataset", "--input_path", str(corpus),
                   "--output_path", str(out), "--num_signal", "65536",
                   "--save_waveform", "--beat_track"])
    assert rc == 0
    reader = RecordReader(str(out))
    ae = AudioExample(reader.get(reader.keys()[0]))
    bc = ae.get("beat_clock")
    dc = ae.get("downbeat_clock")
    assert bc.shape == (65536 // 2048,) and dc.shape == bc.shape
    assert 0 <= bc.min() and bc.max() <= 1.0001


def test_update_dataset(corpus, tmp_path):
    import jax
    import jax.numpy as jnp

    from after_tpu.config import AutoEncoderConfig, ae_to_json
    from after_tpu.models import AudioCodec
    from after_tpu.utils.checkpoint import save_checkpoint

    # waveform-only store
    db = tmp_path / "db_wav"
    rc = cli_main(["prepare_dataset", "--input_path", str(corpus),
                   "--output_path", str(db), "--num_signal", "4096",
                   "--save_waveform", "--max_files", "1"])
    assert rc == 0

    # micro codec checkpoint with its config
    cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                            multipliers=(1, 2, 2), factors=(2, 2),
                            dilations=(1, 3), num_blocks_per_stage=1)
    codec = AudioCodec(cfg)
    variables = jax.jit(codec.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 4096, 1)))
    ckpt = tmp_path / "codec_ckpt"
    save_checkpoint(str(ckpt), 0, {"codec_vars": variables},
                    config_json=ae_to_json(cfg))

    out = tmp_path / "db_z"
    rc = cli_main(["update_dataset", "--dataset_path", str(db),
                   "--output_path", str(out),
                   "--emb_model_path", str(ckpt)])
    assert rc == 0
    reader = RecordReader(str(out))
    ae = AudioExample(reader.get(reader.keys()[0]))
    z = ae.get("z")
    assert z.shape == (8, 4096 // cfg.ratio)   # stored (C, T)
    assert np.isfinite(z).all()


MICRO_OVERRIDES = [
    "--override", "denoiser.embed_dim=64",
    "--override", "denoiser.n_layers=1",
    "--override", "denoiser.noise_embed_dims=16",
    "--override", "denoiser.mlp_multiplier=2",
    "--override", "encoder.channels=[8,8,8,16]",
    "--override", "encoder_time.channels=[8,8,8,8,12]",
    "--override", "classifier.channels=[8,8,8,8,6]",
    "--override", "train.n_signal=32",
]


@pytest.fixture
def z_store(tmp_path):
    """Synthetic latent store (8 records, z as (C=8, T=200))."""
    from after_tpu.dataset import RecordWriter
    rng = np.random.RandomState(0)
    db = tmp_path / "zdb"
    with RecordWriter(str(db)) as w:
        for i in range(8):
            ae = AudioExample()
            ae.put_array("z", rng.randn(8, 200).astype(np.float32))
            ae.put_metadata({"name": f"rec{i}"})
            w.put(f"{i:08d}", ae.serialize())
    return db


@pytest.mark.slow
def test_train_cli_restart_restores_opt_state(z_store, tmp_path):
    """CLI restart: full train state (opt_state + cls_opt_state) is saved
    and restored (reference model.py:157,241-247)."""
    from after_tpu.utils.checkpoint import checkpoint_keys, restore_checkpoint

    out = tmp_path / "runs"
    base = ["train", "--name", "r", "--db_path", str(z_store),
            "--out_path", str(out), "--config", "tiny",
            "--batch_size", "2", *MICRO_OVERRIDES]
    assert cli_main(base + ["--max_steps", "2"]) == 0
    mdir = str(out / "r")
    keys = set(checkpoint_keys(mdir, 2))
    assert {"variables", "ema_params", "opt_state", "cls_opt_state",
            "step"} <= keys

    # resume with the optimizer state and continue to step 4
    assert cli_main(base + ["--max_steps", "4", "--restart", "2"]) == 0
    assert int(restore_checkpoint(mdir, 4)["step"]) == 4
    assert "opt_state" in set(checkpoint_keys(mdir, 4))


@pytest.mark.slow
def test_train_cli_model_edm(z_store, tmp_path):
    """`--model edm` trains through the CLI (the reference's dead switch,
    train.py:88-95), records diffusion_type in the run config, and
    restarts under it."""
    import json

    out = tmp_path / "runs"
    base = ["train", "--name", "e", "--db_path", str(z_store),
            "--out_path", str(out), "--config", "tiny",
            "--batch_size", "2", "--model", "edm", *MICRO_OVERRIDES]
    assert cli_main(base + ["--max_steps", "2"]) == 0
    cfgj = json.load(open(out / "e" / "config.json"))
    assert cfgj["diffusion_type"] == "edm"
    assert cli_main(base + ["--max_steps", "3", "--restart", "2"]) == 0


def test_train_cli_audio_probe_margin_and_quantized_structure(z_store,
                                                              tmp_path):
    """With --emb_model_path the validation loop logs BOTH transfer-margin
    probes — latent-space and the gate-honest audio round trip
    (val_transfer_margin_audio: sample at gate guidance, codec decode,
    re-encode, re-embed) — and encoder_time.quantizer_levels trains the FSQ
    structure bottleneck (the round-5 disentanglement recipe; the
    reference's FSQ, fsq.py:66, is dormant in its shipped configs)."""
    import json

    import jax
    import jax.numpy as jnp

    from after_tpu.config import AutoEncoderConfig, ae_to_json
    from after_tpu.models import AudioCodec
    from after_tpu.utils.checkpoint import save_checkpoint

    cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                            multipliers=(1, 2, 2), factors=(2, 2),
                            dilations=(1, 3), num_blocks_per_stage=1)
    codec = AudioCodec(cfg)
    variables = jax.jit(codec.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 4096, 1)))
    ckpt = tmp_path / "codec_ckpt"
    save_checkpoint(str(ckpt), 0, {"codec_vars": variables},
                    config_json=ae_to_json(cfg))

    out = tmp_path / "runs"
    rc = cli_main([
        "train", "--name", "m", "--db_path", str(z_store),
        "--out_path", str(out), "--config", "tiny", "--batch_size", "2",
        "--emb_model_path", str(ckpt), *MICRO_OVERRIDES,
        "--override", "encoder_time.quantizer_levels=[5,5,5,5,5,5,5,5,5,5,5,5]",
        "--override", "train.steps_valid=2",
        "--override", "train.timbre_warmup=1",
        "--max_steps", "2"])
    assert rc == 0
    rows = [json.loads(line)
            for line in open(out / "m" / "metrics.jsonl")]
    vt = [r for r in rows if "val_transfer_margin_audio" in r]
    assert vt and np.isfinite(vt[-1]["val_transfer_margin_audio"])
    assert any("val_transfer_margin" in r for r in rows)


@pytest.mark.slow
def test_prepare_augment_then_train_consumes_z_aug(corpus, tmp_path, capsys):
    """e2e: prepare_dataset --augmentations writes z_aug_* latents and the
    train CLI discovers + consumes them (reference train.py:105-122)."""
    import jax
    import jax.numpy as jnp

    from after_tpu.config import AutoEncoderConfig, ae_to_json
    from after_tpu.models import AudioCodec
    from after_tpu.utils.checkpoint import save_checkpoint

    cfg = AutoEncoderConfig(pqmf_bands=4, z_channels=8, base_channels=8,
                            multipliers=(1, 2, 2), factors=(2, 2),
                            dilations=(1, 3), num_blocks_per_stage=1)
    codec = AudioCodec(cfg)
    num_signal = 64 * cfg.ratio  # 64 latent frames per record
    variables = jax.jit(codec.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, num_signal, 1)))
    ckpt = tmp_path / "codec_ckpt"
    save_checkpoint(str(ckpt), 0, {"codec_vars": variables},
                    config_json=ae_to_json(cfg))

    db = tmp_path / "db_aug"
    rc = cli_main(["prepare_dataset", "--input_path", str(corpus),
                   "--output_path", str(db), "--num_signal", str(num_signal),
                   "--emb_model_path", str(ckpt), "--augmentations", "2",
                   "--max_files", "2"])
    assert rc == 0
    reader = RecordReader(str(db))
    ae = AudioExample(reader.get(reader.keys()[0]))
    assert {"z", "z_aug_0", "z_aug_1"} <= set(ae.get_keys())
    assert ae.get("z_aug_0").shape == ae.get("z").shape

    out = tmp_path / "runs_aug"
    rc = cli_main(["train", "--name", "a", "--db_path", str(db),
                   "--out_path", str(out), "--config", "tiny",
                   "--batch_size", "2", "--max_steps", "1",
                   "--augmentation_keys", "all", *MICRO_OVERRIDES])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "timbre augmentation keys: ['z_aug_0', 'z_aug_1']" in stdout


def test_parse_override_args():
    from after_tpu.cli.train import parse_override_args
    out = parse_override_args(["a.b=3", "c=[1,2]", "d=hello", "e=0.5",
                               "f=true"])
    assert out == {"a.b": 3, "c": (1, 2), "d": "hello", "e": 0.5, "f": True}
    with pytest.raises(ValueError):
        parse_override_args(["novalue"])


def test_all_cli_modules_import_and_parse():
    """Every CLI submodule imports (a stray syntax error once shipped in
    import_torch.py) and its argparser builds."""
    import importlib

    from after_tpu.cli import main as main_mod
    for mod_name, attr in [
            ("after_tpu.cli.prepare_dataset", "build_argparser"),
            ("after_tpu.cli.train", "build_argparser"),
            ("after_tpu.cli.train_autoencoder", "build_argparser"),
            ("after_tpu.cli.import_torch", "build_argparser"),
    ]:
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, attr)), mod_name
    from after_tpu.cli.export import build_argparser as export_parser
    assert export_parser("export") is not None


def test_every_module_imports():
    """Package-wide import sweep: no module may fail to compile/import."""
    import importlib
    import pkgutil

    import after_tpu

    bad = []
    for m in pkgutil.walk_packages(after_tpu.__path__, "after_tpu."):
        try:
            importlib.import_module(m.name)
        except Exception as e:  # pragma: no cover - failure reporting
            bad.append((m.name, repr(e)))
    assert not bad, bad


def test_prepare_dataset_descriptors(corpus, tmp_path):
    """--descriptors stores per-chunk spectral features at latent rate
    (reference prepare_dataset.py:350-357, transforms.py:273-337)."""
    out = tmp_path / "db_desc"
    rc = cli_main(["prepare_dataset", "--input_path", str(corpus),
                   "--output_path", str(out), "--num_signal", "65536",
                   "--save_waveform", "--descriptors", "centroid",
                   "--descriptors", "flatness"])
    assert rc == 0
    reader = RecordReader(str(out))
    ae = AudioExample(reader.get(reader.keys()[0]))
    c = ae.get("centroid")
    f = ae.get("flatness")
    assert c.shape == (65536 // 2048,) and f.shape == c.shape
    assert np.isfinite(c).all() and 0 < c.mean() < 22050
    assert np.all(f >= 0) and np.all(f <= 1.0 + 1e-6)
    assert "bandwidth" not in ae.get_keys()

    # 'all' expands; unknown names fail with a clear error
    out2 = tmp_path / "db_desc_all"
    rc = cli_main(["prepare_dataset", "--input_path", str(corpus),
                   "--output_path", str(out2), "--num_signal", "65536",
                   "--save_waveform", "--descriptors", "all",
                   "--max_files", "1"])
    assert rc == 0
    ae2 = AudioExample(RecordReader(str(out2)).get("00000000"))
    assert {"centroid", "bandwidth", "rolloff", "flatness",
            "rms"} <= set(ae2.get_keys())
    with pytest.raises(SystemExit):
        cli_main(["prepare_dataset", "--input_path", str(corpus),
                  "--output_path", str(tmp_path / "db_bad"),
                  "--num_signal", "65536", "--save_waveform",
                  "--descriptors", "bogus", "--max_files", "1"])


@pytest.fixture
def wave_store(tmp_path):
    """Synthetic waveform store (10 records, 16384 samples each)."""
    from after_tpu.dataset import RecordWriter
    rng = np.random.RandomState(0)
    db = tmp_path / "wavedb"
    with RecordWriter(str(db)) as w:
        for i in range(10):
            ae = AudioExample()
            t = np.arange(16384) / 44100.0
            x = 0.4 * np.sin(2 * np.pi * (220 + 55 * i) * t)
            x += 0.01 * rng.randn(len(x))
            ae.put_array("waveform", x.astype(np.float32), dtype=np.int16)
            ae.put_metadata({"name": f"rec{i}"})
            w.put(f"{i:08d}", ae.serialize())
    return db


AE_MICRO_OVERRIDES = [
    "--override", "pqmf_bands=4",
    "--override", "z_channels=8",
    "--override", "base_channels=8",
    "--override", "multipliers=[1,2,2]",
    "--override", "factors=[2,2]",
    "--override", "dilations=[1,3]",
    "--override", "num_blocks_per_stage=1",
    "--override", "train.steps_valid=2",
]


@pytest.mark.slow
def test_train_autoencoder_cli_validation_and_mesh(wave_store, tmp_path,
                                                  capsys):
    """AE CLI end-to-end (VERDICT r2 #4/#5): --override shapes the codec,
    validation losses land in metrics.jsonl, reconstruction audio artifacts
    are written (reference trainer.py:221-260,324-344), and --mesh data=N
    runs the GAN steps SPMD."""
    import jax
    import json

    from after_tpu.config import load_codec_config

    n_mesh = min(8, len(jax.devices()))
    out = tmp_path / "runs"
    rc = cli_main(["train_autoencoder", "--name", "ae", "--db_path",
                   str(wave_store), "--out_path", str(out),
                   "--batch_size", str(n_mesh), "--num_signal", "8192",
                   "--max_steps", "2", "--mesh", f"data={n_mesh}",
                   *AE_MICRO_OVERRIDES])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert f"mesh: data={n_mesh}" in stdout
    assert "val mrstft" in stdout

    mdir = out / "ae"
    # --override reached the saved codec architecture config
    assert load_codec_config(str(mdir)).z_channels == 8

    entries = [json.loads(l) for l in
               open(mdir / "metrics.jsonl").read().splitlines()]
    val_entries = [e for e in entries if "val_mrstft" in e]
    assert val_entries, entries
    assert np.isfinite(val_entries[0]["val_mrstft"])

    wavs = list((mdir / "audio").glob("validation_audio_*.wav"))
    assert wavs, "no validation audio artifact written"

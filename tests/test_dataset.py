"""Dataset layer tests: record store round-trip, AudioExample, datasets,
collate, MIDI parser, audio IO."""

import os

import numpy as np
import pytest

from after_tpu.dataset import (AudioExample, CombinedDataset, DataLoader,
                               MidiFile, Note, RecordReader, RecordWriter,
                               SimpleDataset, make_collate_fn)
from after_tpu.dataset.audio import load_wav, normalize_signal, save_wav


def _write_store(path, n=10, z_shape=(8, 64)):
    rng = np.random.RandomState(0)
    with RecordWriter(str(path)) as w:
        for i in range(n):
            ae = AudioExample()
            ae.put_array("z", rng.randn(*z_shape).astype(np.float32))
            ae.put_array("waveform", rng.randn(1024), dtype=np.int16)
            ae.put_metadata({"idx": str(i)})
            w.put(f"{i:08d}", ae.serialize())


def test_store_roundtrip(tmp_path):
    _write_store(tmp_path / "db")
    r = RecordReader(str(tmp_path / "db"))
    assert len(r) == 10
    ae = AudioExample(r.get("00000003"))
    assert ae.get("z").shape == (8, 64)
    assert ae.get("waveform").dtype == np.float32  # int16 auto-rescaled
    assert abs(ae.get("waveform")).max() <= 1.0
    assert ae.get_metadata()["idx"] == "3"
    assert set(ae.get_keys()) == {"z", "waveform"}


def test_simple_dataset_split(tmp_path):
    _write_store(tmp_path / "db", n=50)
    tr = SimpleDataset(str(tmp_path / "db"), keys=["z"], split="train")
    va = SimpleDataset(str(tmp_path / "db"), keys=["z"], split="validation")
    assert len(tr) + len(va) == 50
    assert len(va) >= 1
    item = tr[0]
    assert item["z"].shape == (8, 64)


def test_combined_dataset_and_loader(tmp_path):
    _write_store(tmp_path / "a", n=30)
    _write_store(tmp_path / "b", n=10)
    ds = CombinedDataset({"a": str(tmp_path / "a"), "b": str(tmp_path / "b")},
                         keys=["z"])
    assert len(ds) == 39 or len(ds) == 38  # minus validation splits? no: train
    collate = make_collate_fn(n_signal=32)
    loader = DataLoader(ds, batch_size=4, collate_fn=collate,
                        weights=ds.example_weights)
    it = iter(loader)
    batch = next(it)
    assert batch["x"].shape == (4, 32, 8)
    assert batch["x_cond"].shape == (4, 32, 8)
    assert batch["x_time_cond"].shape == (4, 32, 8)


def test_midi_roundtrip_and_piano_roll(tmp_path):
    notes = [Note(60, 100, 0.0, 1.0), Note(64, 80, 0.5, 1.5),
             Note(67, 90, 1.0, 2.0)]
    m = MidiFile(notes=notes)
    p = str(tmp_path / "t.mid")
    m.save(p)
    m2 = MidiFile(p)
    assert len(m2.notes) == 3
    for a, b in zip(sorted(notes, key=lambda n: (n.start, n.pitch)),
                    sorted(m2.notes, key=lambda n: (n.start, n.pitch))):
        assert a.pitch == b.pitch and a.velocity == b.velocity
        assert abs(a.start - b.start) < 0.01 and abs(a.end - b.end) < 0.01
    times = np.linspace(0, 2, 100)
    roll = m2.get_piano_roll(times)
    assert roll.shape == (128, 100)
    assert roll[60, 10] == 100 and roll[60, 60] == 0
    sliced = m2.slice(0.5, 1.5)
    assert len(sliced.notes) == 3 and sliced.notes[0].start == 0.0


def test_midi_note_pairs_match_piano_roll():
    """get_note_pairs (the native host's streaming conditioning) scattered
    back into a 128-bin roll reproduces get_piano_roll — the same property
    Streamer.diffuse_midi relies on (velocity/128 scatter-max)."""
    notes = [Note(60, 100, 0.0, 1.0), Note(64, 80, 0.5, 1.5),
             Note(67, 90, 1.0, 2.0)]
    m = MidiFile(notes=notes)
    times = np.linspace(0, 2, 50)
    pairs = m.get_note_pairs(times, n_poly=4)
    assert pairs.shape == (50, 4, 2)
    roll = np.zeros((50, 128), np.float32)
    for i in range(50):
        for p, v in pairs[i]:
            if v > 0:
                roll[i, int(p)] = max(roll[i, int(p)], v)
    assert np.array_equal(roll.T, m.get_piano_roll(times))
    # polyphony truncation keeps the FIRST n_poly active notes in note
    # order: at t=0.75 both pitch 60 (vel 100) and 64 (vel 80) are active
    trunc = m.get_note_pairs(np.array([0.75]), n_poly=1)
    assert trunc.shape == (1, 1, 2)
    assert tuple(trunc[0, 0]) == (60.0, 100.0)


def test_midi_collate(tmp_path):
    m = MidiFile(notes=[Note(60, 100, 0.0, 3.0)])
    z = np.random.randn(8, 64).astype(np.float32)
    collate = make_collate_fn(n_signal=32, structure_type="midi",
                              ae_ratio=2048, sr=44100)
    batch = collate([{"z": z, "midi": m}, {"z": z, "midi": m}])
    assert batch["x_time_cond"].shape == (2, 32, 128)
    assert batch["x_time_cond"].max() <= 1.0


def test_wav_io(tmp_path):
    sr = 44100
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, x, sr)
    y, sr2 = load_wav(p, sr=22050)
    assert sr2 == 22050
    assert abs(len(y) - sr // 2) < 4
    z = normalize_signal(0.01 * x)
    # gain capped at +30 dB: 0.005 peak -> ~0.158
    assert 0.1 < np.abs(z).max() <= 1.0


def test_native_store_matches_python(tmp_path):
    from after_tpu.dataset.native_store import NativeRecordReader, build_native
    if build_native() is None:
        pytest.skip("g++ unavailable")
    _write_store(tmp_path / "db", n=12)
    py = RecordReader(str(tmp_path / "db"))
    nat = NativeRecordReader(str(tmp_path / "db"))
    assert len(nat) == len(py) == 12
    assert nat.keys() == py.keys()
    for k in py.keys():
        assert nat.get(k) == py.get(k)
    nat.close()


def test_midi_collate_from_store(tmp_path):
    """MIDI records written by prepare_dataset (pickled MidiFile bytes) flow
    through the collate into piano rolls."""
    import pickle
    from after_tpu.dataset import RecordWriter
    m = MidiFile(notes=[Note(64, 90, 0.0, 2.0)])
    with RecordWriter(str(tmp_path / "db")) as w:
        for i in range(4):
            ae = AudioExample()
            ae.put_array("z", np.random.randn(8, 64).astype(np.float32))
            blob = pickle.dumps(m)
            ae.put_buffer("midi_bytes", blob, [len(blob)])
            w.put(f"{i:08d}", ae.serialize())
    ds = SimpleDataset(str(tmp_path / "db"), keys=["z", "midi_bytes"])
    collate = make_collate_fn(n_signal=32, structure_type="midi",
                              ae_ratio=2048, sr=44100)
    batch = collate([ds[0], ds[1]])
    assert batch["x_time_cond"].shape == (2, 32, 128)
    assert batch["x_time_cond"][:, :, 64].max() > 0


def test_latent_map_projector(tmp_path):
    from after_tpu.utils.latent_map import (SmallAutoencoder, train_projector,
                                            generate_map_png)
    rng = np.random.RandomState(0)
    emb = rng.randn(200, 6).astype(np.float32)
    model, params = train_projector(emb, num_steps=200, batch_size=32)
    import jax.numpy as jnp
    m2d = model.apply(params, jnp.asarray(emb), method=SmallAutoencoder.encode)
    assert m2d.shape == (200, 2)
    assert np.abs(np.asarray(m2d)).max() <= 1.0
    png = str(tmp_path / "map.png")
    rgb = generate_map_png(np.asarray(m2d), png, bins=64, sigma=3)
    assert rgb.shape == (64, 64, 3)
    assert open(png, "rb").read(8) == b"\x89PNG\r\n\x1a\n"


def test_collate_timbre_augmentation_keys():
    """x_cond crops come from the augmented buffers when keys are given
    (reference utils.py:58-75); short augments fall back to z."""
    from after_tpu.dataset import make_collate_fn

    n_signal = 16
    batch = []
    for bi in range(4):
        batch.append({
            "z": np.zeros((8, 64), np.float32),
            "z_aug_0": np.full((8, 64), 1.0, np.float32),
            "z_aug_1": np.full((8, 64), 2.0, np.float32),
        })
    collate = make_collate_fn(n_signal, "audio",
                              timbre_augmentation_keys=("z_aug_0", "z_aug_1"))
    out = collate(batch)
    assert out["x"].shape == (4, n_signal, 8)
    # targets come from z (zeros); timbre crops from the augment buffers
    assert np.all(out["x"] == 0.0)
    vals = np.unique(out["x_cond"])
    assert set(vals.tolist()) <= {1.0, 2.0} and len(vals) >= 1

    # an augment that is too short falls back to the original z
    batch_short = [{"z": np.zeros((8, 64), np.float32),
                    "z_aug_0": np.full((8, 10), 3.0, np.float32)}]
    collate1 = make_collate_fn(n_signal, "audio",
                               timbre_augmentation_keys=("z_aug_0",))
    out1 = collate1(batch_short)
    assert np.all(out1["x_cond"] == 0.0)


def test_collate_timbre_limit():
    """timbre_limit windows the x_cond crop near the target crop
    (reference utils.py:78-87)."""
    from after_tpu.dataset import make_collate_fn

    n_signal, T = 8, 256
    z = np.arange(T, dtype=np.float32)[None].repeat(2, 0)  # (C=2, T)
    batch = [{"z": z} for _ in range(16)]
    collate = make_collate_fn(n_signal, "audio", timbre_limit=0.5)
    out = collate(batch)
    # start offset of each crop = first element along T (values are aranges)
    for bi in range(16):
        d = abs(out["x_cond"][bi, 0, 0] - out["x"][bi, 0, 0])
        assert d <= n_signal * 0.5 + 1e-6


def test_dataloader_concurrent_iterators(tmp_path):
    """Two live iterators of one loader (and one shared collate) draw from
    independent per-iterator/per-thread rng streams without racing."""
    _write_store(str(tmp_path / "db"), n=16)
    from after_tpu.dataset import make_collate_fn

    ds = SimpleDataset(str(tmp_path / "db"), keys=["z"])
    collate = make_collate_fn(16, "audio")
    loader = DataLoader(ds, 4, collate, prefetch=2)
    it1, it2 = iter(loader), iter(loader)
    for _ in range(8):
        b1, b2 = next(it1), next(it2)
        assert b1["x"].shape == b2["x"].shape == (4, 16, 8)
        assert np.isfinite(b1["x"]).all() and np.isfinite(b2["x"]).all()

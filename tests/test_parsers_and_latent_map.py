"""Corpus parser tests + latent-map projector/PNG tests."""

import os

import numpy as np
import pytest

from after_tpu.dataset.audio import save_wav
from after_tpu.dataset.parsers import get_parser


def _wav(path, seconds=0.1, sr=4000):
    save_wav(path, np.zeros(int(seconds * sr), np.float32), sr)


def test_simple_audio_and_midi(tmp_path):
    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    _wav(str(d / "a.wav"))
    _wav(str(d / "sub" / "b.wav"))
    (d / "a.mid").write_bytes(b"")
    (d / "c.mp3").write_bytes(b"")   # unsupported: listed as skipped

    audio, midis, metas = get_parser("simple_audio")(str(d))
    assert [os.path.basename(f) for f in audio] == ["a.wav", "b.wav"]
    assert midis == [None, None]
    assert metas[0]["name"] == "a"

    audio, midis, metas = get_parser("simple_midi")(str(d))
    # only a.wav has a same-stem midi
    assert [os.path.basename(f) for f in audio] == ["a.wav"]
    assert midis[0].endswith("a.mid")


def test_slakh_parser_bans_drums(tmp_path):
    yaml = pytest.importorskip("yaml")
    d = tmp_path / "Track00001"
    (d / "stems").mkdir(parents=True)
    (d / "MIDI").mkdir()
    _wav(str(d / "stems" / "S00.wav"))
    _wav(str(d / "stems" / "S01.wav"))
    (d / "MIDI" / "S00.mid").write_bytes(b"")
    (d / "metadata.yaml").write_text(
        "stems:\n  S00:\n    inst_class: Piano\n"
        "  S01:\n    inst_class: Drums\n")
    audio, midis, metas = get_parser("slakh")(str(tmp_path))
    assert len(audio) == 1 and audio[0].endswith("S00.wav")
    assert midis[0].endswith("S00.mid")
    assert metas[0]["instrument"] == "piano"


def test_vital_parser(tmp_path):
    _wav(str(tmp_path / "brass_60.wav"))
    audio, _, metas = get_parser("vital")(str(tmp_path))
    assert metas[0]["patch"] == "brass" and metas[0]["pitch"] == "60"


def test_get_parser_unknown():
    with pytest.raises(KeyError):
        get_parser("nope")


def test_latent_map_projector_and_png(tmp_path):
    from after_tpu.utils.latent_map import (SmallAutoencoder,
                                            generate_map_png,
                                            train_projector)

    rng = np.random.RandomState(0)
    # two separable clusters in 6-D
    emb = np.concatenate([rng.randn(64, 6) + 4, rng.randn(64, 6) - 4])
    emb = emb.astype(np.float32)
    model, params = train_projector(emb, num_steps=300)
    xy = np.asarray(model.apply(params, emb,
                                method=SmallAutoencoder.encode))
    assert xy.shape == (128, 2)
    # clusters remain separated in the 2-D map
    a, b = xy[:64].mean(0), xy[64:].mean(0)
    spread = xy.std(0).mean()
    assert np.linalg.norm(a - b) > spread, (a, b, spread)

    png = str(tmp_path / "map.png")
    generate_map_png(xy, png, bins=64)
    data = open(png, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 200

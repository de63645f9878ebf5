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

"""Basic-pitch transcription pipeline tests."""

import numpy as np
import jax
import pytest

from after_tpu.dataset.basic_pitch import (AUDIO_SAMPLE_RATE, BasicPitch,
                                           notes_from_activations)


def test_note_extraction_from_synthetic_activations():
    T, bins = 200, 88
    onsets = np.zeros((T, bins), np.float32)
    frames = np.zeros((T, bins), np.float32)
    # one clear note: bin 39 (midi 60), frames 20..80
    onsets[20, 39] = 0.9
    frames[20:80, 39] = 0.8
    # a too-short blip
    onsets[100, 50] = 0.9
    frames[100:104, 50] = 0.8
    midi = notes_from_activations(onsets, frames)
    assert len(midi.notes) == 1
    n = midi.notes[0]
    assert n.pitch == 60
    fps = AUDIO_SAMPLE_RATE / 256
    assert abs(n.start - 20 / fps) < 0.02
    assert n.end > n.start + 0.5


def test_basic_pitch_forward_runs():
    bp = BasicPitch()
    bp.init(jax.random.PRNGKey(0))
    sr = AUDIO_SAMPLE_RATE
    t = np.arange(sr) / sr
    audio = (0.5 * np.sin(2 * np.pi * 261.63 * t)).astype(np.float32)
    acts = bp.activations(audio)
    assert acts["note"].shape[1] == 88
    assert acts["onset"].shape == acts["note"].shape
    assert 0 <= acts["note"].min() and acts["note"].max() <= 1


def test_basic_pitch_torch_weight_port():
    ckpt = ("/root/reference/after/dataset/basic_pitch_torch/assets/"
            "basic_pitch_pytorch_icassp_2022.pth")
    import os
    if not os.path.exists(ckpt):
        pytest.skip("vendored checkpoint unavailable")
    pytest.importorskip("torch")
    from after_tpu.dataset.basic_pitch import load_torch_weights
    bp = BasicPitch()
    variables = bp.init(jax.random.PRNGKey(0))
    ported = load_torch_weights(ckpt)
    # shapes must line up with the initialised tree
    init_net = variables["net"]["params"]
    for name, leaf in ported["net"]["params"].items():
        for k, v in leaf.items():
            assert np.shape(init_net[name][k]) == np.shape(v), (name, k)
    bp.variables = {**variables, "net": ported["net"],
                    "cqt_bn": ported["cqt_bn"]}
    sr = AUDIO_SAMPLE_RATE
    t = np.arange(2 * sr) / sr
    # C major triad
    audio = sum(0.3 * np.sin(2 * np.pi * f * t)
                for f in (261.63, 329.63, 392.0)).astype(np.float32)
    midi = bp.transcribe(audio, sr)
    pitches = sorted({n.pitch for n in midi.notes})
    # with real weights the triad pitches should appear
    assert len(midi.notes) >= 1
    assert any(p in (60, 64, 67) for p in pitches), pitches
